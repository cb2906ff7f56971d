#!/bin/bash
# usage: sh scripts/coop/base2new_test.sh <dataset> <seed> <device> <shots> <loadep> <base|new>
TRAINER=CoOp
CFG=$([ "CoOp" = "CoOp" ] && echo vit_b16_ep50_ctxv1 || echo vit_b16_c4_ep10_batch1)

DATASET=$1
SEED=$2
DEVICE=$3
SHOTS=$4
LOADEP=$5
SUB=$6

COMMON_DIR=${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}/seed${SEED}
MODEL_DIR=output/coop/base2new/train_base/${COMMON_DIR}
DIR=output/coop/base2new/test_${SUB}/${COMMON_DIR}

python train.py \
--root ${DATA} \
--seed ${SEED} \
--trainer ${TRAINER} \
--dataset-config-file configs/datasets/${DATASET}.yaml \
--config-file configs/trainers/${TRAINER}/${CFG}.yaml \
--output-dir ${DIR} \
--model-dir ${MODEL_DIR} \
--load-epoch ${LOADEP} \
--eval-only \
DATASET.NUM_SHOTS ${SHOTS} \
DATASET.SUBSAMPLE_CLASSES ${SUB}
