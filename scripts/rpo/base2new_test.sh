#!/bin/bash
# TPU port of /root/reference/scripts/rpo/base2new_test.sh
# usage: sh scripts/rpo/base2new_test.sh <dataset> <seed> <device> <cfg> <shots> <loadep> <base|new>
TRAINER=RPO

DATASET=$1
SEED=$2
DEVICE=$3
CFG=$4
SHOTS=$5
LOADEP=$6
SUB=$7

COMMON_DIR=${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}/seed${SEED}
MODEL_DIR=output/rpo/base2new/train_base/${COMMON_DIR}
DIR=output/rpo/base2new/test_${SUB}/${COMMON_DIR}

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
