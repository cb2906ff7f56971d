#!/bin/bash
# usage: sh scripts/cocoop/base2new_train.sh <dataset> <seed> <device> <shots>
TRAINER=CoCoOp
CFG=$([ "CoCoOp" = "CoOp" ] && echo vit_b16_ep50_ctxv1 || echo vit_b16_c4_ep10_batch1)

DATASET=$1
SEED=$2
DEVICE=$3
SHOTS=$4

DIR=output/cocoop/base2new/train_base/${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}/seed${SEED}
if [ -d "$DIR" ]; then
    echo "Oops! The results exist at ${DIR} (so skip this job)"
else
python train.py \
--root ${DATA} \
--seed ${SEED} \
--trainer ${TRAINER} \
--dataset-config-file configs/datasets/${DATASET}.yaml \
--config-file configs/trainers/${TRAINER}/${CFG}.yaml \
--output-dir ${DIR} \
DATASET.NUM_SHOTS ${SHOTS} \
DATASET.SUBSAMPLE_CLASSES base
fi
