#!/bin/bash
# TPU port of /root/reference/scripts/rpo/base2new_train.sh
# usage: sh scripts/rpo/base2new_train.sh <dataset> <seed> <device> <cfg> <shots>
# <device> is kept for CLI compatibility; device selection on TPU hosts is
# handled by the runtime (one process per chip/slice).
TRAINER=RPO

DATASET=$1
SEED=$2
DEVICE=$3
CFG=$4
SHOTS=$5

DIR=output/rpo/base2new/train_base/${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}/seed${SEED}
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
