#!/bin/bash
# usage: sh scripts/rpo/xd_train.sh <dataset> <seed> <device> <cfg>
TRAINER=RPO
DATASET=$1
SEED=$2
DEVICE=$3
CFG=$4
SHOTS=16

DIR=output/rpo/domain/${DATASET}/${TRAINER}/${CFG}_${SHOTS}shots/seed${SEED}
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
    DATASET.NUM_SHOTS ${SHOTS}
fi
