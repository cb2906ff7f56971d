#!/bin/bash
# usage: sh scripts/rpo/xd_test.sh <dataset> <seed> <epoch> <device> <cfg>
TRAINER=RPO
DATASET=$1
SEED=$2
EPOCH=$3
DEVICE=$4
CFG=$5
SHOTS=16

DIR=output/rpo/evaluation/${TRAINER}/${CFG}_${SHOTS}shots/${DATASET}/seed${SEED}
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
    --model-dir output/rpo/domain/imagenet/${TRAINER}/${CFG}_${SHOTS}shots/seed${SEED} \
    --load-epoch ${EPOCH} \
    --eval-only
fi
