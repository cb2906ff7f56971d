#!/bin/bash
# usage: sh scripts/lp/eval.sh <dataset> <cfg> <shots> <model-dir> <loadep>
TRAINER=LP
DATASET=$1
CFG=$2
SHOTS=$3
MODEL_DIR=$4
LOADEP=$5

for SEED in 1 2 3
do
    DIR=output/evaluation/${DATASET}/${TRAINER}/${CFG}_${SHOTS}shots/seed${SEED}
    python train.py \
    --root ${DATA} \
    --seed ${SEED} \
    --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir ${DIR} \
    --model-dir ${MODEL_DIR}/seed${SEED} \
    --load-epoch ${LOADEP} \
    --eval-only
done
