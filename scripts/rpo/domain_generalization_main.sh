#!/bin/bash
# Table-2 protocol: train ImageNet 16-shot (K=24, LR 0.005), eval on 5 shifts.
DEVICE=$1
EPOCH=15

for seed in 1 2 3
do
    sh scripts/rpo/xd_train.sh imagenet ${seed} ${DEVICE} imagenet_k24_ep15
    for dataset in imagenet imagenet_a imagenet_r imagenet_sketch imagenetv2
    do
        sh scripts/rpo/xd_test.sh ${dataset} ${seed} ${EPOCH} ${DEVICE} imagenet_k24_ep15
    done
done
