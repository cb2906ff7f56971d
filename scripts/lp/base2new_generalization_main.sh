#!/bin/bash
DEVICE=$1
SHOT=16
EPOCH=10

for dataset in eurosat dtd fgvc_aircraft oxford_flowers stanford_cars oxford_pets food101 sun397 ucf101 caltech101 imagenet
do
    for seed in 1 2 3
    do
        sh scripts/lp/base2new_train.sh ${dataset} ${seed} ${DEVICE} ${SHOT}
        sh scripts/lp/base2new_test.sh ${dataset} ${seed} ${DEVICE} ${SHOT} ${EPOCH} base
        sh scripts/lp/base2new_test.sh ${dataset} ${seed} ${DEVICE} ${SHOT} ${EPOCH} new
    done
done
