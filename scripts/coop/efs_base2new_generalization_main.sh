#!/bin/bash
# Extremely-few-shot protocol (reference scripts/coop/efs_base2new_generalization_main.sh)
DEVICE=$1
EPOCH=50

for shot in 1 2 4 8 16
do
    for dataset in eurosat dtd fgvc_aircraft oxford_flowers stanford_cars oxford_pets food101 sun397 ucf101 caltech101
    do
        for seed in 1 2 3 4 5 6 7 8 9 10
        do
            sh scripts/coop/base2new_train.sh ${dataset} ${seed} ${DEVICE} ${shot}
            sh scripts/coop/base2new_test.sh ${dataset} ${seed} ${DEVICE} ${shot} ${EPOCH} base
            sh scripts/coop/base2new_test.sh ${dataset} ${seed} ${DEVICE} ${shot} ${EPOCH} new
        done
    done
done
