#!/bin/bash
# Fig-1 motivation: 10-seed fgvc run (reference scripts/coop/motivation.sh)
DEVICE=$1
SHOT=16
EPOCH=50

for dataset in fgvc_aircraft
do
    for seed in 1 2 3 4 5 6 7 8 9 10
    do
        sh scripts/coop/base2new_train.sh ${dataset} ${seed} ${DEVICE} ${SHOT}
        sh scripts/coop/base2new_test.sh ${dataset} ${seed} ${DEVICE} ${SHOT} ${EPOCH} base
        sh scripts/coop/base2new_test.sh ${dataset} ${seed} ${DEVICE} ${SHOT} ${EPOCH} new
    done
done
