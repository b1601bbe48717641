#!/usr/bin/env bash
# GARF pose-refinement pipeline driver (parity: data_refine/get_pose.sh):
# 1. evaluate the trained GARF model -> exports transform_train.json and the
#    per-image test-time-optimized transform_val.json
# 2. propagate the val deltas onto the test poses -> data_refine/<scene>/
set -e
SCENE=${1:-Easyship}
python -m myc_nerfs_tpu.cli.evaluate --model=garf --yaml=configs/barf/${SCENE}.yaml "$@"
mkdir -p data_refine/${SCENE}
cp output/GARF/${SCENE}/transform_train.json data_refine/${SCENE}/transforms_train.json
cp output/GARF/${SCENE}/transform_val.json data_refine/${SCENE}/transforms_val.json
python -m myc_nerfs_tpu.cli.compare_pose --exp ${SCENE} --method trans
