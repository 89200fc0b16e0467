#!/bin/sh
# The designated r1-recipe replication experiment (docs/milestone_eval.md
# "Reconciling round-1's clean SSIM 0.9696"): 40k steps x batch 32 over
# the preserved 20k-sample dataset (dataset/OpenFWI_20k/), fp32 (round-1's
# Makefile passed no --amp), milestones every 2.5k steps so the
# quality-vs-step curve for THIS recipe is resolved at the same
# granularity as probe_run resolved the batch-128 recipe.
#
# Chip-exclusive: run only when nothing else executes on the TPU.
# Usage: sh tools/replicate_r1_prior.sh [results_folder]
set -ex
cd "$(dirname "$0")/.."
OUT=${1:-pretrained_models/replication_r1}
red-diffeq-train \
  --data_dir dataset/OpenFWI_20k/Velocity_Data \
  --batch_size 32 \
  --train_num_steps 40000 \
  --save_every 2500 \
  --results_folder "$OUT"
