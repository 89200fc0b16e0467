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

# Round-end guard (same rationale as post_outage_chain.sh): the driver
# benches on this chip at round end; training must be dead and the
# grant reclaimed by then. Self-cap the run to the time remaining
# before /tmp/ROUND5_DEADLINE minus a 45-min margin; milestones land
# every 2500 steps (atomic writes), so a timeout kill still yields
# evaluable partial data. Skip entirely if <30 min would remain.
DEADLINE=$(cat /tmp/ROUND5_DEADLINE 2>/dev/null || echo 9999999999)
AVAIL=$((DEADLINE - $(date +%s) - 2700))
if [ "$AVAIL" -lt 1800 ]; then
  echo "SKIP replication: only ${AVAIL}s before round deadline" >&2
  exit 0
fi
if [ "$AVAIL" -gt 10800 ]; then AVAIL=10800; fi
timeout "$AVAIL" red-diffeq-train \
  --data_dir dataset/OpenFWI_20k/Velocity_Data \
  --batch_size 32 \
  --train_num_steps 40000 \
  --save_every 2500 \
  --results_folder "$OUT"
