#!/bin/sh
# Post-outage requeue: the chip-gated evidence steps, strictly
# serialized (docs/outage_runbook.md — two concurrent chip users wedge
# the tunnel). Run this once the chip answers a probe again; the first
# step's first dispatch absorbs the 5-8 min grant reclaim.
#
# Steps, cheapest-first so partial recovery still yields evidence:
#   1. headline bench (refreshes BENCH_LAST_GOOD.json)
#   2. stencil-layout on-chip timing (VERDICT r4 Next #4)
#   3. batch-16 operating point (VERDICT r4 Next #7)
#   4. QUALITY regen with warmup fix (VERDICT r4 Next #5)
#   5. corrupted-QUALITY regen (VERDICT r4 Next #5)
# The long r1-recipe prior replication (Next #3) is NOT queued here —
# launch tools/replicate_r1_prior.sh separately when hours of exclusive
# chip time are available.
#
# Exit code: nonzero if ANY step failed (same contract as
# publish_round.sh — stale artifacts must not masquerade as fresh).
#
# Usage: sh tools/post_outage_chain.sh [logdir]
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/post_outage}
mkdir -p "$LOG"
STATUS="$LOG/status.txt"
: > "$STATUS"
FAILED=0

# Shared deadline/step/serialization policies: tools/chain_lib.sh.
EV=${RDT_EVIDENCE_DIR:-docs/chip_evidence_r5}
. tools/chain_lib.sh
register_chain

run_bench bench         python bench.py --repeat 3
run layout_probe  python tools/kernel_layout_probe.py --nt 1000 --programs 20 --reps 3
# Production A/B of the x-stencil layout (ops/stencil.py X_STENCIL_LAYOUT):
# the probe times the bare recursion; these time the real fwd+adjoint
# kernels so adoption is decided on the production program.
run layout_ab_roll env RDT_X_STENCIL=roll python tools/kernel_bench.py --reps 3
run layout_ab_mxu  env RDT_X_STENCIL=mxu  python tools/kernel_bench.py --reps 3
run layout_ab_halo env RDT_X_STENCIL=halo python tools/kernel_bench.py --reps 3
run layout_ab_mxy  env RDT_X_STENCIL=mxu_xy python tools/kernel_bench.py --reps 3
run_bench bench_b16     python bench.py --repeat 3 --batch 16
run quality       python tools/eval_quality.py --n 4 --ts 300 --out QUALITY.md --save_curves docs/curves/openfwi
run quality_corr  python tools/eval_quality.py --n 4 --ts 300 --noise_std 0.05 --missing_number 10 --obs refined --out QUALITY_corrupted.md
# QUALITY.md feeds README's generated quality block (CPU-only step).
run readme_claims python tools/update_readme_claims.py
# Preserve the raw measurements IN THE REPO: if no session is live when
# this chain runs, /tmp evidence would die with the round — the driver
# auto-commits repo files at round end.
snapshot
echo CHAIN_DONE >> "$STATUS"
cat "$STATUS"
exit "$FAILED"
