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

# Round-end guard: the driver benches on the SAME single chip right
# after the round ends, and two concurrent chip users wedge the tunnel
# (docs/outage_runbook.md). If /tmp/ROUND5_DEADLINE (epoch seconds)
# exists, refuse to START a chip step within 40 min of it so the chip
# is always free (and grant-reclaimed) for the graded bench.
DEADLINE=$(cat /tmp/ROUND5_DEADLINE 2>/dev/null || echo 9999999999)
past_deadline() {
  [ "$(date +%s)" -gt "$((DEADLINE - 2400))" ]
}

# bench.py exits 0 with an {"error": ...} diagnostic line when the
# device is unreachable (by design, for the driver) — that is still a
# FAILED capture here, so gate on the error key as well as the rc.
# bench steps self-retry transient faults; they get NO shell retry.
run_bench() {
  name=$1; shift
  if past_deadline; then
    echo "SKIP $name (round deadline)" >> "$STATUS"
    return
  fi
  if "$@" > "$LOG/$name.log" 2>&1 && ! grep -q '"error"' "$LOG/$name.log"; then
    echo "ok   $name" >> "$STATUS"
  else
    echo "FAIL $name (see $LOG/$name.log)" >> "$STATUS"
    FAILED=1
  fi
}

# Non-bench steps: transient UNAVAILABLE faults are MOST likely right
# after an outage (runbook mode 3: all retryable in a fresh process),
# so retry once when the log's tail shows one — same policy as
# publish_round.sh run_step.
run() {
  name=$1; shift
  if past_deadline; then
    echo "SKIP $name (round deadline)" >> "$STATUS"
    return
  fi
  if "$@" > "$LOG/$name.log" 2>&1; then
    echo "ok   $name" >> "$STATUS"
  elif tail -n 25 "$LOG/$name.log" | grep -qi 'UNAVAILABLE'; then
    echo "retrying $name after transient UNAVAILABLE" >&2
    if "$@" > "$LOG/$name.retry.log" 2>&1; then
      echo "ok   $name (after retry)" >> "$STATUS"
    else
      echo "FAIL $name (see $LOG/$name.retry.log)" >> "$STATUS"
      FAILED=1
    fi
  else
    echo "FAIL $name (see $LOG/$name.log)" >> "$STATUS"
    FAILED=1
  fi
}

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
# Preserve the raw measurements IN THE REPO: if no session is live when
# this chain runs, /tmp evidence would die with the round — the driver
# auto-commits repo files at round end.
EV=docs/chip_evidence_r5
mkdir -p "$EV"
cp "$STATUS" "$LOG"/*.log "$EV"/ 2>/dev/null || true
echo CHAIN_DONE >> "$STATUS"
cat "$STATUS"
exit "$FAILED"
