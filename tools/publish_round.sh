#!/bin/sh
# Post-training publishing chain (run when the chip is otherwise idle —
# everything here dispatches to the TPU and MUST be serialized).
#
# Each step's pass/fail is collected and reported at the end; any
# failure makes the script exit nonzero so stale artifacts can't
# masquerade as fresh (advisor r3: steps used to ignore exit codes).
#
# Usage: sh tools/publish_round.sh [logdir]
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/publish_r4}
mkdir -p "$LOG"
STATUS_FILE="$LOG/status.txt"
: > "$STATUS_FILE"
FAILED=0

run_step() {
  name=$1; shift
  if "$@" > "$LOG/$name.log" 2>&1; then
    echo "ok   $name" >> "$STATUS_FILE"
  elif tail -n 25 "$LOG/$name.log" | grep -qi 'UNAVAILABLE'; then
    # Only the FINAL error counts: backend-init chatter earlier in the
    # log can legitimately contain 'Unable ... UNAVAILABLE' on hosts
    # where the accelerator plugin probes and falls back, and a
    # deterministic failure must not trigger a multi-hour rerun.
    # Transient device/compile-service fault (observed: a batch-16
    # bench "kernel fault" that succeeded verbatim on retry). One
    # retry in a fresh process; the grant reclaim after a fault can
    # take ~5-8 min, which the retry's first dispatch absorbs.
    echo "retrying $name after transient UNAVAILABLE" >&2
    if "$@" > "$LOG/$name.retry.log" 2>&1; then
      echo "ok   $name (after retry)" >> "$STATUS_FILE"
    else
      echo "FAIL $name (see $LOG/$name.retry.log)" >> "$STATUS_FILE"
      FAILED=1
    fi
  else
    echo "FAIL $name (see $LOG/$name.log)" >> "$STATUS_FILE"
    FAILED=1
  fi
}

# 1. Export the shipped EMA prior — everything downstream measures it,
#    so a failure here aborts immediately.
#
#    The shipped milestone is the best-by-held-out-inversion-quality
#    one, NOT the last: docs/milestone_eval.md shows quality peaks
#    early (~20k steps) and degrades monotonically to 100k, and
#    tools/lambda_sweep.py shows no coupling-strength retune rescues
#    the late milestones. Override with SHIP_RUN / SHIP_MILESTONE.
SHIP_RUN=${SHIP_RUN:-pretrained_models/milestones_archive}
SHIP_MILESTONE=${SHIP_MILESTONE:-2}
run_step export_ema python tools/export_ema.py \
  --run "$SHIP_RUN" --milestone "$SHIP_MILESTONE"
grep -q FAIL "$STATUS_FILE" && { cat "$STATUS_FILE"; exit 1; }

# 2. Quality vs training progress (one compiled program, K milestones).
#    Includes the short probe run's 2.5k-10k milestones so the early
#    peak is located, not just bracketed.
run_step milestone_eval python tools/milestone_eval.py \
  --ckpts pretrained_models/probe_run/model-*.ckpt \
          pretrained_models/milestones_archive/model-*.ckpt \
  --out docs/milestone_eval.md \
  --note "Provenance: milestones_archive/* are the single 100k-step budget run (batch 128 = the reference's 12.8M-image budget); probe_run/* is a second, shorter run with the same recipe and a fresh seed, saved every 2.5k steps to resolve where the early peak sits. The shipped prior (pretrained_models/model-synthetic-ema.ckpt) is the best-by-held-out-quality milestone — early stopping applied with the full budget as evidence; tools/lambda_sweep.py (run once per prior change) shows retuning lambda does not rescue late milestones."

# 3. Headline quality, both observation protocols
run_step quality python tools/eval_quality.py --n 4 --ts 300 \
  --out QUALITY.md --save_curves docs/curves/openfwi

# 4. Robustness under corruption (honest observations)
run_step quality_corrupted python tools/eval_quality.py --n 4 --ts 300 \
  --noise_std 0.05 --missing_number 10 --obs refined \
  --out QUALITY_corrupted.md

# 5. Field-scale Marmousi-class table (patched RED, sigma=20)
run_step quality_marmousi python tools/eval_quality.py --n 2 --ts 300 \
  --width 190 --sigma 20 --out QUALITY_marmousi.md \
  --save_curves docs/curves/marmousi

# 6. Method comparison under both protocols
run_step benchmarks python tools/compare_methods.py --n 4 \
  --out BENCHMARKS.md
# 6b. Re-derive README's method-comparison paragraph from the artifact
#     just measured — otherwise tests/test_docs_consistency.py goes red
#     and the README quotes numbers the repo no longer reports.
run_step readme_claims python tools/update_readme_claims.py

# 7. Executed example notebooks (golden runs)
run_step nb_openfwi jupyter nbconvert --to notebook --execute --inplace \
  --ExecutePreprocessor.timeout=3600 examples/example_openfwi.ipynb
run_step nb_marmousi jupyter nbconvert --to notebook --execute --inplace \
  --ExecutePreprocessor.timeout=3600 examples/example_marmousi.ipynb

# bench.py handles its own fault policy (device probe with timeout, one
# self-retry with --repeat 1, diagnostic JSON + rc=0 on unrecoverable
# failure) — so it is NOT wrapped in run_step's UNAVAILABLE retry
# (advisor r4: the two retries used to stack into ~4 runs / 30+ min).
# A diagnostic line still fails the step here: rc=0 with an "error" key
# means "machine-readable failure", which must not publish as fresh.
run_bench_step() {
  name=$1; shift
  if "$@" > "$LOG/$name.log" 2>&1 && ! grep -q '"error"' "$LOG/$name.log"; then
    echo "ok   $name" >> "$STATUS_FILE"
  else
    echo "FAIL $name (see $LOG/$name.log)" >> "$STATUS_FILE"
    FAILED=1
  fi
}

# 8. Headline bench with measured variance
run_bench_step bench python bench.py --repeat 3

# 9. Batch operating-point check (docs/scaling.md projects ~8.3 s/sample
#    at batch 16 vs 8.7 at 4; decide bench.py's default from data)
run_bench_step bench_b16 python bench.py --repeat 3 --batch 16

# 10. Attribute the cross-round headline drift (device vs host split)
run_step drift_probe python tools/drift_probe.py --repeat 3 \
  --out docs/perf_split.md

set +x
echo "==== publish status ===="
cat "$STATUS_FILE"
[ "$FAILED" -eq 0 ] && echo DONE || echo "FAILED (see logs in $LOG)"
exit "$FAILED"
