#!/bin/sh
# Second-reset continuation of tools/recovery_chain.sh (round 5,
# 2026-08-19 ~05:45 UTC: the host VM reset AGAIN, mid-chain). The
# already-captured steps (headline bench 7.877 s/sample, layout probe,
# 4-way layout A/B) are committed under docs/chip_evidence_r5/ and are
# NOT re-run; this chain resumes at the first incomplete step:
#
#   1. batch-16 operating point  (FAILED on a device fault pre-reset)
#   2. r1-recipe prior replication (never started; dataset regenerated
#      again from the committed generator, seed 42)
#   3. milestone eval + EMA export of the best milestone
#   4. QUALITY regen with the restored prior
#
# Same policies as recovery_chain.sh. Chip-exclusive.
# Usage: sh tools/resume_chain_r5c.sh [logdir]
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/recovery2}
mkdir -p "$LOG"
STATUS="$LOG/status.txt"
: > "$STATUS"
FAILED=0

# Shared deadline/step/serialization policies: tools/chain_lib.sh.
EV=${RDT_EVIDENCE_DIR:-docs/chip_evidence_r5}
. tools/chain_lib.sh
register_chain

run_bench bench_b16 python bench.py --repeat 3 --batch 16
snapshot

run replication    sh tools/replicate_r1_prior.sh pretrained_models/replication_r1
snapshot

if ls pretrained_models/replication_r1/model-*.ckpt >/dev/null 2>&1; then
  run milestone_eval python tools/milestone_eval.py \
    --run pretrained_models/replication_r1 \
    --out docs/milestone_eval_replication.md \
    --note "Replication run (r1 recipe: 40k steps x batch 32, dataset/OpenFWI_20k regenerated with seed 42 after the second VM reset). Compare against docs/milestone_eval.md's probe_run/milestones_archive rows."
  snapshot
  run export_prior  python tools/pick_best_milestone.py \
    --eval docs/milestone_eval_replication.md \
    --out pretrained_models/model-synthetic-ema.ckpt
  if [ -f pretrained_models/model-synthetic-ema.ckpt ]; then
    run quality      python tools/eval_quality.py --n 4 --ts 300 \
      --out QUALITY.md --save_curves docs/curves/openfwi
    run quality_corr python tools/eval_quality.py --n 4 --ts 300 \
      --noise_std 0.05 --missing_number 10 --obs refined \
      --out QUALITY_corrupted.md
    # QUALITY.md feeds README's generated quality block; regenerate it
    # (CPU-only, drift-gated by tests/test_docs_consistency.py).
    run readme_claims python tools/update_readme_claims.py
  else
    echo "SKIP quality (no restored prior)" >> "$STATUS"
  fi
else
  echo "SKIP milestone_eval/export/quality (no replication milestones)" >> "$STATUS"
fi
snapshot
echo CHAIN_DONE >> "$STATUS"
cat "$STATUS"
exit "$FAILED"
