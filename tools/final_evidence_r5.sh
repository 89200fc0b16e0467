#!/bin/sh
# Round-5 final-evidence pass. Runs after tools/resume_chain_r5c.sh has
# finished (waits for its CHAIN_DONE marker so chip use stays strictly
# serialized — docs/outage_runbook.md failure mode 1), then completes
# the one-prior coherence work that the resume chain does not cover:
#
#   1. batch-16 operating point, segmented into 60-step dispatches
#      (the un-segmented ~150 s dispatch trips the tunnel's execution
#      limit — runbook failure mode 6; measurement for docs/scaling.md)
#   2. method comparison -> BENCHMARKS.md (the committed table was
#      measured with the prior the Aug-19 VM reset destroyed; the
#      restored prior must be the one every published table uses)
#   3. README claims regenerated from BENCHMARKS.md (CPU-only)
#   4. QUALITY_marmousi.md regen with the restored prior
#   5. notebook re-execution (golden runs re-captured with the
#      restored prior; tests/test_notebook_golden.py gates the bands)
#
# Shared step/deadline/serialization policies: tools/chain_lib.sh.
# Usage: sh tools/final_evidence_r5.sh [logdir]
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/final_r5}
mkdir -p "$LOG"
STATUS="$LOG/status.txt"
: > "$STATUS"
FAILED=0
EV=${RDT_EVIDENCE_DIR:-docs/chip_evidence_r5/final}
. tools/chain_lib.sh

# Wait (up to 4 h) for the resume chain to release the chip. Proceed
# early ONLY on positive evidence the chain is finished or dead:
# CHAIN_DONE in its status file, or a registered pidfile whose process
# is gone. A missing pidfile is NOT evidence of a dead chain (the
# chain may not have started yet) — keep waiting until the cap.
CHAIN_STATUS=${RDT_CHAIN_STATUS:-/tmp/recovery2/status.txt}
i=0
until grep -q CHAIN_DONE "$CHAIN_STATUS" 2>/dev/null; do
  if [ -f "$CHAIN_PIDFILE" ] && ! chain_alive; then
    echo "note: registered chain is dead; proceeding" >> "$STATUS"
    break
  fi
  i=$((i + 1))
  if [ "$i" -gt 240 ] || past_deadline; then
    echo "FAIL wait_chain (chain never finished)" >> "$STATUS"
    exit 1
  fi
  sleep 60
done
register_chain

run_bench bench_b16_seg python bench.py --repeat 3 --batch 16 --segment 60
snapshot

if [ -f pretrained_models/model-synthetic-ema.ckpt ]; then
  run compare          python tools/compare_methods.py --n 4 --out BENCHMARKS.md
  snapshot
  run quality_marmousi python tools/eval_quality.py --n 2 --ts 300 \
    --width 190 --sigma 20 --out QUALITY_marmousi.md
  snapshot
  # README blocks are generated from BENCHMARKS.md AND QUALITY*.md, so
  # this must run AFTER every artifact regen above (else the committed
  # tree fails tests/test_docs_consistency.py).
  run readme_claims    python tools/update_readme_claims.py
  run notebooks        make notebooks
else
  echo "SKIP compare/readme/marmousi/notebooks (no prior)" >> "$STATUS"
fi
snapshot
echo FINAL_DONE >> "$STATUS"
cat "$STATUS"
exit "$FAILED"
