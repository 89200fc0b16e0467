#!/bin/sh
# Post-training publishing chain (run when the chip is otherwise idle —
# everything here dispatches to the TPU and MUST be serialized).
#
# Usage: sh tools/publish_round.sh [logdir]
set -x
LOG=${1:-/tmp/publish_r3}
mkdir -p "$LOG"

# 1. Export the final EMA prior
python tools/export_ema.py > "$LOG/export_ema.log" 2>&1 || exit 1

# 2. Quality vs training progress (one compiled program, K milestones)
python tools/milestone_eval.py --out docs/milestone_eval.md \
  > "$LOG/milestone_eval.log" 2>&1

# 3. Headline quality, both observation protocols
python tools/eval_quality.py --n 4 --ts 300 --out QUALITY.md \
  --save_curves docs/curves/openfwi > "$LOG/quality.log" 2>&1

# 4. Robustness under corruption (honest observations)
python tools/eval_quality.py --n 4 --ts 300 --noise_std 0.05 \
  --missing_number 10 --obs refined --out QUALITY_corrupted.md \
  > "$LOG/quality_corrupted.log" 2>&1

# 5. Field-scale Marmousi-class table (patched RED, sigma=20)
python tools/eval_quality.py --n 2 --ts 300 --width 190 --sigma 20 \
  --out QUALITY_marmousi.md --save_curves docs/curves/marmousi \
  > "$LOG/quality_marmousi.log" 2>&1

# 6. Method comparison under both protocols
python tools/compare_methods.py --n 4 --out BENCHMARKS.md \
  > "$LOG/benchmarks.log" 2>&1

# 7. Executed example notebooks (golden runs)
jupyter nbconvert --to notebook --execute --inplace \
  --ExecutePreprocessor.timeout=3600 examples/example_openfwi.ipynb \
  > "$LOG/nb_openfwi.log" 2>&1
jupyter nbconvert --to notebook --execute --inplace \
  --ExecutePreprocessor.timeout=3600 examples/example_marmousi.ipynb \
  > "$LOG/nb_marmousi.log" 2>&1

# 8. Headline bench with measured variance
python bench.py --repeat 3 > "$LOG/bench.log" 2>&1

echo DONE
