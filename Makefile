# Common workflows for red-diffeq-tpu.

.PHONY: install test test-tpu bench bench-smoke datagen pretrain quality \
  compare quality-marmousi quality-corrupted scaling milestone-eval \
  synthetic-stats notebooks prewarm post-outage replicate-r1 layout-ab \
  drift-probe

install:
	pip install -e . --no-deps --no-build-isolation

test:
	python -m pytest tests/ -q

# Pallas parity tests need real TPU default device (run outside conftest)
test-tpu:
	python -m pytest tests/test_pallas_tpu.py -q -p no:cacheprovider \
	  --co -q >/dev/null && python tests/run_tpu_parity.py

bench:
	python bench.py

# Tiny CPU-executable pipeline check (never a headline number)
bench-smoke:
	python bench.py --smoke --repeat 1

# Serialized chip-evidence requeue after an outage (docs/outage_runbook.md)
post-outage:
	sh tools/post_outage_chain.sh

# The designated round-1 prior-recipe replication (docs/milestone_eval.md)
replicate-r1:
	sh tools/replicate_r1_prior.sh

# 4-way x-stencil layout A/B on the production kernels (chip required;
# flip ops/stencil.py X_STENCIL_LAYOUT only on a measured win)
layout-ab:
	RDT_X_STENCIL=roll   python tools/kernel_bench.py --reps 3
	RDT_X_STENCIL=mxu    python tools/kernel_bench.py --reps 3
	RDT_X_STENCIL=mxu_xy python tools/kernel_bench.py --reps 3
	RDT_X_STENCIL=halo   python tools/kernel_bench.py --reps 3

datagen:
	red-diffeq-datagen --out dataset/OpenFWI --n 100

pretrain:
	red-diffeq-train --data_dir dataset/OpenFWI/Velocity_Data \
	  --results_folder pretrained_models/train_run

quality:
	python tools/eval_quality.py --n 4 --ts 300 --out QUALITY.md

quality-marmousi:
	python tools/eval_quality.py --n 2 --ts 300 --width 190 --sigma 20 \
	  --out QUALITY_marmousi.md

scaling:
	python tools/scaling_bench.py --bf16 --out docs/scaling.md

compare:
	python tools/compare_methods.py --n 4 --out BENCHMARKS.md

quality-corrupted:
	python tools/eval_quality.py --n 4 --ts 300 --noise_std 0.05 \
	  --missing_number 10 --obs refined --out QUALITY_corrupted.md

# Inversion quality per prior-training milestone + loss-curve summary
milestone-eval:
	python tools/milestone_eval.py --out docs/milestone_eval.md

# Generator statistics vs the reference-verifiable OpenFWI constraints
synthetic-stats:
	python tools/synthetic_stats.py --out docs/synthetic_data_stats.md

# Attribute headline-bench drift: device-only scan vs end-to-end time
drift-probe:
	python tools/drift_probe.py --repeat 3 --out docs/perf_split.md

# AOT-compile the eval/bench programs (no chip dispatch; safe while
# the accelerator is busy pretraining)
prewarm:
	python tools/prewarm_compile.py --batches 4 --ts 300
	python tools/prewarm_compile.py --batches 2 --ts 300 --grid 190 \
	  --height 70 --regs diffusion tv l2 none

# Execute the example notebooks in-place (captures outputs = golden runs)
notebooks:
	jupyter nbconvert --to notebook --execute --inplace \
	  --ExecutePreprocessor.timeout=3600 examples/example_openfwi.ipynb
	jupyter nbconvert --to notebook --execute --inplace \
	  --ExecutePreprocessor.timeout=3600 examples/example_marmousi.ipynb
