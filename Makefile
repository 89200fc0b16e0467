# Common workflows for red-diffeq-tpu.

.PHONY: install test test-tpu bench datagen pretrain quality compare

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
