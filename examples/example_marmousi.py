"""Marmousi field-scale example (reference example/example_marmousi.ipynb):
70x190 model with the patched diffusion regularizer."""
import argparse
from pathlib import Path

import sys
sys.path.insert(0, str(Path(__file__).parent))
from red_diffeq_tpu.cli.run_inversion import main as run_inversion_main
from example_openfwi import ensure_dataset, plot_results

if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--config', default='configs/marmousi/red-diffeq.yaml')
    p.add_argument('--results_dir', default='experiment/example_marmousi')
    args = p.parse_args()
    run_inversion_main(ensure_dataset(args.config) +
                       ['--sample_index', '0',
                        '--results_dir', args.results_dir,
                        '--random_seed', '8888'])
    run_dir = sorted(Path(args.results_dir).rglob('config.yaml'))[-1].parent
    plot_results(run_dir, name='example_marmousi')
