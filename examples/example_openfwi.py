"""End-to-end OpenFWI example (equivalent of the reference's
example/example_openfwi.ipynb): run a single-sample RED-DiffEq inversion
and plot ground truth / result / absolute error.

Usage:
    python examples/example_openfwi.py [--config configs/openfwi/red-diffeq.yaml]
"""
import argparse
from pathlib import Path

import numpy as np

from red_diffeq_tpu.cli.run_inversion import main as run_inversion_main


def plot_results(run_dir: Path):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    npz = sorted(run_dir.rglob('*_results.npz'))[0]
    d = np.load(npz)
    gt, res = d['ground_truth'], d['result']
    # result is in [-1, 1]; map ground truth for comparison
    gt_norm = (gt - 1500.0) / 3000.0 * 2.0 - 1.0
    fig, axes = plt.subplots(1, 3, figsize=(13, 4))
    for ax, img, title in zip(
            axes, [gt_norm, res, np.abs(res - gt_norm)],
            ['ground truth', 'RED-DiffEq result', 'absolute error']):
        im = ax.imshow(img, cmap='jet')
        ax.set_title(title)
        fig.colorbar(im, ax=ax, shrink=0.8)
    out = run_dir / 'example_openfwi.png'
    fig.savefig(out, dpi=120, bbox_inches='tight')
    print(f'Final MAE {d["mae"][-1]:.4f}  RMSE {d["rmse"][-1]:.4f}  '
          f'SSIM {d["ssim"][-1]:.4f}')
    print(f'Figure saved to {out}')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--config', default='configs/openfwi/red-diffeq.yaml')
    p.add_argument('--results_dir', default='experiment/example_openfwi')
    args = p.parse_args()
    run_inversion_main(['--config', args.config,
                        '--sample_index', '0',
                        '--results_dir', args.results_dir,
                        '--random_seed', '8888'])
    run_dir = sorted(Path(args.results_dir).rglob('config.yaml'))[-1].parent
    plot_results(run_dir)
