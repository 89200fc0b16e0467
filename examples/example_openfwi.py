"""End-to-end OpenFWI example (equivalent of the reference's
example/example_openfwi.ipynb): run a single-sample RED-DiffEq inversion
and plot ground truth / result / absolute error.

If the configured dataset directory does not exist, a synthetic
OpenFWI-style dataset is generated on the fly (the real datasets are not
distributable), and the self-pretrained prior checkpoint is used when
present.

Usage:
    python examples/example_openfwi.py [--config configs/openfwi/red-diffeq.yaml]
"""
import argparse
from pathlib import Path

import numpy as np

from red_diffeq_tpu.cli.run_inversion import main as run_inversion_main


def ensure_dataset(config_path: str) -> list:
    """Create a synthetic dataset + config override if data is missing.
    Returns extra CLI args."""
    import tempfile

    import jax.numpy as jnp
    import yaml

    from red_diffeq_tpu.config import load_config, save_config
    from red_diffeq_tpu.io.synthetic import generate_mixed_dataset
    from red_diffeq_tpu.solvers.acoustic import (
        FWIForward, refined_ctx, upsample_velocity,
    )
    from red_diffeq_tpu.utils.data_trans import (
        s_normalize_none, v_denormalize, v_normalize,
    )

    cfg = load_config(config_path)
    if Path(cfg.data.seismic_data_dir).exists():
        return ['--config', config_path]

    print('dataset not found -> generating a synthetic OpenFWI-style one')
    root = Path(tempfile.mkdtemp(prefix='red_diffeq_synth_'))
    (root / 'Seismic_Data').mkdir(parents=True)
    (root / 'Velocity_Data').mkdir(parents=True)
    vel = generate_mixed_dataset(2, h=70, w=int(cfg.pde.ng), seed=1234)
    # Observations come from a dt/2 + dx/2 refined solver at the same
    # physical acquisition — NOT from the solver the inversion itself
    # uses — so the captured golden metrics carry an honest
    # forward-model mismatch (no inverse crime), matching QUALITY.md.
    # backend='xla': the refined grid's receiver line is strided (every
    # 2nd fine column), which the pallas contiguous-gather path rejects.
    op = FWIForward(refined_ctx(cfg.pde.to_dict(), factor=2),
                    sample_temporal=2, normalize=True,
                    v_denorm_func=v_denormalize,
                    s_norm_func=s_normalize_none, backend='xla', chunk=20)
    vel_fine = upsample_velocity(vel, factor=2)
    seis = np.asarray(op(v_normalize(jnp.asarray(vel_fine))))
    np.save(root / 'Seismic_Data' / 'CV.npy', seis)
    np.save(root / 'Velocity_Data' / 'CV.npy', vel)

    cfg.data.seismic_data_dir = str(root / 'Seismic_Data')
    cfg.data.velocity_data_dir = str(root / 'Velocity_Data')
    ema = Path('pretrained_models/model-synthetic-ema.ckpt')
    if ema.exists():
        cfg.diffusion.model_path = str(ema)
    override = root / 'config.yaml'
    save_config(cfg, override)
    return ['--config', str(override)]


def plot_results(run_dir: Path, name: str = 'example_openfwi'):
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
    out = run_dir / f'{name}.png'
    fig.savefig(out, dpi=120, bbox_inches='tight')
    print(f'Final MAE {d["mae"][-1]:.4f}  RMSE {d["rmse"][-1]:.4f}  '
          f'SSIM {d["ssim"][-1]:.4f}')
    print(f'Figure saved to {out}')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--config', default='configs/openfwi/red-diffeq.yaml')
    p.add_argument('--results_dir', default='experiment/example_openfwi')
    args = p.parse_args()
    run_inversion_main(ensure_dataset(args.config) +
                       ['--sample_index', '0',
                        '--results_dir', args.results_dir,
                        '--random_seed', '8888'])
    run_dir = sorted(Path(args.results_dir).rglob('config.yaml'))[-1].parent
    plot_results(run_dir)
