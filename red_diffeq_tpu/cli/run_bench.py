"""Benchmark-method CLI: DiffusionFWI / ILVR-FWI over datasets.

Behavioral parity with reference diffusion_bench/run_bench.py:186-430:
same scaffolding as run_inversion (families, batches, npz outputs), with
method selection and trick/ILVR/patch flag plumbing. Unlike run_inversion,
the initial model is NOT padded (reference run_bench.py:107-117) — the
bench methods pad/crop internally around the denoiser.
"""
import argparse
from datetime import datetime
from pathlib import Path

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np

from red_diffeq_tpu.bench_methods.diffusion_fwi import DiffusionFWI
from red_diffeq_tpu.bench_methods.ilvr_fwi import ILVR_FWI
from red_diffeq_tpu.cli.run_inversion import (
    build_diffusion_model, build_forward_operator, get_data_files,
)
from red_diffeq_tpu.config import get_config, load_config, save_config
from red_diffeq_tpu.utils.data_trans import prepare_initial_model
from red_diffeq_tpu.utils.seed_utils import set_seed


def _opt_get(config, name, default):
    return config.optimization.get(name, default)


def process_batch(seis_batch, vel_batch, config, bench, fwi_forward, key):
    """One batch through a bench method (reference run_bench.py:84-147)."""
    inits = [
        prepare_initial_model(vel_batch[i:i + 1],
                              config.optimization.initial_type,
                              sigma=config.optimization.sigma)
        for i in range(vel_batch.shape[0])
    ]
    mu0 = jnp.asarray(np.concatenate(inits, axis=0))  # NOT padded

    kwargs = dict(
        ts=config.optimization.ts,
        diffusion_ts=config.optimization.diffusion_ts,
        lr=config.optimization.lr,
        noise_std=config.optimization.noise_std,
        noise_type=config.optimization.noise_type,
        missing_number=config.optimization.missing_number,
        grad_norm=_opt_get(config, 'grad_norm', True),
        grad_smooth=_opt_get(config, 'grad_smooth', None),
        model_blur=_opt_get(config, 'model_blur', False),
        grad_clip=_opt_get(config, 'grad_clip', 1.0),
        use_patches=_opt_get(config, 'use_patches', False),
        patch_kernel_size=_opt_get(config, 'patch_kernel_size', None),
        patch_stride=_opt_get(config, 'patch_stride', None),
        key=key,
    )
    if isinstance(bench, ILVR_FWI):
        kwargs.update(
            use_ilvr=_opt_get(config, 'use_ilvr', True),
            ilvr_weight=_opt_get(config, 'ilvr_weight', 0.05),
            ilvr_down_schedule=_opt_get(config, 'ilvr_down_schedule',
                                        'linear'),
        )

    mu, per_model = bench.optimize(mu0, jnp.asarray(vel_batch),
                                   jnp.asarray(seis_batch), fwi_forward,
                                   **kwargs)
    return mu, per_model, mu0


def save_batch_results(batch_start, mu, per_model, mu0, vel_batch,
                       output_dir: Path) -> None:
    """Per-sample npz (reference run_bench.py:150-183; note: no
    reg_losses key — bench methods have no regularization term)."""
    mu_np = np.asarray(mu)
    mu0_np = np.asarray(mu0)
    output_dir.mkdir(parents=True, exist_ok=True)
    for i in range(mu_np.shape[0]):
        curves = per_model[i]
        np.savez(
            str((output_dir / f'{batch_start + i}_results.npz').resolve()),
            result=mu_np[i, 0],
            initial_velocity=mu0_np[i, 0],
            ground_truth=np.asarray(vel_batch)[i, 0],
            total_losses=np.asarray(curves['total_losses']),
            obs_losses=np.asarray(curves['obs_losses']),
            ssim=np.asarray(curves['ssim']),
            mae=np.asarray(curves['mae']),
            rmse=np.asarray(curves['rmse']),
        )


def run_experiment(config: ml_collections.ConfigDict,
                   method: str = 'diffusionfwi') -> Path:
    """Reference run_bench.py:186-300."""
    seed = config.experiment.random_seed
    if seed is not None:
        key = set_seed(int(seed), verbose=True)
    else:
        key = jax.random.PRNGKey(np.random.randint(0, 2 ** 31))

    print('Initializing models...')
    diffusion = build_diffusion_model(config)
    fwi_forward = build_forward_operator(config)

    if method in ('ilvr', 'ilvr_fwi'):
        bench = ILVR_FWI(diffusion, fwi_forward)
    else:
        bench = DiffusionFWI(diffusion, fwi_forward)
    print(f'Benchmark method: {type(bench).__name__}')

    seismic_dir = Path(config.data.seismic_data_dir).resolve()
    dataset_name = seismic_dir.parts[-2] if len(seismic_dir.parts) >= 2 else None
    timestamp = datetime.now().strftime('%Y%m%d_%H%M%S')
    results_dir = Path(config.experiment.results_dir)
    if dataset_name:
        results_dir = results_dir / dataset_name
    results_dir = results_dir / f'{method}_{config.experiment.name}' / timestamp
    results_dir.mkdir(parents=True, exist_ok=True)
    save_config(config, results_dir / 'config.yaml')
    print(f'Results will be saved to: {results_dir}')

    from red_diffeq_tpu.io.native_loader import NpyBatchLoader

    for family_name in get_data_files(config):
        print(f'\nProcessing: {family_name}')
        family_dir = results_dir / Path(family_name).stem
        family_dir.mkdir(exist_ok=True)
        # Same native mmap loaders + next-batch prefetch as run_inversion
        # (the raw np.load path paid the page-fault stall per batch).
        seis_loader = NpyBatchLoader(
            Path(config.data.seismic_data_dir) / family_name)
        vel_loader = NpyBatchLoader(
            Path(config.data.velocity_data_dir) / family_name)
        num_models = len(seis_loader)

        sample_index = config.data.get('sample_index', None)
        if sample_index is not None:
            batches = [(sample_index, sample_index + 1)]
        else:
            bs = config.data.batch_size
            batches = [(s, min(s + bs, num_models))
                       for s in range(0, num_models, bs)]

        for i, (batch_start, batch_end) in enumerate(batches):
            if i + 1 < len(batches):
                nxt_start, nxt_end = batches[i + 1]
                seis_loader.prefetch(nxt_start, nxt_end - nxt_start)
                vel_loader.prefetch(nxt_start, nxt_end - nxt_start)
            key, sub = jax.random.split(key)
            seis_batch = seis_loader[batch_start:batch_end].astype(
                np.float32)
            vel_batch = vel_loader[batch_start:batch_end].astype(np.float32)
            mu, per_model, mu0 = process_batch(
                seis_batch, vel_batch, config, bench, fwi_forward, sub)
            save_batch_results(batch_start, mu, per_model, mu0, vel_batch,
                               family_dir)
        seis_loader.close()
        vel_loader.close()

    print(f'\nExperiment complete! Results saved to: {results_dir}')
    return results_dir


def build_parser() -> argparse.ArgumentParser:
    """Flag parity with reference run_bench.py:302-371."""
    def boolean(x):
        return x.lower() == 'true'

    p = argparse.ArgumentParser(
        description='Run benchmark diffusion FWI methods '
                    '(DiffusionFWI or ILVR-FWI)',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument('--method', type=str,
                   choices=['diffusionfwi', 'ilvr', 'ilvr_fwi'],
                   default='diffusionfwi')
    p.add_argument('--config', type=Path, default=None)
    p.add_argument('--lr', type=float)
    p.add_argument('--ts', type=int,
                   help='FWI iterations per diffusion step')
    p.add_argument('--diffusion_ts', type=int,
                   help='Number of diffusion timesteps')
    p.add_argument('--grad_norm', type=boolean)
    p.add_argument('--grad_smooth', type=float)
    p.add_argument('--model_blur', type=boolean)
    p.add_argument('--grad_clip', type=float)
    p.add_argument('--use_ilvr', type=boolean)
    p.add_argument('--ilvr_weight', type=float)
    p.add_argument('--ilvr_down_schedule', type=str,
                   choices=['linear', 'stepwise'])
    p.add_argument('--use_patches', type=boolean)
    p.add_argument('--patch_height', type=int)
    p.add_argument('--patch_width', type=int)
    p.add_argument('--patch_stride_h', type=int)
    p.add_argument('--patch_stride_w', type=int)
    p.add_argument('--noise_type', choices=['gaussian', 'laplace'])
    p.add_argument('--noise_std', type=float)
    p.add_argument('--sigma', type=float)
    p.add_argument('--missing_number', type=int)
    p.add_argument('--batch_size', type=int)
    p.add_argument('--experiment_name', type=str)
    p.add_argument('--random_seed', type=int)
    p.add_argument('--results_dir', type=str,
                   help='output root (reference run_bench.py:364)')
    return p


def apply_overrides(config, args):
    o = config.optimization
    for name in ('lr', 'ts', 'diffusion_ts', 'grad_norm', 'grad_smooth',
                 'model_blur', 'grad_clip', 'use_ilvr', 'ilvr_weight',
                 'ilvr_down_schedule', 'use_patches', 'noise_type',
                 'noise_std', 'sigma', 'missing_number'):
        val = getattr(args, name, None)
        if val is not None:
            setattr(o, name, val)
    if args.patch_height is not None and args.patch_width is not None:
        o.patch_kernel_size = [args.patch_height, args.patch_width]
    if args.patch_stride_h is not None and args.patch_stride_w is not None:
        o.patch_stride = [args.patch_stride_h, args.patch_stride_w]
    if args.batch_size is not None:
        config.data.batch_size = args.batch_size
    if args.experiment_name is not None:
        config.experiment.name = args.experiment_name
    if args.random_seed is not None:
        config.experiment.random_seed = args.random_seed
    if args.results_dir is not None:
        config.experiment.results_dir = args.results_dir
    return config


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from red_diffeq_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    if args.config:
        print(f'Loading configuration from: {args.config}')
        config = load_config(args.config)
    else:
        print('No config file specified. Using default configuration.')
        config = get_config()
    config = apply_overrides(config, args)
    run_experiment(config, method=args.method)


if __name__ == '__main__':
    main()
