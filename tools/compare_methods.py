"""Method comparison: RED-DiffEq vs DiffusionFWI vs ILVR-FWI.

The reference's raison d'etre — benchmark the RED approach against the
two diffusion-guided competitor methods (reference diffusion_bench/) on
the same held-out data with the same pretrained prior. Bench methods run
with the reference ablation's best-trick settings (all tricks,
diffusion_ts=30, ts=10).

Usage:
    python tools/compare_methods.py [--n 2] [--out BENCHMARKS.md]
"""
import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--ckpt', type=Path,
                   default=Path('pretrained_models/model-synthetic-ema.ckpt'))
    p.add_argument('--n', type=int, default=2)
    p.add_argument('--obs', choices=['both', 'clean', 'refined'],
                   default='both',
                   help="observation protocol: 'refined' (dt/2 + dx/2 "
                        "observation grid — honest forward-model "
                        "mismatch, the headline) and/or 'clean' "
                        "(same-solver observations — inverse-crime "
                        "upper bound, secondary)")
    p.add_argument('--out', type=Path, default=None)
    args = p.parse_args(argv)

    from red_diffeq_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from red_diffeq_tpu.bench_methods.diffusion_fwi import DiffusionFWI
    from red_diffeq_tpu.bench_methods.ilvr_fwi import ILVR_FWI
    from red_diffeq_tpu.core.inversion import InversionEngine
    from red_diffeq_tpu.io.checkpoints import load_diffusion_params
    from red_diffeq_tpu.io.synthetic import generate_mixed_dataset
    from red_diffeq_tpu.models.diffusion import GaussianDiffusion
    from red_diffeq_tpu.models.unet import Unet
    from red_diffeq_tpu.solvers.acoustic import (
        FWIForward, refined_ctx, upsample_velocity,
    )
    from red_diffeq_tpu.utils.data_trans import (
        prepare_initial_model, s_normalize_none, v_denormalize, v_normalize,
    )

    ctx = dict(n_grid=70, nt=1000, dx=10.0, dt=0.001, nbc=120, f=15.0,
               sz=10, gz=10, ng=70, ns=5)
    backend = 'pallas' if jax.default_backend() == 'tpu' else 'xla'
    op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                    s_norm_func=s_normalize_none, backend=backend, chunk=20)
    model = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1)
    diffusion = GaussianDiffusion(model, image_size=72, timesteps=1000,
                                  objective='pred_noise')
    load_diffusion_params(diffusion, str(args.ckpt))

    v_true = generate_mixed_dataset(args.n, seed=7777)
    v_true_j = jnp.asarray(v_true)
    observations = {}
    if args.obs in ('both', 'refined'):
        op_obs = FWIForward(refined_ctx(ctx, factor=2), sample_temporal=2,
                            normalize=True, v_denorm_func=v_denormalize,
                            s_norm_func=s_normalize_none, backend='xla',
                            chunk=20)
        v_fine = jnp.asarray(upsample_velocity(v_true, factor=2))
        observations['refined'] = op_obs(v_normalize(v_fine))
    if args.obs in ('both', 'clean'):
        observations['clean'] = op(v_normalize(v_true_j))
    init = np.concatenate([
        prepare_initial_model(v_true[b:b + 1], 'smoothed', sigma=10.0)
        for b in range(args.n)])
    init_j = jnp.asarray(init)

    results = {}
    for obs_name, y in observations.items():
        # RED-DiffEq (the product method)
        engine = InversionEngine(diffusion, regularization='diffusion',
                                 sigma_x0=1e-4)
        mu0 = jnp.pad(init_j, ((0, 0), (0, 0), (1, 1), (1, 1)))
        # AOT-prewarm so s/sample is execution-only (same protocol as
        # tools/eval_quality.py) — then one discarded dispatch so the
        # per-process first-dispatch/executable-load warmup lands outside
        # the timed row, matching the competitors' discarded warmup pass
        # below (round-4 advisor finding).
        engine.warm_compile(mu0.shape, y.shape, op, ts=300, lr=0.03,
                            reg_lambda=0.75, regularization='diffusion')
        engine.optimize(mu0, v_true_j, y, op, ts=300, lr=0.03,
                        reg_lambda=0.75, key=jax.random.PRNGKey(8888),
                        progress=False)
        t0 = time.time()
        _, pm = engine.optimize(mu0, v_true_j, y, op, ts=300, lr=0.03,
                                reg_lambda=0.75,
                                key=jax.random.PRNGKey(8888),
                                progress=False)
        results[f'{obs_name}/RED-DiffEq'] = {
            'MAE': float(np.mean([m['mae'][-1] for m in pm])),
            'RMSE': float(np.mean([m['rmse'][-1] for m in pm])),
            'SSIM': float(np.mean([m['ssim'][-1] for m in pm])),
            's_per_sample': round((time.time() - t0) / args.n, 2),
        }
        print(obs_name, 'RED-DiffEq',
              results[f'{obs_name}/RED-DiffEq'], flush=True)

        # Competitor methods, best-trick ablation settings
        kwargs = dict(ts=10, diffusion_ts=30, lr=0.03, grad_norm=True,
                      grad_smooth=1.0, model_blur=True, grad_clip=1.1,
                      key=jax.random.PRNGKey(8888), progress=False)
        for name, cls, extra in (
                ('DiffusionFWI', DiffusionFWI, {}),
                ('ILVR-FWI', ILVR_FWI,
                 dict(use_ilvr=True, ilvr_weight=0.05,
                      ilvr_down_schedule='linear'))):
            bench = cls(diffusion, op)
            # Warmup pass fills the jit caches (the competitors' outer
            # loop compiles its denoise/inner-scan/metrics programs on
            # first use); the timed run then measures execution only.
            bench.optimize(init_j, v_true_j, y, op, **kwargs, **extra)
            t0 = time.time()
            _, pm = bench.optimize(init_j, v_true_j, y, op, **kwargs,
                                   **extra)
            results[f'{obs_name}/{name}'] = {
                'MAE': float(np.mean([m['mae'][-1] for m in pm])),
                'RMSE': float(np.mean([m['rmse'][-1] for m in pm])),
                'SSIM': float(np.mean([m['ssim'][-1] for m in pm])),
                's_per_sample': round((time.time() - t0) / args.n, 2),
            }
            print(obs_name, name, results[f'{obs_name}/{name}'],
                  flush=True)

    print(json.dumps(results))
    if args.out:
        lines = ['# Method comparison (held-out synthetic OpenFWI-style)',
                 '',
                 f'n={args.n}, nt=1000, ns=5, seed 8888, backend={backend}.'
                 ' RED-DiffEq: ts=300. Competitors: best-trick ablation'
                 ' settings (all tricks, diffusion_ts=30, ts=10).',
                 '',
                 'Protocols: `refined` = observations from a dt/2 + dx/2 '
                 'grid (honest forward-model mismatch — the headline); '
                 '`clean` = same-solver observations (inverse-crime upper '
                 'bound, kept for cross-referencing the ablation '
                 'archive). All three methods share the same prior, data '
                 'and protocol within each block.', '',
                 '| protocol | method | MAE | RMSE | SSIM | s/sample* |',
                 '|---|---|---|---|---|---|']
        for key_name, r in results.items():
            obs_name, name = key_name.split('/')
            lines.append(f'| {obs_name} | {name} | {r["MAE"]:.4f} | '
                         f'{r["RMSE"]:.4f} | '
                         f'{r["SSIM"]:.4f} | {r["s_per_sample"]} |')
        lines += ['', '*execution only: RED-DiffEq is AOT-prewarmed and '
                      'the competitors get a discarded warmup pass, so '
                      'no row absorbs compilation.',
                  f'Prior checkpoint: `{args.ckpt}`.']
        args.out.write_text('\n'.join(lines) + '\n')
        print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
