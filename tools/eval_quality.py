"""Quality evaluation: RED-DiffEq vs TV vs unregularized on held-out
synthetic OpenFWI-style samples.

Runs the full reference workload (70x70, nt=1000, ns=5, ts=300 steps,
seed 8888) for each regularization and reports final MAE/RMSE/SSIM —
the apples-to-apples quality comparison behind the perf headline.

Usage:
    python tools/eval_quality.py [--ckpt pretrained_models/model-synthetic-ema.ckpt]
        [--n 4] [--ts 300] [--out QUALITY.md]
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
    p.add_argument('--n', type=int, default=4)
    p.add_argument('--ts', type=int, default=300)
    p.add_argument('--width', type=int, default=70,
                   help='model width; >72 exercises the patched RED path '
                        '(Marmousi-style, reference configs use 190)')
    p.add_argument('--sigma', type=float, default=10.0,
                   help='initial-model smoothing (reference: 10 OpenFWI, '
                        '20 Marmousi)')
    p.add_argument('--noise_std', type=float, default=0.0)
    p.add_argument('--missing_number', type=int, default=0)
    p.add_argument('--obs', choices=['both', 'clean', 'refined'],
                   default='both',
                   help="observation discretization: 'clean' = same "
                        "solver as the inversion (inverse crime, upper "
                        "bound); 'refined' = dt/2 + dx/2 grid (honest "
                        "forward-model mismatch)")
    p.add_argument('--regs', type=str, nargs='+',
                   choices=['none', 'tv', 'l2', 'diffusion'],
                   default=['none', 'tv', 'l2', 'diffusion'],
                   help='regularizations to evaluate (each one is its own '
                        'compiled program — trim on slow-compile hosts)')
    p.add_argument('--out', type=Path, default=None)
    p.add_argument('--save_curves', type=Path, default=None,
                   help='directory for per-step metric curves '
                        '(<obs>_<reg>.npz), e.g. for golden-run pinning')
    args = p.parse_args(argv)

    from red_diffeq_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

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

    ctx = dict(n_grid=args.width, nt=1000, dx=10.0, dt=0.001, nbc=120,
               f=15.0, sz=10, gz=10, ng=args.width, ns=5)
    backend = 'pallas' if jax.default_backend() == 'tpu' else 'xla'
    op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                    s_norm_func=s_normalize_none, backend=backend, chunk=20)

    model = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1)
    diffusion = GaussianDiffusion(model, image_size=72, timesteps=1000,
                                  objective='pred_noise')
    load_diffusion_params(diffusion, str(args.ckpt))

    # Held-out: generator seed far from the pretraining seed (42..145).
    v_true = generate_mixed_dataset(args.n, h=70, w=args.width, seed=7777)
    v_true_j = jnp.asarray(v_true)

    observations = {}
    if args.obs in ('both', 'clean'):
        observations['clean'] = op(v_normalize(v_true_j))
    if args.obs in ('both', 'refined'):
        # dt/2 + dx/2 observation solver at the same physical acquisition
        # (VERDICT r1 #3: do not commit the inverse crime).
        op_obs = FWIForward(refined_ctx(ctx, factor=2), sample_temporal=2,
                            normalize=True, v_denorm_func=v_denormalize,
                            s_norm_func=s_normalize_none, backend='xla',
                            chunk=20)
        v_fine = jnp.asarray(upsample_velocity(v_true, factor=2))
        observations['refined'] = op_obs(v_normalize(v_fine))

    init = np.concatenate([
        prepare_initial_model(v_true[b:b + 1], 'smoothed', sigma=args.sigma)
        for b in range(args.n)])
    mu0 = jnp.pad(jnp.asarray(init), ((0, 0), (0, 0), (1, 1), (1, 1)))

    results = {}
    session_warm = False
    lambdas = {'none': 0.0, 'tv': 0.01, 'l2': 0.01, 'diffusion': 0.75}
    # One engine per regularizer, shared across observation protocols:
    # the (reg, shapes) program key is identical for clean and refined
    # observations (refined is resampled back to the same nt), so
    # rebuilding engines per protocol would discard the AOT cache and
    # repeat every warm_compile (round-5 review finding).
    engines = {reg: InversionEngine(diffusion, regularization=reg,
                                    sigma_x0=1e-4) for reg in args.regs}
    warmed = set()
    # True SSIM of the smoothed initial model, same formula as the
    # engine's per-step metric (core/metrics.py: normalized fields
    # mapped to [0,1]). The engine's curves start AFTER the first Adam
    # update, so pm['ssim'][0] is a post-step value, not the start.
    from red_diffeq_tpu.utils.ssim import ssim as _ssim
    # ``init`` is already normalized to [-1, 1] (prepare_initial_model
    # returns mu-space); only the true model needs normalizing.
    init_ssim_true = float(np.mean(np.asarray(_ssim(
        (jnp.asarray(init) + 1) / 2,
        (v_normalize(v_true_j) + 1) / 2, size_average=False))))
    for obs_name, y in observations.items():
        for reg in args.regs:
            lam = lambdas[reg]
            engine = engines[reg]
            # AOT-prewarm so the timed run measures execution only —
            # compilation (minutes for the first configuration of a
            # session) would otherwise be amortized into whichever row
            # happens to run first.
            if (reg, y.shape) not in warmed:
                engine.warm_compile(
                    mu0.shape, y.shape, op, ts=args.ts, lr=0.03,
                    reg_lambda=lam,
                    regularization=None if reg == 'none' else reg)
                warmed.add((reg, y.shape))
            if not session_warm:
                # The process's FIRST device dispatch absorbs one-time
                # executable-load / device-warmup latency that AOT
                # compilation does not cover (observed 10-80 s on the
                # tunneled chip); run it once untimed so no table row
                # inherits it.
                engine.optimize(
                    mu0, v_true_j, y, op, ts=args.ts, lr=0.03,
                    reg_lambda=lam, noise_std=args.noise_std,
                    missing_number=args.missing_number,
                    regularization=None if reg == 'none' else reg,
                    key=jax.random.PRNGKey(8888), use_scan=True,
                    progress=False)
                session_warm = True
            t0 = time.time()
            _, per_model = engine.optimize(
                mu0, v_true_j, y, op, ts=args.ts, lr=0.03, reg_lambda=lam,
                noise_std=args.noise_std,
                missing_number=args.missing_number,
                regularization=None if reg == 'none' else reg,
                key=jax.random.PRNGKey(8888), use_scan=True,
                progress=False)
            dt = time.time() - t0
            final = {
                'MAE': float(np.mean([pm['mae'][-1] for pm in per_model])),
                'RMSE': float(np.mean([pm['rmse'][-1]
                                       for pm in per_model])),
                'SSIM': float(np.mean([pm['ssim'][-1]
                                       for pm in per_model])),
                'initial_SSIM': init_ssim_true,
                'first_step_SSIM': float(np.mean([pm['ssim'][0]
                                                  for pm in per_model])),
                'seconds_per_sample': round(dt / args.n, 2),
            }
            results[f'{obs_name}/{reg}'] = final
            if args.save_curves is not None:
                args.save_curves.mkdir(parents=True, exist_ok=True)
                np.savez(args.save_curves / f'{obs_name}_{reg}.npz',
                         **{k: np.asarray([pm[k] for pm in per_model])
                            for k in ('mae', 'rmse', 'ssim',
                                      'total_losses', 'obs_losses',
                                      'reg_losses')})
            print(f'{obs_name:8s} {reg:10s} MAE {final["MAE"]:.4f}  '
                  f'RMSE {final["RMSE"]:.4f}  SSIM {final["SSIM"]:.4f}  '
                  f'({final["seconds_per_sample"]} s/sample)', flush=True)

    print(json.dumps(results))
    if args.out:
        lines = ['# Quality evaluation (synthetic held-out OpenFWI-style)',
                 '',
                 f'n={args.n} samples (70x{args.width}), ts={args.ts}, '
                 f'nt=1000, ns=5, sigma_init={args.sigma}, '
                 f'seed 8888, backend={backend}, '
                 f'noise_std={args.noise_std}, '
                 f'missing={args.missing_number}', '',
                 'Observations: `clean` = generated by the inversion '
                 'solver itself (inverse crime — an upper bound); '
                 '`refined` = generated on a dt/2 + dx/2 grid at the same '
                 'physical acquisition (honest forward-model mismatch).',
                 '',
                 '| observations | regularization | MAE | RMSE | SSIM | '
                 's/sample |',
                 '|---|---|---|---|---|---|']
        for key_name, r in results.items():
            obs_name, reg = key_name.split('/')
            lines.append(f'| {obs_name} | {reg} | {r["MAE"]:.4f} | '
                         f'{r["RMSE"]:.4f} | {r["SSIM"]:.4f} | '
                         f'{r["seconds_per_sample"]} |')
        lines += [
            '',
            'Timing note: each configuration is AOT-prewarmed '
            '(`warm_compile`) before its timed run, so s/sample measures '
            'execution only — compilation (minutes for the first program '
            'of a session; cached persistently afterwards) is excluded '
            'from every row, and a separate untimed warmup dispatch '
            'absorbs the one-time per-process executable-load/device '
            'warmup before the first timed row.',
            f'Prior checkpoint: `{args.ckpt}`.',
        ]
        args.out.write_text('\n'.join(lines) + '\n')
        print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
