"""Single-chip scaling study: s/sample vs batch size, fp32 vs bf16 U-Net.

Measures the full RED-DiffEq inversion step (solver fwd+adjoint + U-Net
score + Adam + metrics) at several batch sizes, plus the solver-only
cost, to locate the knee where the chip saturates (VERDICT r1 #7).

Usage:
    python tools/scaling_bench.py [--batches 1 2 4 8 16] [--ts 60]
        [--out docs/scaling.md]
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
    p.add_argument('--batches', type=int, nargs='+', default=[1, 2, 4, 8, 16])
    p.add_argument('--ts', type=int, default=60,
                   help='timed optimization steps per measurement')
    p.add_argument('--ckpt', type=Path,
                   default=Path('pretrained_models/model-synthetic-ema.ckpt'))
    p.add_argument('--bf16', action='store_true',
                   help='also measure with the bf16 U-Net')
    p.add_argument('--out', type=Path, default=None)
    args = p.parse_args(argv)

    from red_diffeq_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from red_diffeq_tpu.core.inversion import InversionEngine
    from red_diffeq_tpu.io.checkpoints import load_diffusion_params
    from red_diffeq_tpu.io.synthetic import generate_mixed_dataset
    from red_diffeq_tpu.models.diffusion import GaussianDiffusion
    from red_diffeq_tpu.models.unet import Unet
    from red_diffeq_tpu.solvers.acoustic import FWIForward
    from red_diffeq_tpu.utils.data_trans import (
        prepare_initial_model, s_normalize_none, v_denormalize, v_normalize,
    )

    ctx = dict(n_grid=70, nt=1000, dx=10.0, dt=0.001, nbc=120, f=15.0,
               sz=10, gz=10, ng=70, ns=5)
    backend = 'pallas' if jax.default_backend() == 'tpu' else 'xla'
    op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                    s_norm_func=s_normalize_none, backend=backend, chunk=20)

    model = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1)

    rows = []
    variants = [('fp32', False)] + ([('bf16', True)] if args.bf16 else [])
    max_b = max(args.batches)
    v_all = generate_mixed_dataset(max_b, seed=8888)
    init_all = np.concatenate([
        prepare_initial_model(v_all[b:b + 1], 'smoothed', sigma=10.0)
        for b in range(max_b)])

    for vname, half in variants:
        diffusion = GaussianDiffusion(model, image_size=72, timesteps=1000,
                                      objective='pred_noise',
                                      half_precision=half)
        load_diffusion_params(diffusion, str(args.ckpt), verbose=False)
        engine = InversionEngine(diffusion, regularization='diffusion',
                                 sigma_x0=1e-4)
        for b in args.batches:
            v_true = jnp.asarray(v_all[:b])
            y = op(v_normalize(v_true))
            mu0 = jnp.pad(jnp.asarray(init_all[:b]),
                          ((0, 0), (0, 0), (1, 1), (1, 1)))

            def run():
                mu, _ = engine.optimize(
                    mu0, v_true, y, op, ts=args.ts, lr=0.03,
                    reg_lambda=0.75, key=jax.random.PRNGKey(0),
                    use_scan=True, progress=False)
                jax.block_until_ready(mu)
                return float(jnp.sum(mu))  # force remote sync under axon

            run()                                # compile + warm
            t0 = time.time()
            run()
            dt = time.time() - t0
            s_300 = dt / args.ts * 300 / b       # normalized to ts=300
            rows.append({'variant': vname, 'batch': b,
                         'ms_per_step_total': round(dt / args.ts * 1e3, 1),
                         's_per_sample_at_300': round(s_300, 2),
                         'samples_per_hour': round(3600.0 / s_300, 1)})
            print(json.dumps(rows[-1]), flush=True)

    if args.out:
        lines = ['# Single-chip scaling (RED-DiffEq inversion, '
                 f'backend={backend})', '',
                 f'One step = nt=1000 FD fwd+adjoint (310x310, ns=5) + '
                 f'U-Net score + Adam; timed over ts={args.ts} scan steps, '
                 'normalized to the 300-step workload.', '',
                 '| U-Net | batch | ms/step (whole batch) | s/sample '
                 '(300 steps) | samples/hour |', '|---|---|---|---|---|']
        for r in rows:
            lines.append(f"| {r['variant']} | {r['batch']} | "
                         f"{r['ms_per_step_total']} | "
                         f"{r['s_per_sample_at_300']} | "
                         f"{r['samples_per_hour']} |")
        lines += ['', 'Headline-bench time split (device-only scan vs '
                      'end-to-end dispatch/host): docs/perf_split.md, '
                      'produced by `make drift-probe`.']
        args.out.write_text('\n'.join(lines) + '\n')
        print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
