"""Ahead-of-time compile of the benchmark/eval inversion programs.

Fills JAX's persistent compilation cache (utils/cache.py) through the
compile service using InversionEngine.warm_compile — NO work is
dispatched to the chip, so this can run while the accelerator is busy
(e.g. during diffusion pretraining). A later bench.py / eval_quality /
scaling_bench run then starts from a warm cache regardless of which
U-Net checkpoint is loaded (weights are traced arguments, not baked
constants).

Usage:
    python tools/prewarm_compile.py [--batches 4] [--ts 300]
        [--regs diffusion tv l2 none]
"""
import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--batches', type=int, nargs='+', default=[4])
    p.add_argument('--ts', type=int, nargs='+', default=[300])
    p.add_argument('--regs', type=str, nargs='+',
                   default=['diffusion', 'tv', 'l2', 'none'])
    p.add_argument('--nt', type=int, default=1000)
    p.add_argument('--grid', type=int, default=70,
                   help='model width (= receiver spread)')
    p.add_argument('--height', type=int, default=None,
                   help='model height (depth rows); default = --grid. '
                        'Set 70 with --grid 190 for the Marmousi shape '
                        '(patched RED program)')
    args = p.parse_args(argv)

    from red_diffeq_tpu.utils.cache import enable_persistent_cache
    print('cache:', enable_persistent_cache(), flush=True)

    import jax
    import jax.numpy as jnp
    from red_diffeq_tpu.core.inversion import InversionEngine
    from red_diffeq_tpu.models.diffusion import GaussianDiffusion
    from red_diffeq_tpu.models.unet import Unet
    from red_diffeq_tpu.solvers.acoustic import FWIForward
    from red_diffeq_tpu.utils.data_trans import (
        s_normalize_none, v_denormalize,
    )

    n = args.grid
    h = args.height if args.height is not None else n
    ctx = dict(n_grid=n, nt=args.nt, dx=10.0, dt=0.001, nbc=120, f=15.0,
               sz=10, gz=10, ng=n, ns=5)
    backend = 'pallas' if jax.default_backend() == 'tpu' else 'xla'
    op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                    s_norm_func=s_normalize_none, backend=backend,
                    chunk=20)

    model = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1)
    # Patch size is always 72 (the prior's native resolution); wide
    # models route through the patched RED path automatically.
    diffusion = GaussianDiffusion(model, image_size=72,
                                  timesteps=1000, sampling_timesteps=250,
                                  objective='pred_noise')
    # Params tree STRUCTURE only — nothing is initialized or transferred.
    params_sds = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 1, 72, 72)),
                             jnp.zeros((1,)))['params'],
        jax.random.PRNGKey(0))

    lambdas = {'diffusion': 0.75, 'tv': 0.01, 'l2': 0.01, 'none': 0.0}
    for b in args.batches:
        mu_shape = (b, 1, h + 2, n + 2)
        y_shape = (b, 5, args.nt, n)
        for ts in args.ts:
            for reg in args.regs:
                engine = InversionEngine(
                    diffusion_model=diffusion if reg == 'diffusion'
                    else None,
                    regularization=None if reg == 'none' else reg,
                    sigma_x0=1e-4)
                t0 = time.time()
                engine.warm_compile(
                    mu_shape, y_shape, op, ts=ts, lr=0.03,
                    reg_lambda=lambdas[reg],
                    regularization=None if reg == 'none' else reg,
                    params_template=(params_sds if reg == 'diffusion'
                                     else None))
                print(f'compiled reg={reg} batch={b} ts={ts} '
                      f'in {time.time() - t0:.0f}s', flush=True)


if __name__ == '__main__':
    main()
