"""Microbenchmark of the Pallas FD kernels (forward and fwd+adjoint).

Times the bench.py solver workload (310x310 padded grid, ns=5, nt=1000,
chunk=20) amortized inside ONE jitted dispatch — K repetitions via
lax.scan — so the axon tunnel's per-dispatch latency cancels out.

Usage:
    python tools/kernel_bench.py [--batch 4] [--nt 1000] [--reps 5]
        [--adjoint reverse|tape]
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--nt', type=int, default=1000)
    p.add_argument('--chunk', type=int, default=20)
    p.add_argument('--reps', type=int, default=5)
    p.add_argument('--adjoint', default=None, choices=['reverse', 'tape'])
    p.add_argument('--grid', type=int, default=70)
    args = p.parse_args(argv)

    from red_diffeq_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from red_diffeq_tpu.solvers.acoustic import Geometry, forward_modeling

    assert jax.default_backend() == 'tpu', 'requires a TPU'
    n = args.grid
    ctx = dict(n_grid=n, nt=args.nt, dx=10.0, dt=0.001, nbc=120, f=15.0,
               sz=10, gz=10, ng=n, ns=5)
    geom = Geometry.from_ctx(ctx)
    hp = n + 2 * geom.nbc
    rng = np.random.RandomState(0)
    v = jnp.asarray(1500 + 3000 * rng.rand(args.batch, 1, hp, hp),
                    jnp.float32)

    def fwd_once(v):
        return forward_modeling(v, geom, chunk=args.chunk,
                                backend='pallas', adjoint=args.adjoint)

    def grad_once(v):
        return jax.grad(lambda x: jnp.sum(fwd_once(x) ** 2))(v)

    def timed(fn, tag):
        @jax.jit
        def many(v):
            def body(c, _):
                r = fn(c)
                # fold the result back into the carry so the scan can't
                # be elided; keeps shapes static
                return c + 0.0 * jnp.mean(r) , None
            out, _ = jax.lax.scan(body, v, None, length=args.reps)
            return out

        r = many(v)
        float(jnp.sum(r))                   # sync (axon needs a transfer)
        t0 = time.time()
        r = many(v)
        float(jnp.sum(r))
        dt = (time.time() - t0) / args.reps
        per_sample = dt / args.batch * 1e3
        # Report the EFFECTIVE mode/layout (after the silent downgrades
        # resolve_run_config applies), not the requested ones — the
        # layout A/B decides the production default from these tags.
        from red_diffeq_tpu.ops.stencil import resolve_run_config
        eff_mode, eff_layout, eff_unroll = resolve_run_config(
            geom, args.chunk, mode=args.adjoint)
        print(json.dumps({'what': tag, 'batch': args.batch,
                          'nt': args.nt,
                          'layout': eff_layout,
                          'adjoint': eff_mode,
                          'unroll': eff_unroll,
                          'ms_per_call': round(dt * 1e3, 2),
                          'ms_per_sample': round(per_sample, 2)}),
              flush=True)

    timed(fwd_once, 'forward')
    timed(grad_once, 'forward+adjoint')


if __name__ == '__main__':
    main()
