"""Stencil-layout microbenchmark: can the 4 lane-axis rolls go faster?

docs/solver_design.md's saturation analysis left one headroom
hypothesis untested (VERDICT r3 stretch #8): the forward kernel is
VPU-issue-bound and the 4 lane-axis ``pltpu.roll``s (x-direction
neighbor access) account for most of the gap to the elementwise issue
bound. This probe times the bare damped-wave recursion

    p = t1*p1 - t2*p0 + alpha * L4(p1)

for ``nt`` in-kernel steps under interchangeable x-stencil layouts:

* ``roll``    — shipped layout: 8 circular rolls (4 sublane + 4 lane);
* ``mxu_x``   — y-stencil via 4 sublane rolls, x-stencil as one MXU
                matmul ``p @ D`` with a banded circulant (Wp, Wp) matrix
                (runs on the otherwise-idle MXU, freeing VPU slots);
* ``mxu_xy``  — zero rolls: ``E @ p + p @ D`` (both directions on MXU);
* ``halo``    — redundant halo columns: state kept (Hp, Wp+4) with the
                circular wrap materialized in 2 explicit halo columns
                per side; x-neighbors become static unaligned ref
                slices instead of rolls (ping-pong scratch, no copies).

All variants compute the same operator (validated against each other to
fp32 reassociation tolerance). Timing amortizes K repetitions inside
one jitted lax.scan (axon dispatch latency cancels; see
tools/kernel_bench.py).

Usage:
    python tools/kernel_layout_probe.py [--validate-only]  # CPU interpret
    python tools/kernel_layout_probe.py --nt 1000 --programs 20 --reps 3
"""
import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C1, C2, C3 = -2.5, 4.0 / 3.0, -1.0 / 12.0

_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024)


def _roll(p, shift, axis):
    return pltpu.roll(p, shift % p.shape[axis], axis)


def _lap_roll(p):
    return (C2 * (_roll(p, 1, 0) + _roll(p, -1, 0)
                  + _roll(p, 1, 1) + _roll(p, -1, 1))
            + C3 * (_roll(p, 2, 0) + _roll(p, -2, 0)
                    + _roll(p, 2, 1) + _roll(p, -2, 1)))


def _lap_y_roll(p):
    return (C2 * (_roll(p, 1, 0) + _roll(p, -1, 0))
            + C3 * (_roll(p, 2, 0) + _roll(p, -2, 0)))


def band_circulant(n: int) -> np.ndarray:
    """(n, n) symmetric circulant D with D[i, i±1 mod n] = C2 and
    D[i, i±2 mod n] = C3: (p @ D)[., j] = x-direction 4th-order
    second-difference (without the C1 center, which the time recursion
    folds into t1)."""
    d = np.zeros((n, n), np.float32)
    idx = np.arange(n)
    for off, c in ((1, C2), (-1, C2), (2, C3), (-2, C3)):
        d[idx, (idx + off) % n] += c
    return d


# -- kernels -----------------------------------------------------------

def _step_kernel_common(state, alpha, t1, t2, lap_fn, unroll):
    p0 = state[0]
    p1 = state[1]
    for _ in range(unroll):
        p = t1 * p1 - t2 * p0 + alpha * lap_fn(p1)
        p0, p1 = p1, p
    state[0] = p0
    state[1] = p1


def _roll_kernel(p0_ref, p1_ref, a_ref, t1_ref, t2_ref, out_ref, state,
                 *, unroll, n_iter):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        state[0] = p0_ref[0]
        state[1] = p1_ref[0]

    _step_kernel_common(state, a_ref[0], t1_ref[0], t2_ref[0],
                        _lap_roll, unroll)

    @pl.when(j == n_iter - 1)
    def _():
        out_ref[0] = state[1]


def _mxu_x_kernel(p0_ref, p1_ref, a_ref, t1_ref, t2_ref, d_ref, out_ref,
                  state, *, unroll, n_iter):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        state[0] = p0_ref[0]
        state[1] = p1_ref[0]

    d = d_ref[...]

    def lap(p):
        return _lap_y_roll(p) + jnp.dot(
            p, d, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    _step_kernel_common(state, a_ref[0], t1_ref[0], t2_ref[0], lap, unroll)

    @pl.when(j == n_iter - 1)
    def _():
        out_ref[0] = state[1]


def _mxu_xy_kernel(p0_ref, p1_ref, a_ref, t1_ref, t2_ref, d_ref, e_ref,
                   out_ref, state, *, unroll, n_iter):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        state[0] = p0_ref[0]
        state[1] = p1_ref[0]

    d = d_ref[...]
    e = e_ref[...]

    def lap(p):
        # HIGHEST: f32-accurate multi-pass MXU dot — the default
        # (bf16-input) precision loses ~1e-3 relative per step, which a
        # 1000-step recursion amplifies far past the solver's 3e-6
        # adjoint parity bar.
        return (jnp.dot(e, p, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                + jnp.dot(p, d, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST))

    _step_kernel_common(state, a_ref[0], t1_ref[0], t2_ref[0], lap, unroll)

    @pl.when(j == n_iter - 1)
    def _():
        out_ref[0] = state[1]


def _halo_kernel(p0_ref, p1_ref, a_ref, t1_ref, t2_ref, out_ref, state,
                 *, unroll, n_iter, wp):
    """State lives as (Hp, Wp+4): interior [2, Wp+2), halo columns
    replicate the circular wrap. x-neighbor access = static unaligned
    value slices; ping-pong between state[0]/state[1] (unroll is even,
    enforced by the caller)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        for k, ref in ((0, p0_ref), (1, p1_ref)):
            p = ref[0]
            state[k, :, 2:wp + 2] = p
            state[k, :, 0:2] = p[:, wp - 2:wp]
            state[k, :, wp + 2:wp + 4] = p[:, 0:2]

    alpha = a_ref[0]
    t1 = t1_ref[0]
    t2 = t2_ref[0]

    for u in range(unroll):
        src, dst = (u + 1) % 2, u % 2      # p1 = state[src], p0 = state[dst]
        p1x = state[src]                    # (Hp, Wp+4)
        p1 = p1x[:, 2:wp + 2]
        p0 = state[dst][:, 2:wp + 2]
        xsum = (C2 * (p1x[:, 1:wp + 1] + p1x[:, 3:wp + 3])
                + C3 * (p1x[:, 0:wp] + p1x[:, 4:wp + 4]))
        p = t1 * p1 - t2 * p0 + alpha * (_lap_y_roll(p1) + xsum)
        state[dst, :, 2:wp + 2] = p
        state[dst, :, 0:2] = p[:, wp - 2:wp]
        state[dst, :, wp + 2:wp + 4] = p[:, 0:2]

    @pl.when(j == n_iter - 1)
    def _():
        # after an even unroll the newest state is in state[1]
        out_ref[0] = state[1, :, 2:wp + 2]


# -- drivers -----------------------------------------------------------

def run_variant(variant, p0, p1, alpha, t1, t2, *, nt, unroll,
                interpret=False):
    nprog, hp, wp = p0.shape
    assert nt % unroll == 0 and unroll % 2 == 0
    n_iter = nt // unroll

    field = pl.BlockSpec((1, hp, wp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    coef = pl.BlockSpec((1, hp, wp), lambda i, j: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    mat_w = pl.BlockSpec((wp, wp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    mat_h = pl.BlockSpec((hp, hp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nprog, hp, wp), jnp.float32)
    common = dict(grid=(nprog, n_iter), out_specs=field,
                  out_shape=out_shape, compiler_params=_COMPILER_PARAMS,
                  interpret=interpret)
    coefs = (alpha[None], t1[None], t2[None])

    if variant == 'roll':
        return pl.pallas_call(
            partial(_roll_kernel, unroll=unroll, n_iter=n_iter),
            in_specs=[field, field, coef, coef, coef],
            scratch_shapes=[pltpu.VMEM((2, hp, wp), jnp.float32)],
            **common)(p0, p1, *coefs)
    if variant == 'mxu_x':
        d = jnp.asarray(band_circulant(wp))
        return pl.pallas_call(
            partial(_mxu_x_kernel, unroll=unroll, n_iter=n_iter),
            in_specs=[field, field, coef, coef, coef, mat_w],
            scratch_shapes=[pltpu.VMEM((2, hp, wp), jnp.float32)],
            **common)(p0, p1, *coefs, d)
    if variant == 'mxu_xy':
        d = jnp.asarray(band_circulant(wp))
        e = jnp.asarray(band_circulant(hp))
        return pl.pallas_call(
            partial(_mxu_xy_kernel, unroll=unroll, n_iter=n_iter),
            in_specs=[field, field, coef, coef, coef, mat_w, mat_h],
            scratch_shapes=[pltpu.VMEM((2, hp, wp), jnp.float32)],
            **common)(p0, p1, *coefs, d, e)
    if variant == 'halo':
        return pl.pallas_call(
            partial(_halo_kernel, unroll=unroll, n_iter=n_iter, wp=wp),
            in_specs=[field, field, coef, coef, coef],
            scratch_shapes=[pltpu.VMEM((2, hp, wp + 4), jnp.float32)],
            **common)(p0, p1, *coefs)
    raise ValueError(variant)


def make_problem(nprog, hp, wp, seed=0):
    rng = np.random.RandomState(seed)
    # physically-shaped coefficients: v in [1500, 4000] (CFL-safe),
    # sponge-style damping ring
    v = 1500.0 + 2500.0 * rng.rand(hp, wp).astype(np.float32)
    alpha = (v * 1e-3 / 10.0) ** 2
    kappa = np.zeros((hp, wp), np.float32)
    edge = 120
    ramp = (np.maximum(0, edge - np.minimum.outer(
        np.minimum(np.arange(hp), hp - 1 - np.arange(hp)),
        np.minimum(np.arange(wp), wp - 1 - np.arange(wp)))) / edge) ** 2
    kappa = 3.0 * 1500.0 * np.log(1e7) / (2 * (edge - 1) * 10.0) * ramp
    t1 = 2.0 + 2.0 * C1 * alpha - kappa * 1e-3
    t2 = 1.0 - kappa * 1e-3
    p0 = 1e-3 * rng.randn(nprog, hp, wp).astype(np.float32)
    p1 = 1e-3 * rng.randn(nprog, hp, wp).astype(np.float32)
    return (jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(alpha),
            jnp.asarray(t1.astype(np.float32)),
            jnp.asarray(t2.astype(np.float32)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--programs', type=int, default=20,
                    help='independent (sample, shot) fields (bench '
                         'workload: batch 4 x ns 5 = 20)')
    ap.add_argument('--size', type=int, default=310)
    ap.add_argument('--nt', type=int, default=1000)
    ap.add_argument('--unroll', type=int, default=10)
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--variants', nargs='+',
                    default=['roll', 'mxu_x', 'mxu_xy', 'halo'])
    ap.add_argument('--validate-only', action='store_true',
                    help='interpret-mode equivalence check (CPU)')
    args = ap.parse_args(argv)

    interpret = args.validate_only or jax.default_backend() != 'tpu'
    if args.validate_only:
        nprog, hp, wp, nt, unroll = 2, 40, 48, 20, 2
    else:
        nprog, hp, wp = args.programs, args.size, args.size
        nt, unroll = args.nt, args.unroll
    prob = make_problem(nprog, hp, wp)

    # correctness: all variants implement the same operator
    ref = None
    results = {}
    for v in args.variants:
        try:
            out = run_variant(v, *prob, nt=min(nt, 20), unroll=2,
                              interpret=interpret)
            out = np.asarray(out)
        except Exception as e:
            print(json.dumps({'variant': v, 'error': repr(e)[:300]}),
                  flush=True)
            results[v] = None
            continue
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(np.max(np.abs(out - ref))
                        / max(1e-12, np.max(np.abs(ref))))
        results[v] = err
        print(json.dumps({'variant': v, 'rel_err_vs_roll': err}),
              flush=True)
    if args.validate_only:
        ok = all(e is not None and e < 1e-4 for e in results.values())
        print('VALIDATION', 'OK' if ok else 'FAILED')
        return

    # timing (TPU): K reps of the full nt-step kernel in one dispatch
    for v in args.variants:
        if results.get(v) is None:
            continue

        @jax.jit
        def many(p0, p1, a, t1, t2):
            def body(c, _):
                r = run_variant(v, c, p1, a, t1, t2, nt=nt,
                                unroll=args.unroll)
                return c + 0.0 * jnp.mean(r), None
            out, _ = jax.lax.scan(body, p0, None, length=args.reps)
            return out

        r = many(*prob)
        float(jnp.sum(r))
        t0 = time.time()
        r = many(*prob)
        float(jnp.sum(r))
        dt = (time.time() - t0) / args.reps
        us_per_step_field = dt / nt / nprog * 1e6
        print(json.dumps({
            'variant': v, 'programs': nprog, 'size': [hp, wp], 'nt': nt,
            'ms_per_call': round(dt * 1e3, 2),
            'us_per_step_per_field': round(us_per_step_field, 3),
        }), flush=True)


if __name__ == '__main__':
    main()
