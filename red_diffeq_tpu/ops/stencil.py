"""Pallas TPU kernels for the acoustic FD time stepper.

The XLA path (solvers/acoustic.py:_xla_chunk) round-trips the wavefield
through HBM every time step (~6 field transfers/step). These kernels keep
the wavefield carry in VMEM scratch across a whole chunk of time steps —
per-step HBM traffic drops to one receiver row — and implement the exact
adjoint by hand:

* ``_fwd_kernel``  — grid (B, ns, chunk): one (sample, shot) wavefield per
  program, one FD step per innermost grid iteration; the state lives in
  VMEM scratch, coefficient blocks stay resident while their block index
  is unchanged; outputs only receiver rows and the final carry. The
  per-shot (Hp, Wp) block keeps the whole working set ~5 MB — well under
  the 16 MB VMEM of a v5e core (an all-shots block was measured at 22 MB).
* ``_tape_kernel`` — same stepping, but writes every post-injection state
  to an HBM tape (used only inside the backward pass of one chunk).
* ``_bwd_kernel``  — reverse sweep over the tape computing cotangents for
  the wavefield carry, the coefficient fields (alpha, temp1, temp2) and
  the source-injection row. Relies on the self-adjointness of the
  circular 4th-order Laplacian; coefficient cotangents accumulate across
  shots directly in the output block (its index is constant over the
  (shot, step) inner grid).

Point-source injection is a row FMA against a precomputed injection field
``inj`` (B, ns, Wp) holding beta_dt at each shot's source column (Mosaic
has no value-level scatter); ``inj`` is the differentiable handle through
which velocity gradients flow back from the source term. The Ricker
wavelet is a config constant, so its cotangent is zero by design. Row
updates go through the scratch ref (sliced ref stores are native; there
is no value-level dynamic_update_slice either).

``pallas_chunk`` wraps the kernels as a ``jax.custom_vjp``: the forward
saves only the chunk-start carry + coefficients; the backward re-runs the
chunk through the tape kernel and sweeps it in reverse — an O(chunk) HBM
tape that lives only during the backward of one chunk.

Semantics match reference red_diffeq/solvers/pde.py:61-86 exactly
(roll-wraparound boundaries, post-injection recording).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C1, C2, C3 = -2.5, 4.0 / 3.0, -1.0 / 12.0


def _roll(p, shift, axis):
    """Circular roll; pltpu.roll requires a non-negative shift."""
    return pltpu.roll(p, shift % p.shape[axis], axis)


def _lap(p):
    """4th-order circular Laplacian stencil on (Hp, Wp)."""
    return (C2 * (_roll(p, 1, 0) + _roll(p, -1, 0)
                  + _roll(p, 1, 1) + _roll(p, -1, 1))
            + C3 * (_roll(p, 2, 0) + _roll(p, -2, 0)
                    + _roll(p, 2, 1) + _roll(p, -2, 1)))


def _fwd_kernel(p0_ref, p1_ref, alpha_ref, t1_ref, t2_ref, inj_ref,
                src_ref, p0_out, p1_out, rec_ref, state,
                *, chunk, isz, igz, g0, g1):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        state[0] = p0_ref[0, 0]
        state[1] = p1_ref[0, 0]

    par = j % 2
    a = state[0]
    b = state[1]
    p0 = jnp.where(par == 0, a, b)
    p1 = jnp.where(par == 0, b, a)

    p = (t1_ref[0, 0] * p1 - t2_ref[0, 0] * p0
         + alpha_ref[0, 0] * _lap(p1))
    row = p[isz, :] + inj_ref[0, 0, 0] * src_ref[j]

    # No value-level scatter/DUS on Mosaic: store the field, then overwrite
    # the injected source row through the scratch ref.
    @pl.when(par == 0)
    def _():
        state[0] = p
        state[0, isz, :] = row

    @pl.when(par == 1)
    def _():
        state[1] = p
        state[1, isz, :] = row

    rec_ref[0, 0, 0, 0] = row[g0:g1] if igz == isz else p[igz, g0:g1]

    @pl.when(j == chunk - 1)
    def _():
        p0_out[0, 0] = p1

    @pl.when((j == chunk - 1) & (par == 0))
    def _():
        p1_out[0, 0] = state[0]

    @pl.when((j == chunk - 1) & (par == 1))
    def _():
        p1_out[0, 0] = state[1]


def _tape_kernel(p0_ref, p1_ref, alpha_ref, t1_ref, t2_ref, inj_ref,
                 src_ref, tape_ref, state, *, chunk, isz):
    """Grid (B, ns, chunk+1). Iteration j=0 records tape[0] = p1_in;
    iteration j >= 1 performs FD step j-1 and records the post-injection
    state."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        state[0] = p0_ref[0, 0]
        state[1] = p1_ref[0, 0]
        tape_ref[0, 0, 0] = p1_ref[0, 0]

    @pl.when(j > 0)
    def _():
        par = (j - 1) % 2
        a = state[0]
        b = state[1]
        p0 = jnp.where(par == 0, a, b)
        p1 = jnp.where(par == 0, b, a)
        p = (t1_ref[0, 0] * p1 - t2_ref[0, 0] * p0
             + alpha_ref[0, 0] * _lap(p1))
        row = p[isz, :] + inj_ref[0, 0, 0] * src_ref[j - 1]

        @pl.when(par == 0)
        def _():
            state[0] = p
            state[0, isz, :] = row
            tape_ref[0, 0, 0] = state[0]

        @pl.when(par == 1)
        def _():
            state[1] = p
            state[1, isz, :] = row
            tape_ref[0, 0, 0] = state[1]


def _bwd_kernel(tape_k_ref, tape_km1_ref, p0_in_ref, gp0_out_ref,
                gp1_out_ref, rec_ct_ref, alpha_ref, t1_ref, t2_ref,
                src_ref,
                gp0_ref, gp1_ref, galpha_ref, gt1_ref, gt2_ref, ginj_ref,
                carry, *, chunk, isz, igz, g0, g1):
    """Grid (B, ns, chunk); iteration j reverses forward step
    k = chunk-1-j for one (sample, shot) wavefield.

    Adjoint recursion for p_{k+1} = t1*p_k - t2*p_{k-1} + alpha*L(p_k) + S:
      v' = v + G^T rec_ct            (receiver gather transpose)
      (u, v) <- (-t2*v', u + t1*v' + L(alpha*v'))
    with coefficient cotangents accumulated against taped states, summed
    over shots via the constant-index output block.
    """
    s = pl.program_id(1)
    j = pl.program_id(2)
    k = chunk - 1 - j

    @pl.when(j == 0)
    def _():
        carry[0] = gp0_out_ref[0, 0]
        carry[1] = gp1_out_ref[0, 0]
        ginj_ref[0, 0, 0] = jnp.zeros_like(ginj_ref[0, 0, 0])

    @pl.when((j == 0) & (s == 0))
    def _():
        galpha_ref[0, 0] = jnp.zeros_like(galpha_ref[0, 0])
        gt1_ref[0, 0] = jnp.zeros_like(gt1_ref[0, 0])
        gt2_ref[0, 0] = jnp.zeros_like(gt2_ref[0, 0])

    # Receiver cotangent flows into the post-injection state p_k (applied
    # through the carry ref; no value-level DUS on Mosaic).
    carry[1, igz, g0:g1] = carry[1, igz, g0:g1] + rec_ct_ref[0, 0, 0, 0]
    u = carry[0]
    v = carry[1]

    p_k = tape_k_ref[0, 0, 0]
    p_km1 = jnp.where(k == 0, p0_in_ref[0, 0], tape_km1_ref[0, 0, 0])

    # Injection-row cotangent: p_post = p_pre + inj * src_k at row isz.
    ginj_ref[0, 0, 0] += v[isz, :] * src_ref[k]

    alpha = alpha_ref[0, 0]
    t1 = t1_ref[0, 0]
    t2 = t2_ref[0, 0]

    # Transposed stencil (L is self-adjoint under circular boundaries).
    new_v = u + t1 * v + _lap(alpha * v)
    new_u = -t2 * v
    carry[0] = new_u
    carry[1] = new_v

    # Coefficient cotangents (accumulate across shots and steps).
    galpha_ref[0, 0] += v * _lap(p_k)
    gt1_ref[0, 0] += v * p_k
    gt2_ref[0, 0] += -v * p_km1

    @pl.when(j == chunk - 1)
    def _():
        gp0_ref[0, 0] = carry[0]
        gp1_ref[0, 0] = carry[1]


def _field_spec(hp, wp):
    """Per-(sample, shot) wavefield block."""
    return pl.BlockSpec((1, 1, hp, wp), lambda b, s, j: (b, s, 0, 0),
                        memory_space=pltpu.VMEM)


def _coef_spec(hp, wp):
    """Per-sample coefficient block (shared across shots)."""
    return pl.BlockSpec((1, 1, hp, wp), lambda b, s, j: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _inj_spec(wp):
    # inj is carried as (B, ns, 1, Wp) so the trailing two block dims
    # satisfy Mosaic's tiling rule (second-to-last == array dim).
    return pl.BlockSpec((1, 1, 1, wp), lambda b, s, j: (b, s, 0, 0),
                        memory_space=pltpu.VMEM)


def _src_spec(chunk):
    return pl.BlockSpec((chunk,), lambda b, s, j: (0,),
                        memory_space=pltpu.SMEM)


def _run_fwd(p0, p1, alpha, t1, t2, inj, src_chunk, *, geom, chunk):
    b, ns, hp, wp = p0.shape
    g0, g1 = geom.igx[0], geom.igx[-1] + 1
    ng = g1 - g0
    kern = partial(_fwd_kernel, chunk=chunk, isz=geom.isz, igz=geom.igz,
                   g0=g0, g1=g1)
    return pl.pallas_call(
        kern,
        grid=(b, ns, chunk),
        in_specs=[
            _field_spec(hp, wp),
            _field_spec(hp, wp),
            _coef_spec(hp, wp),
            _coef_spec(hp, wp),
            _coef_spec(hp, wp),
            _inj_spec(wp),
            _src_spec(chunk),
        ],
        out_specs=[
            _field_spec(hp, wp),
            _field_spec(hp, wp),
            # (B, chunk, ns, 1, ng): the singleton axis satisfies the
            # Mosaic trailing-dims tiling rule for a one-row write.
            pl.BlockSpec((1, 1, 1, 1, ng),
                         lambda b_, s, j: (b_, j, s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ns, hp, wp), p0.dtype),
            jax.ShapeDtypeStruct((b, ns, hp, wp), p0.dtype),
            jax.ShapeDtypeStruct((b, chunk, ns, 1, ng), p0.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, hp, wp), jnp.float32)],
    )(p0, p1, alpha, t1, t2, inj, src_chunk)


def _run_tape(p0, p1, alpha, t1, t2, inj, src_chunk, *, geom, chunk):
    b, ns, hp, wp = p0.shape
    kern = partial(_tape_kernel, chunk=chunk, isz=geom.isz)
    return pl.pallas_call(
        kern,
        grid=(b, ns, chunk + 1),
        in_specs=[
            _field_spec(hp, wp),
            _field_spec(hp, wp),
            _coef_spec(hp, wp),
            _coef_spec(hp, wp),
            _coef_spec(hp, wp),
            _inj_spec(wp),
            _src_spec(chunk),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, hp, wp), lambda b_, s, j: (b_, j, s, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, chunk + 1, ns, hp, wp), p0.dtype),
        scratch_shapes=[pltpu.VMEM((2, hp, wp), jnp.float32)],
    )(p0, p1, alpha, t1, t2, inj, src_chunk)


def _run_bwd(tape, p0, gp0o, gp1o, grec, alpha, t1, t2, src_chunk,
             *, geom, chunk):
    b, ns, hp, wp = p0.shape
    g0, g1 = geom.igx[0], geom.igx[-1] + 1
    ng = g1 - g0
    kern = partial(_bwd_kernel, chunk=chunk, isz=geom.isz, igz=geom.igz,
                   g0=g0, g1=g1)
    tape_spec_k = pl.BlockSpec(
        (1, 1, 1, hp, wp),
        lambda b_, s, j: (b_, chunk - 1 - j, s, 0, 0),
        memory_space=pltpu.VMEM)
    tape_spec_km1 = pl.BlockSpec(
        (1, 1, 1, hp, wp),
        lambda b_, s, j: (b_, jnp.maximum(chunk - 2 - j, 0), s, 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b, ns, chunk),
        in_specs=[
            tape_spec_k,
            tape_spec_km1,
            _field_spec(hp, wp),                         # p0_in
            _field_spec(hp, wp),                         # g p0_out
            _field_spec(hp, wp),                         # g p1_out
            pl.BlockSpec((1, 1, 1, 1, ng),
                         lambda b_, s, j: (b_, chunk - 1 - j, s, 0, 0),
                         memory_space=pltpu.VMEM),       # rec ct
            _coef_spec(hp, wp),
            _coef_spec(hp, wp),
            _coef_spec(hp, wp),
            _src_spec(chunk),
        ],
        out_specs=[
            _field_spec(hp, wp),                         # g p0
            _field_spec(hp, wp),                         # g p1
            _coef_spec(hp, wp),                          # g alpha (summed
            _coef_spec(hp, wp),                          # g t1    over
            _coef_spec(hp, wp),                          # g t2    shots)
            _inj_spec(wp),                               # g inj
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ns, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, ns, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, ns, 1, wp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, hp, wp), jnp.float32)],
    )(tape, tape, p0, gp0o, gp1o, grec, alpha, t1, t2, src_chunk)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def pallas_chunk(p0, p1, alpha, t1, t2, inj, src_chunk, geom, chunk):
    """One chunk of FD time steps on TPU. Returns (p0', p1', recs) with
    recs of shape (B, chunk, ns, ng)."""
    p0o, p1o, rec5 = _run_fwd(p0, p1, alpha, t1, t2, inj, src_chunk,
                              geom=geom, chunk=chunk)
    return p0o, p1o, rec5[:, :, :, 0, :]


def _pallas_chunk_fwd(p0, p1, alpha, t1, t2, inj, src_chunk, geom, chunk):
    out = pallas_chunk(p0, p1, alpha, t1, t2, inj, src_chunk, geom, chunk)
    return out, (p0, p1, alpha, t1, t2, inj, src_chunk)


def _pallas_chunk_bwd(geom, chunk, res, cts):
    p0, p1, alpha, t1, t2, inj, src_chunk = res
    gp0o, gp1o, grec = cts
    tape = _run_tape(p0, p1, alpha, t1, t2, inj, src_chunk,
                     geom=geom, chunk=chunk)
    gp0, gp1, galpha, gt1, gt2, ginj = _run_bwd(
        tape, p0, gp0o, gp1o, grec[:, :, :, None, :], alpha, t1, t2,
        src_chunk, geom=geom, chunk=chunk)
    # The source wavelet is a config constant; its cotangent is unused.
    gsrc = jnp.zeros_like(src_chunk)
    return gp0, gp1, galpha, gt1, gt2, ginj, gsrc


pallas_chunk.defvjp(_pallas_chunk_fwd, _pallas_chunk_bwd)


def build_injection_field(beta_pts, isx, wp):
    """(B, ns) source amplitudes -> (B, ns, 1, Wp) injection row field
    with beta at each shot's source column. Differentiable w.r.t.
    beta_pts."""
    b, ns = beta_pts.shape
    inj = jnp.zeros((b, ns, wp), beta_pts.dtype)
    inj = inj.at[:, jnp.arange(ns), jnp.asarray(isx)].set(beta_pts)
    return inj[:, :, None, :]


def pallas_chunk_fn(*, alpha, temp1, temp2, beta_pts, geom, chunk):
    """Adapter with the (carry, src_chunk) -> (carry, recs) signature the
    scan in solvers/acoustic.py:forward_modeling expects. ``recs`` comes
    back as (chunk, B, ns, ng) to match the XLA path."""
    if not geom.receivers_contiguous:
        raise NotImplementedError(
            'pallas backend requires a contiguous receiver line; '
            "use backend='xla' for scattered receivers")
    wp = alpha.shape[-1]
    inj = build_injection_field(beta_pts, geom.isx, wp)

    def chunk_fn(carry, src_chunk):
        p0, p1 = carry
        p0o, p1o, recs = pallas_chunk(p0, p1, alpha, temp1, temp2, inj,
                                      src_chunk, geom, chunk)
        return (p0o, p1o), jnp.moveaxis(recs, 1, 0)

    return chunk_fn
