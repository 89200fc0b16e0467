"""Differentiable 2D acoustic wave forward modeling, TPU-first.

Capability parity with the reference solver (red_diffeq/solvers/pde.py:6-93):
4th-order-space / 2nd-order-time finite differences with a quadratic sponge
absorbing boundary, Ricker source, simultaneous multi-shot propagation and
receiver sampling. The design, however, is JAX-native:

* the time loop is a ``lax.scan`` over fixed-size *chunks* of time steps,
  with ``jax.checkpoint`` on each chunk so the adjoint stores O(nt/chunk)
  wavefield carries instead of O(nt) intermediates (the reference's autograd
  holds every wavefield — its main memory/time bottleneck);
* all geometry (source/receiver indices, wavelet) is static, so XLA compiles
  one fused program; source injection and receiver sampling are static
  scatter/gather;
* an optional Pallas backend (red_diffeq_tpu/ops/stencil.py) fuses a whole
  chunk of time steps into one VMEM-resident kernel, eliminating HBM round
  trips between steps.

Wavefield layout: (batch, ns, Hp, Wp) with all shots of a sample stepped
simultaneously as a leading channel dim, matching reference pde.py:75-77.
"""
import math
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# 4th-order spatial stencil coefficients (reference pde.py:66-68).
C1, C2, C3 = -2.5, 4.0 / 3.0, -1.0 / 12.0


def ricker(f: float, dt: float, nt: int) -> np.ndarray:
    """Ricker wavelet sampled on the FD time grid (reference pde.py:26-36).

    The wavelet occupies the first ``nw = 2*floor(1.1/(f*dt))+1`` samples;
    the remainder is zero.
    """
    nw = 2.2 / f / dt
    nw = 2 * math.floor(nw / 2) + 1
    nc = math.floor(nw / 2)
    k = np.arange(nw)
    beta = ((nc - k) * f * dt * np.pi) ** 2
    w0 = (1 - 2 * beta) * np.exp(-beta)
    w = np.zeros(nt, dtype=np.float64)
    n = min(len(w0), nt)
    w[:n] = w0[:n]
    return w.astype(np.float32)


def sponge_profile(v_pad: jax.Array, nbc: int, dx: float) -> jax.Array:
    """Quadratic sponge damping field (reference pde.py:38-52).

    ``v_pad``: (B, 1, Hp, Wp) velocity in m/s. Returns damp of the same
    shape: zero in the interior; the left/right column profile overwrites
    the top/bottom row profile in the corners (write-order semantics of the
    reference implementation).
    """
    b, _, hp, wp = v_pad.shape
    vmin = jnp.min(v_pad.reshape(b, -1), axis=-1)              # (B,)
    a = (nbc - 1) * dx
    kappa = 3.0 * vmin * math.log(1.0e7) / (2.0 * a)           # (B,)
    ramp = (jnp.arange(nbc, dtype=v_pad.dtype) * dx / a) ** 2  # (nbc,)
    d1 = kappa[:, None] * ramp[None, :]                        # (B, nbc)

    vert = jnp.zeros((b, hp), dtype=v_pad.dtype)
    vert = vert.at[:, :nbc].set(d1[:, ::-1]).at[:, hp - nbc:].set(d1)
    horiz = jnp.zeros((b, wp), dtype=v_pad.dtype)
    horiz = horiz.at[:, :nbc].set(d1[:, ::-1]).at[:, wp - nbc:].set(d1)

    col_idx = jnp.arange(wp)
    in_side = (col_idx < nbc) | (col_idx >= wp - nbc)          # (Wp,)
    damp = jnp.where(in_side[None, None, :], horiz[:, None, :], vert[:, :, None])
    return damp[:, None, :, :]                                  # (B, 1, Hp, Wp)


@dataclass(frozen=True)
class Geometry:
    """Static acquisition geometry, all precomputed on the host.

    Indices are into the *padded* grid (interior offset = nbc), mirroring
    reference pde.py:54-59 (``adj_sr``).
    """
    nbc: int
    dx: float
    nt: int
    dt: float
    f: float
    isx: Tuple[int, ...]   # per-shot source column
    isz: int               # source row
    igx: Tuple[int, ...]   # receiver columns
    igz: int               # receiver row
    sample_temporal: int = 1
    # Wavelet multiplier. The update injects (v*dt)^2 * src into ONE cell
    # with no 1/dx^2 delta-density factor (reference pde.py:80-81), so a
    # refined grid must scale the source by factor^2 to represent the
    # same physical point source (see refined_ctx).
    src_scale: float = 1.0

    @property
    def ns(self) -> int:
        return len(self.isx)

    @property
    def ng(self) -> int:
        return len(self.igx)

    @property
    def receivers_contiguous(self) -> bool:
        g = np.asarray(self.igx)
        return bool(np.all(np.diff(g) == 1))

    @staticmethod
    def from_ctx(ctx: dict, sample_temporal: int = 1,
                 sample_spatial: float = 1.0) -> 'Geometry':
        """Build from a reference-style pde config dict
        (keys of reference default_config.py:6-16; optional sx/gx overrides
        in grid units as in reference pde.py:16-23)."""
        n_grid, dx, nbc = ctx['n_grid'], float(ctx['dx']), int(ctx['nbc'])
        if 'sx' in ctx and ctx['sx'] is not None:
            sx = np.asarray(ctx['sx'], dtype=np.float64) * dx
        else:
            sx = np.linspace(0, n_grid - 1, num=int(ctx['ns'])) * dx
        if 'gx' in ctx and ctx['gx'] is not None:
            gx = np.asarray(ctx['gx'], dtype=np.float64) * dx
        else:
            gx = np.linspace(0, n_grid - 1,
                             num=int(sample_spatial * ctx['ng'])) * dx
        isx = (np.around(sx / dx).astype(int) + nbc)
        igx = (np.around(gx / dx).astype(int) + nbc)
        isz = int(np.around(float(ctx['sz']) / dx)) + nbc
        igz = int(np.around(float(ctx['gz']) / dx)) + nbc
        return Geometry(
            nbc=nbc, dx=dx, nt=int(ctx['nt']), dt=float(ctx['dt']),
            f=float(ctx['f']), isx=tuple(int(i) for i in isx), isz=isz,
            igx=tuple(int(i) for i in igx), igz=igz,
            sample_temporal=sample_temporal,
            src_scale=float(ctx.get('src_scale', 1.0)),
        )


def upsample_velocity(v, factor: int = 2):
    """Nearest-neighbor refinement of a velocity model: the same physical
    medium sampled on a ``factor``-finer spatial grid (for observation
    generation that avoids the inverse crime — see :func:`refined_ctx`)."""
    return np.repeat(np.repeat(np.asarray(v), factor, axis=-2),
                     factor, axis=-1)


def refined_ctx(ctx: dict, factor: int = 2) -> dict:
    """Observation-generation config on a ``factor``-refined space/time
    grid: dx/factor, dt/factor (CFL), nt*factor, nbc*factor (same
    physical sponge width), with sources/receivers pinned to the SAME
    physical coordinates as the coarse grid. Pair with
    ``FWIForward(refined_ctx(ctx), sample_temporal=factor)`` and
    :func:`upsample_velocity` so synthetic observations come from a
    different discretization than the inversion operator — the committed
    inverse crime otherwise makes quality numbers an upper bound
    (reference discretization contract: red_diffeq/solvers/pde.py:61-86).
    """
    n = int(ctx['n_grid'])
    fine = dict(ctx)
    fine['n_grid'] = n * factor
    fine['dx'] = float(ctx['dx']) / factor
    fine['dt'] = float(ctx['dt']) / factor
    fine['nt'] = int(ctx['nt']) * factor
    fine['nbc'] = int(ctx['nbc']) * factor
    # Same physical acquisition: coarse default positions, re-expressed in
    # fine grid units (Geometry.from_ctx multiplies sx/gx by dx).
    sx_m = np.linspace(0, n - 1, num=int(ctx['ns'])) * float(ctx['dx'])
    gx_m = np.linspace(0, n - 1, num=int(ctx['ng'])) * float(ctx['dx'])
    fine['sx'] = sx_m / fine['dx']
    fine['gx'] = gx_m / fine['dx']
    # Keep the physical point-source strength: injection has no 1/dx^2
    # delta-density factor, so the finer cell needs factor^2 compensation.
    fine['src_scale'] = float(ctx.get('src_scale', 1.0)) * factor ** 2
    return fine


def _laplacian4(p: jax.Array) -> jax.Array:
    """4th-order 2D Laplacian stencil (without alpha), circular boundaries.

    Matches the reference's torch.roll wraparound (pde.py:79) — harmless
    because the sponge kills energy long before the padded edge.
    """
    return (C2 * (jnp.roll(p, 1, axis=-2) + jnp.roll(p, -1, axis=-2)
                  + jnp.roll(p, 1, axis=-1) + jnp.roll(p, -1, axis=-1))
            + C3 * (jnp.roll(p, 2, axis=-2) + jnp.roll(p, -2, axis=-2)
                    + jnp.roll(p, 2, axis=-1) + jnp.roll(p, -2, axis=-1)))


def _inject_and_record(p: jax.Array, amp: jax.Array, geom: Geometry,
                       isx_arr: jax.Array, igx_arr: Optional[jax.Array]
                       ) -> Tuple[jax.Array, jax.Array]:
    """Add per-shot source amplitude at static positions; gather receivers.

    ``p``: (B, ns, Hp, Wp); ``amp``: (B, ns) source amplitude per shot.
    Returns updated p and the receiver row (B, ns, ng).
    """
    ns = geom.ns
    rows = p[:, :, geom.isz, :]                                 # (B, ns, Wp)
    rows = rows.at[:, jnp.arange(ns), isx_arr].add(amp)
    p = p.at[:, :, geom.isz, :].set(rows)
    if igx_arr is None:  # contiguous receiver line — plain slice
        g0, g1 = geom.igx[0], geom.igx[-1] + 1
        rec = p[:, :, geom.igz, g0:g1]
    else:
        rec = p[:, :, geom.igz, :][:, :, igx_arr]
    return p, rec


def _xla_chunk(carry, src_chunk, *, coeffs, geom, isx_arr, igx_arr):
    """Run `chunk` FD steps with the pure-XLA stencil; record every step."""
    alpha, temp1, temp2, beta_pts = coeffs

    def step(c, src_i):
        p0, p1 = c
        p = temp1 * p1 - temp2 * p0 + alpha * _laplacian4(p1)
        p, rec = _inject_and_record(p, beta_pts * src_i, geom, isx_arr, igx_arr)
        return (p1, p), rec

    return jax.lax.scan(step, carry, src_chunk)


def forward_modeling(v_pad: jax.Array, geom: Geometry, *, chunk: int = 20,
                     remat: bool = True, backend: str = 'xla',
                     adjoint: Optional[str] = None) -> jax.Array:
    """Propagate all shots through velocity ``v_pad`` (B, 1, Hp, Wp) in m/s.

    Returns the seismogram (B, ns, nt_rec, ng) with
    ``nt_rec = ceil(nt / sample_temporal)``. Equivalent to reference
    pde.py:61-86 (``FWM``).
    """
    b, _, hp, wp = v_pad.shape
    dt, dx, nt = geom.dt, geom.dx, geom.nt
    dtype = v_pad.dtype

    src = jnp.asarray(ricker(geom.f, dt, nt) * geom.src_scale, dtype=dtype)
    alpha = (v_pad * (dt / dx)) ** 2                            # (B,1,Hp,Wp)
    kappa = sponge_profile(v_pad, geom.nbc, dx) * dt
    temp1 = 2.0 + 2.0 * C1 * alpha - kappa
    temp2 = 1.0 - kappa
    beta = (v_pad * dt) ** 2                                    # (B,1,Hp,Wp)

    isx_arr = jnp.asarray(geom.isx)
    igx_arr = None if geom.receivers_contiguous else jnp.asarray(geom.igx)
    # Source amplitude coefficient per (batch, shot): beta at the source point
    # of each shot (reference pde.py:81 uses beta_dt[:, 0, isz, isx[loc]]).
    beta_pts = beta[:, 0, geom.isz, :][:, isx_arr]              # (B, ns)

    n_chunks = -(-nt // chunk)
    steps_padded = n_chunks * chunk
    src_padded = jnp.pad(src, (0, steps_padded - nt))
    src_chunks = src_padded.reshape(n_chunks, chunk)

    if backend in ('pallas', 'pallas_interpret'):
        from red_diffeq_tpu.ops.stencil import pallas_chunk_fn
        chunk_fn = pallas_chunk_fn(
            alpha=alpha, temp1=temp1, temp2=temp2, beta_pts=beta_pts,
            geom=geom, chunk=chunk, mode=adjoint,
            interpret=(backend == 'pallas_interpret'))
        # The pallas chunk carries its own custom VJP that recomputes the
        # intra-chunk states; jax.checkpoint would be redundant.
    else:
        coeffs = (alpha, temp1, temp2, beta_pts)
        chunk_fn = partial(_xla_chunk, coeffs=coeffs, geom=geom,
                           isx_arr=isx_arr, igx_arr=igx_arr)
        if remat:
            chunk_fn = jax.checkpoint(chunk_fn, prevent_cse=False)

    shape = (b, geom.ns, hp, wp)
    p0 = jnp.zeros(shape, dtype=dtype)
    p1 = jnp.zeros(shape, dtype=dtype)
    _, recs = jax.lax.scan(chunk_fn, (p0, p1), src_chunks)
    # recs: (n_chunks, chunk, B, ns, ng) -> (steps, B, ns, ng)
    seis = recs.reshape(steps_padded, b, geom.ns, geom.ng)
    seis = seis[:nt][::geom.sample_temporal]
    return jnp.moveaxis(seis, 0, 2).reshape(b, geom.ns, -1, geom.ng)


class FWIForward:
    """Forward operator: normalized velocity -> seismogram.

    Mirrors the reference interface (red_diffeq/solvers/pde.py:6-93):
    ``__call__(v_norm)`` denormalizes, replicate-pads by nbc, propagates,
    and normalizes the output seismogram. Stateless & jit-compiled.
    """

    def __init__(self, ctx: dict, sample_temporal: int = 1,
                 sample_spatial: float = 1.0, normalize: bool = True,
                 v_denorm_func: Optional[Callable] = None,
                 s_norm_func: Optional[Callable] = None,
                 backend: str = 'auto', chunk: int = 20, remat: bool = True,
                 adjoint: Optional[str] = None):
        self.geom = Geometry.from_ctx(dict(ctx), sample_temporal, sample_spatial)
        self.normalize = normalize
        self.v_denorm_func = v_denorm_func
        self.s_norm_func = s_norm_func
        if backend == 'auto':
            # Pick pallas only when computations actually land on a TPU:
            # a pinned jax_default_device overrides the platform default.
            dev = jax.config.jax_default_device
            on_tpu = (getattr(dev, 'platform', None) == 'tpu'
                      if dev is not None
                      else jax.default_backend() == 'tpu')
            backend = 'pallas' if on_tpu else 'xla'
        self.backend = backend
        self.chunk = chunk
        self.remat = remat
        # Pallas adjoint implementation: None = auto ('reverse' unless the
        # t2 stability guard downgrades to 'tape'), or explicit
        # 'reverse' / 'tape' (ops/stencil.py:pallas_chunk_fn).
        self.adjoint = adjoint
        self._call = jax.jit(self._forward)

    def _forward(self, v_norm: jax.Array) -> jax.Array:
        v = self.v_denorm_func(v_norm) if self.normalize else v_norm
        nbc = self.geom.nbc
        v_pad = jnp.pad(v, ((0, 0), (0, 0), (nbc, nbc), (nbc, nbc)),
                        mode='edge')
        s = forward_modeling(v_pad, self.geom, chunk=self.chunk,
                             remat=self.remat, backend=self.backend,
                             adjoint=self.adjoint)
        if self.normalize and self.s_norm_func is not None:
            s = self.s_norm_func(s)
        return s

    def __call__(self, v_norm: jax.Array) -> jax.Array:
        return self._call(v_norm)
