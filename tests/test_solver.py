"""Solver tests: stencil correctness vs an independent numpy reference,
energy decay in the sponge, shapes, and gradient checks vs finite differences.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from red_diffeq_tpu.solvers.acoustic import (
    FWIForward, Geometry, forward_modeling, ricker, sponge_profile,
)
from red_diffeq_tpu.utils.data_trans import v_denormalize, v_normalize


def np_reference_solver(v_pad, geom):
    """Independent numpy implementation of the same discretization:
    2nd-order-time / 4th-order-space with sponge, circular wrap.
    Loops explicitly; used only on tiny grids."""
    b, _, hp, wp = v_pad.shape
    dt, dx, nt, nbc = geom.dt, geom.dx, geom.nt, geom.nbc
    src = ricker(geom.f, dt, nt).astype(np.float64)
    v = v_pad[:, 0].astype(np.float64)                       # (B, Hp, Wp)

    vmin = v.reshape(b, -1).min(axis=1)
    a = (nbc - 1) * dx
    kappa_coef = 3.0 * vmin * math.log(1e7) / (2.0 * a)
    ramp = (np.arange(nbc) * dx / a) ** 2
    damp = np.zeros_like(v)
    for bi in range(b):
        prof = kappa_coef[bi] * ramp
        damp[bi, :nbc, :] = prof[::-1, None]
        damp[bi, hp - nbc:, :] = prof[:, None]
        damp[bi, :, :nbc] = prof[::-1][None, :]
        damp[bi, :, wp - nbc:] = prof[None, :]
    kappa = damp * dt

    alpha = (v * dt / dx) ** 2
    t1 = 2 + 2 * (-2.5) * alpha - kappa
    t2 = 1 - kappa
    beta = (v * dt) ** 2
    c2, c3 = 4.0 / 3.0, -1.0 / 12.0

    ns, ng = geom.ns, geom.ng
    p0 = np.zeros((b, ns, hp, wp))
    p1 = np.zeros((b, ns, hp, wp))
    seis = []
    for i in range(nt):
        lap = (c2 * (np.roll(p1, 1, axis=-2) + np.roll(p1, -1, axis=-2)
                     + np.roll(p1, 1, axis=-1) + np.roll(p1, -1, axis=-1))
               + c3 * (np.roll(p1, 2, axis=-2) + np.roll(p1, -2, axis=-2)
                       + np.roll(p1, 2, axis=-1) + np.roll(p1, -2, axis=-1)))
        p = t1[:, None] * p1 - t2[:, None] * p0 + alpha[:, None] * lap
        for s in range(ns):
            p[:, s, geom.isz, geom.isx[s]] += beta[:, geom.isz, geom.isx[s]] * src[i]
        if i % geom.sample_temporal == 0:
            seis.append(p[:, :, geom.igz, :][:, :, list(geom.igx)])
        p0, p1 = p1, p
    return np.stack(seis, axis=2)                            # (B, ns, nt_rec, ng)


def tiny_geom(nt=40, nbc=8, n_grid=16, ns=2, ng=16, sample_temporal=1):
    ctx = dict(n_grid=n_grid, nt=nt, dx=10.0, dt=0.001, nbc=nbc, f=15.0,
               sz=10, gz=10, ng=ng, ns=ns)
    return Geometry.from_ctx(ctx, sample_temporal=sample_temporal)


def test_ricker_matches_definition():
    w = ricker(15.0, 0.001, 1000)
    assert w.shape == (1000,)
    nw = 2 * math.floor(2.2 / 15.0 / 0.001 / 2) + 1
    nc = math.floor(nw / 2)
    assert w[nc] == pytest.approx(1.0)          # peak value at center
    assert np.all(w[nw:] == 0)                  # zero tail


def test_sponge_profile_structure():
    v = jnp.full((2, 1, 30, 34), 2000.0)
    damp = np.asarray(sponge_profile(v, nbc=8, dx=10.0))
    assert damp.shape == (2, 1, 30, 34)
    # interior is exactly zero
    assert np.all(damp[:, :, 8:-8, 8:-8] == 0)
    # edges positive and increasing outward
    assert damp[0, 0, 15, 0] > damp[0, 0, 15, 5] > 0
    # corner: column profile wins (write-order semantics)
    assert damp[0, 0, 0, 0] == damp[0, 0, 15, 0]


def test_forward_matches_numpy_reference():
    geom = tiny_geom()
    rng = np.random.RandomState(0)
    hp = 16 + 2 * 8
    v = 1500.0 + 3000.0 * rng.rand(2, 1, hp, hp)
    ref = np_reference_solver(v, geom)
    out = np.asarray(forward_modeling(jnp.asarray(v, jnp.float32), geom,
                                      chunk=7, remat=True))
    assert out.shape == ref.shape == (2, 2, 40, 16)
    assert np.abs(ref).max() > 0  # non-trivial wavefield
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-6 * np.abs(ref).max())


def test_temporal_subsampling():
    geom = tiny_geom(nt=40, sample_temporal=4)
    v = jnp.full((1, 1, 32, 32), 2500.0)
    out = forward_modeling(v, geom, chunk=8)
    assert out.shape == (1, 2, 10, 16)
    ref = np_reference_solver(np.asarray(v), geom)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4,
                               atol=2e-6 * max(np.abs(ref).max(), 1e-30))


def test_remat_equals_no_remat():
    geom = tiny_geom()
    v = jnp.full((1, 1, 32, 32), 3000.0)
    a = forward_modeling(v, geom, chunk=5, remat=True)
    b = forward_modeling(v, geom, chunk=10, remat=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_energy_decay_in_sponge():
    """After the source stops, total wavefield energy must decay (sponge)."""
    geom = tiny_geom(nt=400, nbc=12, n_grid=12)

    def energy_at_end(v):
        # propagate and measure recorded amplitude in late vs mid window
        s = forward_modeling(v, geom, chunk=20)
        return s

    v = jnp.full((1, 1, 12 + 24, 12 + 24), 3000.0)
    s = np.asarray(energy_at_end(v))[0]  # (ns, nt, ng)
    early = np.abs(s[:, 100:200]).max()
    late = np.abs(s[:, 350:]).max()
    assert late < 0.2 * early


def test_gradient_vs_finite_difference():
    geom = tiny_geom(nt=30, nbc=6, n_grid=10, ns=1, ng=10)
    hp = 10 + 12
    rng = np.random.RandomState(1)
    v0 = jnp.asarray(2000.0 + 500.0 * rng.rand(1, 1, 10, 10), jnp.float32)
    target = forward_modeling(
        jnp.pad(v0 * 1.05, ((0, 0), (0, 0), (6, 6), (6, 6)), mode='edge'),
        geom, chunk=6)

    def loss(v):
        v_pad = jnp.pad(v, ((0, 0), (0, 0), (6, 6), (6, 6)), mode='edge')
        s = forward_modeling(v_pad, geom, chunk=6)
        return jnp.sum((s - target) ** 2)

    g = np.asarray(jax.grad(loss)(v0))
    assert g.shape == v0.shape
    # Primary oracle: forward-mode JVP (an independent linearization path
    # through the same program) — exact, free of the fp32 cancellation
    # noise that limits finite differences at ~1e-6 gradient magnitudes.
    f_loss = lambda v: float(loss(jnp.asarray(v, jnp.float32)))
    rng_d = np.random.RandomState(7)
    for _ in range(3):
        d = rng_d.randn(*v0.shape).astype(np.float32)
        d /= np.linalg.norm(d)
        _, jv = jax.jvp(loss, (v0,), (jnp.asarray(d),))
        analytic = float(np.sum(g * d))
        assert analytic == pytest.approx(float(jv), rel=1e-3, abs=1e-10)
        # FD sanity check (loose: fp32 central differences are noisy)
        eps = 4.0
        fd = (f_loss(np.array(v0) + eps * d)
              - f_loss(np.array(v0) - eps * d)) / (2 * eps)
        assert analytic == pytest.approx(fd, rel=0.25, abs=1e-9)


def test_fwi_forward_wrapper():
    ctx = dict(n_grid=16, nt=40, dx=10.0, dt=0.001, nbc=8, f=15.0,
               sz=10, gz=10, ng=16, ns=2)
    op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                    s_norm_func=lambda s: s, backend='xla', chunk=8)
    v_norm = v_normalize(jnp.full((1, 1, 16, 16), 2500.0))
    s = op(v_norm)
    assert s.shape == (1, 2, 40, 16)
    # matches direct call on denormalized, padded input
    v_pad = jnp.pad(jnp.full((1, 1, 16, 16), 2500.0),
                    ((0, 0), (0, 0), (8, 8), (8, 8)), mode='edge')
    ref = forward_modeling(v_pad, op.geom, chunk=8)
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref), rtol=1e-5)


def test_custom_source_receiver_positions():
    ctx = dict(n_grid=16, nt=30, dx=10.0, dt=0.001, nbc=8, f=15.0,
               sz=10, gz=10, ng=4, ns=2, sx=[3, 12], gx=[2, 5, 9, 14])
    geom = Geometry.from_ctx(ctx)
    assert geom.isx == (11, 20)
    assert geom.igx == (10, 13, 17, 22)
    assert not geom.receivers_contiguous
    v = jnp.full((1, 1, 32, 32), 2500.0)
    out = np.asarray(forward_modeling(v, geom, chunk=10))
    ref = np_reference_solver(np.asarray(v), geom)
    assert out.shape == (1, 2, 30, 4)
    np.testing.assert_allclose(out, ref, rtol=2e-4,
                               atol=2e-6 * max(np.abs(ref).max(), 1e-30))


def test_refined_observation_operator():
    """refined_ctx/upsample_velocity: same physical experiment on a
    dt/2 + dx/2 grid must produce observations with the SAME shape that
    are close to — but measurably different from — the coarse solver's
    (the forward-model mismatch used to avoid the inverse crime)."""
    from red_diffeq_tpu.solvers.acoustic import refined_ctx, \
        upsample_velocity

    n, nt, nbc, ns = 16, 80, 12, 2
    ctx = dict(n_grid=n, nt=nt, dx=10.0, dt=0.001, nbc=nbc, f=15.0,
               sz=10, gz=10, ng=n, ns=ns)
    fine = refined_ctx(ctx, factor=2)
    assert fine['n_grid'] == 2 * n and fine['nt'] == 2 * nt
    assert fine['dx'] == 5.0 and fine['dt'] == 0.0005
    assert fine['nbc'] == 2 * nbc
    # physical source/receiver positions preserved
    np.testing.assert_allclose(np.asarray(fine['sx']) * fine['dx'],
                               np.linspace(0, n - 1, ns) * ctx['dx'])

    op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                    s_norm_func=lambda s: s, backend='xla', chunk=10)
    op_fine = FWIForward(fine, sample_temporal=2, normalize=True,
                         v_denorm_func=v_denormalize,
                         s_norm_func=lambda s: s, backend='xla', chunk=10)

    v = np.full((1, 1, n, n), 2000.0, np.float32)
    v[:, :, n // 2:, :] = 3000.0
    y = np.asarray(op(v_normalize(jnp.asarray(v))))
    y_fine = np.asarray(op_fine(v_normalize(
        jnp.asarray(upsample_velocity(v, 2)))))
    assert y_fine.shape == y.shape

    rel = np.linalg.norm(y_fine - y) / np.linalg.norm(y)
    assert 1e-4 < rel < 0.5, rel  # same physics, different discretization
