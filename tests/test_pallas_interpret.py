"""Pallas kernel logic in CPU CI via the Pallas interpreter.

The real-TPU parity tests (test_pallas_tpu.py / run_tpu_parity.py) are
skipped off-TPU; these interpret-mode variants exercise the same kernel
code (ops/stencil.py) in every suite run: forward parity vs the XLA
stepper, gradient parity for BOTH adjoint modes, reverse-vs-tape adjoint
agreement at a large chunk, and the t2 stability guard (VERDICT r1 #4,
ADVICE r1).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from red_diffeq_tpu.ops import stencil
from red_diffeq_tpu.solvers.acoustic import FWIForward, Geometry
from red_diffeq_tpu.utils.data_trans import v_denormalize, v_normalize


def _ops(nt=40, chunk=20, n=16, nbc=8, ns=2, dt=0.001, dx=10.0, **kw):
    ctx = dict(n_grid=n, nt=nt, dx=dx, dt=dt, nbc=nbc, f=15.0,
               sz=10, gz=10, ng=n, ns=ns)
    mk = lambda backend, **b: FWIForward(
        ctx, normalize=True, v_denorm_func=v_denormalize,
        s_norm_func=lambda s: s, backend=backend, chunk=chunk, **b, **kw)
    return mk


def _two_layer(n=16, batch=1):
    v = np.full((batch, 1, n, n), 2000.0, np.float32)
    v[:, :, n // 2:, :] = 3000.0
    return v_normalize(jnp.asarray(v))


def test_interpret_forward_matches_xla():
    mk = _ops()
    v = _two_layer()
    s_xla = np.asarray(mk('xla')(v))
    s_pal = np.asarray(mk('pallas_interpret')(v))
    assert s_pal.shape == s_xla.shape == (1, 2, 40, 16)
    np.testing.assert_allclose(s_pal, s_xla, rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize('mode', ['reverse', 'tape'])
def test_interpret_grad_matches_xla(mode):
    mk = _ops()
    v = _two_layer()

    def loss(op):
        return lambda x: jnp.sum(op._forward(x) ** 2)

    g_xla = np.asarray(jax.grad(loss(mk('xla')))(v))
    g_pal = np.asarray(
        jax.grad(loss(mk('pallas_interpret', adjoint=mode)))(v))
    denom = np.max(np.abs(g_xla)) + 1e-12
    assert np.max(np.abs(g_pal - g_xla)) / denom < 1e-4, mode


def test_reverse_and_tape_adjoints_agree_large_chunk():
    """VERDICT r1 weak #4: the tape-free inverse-recursion adjoint must
    agree with the stored-tape adjoint even with the whole 100-step
    propagation fused into one chunk (maximum within-chunk error
    accumulation). Uses a reference-strength sponge (nbc=100: t2 >= 0.95,
    amplification ~(1/0.95)^100 ~ 1.5e2 on fp32 eps) — the harsh-sponge
    regime where reconstruction is genuinely unstable is covered by the
    guard test below."""
    mk = _ops(nt=100, chunk=100, nbc=100)
    v = _two_layer()

    def loss(op):
        return lambda x: jnp.sum(op._forward(x) ** 2)

    g_rev = np.asarray(
        jax.grad(loss(mk('pallas_interpret', adjoint='reverse')))(v))
    g_tape = np.asarray(
        jax.grad(loss(mk('pallas_interpret', adjoint='tape')))(v))
    denom = np.max(np.abs(g_tape)) + 1e-12
    assert np.max(np.abs(g_rev - g_tape)) / denom < 1e-4


def test_t2_guard_bound_and_fallback():
    """Strong sponge / large dt pushes t2 = 1 - kappa*dt toward 0; the
    host-side bound must flag it and pallas_chunk_fn must auto-downgrade
    'reverse' to 'tape' (ADVICE r1: unguarded division by t2)."""
    # Standard OpenFWI config: comfortably above the guard.
    safe = Geometry.from_ctx(dict(n_grid=70, nt=1000, dx=10.0, dt=0.001,
                                  nbc=120, f=15.0, sz=10, gz=10, ng=70,
                                  ns=5))
    assert stencil._t2_lower_bound(safe) > stencil._T2_GUARD

    # Narrow, strong sponge: bound falls below the guard.
    harsh = Geometry.from_ctx(dict(n_grid=16, nt=40, dx=5.0, dt=0.001,
                                   nbc=10, f=15.0, sz=10, gz=10, ng=16,
                                   ns=2))
    assert stencil._t2_lower_bound(harsh) < stencil._T2_GUARD

    # The guarded operator still produces correct gradients (it silently
    # uses the tape adjoint); compare against XLA.
    mk = _ops(nt=40, chunk=20, nbc=10, dx=5.0)
    v = _two_layer()

    def loss(op):
        return lambda x: jnp.sum(op._forward(x) ** 2)

    g_xla = np.asarray(jax.grad(loss(mk('xla')))(v))
    g_pal = np.asarray(jax.grad(loss(mk('pallas_interpret')))(v))
    denom = np.max(np.abs(g_xla)) + 1e-12
    assert np.max(np.abs(g_pal - g_xla)) / denom < 1e-4


def test_interpret_uneven_chunk_and_value_grad():
    """chunk not dividing nt exercises the source-padding path; also
    check value_and_grad through a masked L1 like the engine uses."""
    mk = _ops(nt=50, chunk=20)
    v = _two_layer()
    op = mk('pallas_interpret')
    y = mk('xla')(v)

    def obj(x):
        return jnp.mean(jnp.abs(op._forward(x) - y))

    val, g = jax.value_and_grad(obj)(v + 0.05)
    assert np.isfinite(float(val)) and float(val) > 0
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


@pytest.mark.parametrize('layout', ['mxu', 'mxu_xy', 'halo'])
@pytest.mark.parametrize('mode', ['reverse', 'tape'])
def test_alt_layouts_match_roll(monkeypatch, mode, layout):
    """x-stencil layouts 'mxu' (lane stencil as one banded-circulant MXU
    matmul), 'mxu_xy' (zero rolls, both directions on MXU) and 'halo'
    (static slices over redundant wrap columns, forward kernel) must
    reproduce the shipped 'roll' layout bit-for-tolerance in forward AND
    gradient — a layout is a pure implementation swap of the same
    operator."""
    mk = _ops()
    v = _two_layer()

    def loss(op):
        return lambda x: jnp.sum(op._forward(x) ** 2)

    s_roll = np.asarray(mk('pallas_interpret')(v))
    g_roll = np.asarray(
        jax.grad(loss(mk('pallas_interpret', adjoint=mode)))(v))

    monkeypatch.setattr(stencil, 'X_STENCIL_LAYOUT', layout)
    s_alt = np.asarray(mk('pallas_interpret')(v))
    g_alt = np.asarray(
        jax.grad(loss(mk('pallas_interpret', adjoint=mode)))(v))

    np.testing.assert_allclose(s_alt, s_roll, rtol=2e-5, atol=1e-7)
    denom = np.max(np.abs(g_roll)) + 1e-12
    assert np.max(np.abs(g_alt - g_roll)) / denom < 1e-5, (mode, layout)


def test_band_circulant_matches_lane_stencil():
    """p @ D == the lane-axis half of the 4th-order circular stencil."""
    wp = 24
    rng = np.random.RandomState(3)
    p = rng.randn(8, wp).astype(np.float32)
    d = stencil.band_circulant_x(wp)
    want = (stencil.C2 * (np.roll(p, -1, 1) + np.roll(p, 1, 1))
            + stencil.C3 * (np.roll(p, -2, 1) + np.roll(p, 2, 1)))
    np.testing.assert_allclose(p.astype(np.float64) @ d, want, atol=1e-5)


def test_halo_layout_odd_chunk_falls_back(monkeypatch):
    """chunk=5 has no even unroll, so 'halo' must silently keep the
    shipped layout and still match the XLA stepper."""
    monkeypatch.setattr(stencil, 'X_STENCIL_LAYOUT', 'halo')
    mk = _ops(nt=20, chunk=5)
    v = _two_layer()
    s_xla = np.asarray(mk('xla')(v))
    s_pal = np.asarray(mk('pallas_interpret')(v))
    np.testing.assert_allclose(s_pal, s_xla, rtol=2e-5, atol=1e-7)


def test_resolve_run_config_downgrades():
    """The effective-config resolver must mirror the kernels' silent
    downgrades — benchmark tags are derived from it (round-5 review)."""
    safe = Geometry.from_ctx(dict(n_grid=70, nt=1000, dx=10.0, dt=0.001,
                                  nbc=120, f=15.0, sz=10, gz=10, ng=70,
                                  ns=5))
    # chunk=20: every layout supported as requested
    assert stencil.resolve_run_config(safe, 20, None, 'halo') == \
        ('reverse', 'halo', 10)
    assert stencil.resolve_run_config(safe, 20, None, 'mxu_xy')[1] == 'mxu_xy'
    # odd chunk: halo falls back to roll (no even unroll)
    assert stencil.resolve_run_config(safe, 15, None, 'halo') == \
        ('reverse', 'roll', 5)
    # chunk divisible by 6 but not by 4/8/10: halo keeps a fat unroll
    assert stencil.resolve_run_config(safe, 18, None, 'halo')[2] == 6
    # harsh sponge: reverse downgrades to tape regardless of layout
    harsh = Geometry.from_ctx(dict(n_grid=16, nt=40, dx=5.0, dt=0.001,
                                   nbc=10, f=15.0, sz=10, gz=10, ng=16,
                                   ns=2))
    assert stencil.resolve_run_config(harsh, 20, None, None)[0] == 'tape'
