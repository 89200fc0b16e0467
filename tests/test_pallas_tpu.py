"""Pallas kernel parity tests — require a real TPU, skipped on CPU CI.

Run manually with: JAX_PLATFORMS='' python -m pytest tests/test_pallas_tpu.py
(conftest pins JAX_PLATFORMS=cpu for the rest of the suite; these tests
re-check the actual backend at runtime).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from red_diffeq_tpu.solvers.acoustic import Geometry, forward_modeling

def _runs_on_tpu() -> bool:
    """True only when computations actually execute on a TPU device (the
    suite pins jax_default_device to CPU; the axon plugin still reports
    default_backend() == 'tpu')."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, 'platform', None) == 'tpu'
    return jax.default_backend() == 'tpu'


pytestmark = pytest.mark.skipif(
    not _runs_on_tpu(), reason='pallas stencil kernels require a TPU')


def _geom(nt=100, **kw):
    ctx = dict(n_grid=70, nt=nt, dx=10.0, dt=0.001, nbc=120, f=15.0,
               sz=10, gz=10, ng=70, ns=5)
    ctx.update(kw)
    return Geometry.from_ctx(ctx)


def test_pallas_forward_matches_xla():
    geom = _geom()
    rng = np.random.RandomState(0)
    v = jnp.asarray(1500 + 3000 * rng.rand(2, 1, 310, 310), jnp.float32)
    sx = forward_modeling(v, geom, chunk=20, backend='xla')
    sp = forward_modeling(v, geom, chunk=20, backend='pallas')
    np.testing.assert_allclose(np.asarray(sp), np.asarray(sx),
                               rtol=1e-5, atol=1e-5)


def test_pallas_grad_matches_xla():
    geom = _geom(nt=60)
    rng = np.random.RandomState(1)
    v = jnp.asarray(1500 + 3000 * rng.rand(1, 1, 310, 310), jnp.float32)
    target = forward_modeling(v * 1.01, geom, chunk=20, backend='xla')

    def loss(v, backend):
        s = forward_modeling(v, geom, chunk=20, backend=backend)
        return jnp.sum((s - target) ** 2)

    gx = jax.grad(lambda v: loss(v, 'xla'))(v)
    gp = jax.grad(lambda v: loss(v, 'pallas'))(v)
    scale = float(jnp.max(jnp.abs(gx))) + 1e-30
    np.testing.assert_allclose(np.asarray(gp) / scale,
                               np.asarray(gx) / scale, atol=1e-4)


def test_pallas_uneven_chunk_and_subsampling():
    geom = _geom(nt=50, **{'ng': 70})
    g2 = Geometry.from_ctx(
        dict(n_grid=70, nt=50, dx=10.0, dt=0.001, nbc=120, f=15.0,
             sz=10, gz=10, ng=70, ns=5), sample_temporal=2)
    v = jnp.full((1, 1, 310, 310), 2500.0)
    # chunk that doesn't divide nt exercises the padded tail
    sx = forward_modeling(v, g2, chunk=16, backend='xla')
    sp = forward_modeling(v, g2, chunk=16, backend='pallas')
    assert sp.shape == (1, 5, 25, 70)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(sx), rtol=1e-5,
                               atol=1e-6)
