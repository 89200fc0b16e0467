"""Standalone TPU parity runner (bypasses the CPU-pinning conftest)."""
import numpy as np
import jax
import jax.numpy as jnp

from red_diffeq_tpu.solvers.acoustic import Geometry, forward_modeling

assert jax.default_backend() == 'tpu', 'requires a TPU'
ctx = dict(n_grid=70, nt=100, dx=10.0, dt=0.001, nbc=120, f=15.0,
           sz=10, gz=10, ng=70, ns=5)
geom = Geometry.from_ctx(ctx)
rng = np.random.RandomState(0)
v = jnp.asarray(1500 + 3000 * rng.rand(2, 1, 310, 310), jnp.float32)
sx = forward_modeling(v, geom, chunk=20, backend='xla')
sp = forward_modeling(v, geom, chunk=20, backend='pallas')
np.testing.assert_allclose(np.asarray(sp), np.asarray(sx), rtol=1e-5,
                           atol=1e-5)
gx = jax.grad(lambda v: jnp.sum(
    forward_modeling(v, geom, chunk=20, backend='xla') ** 2))(v)
gp = jax.grad(lambda v: jnp.sum(
    forward_modeling(v, geom, chunk=20, backend='pallas') ** 2))(v)
scale = float(jnp.max(jnp.abs(gx))) + 1e-30
err = float(jnp.max(jnp.abs(gp - gx))) / scale
assert err < 1e-4, err
print(f'TPU parity OK (grad max rel err {err:.2e})')
