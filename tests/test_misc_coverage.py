"""Coverage for less-traveled API surfaces: sampler variants, seed
context, config helpers, bf16 denoiser, interpolate."""
import io
import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from red_diffeq_tpu.config import get_config, get_marmousi_config, \
    print_config, update_config
from red_diffeq_tpu.models.diffusion import GaussianDiffusion
from red_diffeq_tpu.models.unet import Unet
from red_diffeq_tpu.utils.seed_utils import (
    SeedContext, get_rng_state, next_key, set_rng_state, set_seed,
)


@pytest.fixture(scope='module')
def tiny():
    model = Unet(dim=8, dim_mults=(1, 2), channels=1)
    d = GaussianDiffusion(model, image_size=16, timesteps=10,
                          sampling_timesteps=4, objective='pred_noise')
    d.init_params(jax.random.PRNGKey(0))
    return d


def test_sample_return_all_timesteps(tiny):
    out = tiny.p_sample_loop((1, 1, 16, 16), jax.random.PRNGKey(0),
                             return_all_timesteps=True)
    assert out.shape == (1, 11, 1, 16, 16)  # init + 10 steps
    out2 = tiny.ddim_sample((1, 1, 16, 16), jax.random.PRNGKey(0),
                            return_all_timesteps=True)
    assert out2.shape == (1, 5, 1, 16, 16)  # init + 4 ddim steps


def test_interpolate(tiny):
    x1 = jnp.zeros((1, 1, 16, 16))
    x2 = jnp.ones((1, 1, 16, 16))
    out = tiny.interpolate(x1, x2, jax.random.PRNGKey(1), t=5, lam=0.3)
    assert out.shape == x1.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_bf16_apply(tiny):
    d16 = tiny.with_params(tiny.params)
    d16.half_precision = True
    x = jnp.zeros((1, 1, 16, 16))
    out = d16.apply_fn(x, jnp.array([3.0]))
    assert out.dtype == jnp.float32
    out32 = tiny.apply_fn(x, jnp.array([3.0]))
    # bf16 forward stays close to fp32
    denom = float(jnp.max(jnp.abs(out32))) + 1e-9
    assert float(jnp.max(jnp.abs(out - out32))) / denom < 0.1


def test_objectives_pred_x0_and_v():
    model = Unet(dim=8, dim_mults=(1, 2), channels=1)
    for obj in ('pred_x0', 'pred_v'):
        d = GaussianDiffusion(model, image_size=16, timesteps=8,
                              objective=obj)
        d.init_params(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16, 16))
        pred = d.model_predictions(x, jnp.array([3, 5]), clip_x_start=True)
        assert float(jnp.max(jnp.abs(pred.pred_x_start))) <= 1.0
        loss = d.loss(d.params, (x + 1) / 2, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))


def test_seed_context_restores_state():
    set_seed(1)
    k_before = np.asarray(next_key())
    set_seed(1)
    with SeedContext(999):
        inner = np.asarray(next_key())
    # state restored: the next key matches the pre-context stream
    after = np.asarray(next_key())
    np.testing.assert_array_equal(after, k_before)
    assert not np.array_equal(inner, k_before)


def test_rng_state_roundtrip():
    set_seed(3)
    state = get_rng_state()
    a = np.asarray(next_key())
    set_rng_state(state)
    b = np.asarray(next_key())
    np.testing.assert_array_equal(a, b)


def test_config_helpers():
    cfg = get_config()
    update_config(cfg.optimization, lr=0.5)
    assert cfg.optimization.lr == 0.5
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        print_config(cfg)
    text = buf.getvalue()
    assert 'pde:' in text and 'n_grid: 70' in text
    marm = get_marmousi_config()
    assert 'Marmousi' in marm.data.seismic_data_dir


def test_bf16_distinguishes_adjacent_timesteps(tiny):
    """bf16's 8-bit mantissa quantizes integers >512 to multiples of 4;
    the timestep must therefore reach the sinusoidal embedding in fp32
    even when the U-Net runs in bf16 (ADVICE r1). With a 10-step schedule
    we still exercise the cast path: t=999 vs t=998 must not collapse."""
    d16 = tiny.with_params(tiny.params)
    d16.half_precision = True
    x = jnp.ones((1, 1, 16, 16)) * 0.1
    out_a = d16.apply_fn(x, jnp.array([999.0]))
    out_b = d16.apply_fn(x, jnp.array([998.0]))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_family_alias_resolution(tmp_path):
    """--families accepts both the reference's '_b'-suffixed names and
    the unsuffixed names red-diffeq-datagen emits, against either file
    layout (README/datagen naming mismatch, VERDICT r2 #6)."""
    from red_diffeq_tpu.cli.diffusion_train import load_velocity_datasets

    d = tmp_path / 'vel'
    d.mkdir()
    arr = np.zeros((10, 1, 4, 4), np.float32)
    np.save(d / 'CurveVel.npy', arr)
    np.save(d / 'FlatFault_b.npy', arr + 1)
    for fams, expect in [(['CurveVel'], 0.0), (['CurveVel_b'], 0.0),
                         (['FlatFault'], 1.0), (['FlatFault_b'], 1.0)]:
        tr, va = load_velocity_datasets(d, fams)
        assert len(tr) == 9 and len(va) == 1, fams
        assert float(tr[0].max()) == expect, fams
    tr, _ = load_velocity_datasets(d, ['CurveVel_b', 'FlatFault'])
    assert len(tr) == 18


def test_persistent_cache_respects_user_threshold(tmp_path, monkeypatch):
    """enable_persistent_cache must not clobber a user-set
    JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS (advisor finding r2)."""
    import jax

    from red_diffeq_tpu.utils.cache import enable_persistent_cache

    monkeypatch.setenv('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '7')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 7.0)
    enable_persistent_cache(str(tmp_path / 'c1'))
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 7.0

    monkeypatch.delenv('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS')
    enable_persistent_cache(str(tmp_path / 'c2'))
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.5


def test_p_losses_runs_model_at_param_dtype(tiny):
    """Mixed precision: with bf16 params the denoiser input is cast to
    bf16 (the fp32 q_sample constants would otherwise promote the whole
    forward to fp32, silently defeating amp), and the returned loss is
    still finite fp32 math."""
    params16 = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        tiny.params)
    batch = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 16, 16))
    loss16 = tiny.loss(params16, batch, jax.random.PRNGKey(3))
    loss32 = tiny.loss(tiny.params, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss16)) and np.isfinite(float(loss32))
    # same noise draw → bf16 loss tracks fp32 loss closely
    assert abs(float(loss16) - float(loss32)) / (float(loss32) + 1e-9) < 0.15
    # gradients w.r.t. bf16 params exist and are finite (trainer amp path
    # keeps fp32 masters; this guards the cast itself from NaN blowups)
    g = jax.grad(lambda p: tiny.loss(p, batch, jax.random.PRNGKey(3)).astype(
        jnp.float32))(params16)
    assert all(np.all(np.isfinite(np.asarray(x, dtype=np.float32)))
               for x in jax.tree_util.tree_leaves(g))


def test_load_diffusion_params_accepts_trainer_state(tiny, tmp_path):
    """load_diffusion_params must accept both a bare param tree and a
    trainer milestone checkpoint (full state dict) — taking the EMA
    weights from the latter (reference models/diffusion.py:617-625)."""
    from flax import serialization
    from red_diffeq_tpu.io.checkpoints import (
        load_diffusion_params, save_params,
    )

    ema = jax.tree.map(lambda p: p + 1.0, tiny.params)
    state = {'step': 7, 'params': tiny.params, 'ema_params': ema,
             'version': '0.1.0'}
    ckpt = tmp_path / 'model-1.ckpt'
    ckpt.write_bytes(serialization.to_bytes(state))

    d = tiny.with_params(None)
    d.params = None
    load_diffusion_params(d, str(ckpt), verbose=False)
    leaf = jax.tree_util.tree_leaves(d.params)[0]
    ref = jax.tree_util.tree_leaves(ema)[0]
    np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref))

    # bare param tree still loads, and save_params leaves no .tmp residue
    bare = tmp_path / 'ema.ckpt'
    save_params(tiny.params, bare)
    assert list(tmp_path.glob('*.tmp')) == []
    d2 = tiny.with_params(None)
    d2.params = None
    load_diffusion_params(d2, str(bare), verbose=False)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(d2.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(tiny.params)[0]))
