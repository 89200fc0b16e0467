"""Diffusion model tests: schedule identities, U-Net shapes, sampling,
RED regularization semantics (SURVEY.md §4 layer 3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from red_diffeq_tpu.models.diffusion import (
    DiffusionSchedule, GaussianDiffusion, cosine_beta_schedule,
    linear_beta_schedule, sigmoid_beta_schedule,
)
from red_diffeq_tpu.models.unet import Unet
from red_diffeq_tpu.regularization.red import (
    RED_DiffEq, RED_DiffEq_POST_PROCESS, calculate_patches, make_red_reg_fn,
)


@pytest.fixture(scope='module')
def tiny_diffusion():
    model = Unet(dim=8, dim_mults=(1, 2), channels=1)
    d = GaussianDiffusion(model, image_size=16, timesteps=20,
                          sampling_timesteps=5, objective='pred_noise')
    d.init_params(jax.random.PRNGKey(0))
    return d


def test_beta_schedules_monotone_bounded():
    for fn in (linear_beta_schedule, cosine_beta_schedule,
               sigmoid_beta_schedule):
        betas = fn(100)
        assert betas.shape == (100,)
        assert np.all(betas > 0) and np.all(betas <= 0.999)
    # sigmoid (the default) increases monotonically
    b = sigmoid_beta_schedule(1000)
    assert np.all(np.diff(b) >= -1e-12)


def test_schedule_identities():
    s = DiffusionSchedule.create(50, 'sigmoid', 'pred_noise')
    ac = np.asarray(s.alphas_cumprod)
    np.testing.assert_allclose(np.asarray(s.sqrt_alphas_cumprod) ** 2, ac,
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_one_minus_alphas_cumprod) ** 2, 1 - ac, rtol=1e-5)
    # posterior mean coefficients sum to ~1 scaled: coef1*sqrt(ac_prev-part)
    # check q_posterior variance formula directly
    betas = np.asarray(s.betas)
    acp = np.asarray(s.alphas_cumprod_prev)
    np.testing.assert_allclose(np.asarray(s.posterior_variance),
                               betas * (1 - acp) / (1 - ac), rtol=1e-4)
    # pred_noise objective -> unit loss weight
    np.testing.assert_allclose(np.asarray(s.loss_weight), 1.0, rtol=1e-5)


def test_q_sample_roundtrip(tiny_diffusion):
    d = tiny_diffusion
    key = jax.random.PRNGKey(1)
    x0 = jax.random.uniform(key, (3, 1, 16, 16)) * 2 - 1
    t = jnp.array([0, 10, 19])
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    x_t = d.q_sample(x0, t, noise=noise)
    x0_rec = d.predict_start_from_noise(x_t, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=2e-3)
    noise_rec = d.predict_noise_from_start(x_t, t, x0)
    np.testing.assert_allclose(np.asarray(noise_rec), np.asarray(noise),
                               atol=2e-3)
    # v-parameterization round trip
    v = d.predict_v(x0, t, noise)
    x0_from_v = d.predict_start_from_v(x_t, t, v)
    np.testing.assert_allclose(np.asarray(x0_from_v), np.asarray(x0),
                               atol=2e-3)


def test_unet_shapes_and_divisibility():
    model = Unet(dim=8, dim_mults=(1, 2), channels=1)
    x = jnp.zeros((2, 1, 16, 16))
    t = jnp.array([1.0, 5.0])
    params = model.init(jax.random.PRNGKey(0), x, t)['params']
    out = model.apply({'params': params}, x, t)
    assert out.shape == (2, 1, 16, 16)
    with pytest.raises(AssertionError, match='divide'):
        model.apply({'params': params}, jnp.zeros((1, 1, 15, 15)),
                    jnp.array([0.0]))


def test_unet_full_config_params():
    """Flagship config must instantiate with the expected parameter count
    (~35.7M, matching the reference Unet(dim=64, mults 1/2/4/8, ch=1))."""
    model = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1)
    x = jnp.zeros((1, 1, 72, 72))
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, jnp.array([0.0])))
    n = sum(int(np.prod(v.shape)) for v in
            jax.tree.leaves(params['params']))
    assert 34e6 < n < 38e6, f'param count {n}'


def test_model_predictions_clipping(tiny_diffusion):
    d = tiny_diffusion
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 16, 16)) * 5
    t = jnp.array([15, 15])
    pred = d.model_predictions(x, t, clip_x_start=True,
                               rederive_pred_noise=True)
    assert float(jnp.max(pred.pred_x_start)) <= 1.0
    assert float(jnp.min(pred.pred_x_start)) >= -1.0
    # rederived noise is consistent with the clipped x_start
    x0_back = d.predict_start_from_noise(x, t, pred.pred_noise)
    np.testing.assert_allclose(np.asarray(x0_back),
                               np.asarray(pred.pred_x_start), atol=1e-3)


def test_sampling_shapes(tiny_diffusion):
    d = tiny_diffusion
    out = d.p_sample_loop((2, 1, 16, 16), jax.random.PRNGKey(4))
    assert out.shape == (2, 1, 16, 16)
    assert np.all(np.isfinite(np.asarray(out)))
    out_ddim = d.ddim_sample((2, 1, 16, 16), jax.random.PRNGKey(5))
    assert out_ddim.shape == (2, 1, 16, 16)
    # sample() dispatches to ddim (sampling_timesteps < timesteps)
    out2 = d.sample(batch_size=1, key=jax.random.PRNGKey(6))
    assert out2.shape == (1, 1, 16, 16)


def test_training_loss(tiny_diffusion):
    d = tiny_diffusion
    img = jax.random.uniform(jax.random.PRNGKey(7), (4, 1, 16, 16))
    loss = d.loss(d.params, img, jax.random.PRNGKey(8))
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = jax.grad(lambda p: d.loss(p, img, jax.random.PRNGKey(8)))(d.params)
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(norms)) and max(norms) > 0


def test_calculate_patches_marmousi_layout():
    positions, overlaps = calculate_patches(190, 70)
    assert positions == [(0, 70), (60, 130), (120, 190)]
    assert overlaps == [10, 10]
    positions, overlaps = calculate_patches(70, 70)
    assert positions == [(0, 70)] and overlaps == []


def test_red_reg_linearity(tiny_diffusion):
    """The RED loss is linear in mu: its gradient equals the (detached)
    score field / N, independent of mu."""
    d = tiny_diffusion
    red = RED_DiffEq(d)
    key = jax.random.PRNGKey(9)
    mu = jax.random.uniform(jax.random.PRNGKey(10), (2, 1, 16, 16)) * 2 - 1

    reg, grad_field_mean, t = red.get_reg_loss(mu, key)
    assert reg.shape == (2,) and t.shape == (2,)
    assert np.all(np.asarray(t) < d.num_timesteps)

    g = jax.grad(lambda m: red.get_reg_loss(m, key)[0].sum())(mu)
    # gradient of mean(field * mu) w.r.t. mu = field / N -> mean equals
    # the returned gradient_per_model / N * N = mean(field)
    np.testing.assert_allclose(np.asarray(g.mean(axis=(1, 2, 3))),
                               np.asarray(grad_field_mean) / 1.0
                               / (16 * 16) * (16 * 16) / (16 * 16),
                               rtol=1e-4, atol=1e-6)


def test_red_reg_time_weight(tiny_diffusion):
    d = tiny_diffusion
    red_w = RED_DiffEq(d, use_time_weight=True, fixed_timestep=5)
    mu = jnp.zeros((1, 1, 16, 16))
    reg, _, t = red_w.get_reg_loss(mu, jax.random.PRNGKey(11))
    assert np.all(np.asarray(t) < 5)
    assert np.isfinite(float(reg[0]))


def test_red_patched_matches_single_when_square(tiny_diffusion):
    """For a square (input_size) model the dispatcher takes the unpatched
    path; the patched math on a 1-window layout must agree."""
    d = tiny_diffusion
    fn = make_red_reg_fn(d)
    mu = jax.random.uniform(jax.random.PRNGKey(12), (2, 1, 16, 16)) * 2 - 1
    reg, t = fn(mu, jax.random.PRNGKey(13))
    assert reg.shape == (2,)


def test_red_patched_wide_model(tiny_diffusion):
    """Wide (padded 16x44 -> cropped 14x42) model goes down the patched
    path: k=3 windows of 14, blended overlap weights."""
    d = tiny_diffusion
    red = RED_DiffEq(d)
    mu = jax.random.uniform(jax.random.PRNGKey(14), (2, 1, 16, 44)) * 2 - 1
    reg, gfm, t = red.get_reg_loss_patched(mu, jax.random.PRNGKey(15))
    assert reg.shape == (2,) and np.all(np.isfinite(np.asarray(reg)))
    # dispatcher routes wide inputs to the patched variant
    fn = make_red_reg_fn(d)
    reg2, t2 = fn(mu, jax.random.PRNGKey(15))
    np.testing.assert_allclose(np.asarray(reg2), np.asarray(reg), rtol=1e-5)


def test_post_process_denoise(tiny_diffusion):
    d = tiny_diffusion
    pp = RED_DiffEq_POST_PROCESS(d)
    mu = jax.random.uniform(jax.random.PRNGKey(16), (1, 1, 16, 16)) * 2 - 1
    out = pp.diffusion_denoise(mu, 5, jax.random.PRNGKey(17))
    assert out.shape == mu.shape
    assert np.all(np.isfinite(np.asarray(out)))
    with pytest.raises(ValueError, match='exceeds'):
        pp.diffusion_denoise(mu, 100, jax.random.PRNGKey(18))
