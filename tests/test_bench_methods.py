"""Bench-method tests: filters vs scipy oracles, matrix resizer
properties, patch split/merge, and end-to-end DiffusionFWI / ILVR-FWI
runs on a tiny problem."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

from red_diffeq_tpu.bench_methods.diffusion_fwi import (
    DiffusionFWI, merge_patches_to_data, split_data_to_patches,
)
from red_diffeq_tpu.bench_methods.filters import (
    clip_total_norm, gaussian_blur_3x3, gaussian_smooth,
)
from red_diffeq_tpu.bench_methods.ilvr_fwi import ILVR_FWI
from red_diffeq_tpu.bench_methods.resizer import Resizer, resize_matrix
from red_diffeq_tpu.models.diffusion import GaussianDiffusion
from red_diffeq_tpu.models.unet import Unet
from red_diffeq_tpu.solvers.acoustic import FWIForward
from red_diffeq_tpu.utils.data_trans import v_denormalize, v_normalize


def test_gaussian_smooth_matches_scipy():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 1, 20, 24).astype(np.float32)
    for sigma in (0.8, 2.0):
        ours = np.asarray(gaussian_smooth(jnp.asarray(x), sigma))
        ref = gaussian_filter(x, sigma=[0, 0, sigma, sigma])
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_gaussian_blur_3x3_matches_reflect_conv():
    rng = np.random.RandomState(1)
    x = rng.rand(1, 1, 8, 9).astype(np.float32)
    ours = np.asarray(gaussian_blur_3x3(jnp.asarray(x), sigma=0.4))
    # independent numpy oracle: 3x3 separable gaussian, reflect padding
    g = np.exp(-0.5 * (np.array([-1, 0, 1]) / 0.4) ** 2)
    g /= g.sum()
    k = np.outer(g, g)
    pad = np.pad(x[0, 0], 1, mode='reflect')
    ref = np.zeros_like(x[0, 0])
    for i in range(x.shape[2]):
        for j in range(x.shape[3]):
            ref[i, j] = np.sum(pad[i:i + 3, j:j + 3] * k)
    np.testing.assert_allclose(ours[0, 0], ref, rtol=1e-5, atol=1e-6)


def test_clip_total_norm():
    g = jnp.ones((2, 8)) * 3.0
    clipped = clip_total_norm(g, jnp.float32(1.0))
    assert float(jnp.linalg.norm(clipped.reshape(-1))) == pytest.approx(
        1.0, rel=1e-4)
    small = jnp.ones((4,)) * 0.1
    np.testing.assert_allclose(np.asarray(clip_total_norm(small, 10.0)),
                               np.asarray(small))


def test_resize_matrix_properties():
    for kernel in ('cubic', 'lanczos2', 'lanczos3', 'box', 'linear'):
        m = resize_matrix(64, 16, 0.25, kernel=kernel)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)
    # constant image stays constant under down+up
    x = jnp.full((1, 1, 64, 64), 3.14)
    down = Resizer((1, 1, 64, 64), 1 / 8)
    up = Resizer((1, 1, *down.out_hw), output_shape=(64, 64))
    y = up(down(x))
    np.testing.assert_allclose(np.asarray(y), 3.14, rtol=1e-4)
    # low-pass: ramp is preserved closely, high-freq noise is attenuated
    ramp = jnp.broadcast_to(jnp.linspace(0, 1, 64), (64, 64))[None, None]
    lp_ramp = up(down(ramp))
    interior = np.asarray(lp_ramp)[0, 0, 8:-8, 8:-8]
    np.testing.assert_allclose(interior,
                               np.asarray(ramp)[0, 0, 8:-8, 8:-8],
                               atol=0.02)
    rng = np.random.RandomState(0)
    noise = jnp.asarray(rng.randn(1, 1, 64, 64).astype(np.float32))
    assert float(jnp.std(up(down(noise)))) < 0.4 * float(jnp.std(noise))


def test_patch_split_merge_roundtrip():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 1, 16, 44).astype(np.float32))
    patches = split_data_to_patches(x, (16, 16), (1, 14))
    assert patches.shape == (3, 1, 16, 16)
    merged = merge_patches_to_data(patches, (16, 44), (16, 16), (1, 14))
    np.testing.assert_allclose(np.asarray(merged), np.asarray(x),
                               rtol=1e-5, atol=1e-6)


def test_patch_split_merge_roundtrip_batched():
    # The reference merge hardcodes batch 1 (diffusionfwi.py:46-76);
    # ours must round-trip a real batch without collapsing it.
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(3, 1, 16, 44).astype(np.float32))
    patches = split_data_to_patches(x, (16, 16), (1, 14))
    assert patches.shape == (9, 1, 16, 16)
    merged = merge_patches_to_data(patches, (16, 44), (16, 16), (1, 14))
    assert merged.shape == x.shape
    np.testing.assert_allclose(np.asarray(merged), np.asarray(x),
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError):
        merge_patches_to_data(patches[:4], (16, 44), (16, 16), (1, 14))


@pytest.fixture(scope='module')
def tiny_setup():
    n, nt, ns, nbc = 16, 50, 2, 8
    ctx = dict(n_grid=n, nt=nt, dx=10.0, dt=0.001, nbc=nbc, f=15.0,
               sz=10, gz=10, ng=n, ns=ns)
    op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                    s_norm_func=lambda s: s, backend='xla', chunk=10)
    model = Unet(dim=8, dim_mults=(1, 2), channels=1)
    diffusion = GaussianDiffusion(model, image_size=18, timesteps=12,
                                  objective='pred_noise')
    diffusion.init_params(jax.random.PRNGKey(0))
    v_true = np.full((1, 1, n, n), 2000.0, np.float32)
    v_true[:, :, n // 2:, :] = 3000.0
    y = op(v_normalize(jnp.asarray(v_true)))
    mu0 = v_normalize(jnp.full((1, 1, n, n), 2400.0))  # NOT padded
    return op, diffusion, jnp.asarray(v_true), y, mu0


def test_diffusionfwi_end_to_end(tiny_setup):
    op, diffusion, v_true, y, mu0 = tiny_setup
    bench = DiffusionFWI(diffusion, op)
    mu, per_model = bench.optimize(
        mu0, v_true, y, op, ts=4, diffusion_ts=5, lr=0.05,
        grad_norm=True, grad_smooth=1.0, model_blur=True, grad_clip=1.1,
        key=jax.random.PRNGKey(0), progress=False)
    assert mu.shape == mu0.shape
    curves = per_model[0]
    assert len(curves['ssim']) == 5
    for k in ('total_losses', 'obs_losses', 'ssim', 'mae', 'rmse'):
        assert np.all(np.isfinite(np.asarray(curves[k]))), k


def test_diffusionfwi_validation(tiny_setup):
    op, diffusion, v_true, y, mu0 = tiny_setup
    bench = DiffusionFWI(diffusion, op)
    with pytest.raises(ValueError, match='Batch size mismatch'):
        bench.optimize(jnp.concatenate([mu0, mu0]), v_true, y, op,
                       ts=1, diffusion_ts=1)
    with pytest.raises(ValueError, match='callable'):
        bench.optimize(mu0, v_true, y, None, ts=1, diffusion_ts=1)


def test_ilvr_fwi_end_to_end(tiny_setup):
    op, diffusion, v_true, y, mu0 = tiny_setup
    bench = ILVR_FWI(diffusion, op)
    mu, per_model = bench.optimize(
        mu0, v_true, y, op, ts=3, diffusion_ts=4, lr=0.05,
        use_ilvr=True, ilvr_weight=0.1, ilvr_down_schedule='linear',
        key=jax.random.PRNGKey(1), progress=False)
    assert mu.shape == mu0.shape
    assert np.all(np.isfinite(np.asarray(per_model[0]['ssim'])))
    assert len(bench.down_n) == 4 and bench.down_n[0] == 16 \
        and bench.down_n[-1] == 2


def test_ilvr_stepwise_schedule(tiny_setup):
    op, diffusion, v_true, y, mu0 = tiny_setup
    bench = ILVR_FWI(diffusion, op)
    mu, _ = bench.optimize(
        mu0, v_true, y, op, ts=2, diffusion_ts=4, lr=0.05,
        use_ilvr=True, ilvr_down_schedule='stepwise',
        key=jax.random.PRNGKey(2), progress=False)
    assert list(bench.down_n) == [32, 16, 8, 4]
    with pytest.raises(ValueError, match='Unknown ilvr_down_schedule'):
        bench.optimize(mu0, v_true, y, op, ts=1, diffusion_ts=2,
                       ilvr_down_schedule='bogus')


def test_diffusionfwi_patched(tiny_setup):
    """Wide model goes through the patch-resize-denoise path."""
    op16, diffusion, _, _, _ = tiny_setup
    n, w = 16, 44
    ctx = dict(n_grid=n, nt=40, dx=10.0, dt=0.001, nbc=8, f=15.0,
               sz=10, gz=10, ng=w, ns=2)
    # wide physics: n_grid sets H; receivers span gx over W
    ctx['gx'] = list(range(w))
    ctx['sx'] = [5, 38]
    op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                    s_norm_func=lambda s: s, backend='xla', chunk=10)
    v_true = np.full((1, 1, n, w), 2500.0, np.float32)
    # pad velocity manually: forward op pads replicate internally
    y = op(v_normalize(jnp.asarray(v_true)))
    mu0 = v_normalize(jnp.full((1, 1, n, w), 2300.0))
    bench = DiffusionFWI(diffusion, op)
    mu, per_model = bench.optimize(
        mu0, jnp.asarray(v_true), y, op, ts=2, diffusion_ts=2, lr=0.05,
        use_patches=True, patch_kernel_size=[16, 16], patch_stride=[1, 14],
        key=jax.random.PRNGKey(3), progress=False)
    assert mu.shape == (1, 1, n, w)
    assert np.all(np.isfinite(np.asarray(per_model[0]['mae'])))


def test_ilvr_down_schedule():
    """Reference ilvr_fwi.py:92-103 semantics, incl. the tiny-diffusion_ts
    padding case (ADVICE r1)."""
    from red_diffeq_tpu.bench_methods.ilvr_fwi import ilvr_down_schedule

    lin = ilvr_down_schedule('linear', 5)
    assert list(lin) == [16, 12, 9, 5, 2]
    assert list(ilvr_down_schedule('stepwise', 8)) == [32, 32, 16, 16,
                                                       8, 8, 4, 4]
    assert list(ilvr_down_schedule('stepwise', 10)) == [32, 32, 16, 16,
                                                        8, 8, 4, 4, 4, 4]
    # diffusion_ts < len(blocks): pad entirely with the finest factor
    assert list(ilvr_down_schedule('stepwise', 3)) == [4, 4, 4]
    with pytest.raises(ValueError):
        ilvr_down_schedule('nope', 5)
