"""Engine tests: losses, metrics, baseline regularizers, and a seeded
end-to-end mini-inversion on synthetic data (SURVEY.md §4 layer 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from red_diffeq_tpu.core.inversion import InversionEngine
from red_diffeq_tpu.core.losses import observation_loss, total_loss
from red_diffeq_tpu.core.metrics import calculate_metrics
from red_diffeq_tpu.regularization.benchmark import (
    tikhonov_loss, total_variation_loss,
)
from red_diffeq_tpu.solvers.acoustic import FWIForward
from red_diffeq_tpu.utils.data_trans import v_denormalize, v_normalize


def test_observation_loss_masked():
    pred = jnp.zeros((2, 1, 4, 4))
    target = jnp.ones((2, 1, 4, 4))
    assert np.allclose(observation_loss(pred, target), [1.0, 1.0])
    mask = jnp.zeros((2, 1, 4, 4)).at[:, :, :, :2].set(1.0)
    target2 = target.at[:, :, :, 2:].set(100.0)  # masked-out region ignored
    assert np.allclose(observation_loss(pred, target2, mask), [1.0, 1.0])


def test_total_loss():
    assert np.allclose(total_loss(jnp.array([1.0]), jnp.array([2.0]), 0.5), [2.0])


def test_tv_tikhonov_analytic():
    # linear ramp in x: |d/dx| = 1 everywhere, d/dy = 0
    ramp = jnp.broadcast_to(jnp.arange(4.0), (1, 1, 4, 4))[None][0]
    ramp = ramp.reshape(1, 1, 4, 4)
    assert float(total_variation_loss(ramp)[0]) == pytest.approx(1.0)
    assert float(tikhonov_loss(ramp)[0]) == pytest.approx(1.0)
    flat = jnp.full((3, 1, 5, 5), 2.0)
    assert np.allclose(total_variation_loss(flat), 0.0)
    assert np.allclose(tikhonov_loss(flat), 0.0)


def test_metrics_identity_and_offset():
    truth = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 16, 16)) * 2 - 1
    mae, rmse, s = calculate_metrics(truth, truth)
    assert np.allclose(mae, 0.0, atol=1e-6)
    assert np.allclose(rmse, 0.0, atol=1e-6)
    assert np.allclose(s, 1.0, atol=1e-4)
    mae2, rmse2, s2 = calculate_metrics(jnp.clip(truth + 0.2, -1, 1), truth)
    assert np.all(np.asarray(mae2) > 0.1)
    assert np.all(np.asarray(s2) < 1.0)


def _mini_problem(ns=2, nt=60, n=16, nbc=8):
    ctx = dict(n_grid=n, nt=nt, dx=10.0, dt=0.001, nbc=nbc, f=15.0,
               sz=10, gz=10, ng=n, ns=ns)
    op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                    s_norm_func=lambda s: s, backend='xla', chunk=10)
    rng = np.random.RandomState(0)
    v_true = np.full((1, 1, n, n), 2000.0, np.float32)
    v_true[:, :, n // 2:, :] = 3000.0
    y = op(v_normalize(jnp.asarray(v_true)))
    # smooth initial guess (homogeneous 2400)
    v_init = v_normalize(np.full((1, 1, n, n), 2400.0, np.float32))
    mu0 = jnp.pad(jnp.asarray(v_init), ((0, 0), (0, 0), (1, 1), (1, 1)))
    return op, jnp.asarray(v_true), y, mu0


@pytest.mark.parametrize('use_scan', [True, False])
def test_end_to_end_plain_fwi(use_scan):
    """Plain FWI (no regularization) must reduce MAE on a two-layer model."""
    op, v_true, y, mu0 = _mini_problem()
    engine = InversionEngine(regularization=None)
    mu, per_model = engine.optimize(
        mu0, v_true, y, op, ts=30, lr=0.05, reg_lambda=0.0,
        key=jax.random.PRNGKey(8888), use_scan=use_scan, progress=False)
    assert mu.shape == (1, 1, 16, 16)
    curves = per_model[0]
    assert len(curves['mae']) == 30
    assert curves['mae'][-1] < curves['mae'][0] * 0.9
    assert curves['obs_losses'][-1] < curves['obs_losses'][0] * 0.5
    assert np.allclose(curves['reg_losses'], 0.0)


def test_end_to_end_tv_regularized():
    op, v_true, y, mu0 = _mini_problem()
    engine = InversionEngine(regularization='tv')
    mu, per_model = engine.optimize(
        mu0, v_true, y, op, ts=20, lr=0.05, reg_lambda=0.1,
        key=jax.random.PRNGKey(1), progress=False)
    curves = per_model[0]
    assert curves['mae'][-1] < curves['mae'][0]
    assert all(r > 0 for r in curves['reg_losses'])


def test_scan_and_python_loop_agree():
    op, v_true, y, mu0 = _mini_problem()
    engine = InversionEngine(regularization=None)
    mu_a, pm_a = engine.optimize(mu0, v_true, y, op, ts=5, lr=0.05,
                                 key=jax.random.PRNGKey(3), use_scan=True,
                                 progress=False)
    mu_b, pm_b = engine.optimize(mu0, v_true, y, op, ts=5, lr=0.05,
                                 key=jax.random.PRNGKey(3), use_scan=False,
                                 progress=False)
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_b), atol=1e-6)
    np.testing.assert_allclose(pm_a[0]['mae'], pm_b[0]['mae'], atol=1e-6)


def test_segmented_scan_matches_single_dispatch():
    """segment_steps changes only dispatch granularity: same step keys,
    same per-step math, so mu and every metric curve must match the
    single-dispatch scan (incl. a ragged last segment) to within a ULP —
    the segmented program compiles separately, so XLA fusion can differ
    by one rounding (observed max 3e-8), but nothing more."""
    op, v_true, y, mu0 = _mini_problem()
    engine = InversionEngine(regularization=None)
    mu_a, pm_a = engine.optimize(mu0, v_true, y, op, ts=7, lr=0.05,
                                 key=jax.random.PRNGKey(3), use_scan=True,
                                 progress=False)
    mu_b, pm_b = engine.optimize(mu0, v_true, y, op, ts=7, lr=0.05,
                                 key=jax.random.PRNGKey(3), use_scan=True,
                                 progress=False, segment_steps=3)
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_b),
                               atol=1e-6, rtol=1e-5)
    assert len(pm_b[0]['mae']) == 7
    np.testing.assert_allclose(pm_a[0]['mae'], pm_b[0]['mae'],
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(pm_a[0]['total_losses'],
                               pm_b[0]['total_losses'],
                               atol=1e-6, rtol=1e-5)


def test_validation_errors():
    op, v_true, y, mu0 = _mini_problem()
    engine = InversionEngine(regularization=None)
    with pytest.raises(ValueError, match='Batch size mismatch'):
        engine.optimize(jnp.concatenate([mu0, mu0]), v_true, y, op, ts=1)
    with pytest.raises(ValueError, match='Unknown regularization'):
        engine.optimize(mu0, v_true, y, op, ts=1, regularization='bogus')
    with pytest.raises(ValueError, match='callable'):
        engine.optimize(mu0, v_true, y, None, ts=1)


def test_checkpoint_resume(tmp_path):
    """Segmented checkpointing resumes to bit-identical results."""
    op, v_true, y, mu0 = _mini_problem()
    ck = tmp_path / 'inv.ckpt'
    engine = InversionEngine(regularization=None)
    mu_full, pm_full = engine.optimize(
        mu0, v_true, y, op, ts=12, lr=0.05, key=jax.random.PRNGKey(5),
        progress=False)

    # run only the first 8 steps (interrupt by truncating segments)
    engine2 = InversionEngine(regularization=None)
    engine2.optimize(mu0, v_true, y, op, ts=8, lr=0.05,
                     key=jax.random.PRNGKey(5), progress=False,
                     checkpoint_path=str(ck), checkpoint_every=4)
    assert ck.exists()

    # resume with the full ts: continues from step 8. NOTE: the optimizer
    # schedule is keyed on ts, so resume must use the same total ts as the
    # target run for identical trajectories; here both segments and the
    # monolithic run use lr schedules over their own ts, so compare a
    # segmented-from-scratch run against the monolithic one instead.
    engine3 = InversionEngine(regularization=None)
    mu_seg, pm_seg = engine3.optimize(
        mu0, v_true, y, op, ts=12, lr=0.05, key=jax.random.PRNGKey(5),
        progress=False, checkpoint_path=str(tmp_path / 'inv2.ckpt'),
        checkpoint_every=5)
    np.testing.assert_allclose(np.asarray(mu_seg), np.asarray(mu_full),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(pm_seg[0]['mae'], pm_full[0]['mae'],
                               atol=1e-6)

    # true resume path: re-run ts=12 with resume from the 8-step snapshot
    # of a ts=12-scheduled run
    ck3 = tmp_path / 'inv3.ckpt'
    engine4 = InversionEngine(regularization=None)
    engine4.optimize(mu0, v_true, y, op, ts=12, lr=0.05,
                     key=jax.random.PRNGKey(5), progress=False,
                     checkpoint_path=str(ck3), checkpoint_every=4)
    engine5 = InversionEngine(regularization=None)
    mu_res, pm_res = engine5.optimize(
        mu0, v_true, y, op, ts=12, lr=0.05, key=jax.random.PRNGKey(5),
        progress=False, checkpoint_path=str(ck3), checkpoint_every=4,
        resume=True)
    # resume=True with a complete checkpoint is a no-op replay
    np.testing.assert_allclose(np.asarray(mu_res), np.asarray(mu_full),
                               rtol=1e-5, atol=1e-6)
    assert len(pm_res[0]['mae']) == 12


def test_program_cache_distinguishes_operators():
    """Two operators with different physics must never share a compiled
    program (round-1 cache keyed on id(fwi_forward) could alias after GC);
    equal-geometry operators legitimately share one."""
    op_a, v_true, y_a, mu0 = _mini_problem(nt=40)
    engine = InversionEngine(regularization=None)
    engine.optimize(mu0, v_true, y_a, op_a, ts=2, lr=0.05,
                    key=jax.random.PRNGKey(0), progress=False)
    assert len(engine._program_cache) == 1

    # different dt -> different physics -> new cache entry
    ctx_b = dict(n_grid=16, nt=40, dx=10.0, dt=0.0008, nbc=8, f=15.0,
                 sz=10, gz=10, ng=16, ns=2)
    op_b = FWIForward(ctx_b, normalize=True, v_denorm_func=v_denormalize,
                      s_norm_func=lambda s: s, backend='xla', chunk=10)
    engine.optimize(mu0, v_true, y_a, op_b, ts=2, lr=0.05,
                    key=jax.random.PRNGKey(0), progress=False)
    assert len(engine._program_cache) == 2

    # same geometry rebuilt as a NEW object -> reuses the first entry
    ctx_a = dict(n_grid=16, nt=40, dx=10.0, dt=0.001, nbc=8, f=15.0,
                 sz=10, gz=10, ng=16, ns=2)
    op_a2 = FWIForward(ctx_a, normalize=True, v_denorm_func=v_denormalize,
                       s_norm_func=lambda s: s, backend='xla', chunk=10)
    engine.optimize(mu0, v_true, y_a, op_a2, ts=2, lr=0.05,
                    key=jax.random.PRNGKey(0), progress=False)
    assert len(engine._program_cache) == 2


def test_program_cache_survives_params_swap():
    """U-Net params are a traced program argument, so swapping
    checkpoints between optimize() calls must (a) change the result and
    (b) NOT create a new program-cache entry (no retrace — this is what
    keeps the persistent compile cache valid across milestones)."""
    from red_diffeq_tpu.models.diffusion import GaussianDiffusion
    from red_diffeq_tpu.models.unet import Unet

    op, v_true, y, mu0 = _mini_problem(n=16, nt=40)
    model = Unet(dim=8, dim_mults=(1, 2), channels=1)
    diffusion = GaussianDiffusion(model, image_size=18, timesteps=20,
                                  objective='pred_noise')
    diffusion.init_params(jax.random.PRNGKey(0))
    engine = InversionEngine(diffusion_model=diffusion,
                             regularization='diffusion')
    mu_a, _ = engine.optimize(mu0, v_true, y, op, ts=2, lr=0.05,
                              reg_lambda=1.0, key=jax.random.PRNGKey(3),
                              progress=False)

    n_entries = len(engine._program_cache)
    diffusion.init_params(jax.random.PRNGKey(42))  # swap weights
    mu_b, _ = engine.optimize(mu0, v_true, y, op, ts=2, lr=0.05,
                              reg_lambda=1.0, key=jax.random.PRNGKey(3),
                              progress=False)
    # different prior weights -> different RED score -> different result
    assert not np.allclose(np.asarray(mu_a), np.asarray(mu_b))
    # ... through the SAME compiled program
    assert len(engine._program_cache) == n_entries


def test_warm_compile_matches_dispatch_program():
    """warm_compile() AOT-compiles the exact scan program optimize()
    dispatches: same cache entry, and a subsequent optimize() reuses it
    (no new entry) and produces a normal result."""
    from red_diffeq_tpu.models.diffusion import GaussianDiffusion
    from red_diffeq_tpu.models.unet import Unet

    op, v_true, y, mu0 = _mini_problem(n=16, nt=40)
    model = Unet(dim=8, dim_mults=(1, 2), channels=1)
    diffusion = GaussianDiffusion(model, image_size=18, timesteps=20,
                                  objective='pred_noise')
    diffusion.init_params(jax.random.PRNGKey(0))
    engine = InversionEngine(diffusion_model=diffusion,
                             regularization='diffusion')
    exe = engine.warm_compile(mu0.shape, y.shape, op, ts=2, lr=0.05,
                              reg_lambda=1.0)
    assert exe is not None
    assert len(engine._program_cache) == 1
    mu, pm = engine.optimize(mu0, v_true, y, op, ts=2, lr=0.05,
                             reg_lambda=1.0, key=jax.random.PRNGKey(3),
                             progress=False)
    assert len(engine._program_cache) == 1
    # optimize() after warm_compile dispatches the AOT executable directly
    assert len(engine._aot_cache) == 1
    assert np.all(np.isfinite(np.asarray(mu)))
    assert len(pm[0]['ssim']) == 2
    # ... and it computes the same thing the jit path does
    cold = InversionEngine(diffusion_model=diffusion,
                           regularization='diffusion')
    mu_cold, _ = cold.optimize(mu0, v_true, y, op, ts=2, lr=0.05,
                               reg_lambda=1.0, key=jax.random.PRNGKey(3),
                               progress=False)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_cold),
                               rtol=1e-6, atol=1e-6)


def test_aot_dispatch_falls_back_on_aval_mismatch():
    """An AOT executable is aval-exact; calling optimize() with a typed
    PRNG key (jax.random.key) after a warm_compile done with raw keys
    must fall back to the jit path and still produce the same result
    (round-4 advisor finding: it used to raise TypeError)."""
    from red_diffeq_tpu.models.diffusion import GaussianDiffusion
    from red_diffeq_tpu.models.unet import Unet

    op, v_true, y, mu0 = _mini_problem(n=16, nt=40)
    model = Unet(dim=8, dim_mults=(1, 2), channels=1)
    diffusion = GaussianDiffusion(model, image_size=18, timesteps=20,
                                  objective='pred_noise')
    diffusion.init_params(jax.random.PRNGKey(0))
    engine = InversionEngine(diffusion_model=diffusion,
                             regularization='diffusion')
    engine.warm_compile(mu0.shape, y.shape, op, ts=2, lr=0.05,
                        reg_lambda=1.0)
    assert len(engine._aot_cache) == 1
    mu_typed, _ = engine.optimize(mu0, v_true, y, op, ts=2, lr=0.05,
                                  reg_lambda=1.0, key=jax.random.key(3),
                                  progress=False)
    mu_raw, _ = engine.optimize(mu0, v_true, y, op, ts=2, lr=0.05,
                                reg_lambda=1.0, key=jax.random.PRNGKey(3),
                                progress=False)
    # same seed -> identical bits whichever dispatch path ran
    np.testing.assert_allclose(np.asarray(mu_typed), np.asarray(mu_raw),
                               rtol=1e-6, atol=1e-6)


def test_program_cache_invalidates_on_model_replacement():
    """Replacing engine.diffusion_model WHOLESALE (a new bundle object,
    e.g. a different architecture/schedule) must create a NEW program —
    the cached closure captures the old bundle. A cache hit here would
    silently keep using the old schedule, and with different param
    shapes the traced params argument would be ignored entirely
    (advisor finding r2, core/inversion.py cache_key)."""
    from red_diffeq_tpu.models.diffusion import GaussianDiffusion
    from red_diffeq_tpu.models.unet import Unet

    op, v_true, y, mu0 = _mini_problem(n=16, nt=40)
    model = Unet(dim=8, dim_mults=(1, 2), channels=1)
    diff_a = GaussianDiffusion(model, image_size=18, timesteps=20,
                               objective='pred_noise')
    diff_a.init_params(jax.random.PRNGKey(0))
    engine = InversionEngine(diffusion_model=diff_a,
                             regularization='diffusion')
    mu_a, _ = engine.optimize(mu0, v_true, y, op, ts=2, lr=0.05,
                              reg_lambda=1.0, key=jax.random.PRNGKey(3),
                              progress=False)
    assert len(engine._program_cache) == 1

    # New bundle: different timesteps (schedule) AND different param
    # shapes (dim 16 vs 8) — both would corrupt a stale-program hit.
    model_b = Unet(dim=16, dim_mults=(1, 2), channels=1)
    diff_b = GaussianDiffusion(model_b, image_size=18, timesteps=10,
                               objective='pred_noise')
    diff_b.init_params(jax.random.PRNGKey(1))
    engine.diffusion_model = diff_b
    mu_b, _ = engine.optimize(mu0, v_true, y, op, ts=2, lr=0.05,
                              reg_lambda=1.0, key=jax.random.PRNGKey(3),
                              progress=False)
    assert len(engine._program_cache) == 2
    assert not np.allclose(np.asarray(mu_a), np.asarray(mu_b))
    assert np.all(np.isfinite(np.asarray(mu_b)))


def test_constructor_rejects_unknown_regularization():
    """A misspelled engine-level reg name must fail at construction —
    previously it fell through make_reg_fn to the zero-reg lambda and
    published unregularized results under the method's name."""
    with pytest.raises(ValueError, match='Unknown regularization'):
        InversionEngine(regularization='Diffusion')  # case typo
    # valid names still construct
    InversionEngine(regularization='l2')
    InversionEngine(regularization=None)


def test_segment_steps_option_conflicts():
    op, v_true, y, mu0 = _mini_problem()
    engine = InversionEngine(regularization=None)
    with pytest.raises(ValueError, match='use_scan=False'):
        engine.optimize(mu0, v_true, y, op, ts=2, use_scan=False,
                        segment_steps=1, progress=False)
    with pytest.raises(ValueError, match='checkpoint_every'):
        engine.optimize(mu0, v_true, y, op, ts=2, use_scan=True,
                        segment_steps=1, checkpoint_path='/tmp/never.ckpt',
                        progress=False)


def test_checkpoint_path_requires_scan():
    op, v_true, y, mu0 = _mini_problem()
    engine = InversionEngine(regularization=None)
    with pytest.raises(ValueError, match='use_scan'):
        engine.optimize(mu0, v_true, y, op, ts=2, use_scan=False,
                        checkpoint_path='/tmp/never.ckpt', progress=False)


def test_checkpoint_write_is_atomic(tmp_path):
    """Snapshot writes go through tmp+os.replace; no .tmp residue and the
    final file loads (a kill mid-write must never truncate the only
    snapshot — docs/outage_runbook.md workflow)."""
    op, v_true, y, mu0 = _mini_problem()
    ck = tmp_path / 'inv.ckpt'
    engine = InversionEngine(regularization=None)
    engine.optimize(mu0, v_true, y, op, ts=4, lr=0.05,
                    key=jax.random.PRNGKey(0), progress=False,
                    checkpoint_path=str(ck), checkpoint_every=2)
    assert ck.exists()
    assert list(tmp_path.glob('*.tmp')) == []
    assert ck.stat().st_size > 0
