"""Trainer smoke tests and the full RED-DiffEq engine wiring
(diffusion-regularized inversion end-to-end on a tiny problem)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from red_diffeq_tpu.core.inversion import InversionEngine
from red_diffeq_tpu.models.diffusion import GaussianDiffusion
from red_diffeq_tpu.models.trainer import TensorDataset, Trainer
from red_diffeq_tpu.models.unet import Unet
from red_diffeq_tpu.solvers.acoustic import FWIForward
from red_diffeq_tpu.utils.data_trans import v_denormalize, v_normalize


@pytest.fixture(scope='module')
def tiny_diffusion():
    # image_size 18 = physics 16 + 1px pad ring (mirrors 70 -> 72)
    model = Unet(dim=8, dim_mults=(1, 2), channels=1)
    d = GaussianDiffusion(model, image_size=18, timesteps=16,
                          objective='pred_noise')
    d.init_params(jax.random.PRNGKey(0))
    return d


def test_trainer_steps_and_checkpoint(tmp_path, tiny_diffusion):
    data = np.random.RandomState(0).rand(64, 1, 18, 18).astype(np.float32)
    trainer = Trainer(
        tiny_diffusion, TensorDataset(data),
        train_batch_size=8, gradient_accumulate_every=2,
        train_lr=1e-3, train_num_steps=6, ema_update_every=2,
        save_and_sample_every=1000, num_samples=4,
        results_folder=str(tmp_path), data_parallel=False)
    l0 = None
    trainer.train(log_every=1000)
    assert trainer.step == 6
    assert len(trainer.training_losses) == 6
    losses = [x['loss'] for x in trainer.training_losses]
    assert all(np.isfinite(losses))

    trainer.save(1)
    ckpt = tmp_path / 'model-1.ckpt'
    assert ckpt.exists()
    meta = json.loads((tmp_path / 'training_losses-1.json').read_text())
    assert meta['num_losses'] == 6

    # fresh trainer restores step + params
    trainer2 = Trainer(
        tiny_diffusion, TensorDataset(data),
        train_batch_size=8, gradient_accumulate_every=2,
        train_lr=1e-3, train_num_steps=6,
        results_folder=str(tmp_path), data_parallel=False)
    trainer2.load(1)
    assert trainer2.step == 6
    p1 = jax.tree.leaves(trainer.params)[0]
    p2 = jax.tree.leaves(trainer2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


def test_trainer_resume_restores_rng_stream(tmp_path, tiny_diffusion):
    """A save/load round-trip must continue the batch-index and noise-key
    sequences, not replay them from the constructor seed: an uninterrupted
    6-step run and a 3+save+load+3 run must produce identical losses
    (advisor r3: load() previously dropped _np_rng/_key)."""
    data = np.random.RandomState(2).rand(64, 1, 18, 18).astype(np.float32)

    def make(steps, folder):
        return Trainer(
            tiny_diffusion, TensorDataset(data), train_batch_size=16,
            train_lr=1e-3, train_num_steps=steps, save_and_sample_every=3,
            num_samples=4, results_folder=str(folder), seed=5,
            data_parallel=False, device_data=False)

    straight = make(6, tmp_path / 'a')
    straight.train(log_every=1000, steps_per_call=3)
    ref_losses = [x['loss'] for x in straight.training_losses]

    first = make(3, tmp_path / 'b')
    first.train(log_every=1000, steps_per_call=3)  # saves milestone 1
    assert (tmp_path / 'b' / 'rng-1.npz').exists()
    second = make(6, tmp_path / 'b')
    second.load(1)
    second.train(log_every=1000, steps_per_call=3)
    res_losses = [x['loss'] for x in second.training_losses]
    np.testing.assert_allclose(res_losses, ref_losses, rtol=1e-5)


def test_trainer_device_data_threshold(tiny_diffusion):
    """The device-resident dataset gate respects the configurable HBM
    budget (advisor r3: fixed 4 GiB threshold ignored actual memory)."""
    data = np.random.RandomState(3).rand(32, 1, 18, 18).astype(np.float32)
    common = dict(train_batch_size=16, train_num_steps=1,
                  results_folder='/tmp/tddt', data_parallel=False)
    on = Trainer(tiny_diffusion, TensorDataset(data), **common)
    assert on._device_data
    off = Trainer(tiny_diffusion, TensorDataset(data),
                  device_data_max_bytes=0, **common)
    assert not off._device_data


def test_trainer_grad_accum_equivalence(tiny_diffusion):
    """2 micro-batches of 8 must match 1 batch of 16 up to fp tolerance
    when the same data and keys flow through (structural check: loss is
    the mean over micro-batches)."""
    data = np.random.RandomState(1).rand(32, 1, 18, 18).astype(np.float32)
    t = Trainer(tiny_diffusion, TensorDataset(data), train_batch_size=8,
                gradient_accumulate_every=2, train_lr=0.0,
                train_num_steps=1, results_folder='/tmp/ta',
                data_parallel=False)
    batches = jnp.asarray(np.stack([data[:8], data[8:16]]))
    params, opt_state, ema, step, loss = t._train_step(
        t.params, t.opt_state, t.ema_params, 0, batches,
        jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # lr=0 -> params unchanged
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(params)[0]),
        np.asarray(jax.tree.leaves(t.params)[0]))


def test_red_diffeq_engine_end_to_end(tiny_diffusion):
    """Full RED-DiffEq inversion: diffusion-regularized FWI improves MAE
    and records diffusion timesteps."""
    n, nt, ns, nbc = 16, 50, 2, 8
    ctx = dict(n_grid=n, nt=nt, dx=10.0, dt=0.001, nbc=nbc, f=15.0,
               sz=10, gz=10, ng=n, ns=ns)
    op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                    s_norm_func=lambda s: s, backend='xla', chunk=10)
    v_true = np.full((1, 1, n, n), 2000.0, np.float32)
    v_true[:, :, n // 2:, :] = 3000.0
    y = op(v_normalize(jnp.asarray(v_true)))
    mu0 = jnp.pad(v_normalize(jnp.full((1, 1, n, n), 2400.0)),
                  ((0, 0), (0, 0), (1, 1), (1, 1)))

    engine = InversionEngine(tiny_diffusion, regularization='diffusion',
                             sigma_x0=1e-4)
    mu, per_model = engine.optimize(
        mu0, jnp.asarray(v_true), y, op, ts=15, lr=0.05, reg_lambda=0.05,
        key=jax.random.PRNGKey(8888), use_scan=True, progress=False)
    curves = per_model[0]
    assert mu.shape == (1, 1, n, n)
    # The denoiser is randomly initialized, so the prior is noise and MAE
    # improvement is not guaranteed; the data term, however, must drop and
    # the diffusion machinery must be active and finite.
    assert curves['obs_losses'][-1] < curves['obs_losses'][0]
    assert np.any(np.asarray(curves['reg_losses']) != 0.0)
    assert np.all(np.isfinite(np.asarray(curves['total_losses'])))


def test_red_engine_reg_override(tiny_diffusion):
    """Passing regularization= at optimize() overrides the engine default
    (reference inversion.py:38-44)."""
    n, nt, ns, nbc = 16, 40, 1, 8
    ctx = dict(n_grid=n, nt=nt, dx=10.0, dt=0.001, nbc=nbc, f=15.0,
               sz=10, gz=10, ng=n, ns=ns)
    op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                    s_norm_func=lambda s: s, backend='xla', chunk=10)
    v_true = np.full((1, 1, n, n), 2500.0, np.float32)
    y = op(v_normalize(jnp.asarray(v_true)))
    mu0 = jnp.pad(v_normalize(jnp.full((1, 1, n, n), 2300.0)),
                  ((0, 0), (0, 0), (1, 1), (1, 1)))
    engine = InversionEngine(tiny_diffusion, regularization='diffusion')
    _, per_model = engine.optimize(mu0, jnp.asarray(v_true), y, op, ts=3,
                                   lr=0.01, regularization='tv',
                                   reg_lambda=0.5,
                                   key=jax.random.PRNGKey(0), progress=False)
    assert all(r > 0 for r in per_model[0]['reg_losses'])


def test_image_folder_dataset(tmp_path):
    """Reference models/diffusion.py:556-573 parity: recursive glob,
    resize + center crop to image_size, [0,1] range, (C,H,W) layout."""
    from PIL import Image

    from red_diffeq_tpu.models.trainer import ImageFolderDataset

    sub = tmp_path / 'a' / 'b'
    sub.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i, (w, h) in enumerate([(20, 30), (16, 16), (40, 18)]):
        arr = rng.randint(0, 255, size=(h, w), dtype=np.uint8)
        Image.fromarray(arr, mode='L').save(sub / f'img{i}.png')
    Image.fromarray(rng.randint(0, 255, (24, 24, 3), dtype=np.uint8),
                    mode='RGB').save(tmp_path / 'rgb.jpg')

    ds = ImageFolderDataset(tmp_path, image_size=16, convert_image_to='L')
    assert len(ds) == 4
    batch = ds.sample_batch(np.random.RandomState(1), 6)
    assert batch.shape == (6, 1, 16, 16)
    assert batch.min() >= 0.0 and batch.max() <= 1.0

    flip = ImageFolderDataset(tmp_path, image_size=16, convert_image_to='L',
                              augment_horizontal_flip=True)
    b2 = flip.sample_batch(np.random.RandomState(1), 6)
    assert b2.shape == (6, 1, 16, 16)

    with pytest.raises(FileNotFoundError):
        ImageFolderDataset(tmp_path / 'empty', image_size=16)


def test_frechet_distance_and_trainer_fid(tmp_path):
    """fid_frozen: 0 for identical sets, grows with distribution shift;
    the trainer writes fid_scores.json at each milestone; the frozen
    feature extractor is seed-stable (identical weights every call)."""
    from red_diffeq_tpu.models.trainer import (
        TensorDataset, Trainer, _frozen_feature_apply,
        _frozen_feature_weights, frechet_distance,
    )

    rng = np.random.RandomState(0)
    a = rng.randn(200, 8).astype(np.float64)
    assert frechet_distance(a, a.copy()) == pytest.approx(0.0, abs=1e-6)
    b = a + 3.0
    assert frechet_distance(a, b) > 5.0

    model = Unet(dim=8, dim_mults=(1, 2), channels=1)
    diff = GaussianDiffusion(model, image_size=16, timesteps=10,
                             sampling_timesteps=4, objective='pred_noise')
    data = rng.rand(32, 1, 16, 16).astype(np.float32)
    tr = Trainer(diff, TensorDataset(data), train_batch_size=16,
                 train_num_steps=4, save_and_sample_every=4, num_samples=4,
                 results_folder=str(tmp_path), data_parallel=False,
                 calculate_fid=True, num_fid_samples=8)
    tr.train(log_every=1000)
    scores = json.loads((tmp_path / 'fid_scores.json').read_text())
    assert len(scores) == 1
    assert np.isfinite(scores[0]['fid_frozen'])

    # Frozen extractor is deterministic: same weights, same features,
    # and discriminative: shifted images score a larger Fréchet distance.
    ws1 = _frozen_feature_weights()
    imgs = jnp.asarray(rng.rand(16, 16, 16, 1).astype(np.float32))
    f1 = np.asarray(_frozen_feature_apply(ws1, imgs))
    f2 = np.asarray(_frozen_feature_apply(_frozen_feature_weights(), imgs))
    np.testing.assert_array_equal(f1, f2)
    f_shift = np.asarray(_frozen_feature_apply(ws1, imgs * 0.2 + 0.5))
    d_same = frechet_distance(f1.astype(np.float64), f2.astype(np.float64))
    d_diff = frechet_distance(f1.astype(np.float64),
                              f_shift.astype(np.float64))
    assert d_diff > d_same


def test_device_resident_data_matches_host_stream(tmp_path):
    """The device-resident index-gather path must follow the IDENTICAL
    training trajectory as the host-streamed batch path (same rng call
    sequence, same losses, same final params)."""
    from red_diffeq_tpu.models.trainer import TensorDataset, Trainer

    rng = np.random.RandomState(0)
    data = rng.rand(64, 1, 16, 16).astype(np.float32)

    def build(device_data):
        model = Unet(dim=8, dim_mults=(1, 2), channels=1)
        diff = GaussianDiffusion(model, image_size=16, timesteps=10,
                                 sampling_timesteps=4,
                                 objective='pred_noise')
        return Trainer(diff, TensorDataset(data), train_batch_size=16,
                       train_num_steps=6, save_and_sample_every=6,
                       num_samples=4, results_folder=str(tmp_path / 'a'),
                       data_parallel=False, seed=3,
                       device_data=device_data)

    tr_dev = build(True)
    assert tr_dev._device_data
    tr_dev.train(log_every=1000, steps_per_call=3)
    tr_host = build(False)
    assert not tr_host._device_data
    tr_host.train(log_every=1000, steps_per_call=3)

    l_dev = [e['loss'] for e in tr_dev.training_losses]
    l_host = [e['loss'] for e in tr_host.training_losses]
    np.testing.assert_allclose(l_dev, l_host, rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        tr_dev.params, tr_host.params)


def test_fid_history_survives_resume(tmp_path):
    """trainer.load() must restore fid_scores.json into memory, or the
    first post-resume milestone dump overwrites the file with only the
    new entry (round-5 fix)."""
    from red_diffeq_tpu.models.trainer import TensorDataset, Trainer

    rng = np.random.RandomState(0)
    data = rng.rand(16, 1, 16, 16).astype(np.float32)
    model = Unet(dim=8, dim_mults=(1, 2), channels=1)
    diff = GaussianDiffusion(model, image_size=16, timesteps=10,
                             sampling_timesteps=4, objective='pred_noise')
    tr = Trainer(diff, TensorDataset(data), train_batch_size=16,
                 train_num_steps=2, save_and_sample_every=2, num_samples=4,
                 results_folder=str(tmp_path), data_parallel=False)
    tr.save(1)
    # entries at/before the resumed step survive; LATER entries must be
    # truncated (resuming an earlier milestone would otherwise resurrect
    # future entries that the re-run appends again as duplicates)
    prior = [{'step': 0, 'milestone': 1, 'fid_frozen': 12.5},
             {'step': 99, 'milestone': 7, 'fid_frozen': 9.9}]
    (tmp_path / 'fid_scores.json').write_text(json.dumps(prior))

    tr2 = Trainer(diff, TensorDataset(data), train_batch_size=16,
                  train_num_steps=2, save_and_sample_every=2, num_samples=4,
                  results_folder=str(tmp_path), data_parallel=False)
    tr2.load(1)
    assert tr2.fid_scores == prior[:1]
    # milestone saves are atomic: no .tmp residue
    assert list(tmp_path.glob('*.tmp')) == []
