"""run_bench CLI end-to-end tests (DiffusionFWI + ILVR) on a tiny
synthetic dataset."""
import numpy as np
import pytest
import yaml

import jax.numpy as jnp

from red_diffeq_tpu.cli.run_bench import (
    apply_overrides, build_parser, run_experiment,
)
from red_diffeq_tpu.config import get_config
from red_diffeq_tpu.io.checkpoints import save_params
from red_diffeq_tpu.models.diffusion import GaussianDiffusion
from red_diffeq_tpu.models.unet import Unet
from red_diffeq_tpu.solvers.acoustic import FWIForward
from red_diffeq_tpu.utils.data_trans import v_denormalize, v_normalize


@pytest.fixture(scope='module')
def bench_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp('benchdata')
    (root / 'seis').mkdir()
    (root / 'vel').mkdir()
    n, nt, ns, nbc = 16, 50, 2, 8
    ctx = dict(n_grid=n, nt=nt, dx=10.0, dt=0.001, nbc=nbc, f=15.0,
               sz=10, gz=10, ng=n, ns=ns)
    op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                    s_norm_func=lambda s: s, backend='xla', chunk=10)
    vel = np.full((2, 1, n, n), 2000.0, np.float32)
    vel[0, :, 8:, :] = 3000.0
    vel[1, :, 5:, :] = 2600.0
    seis = np.asarray(op(v_normalize(jnp.asarray(vel))))
    np.save(root / 'seis' / 'CF.npy', seis)
    np.save(root / 'vel' / 'CF.npy', vel)

    # tiny denoiser checkpoint on disk so the CLI loads real weights
    import jax
    model = Unet(dim=8, dim_mults=(1, 2), channels=1)
    d = GaussianDiffusion(model, image_size=18, timesteps=12,
                          objective='pred_noise')
    d.init_params(jax.random.PRNGKey(0))
    ckpt = root / 'model.ckpt'
    save_params(d.params, ckpt)

    cfg = get_config()
    for k, v in ctx.items():
        setattr(cfg.pde, k, v)
    cfg.model.dim = 8
    cfg.model.dim_mults = [1, 2]
    cfg.diffusion.image_size = 18
    cfg.diffusion.timesteps = 12
    cfg.diffusion.sampling_timesteps = 6
    cfg.diffusion.model_path = str(ckpt)
    cfg.optimization.ts = 2
    cfg.optimization.diffusion_ts = 3
    cfg.optimization.sigma = 3.0
    cfg.data.seismic_data_dir = str(root / 'seis')
    cfg.data.velocity_data_dir = str(root / 'vel')
    cfg.data.batch_size = 2
    cfg.experiment.random_seed = 8888
    cfg.tpu.solver_backend = 'xla'
    cfg.tpu.solver_chunk = 10
    return cfg


def test_run_bench_diffusionfwi(bench_setup, tmp_path):
    cfg = bench_setup
    cfg.experiment.results_dir = str(tmp_path / 'out')
    out_dir = run_experiment(cfg, method='diffusionfwi')
    npzs = sorted((out_dir / 'CF').glob('*_results.npz'))
    assert len(npzs) == 2
    d = np.load(npzs[0])
    for key in ('result', 'initial_velocity', 'ground_truth',
                'total_losses', 'obs_losses', 'ssim', 'mae', 'rmse'):
        assert key in d, key
    assert 'reg_losses' not in d  # bench methods have no reg term
    assert d['ssim'].shape == (3,)  # one entry per diffusion step
    assert (out_dir / 'config.yaml').exists()


def test_run_bench_ilvr(bench_setup, tmp_path):
    cfg = bench_setup
    cfg.experiment.results_dir = str(tmp_path / 'out2')
    cfg.optimization.use_ilvr = True
    cfg.optimization.ilvr_weight = 0.1
    cfg.optimization.ilvr_down_schedule = 'stepwise'
    out_dir = run_experiment(cfg, method='ilvr')
    assert 'ilvr_' in str(out_dir)
    npzs = sorted((out_dir / 'CF').glob('*_results.npz'))
    assert len(npzs) == 2
    assert np.all(np.isfinite(np.load(npzs[1])['mae']))


def test_bench_cli_overrides():
    args = build_parser().parse_args([
        '--method', 'ilvr', '--diffusion_ts', '7', '--grad_norm', 'false',
        '--grad_smooth', '2.0', '--model_blur', 'true',
        '--ilvr_weight', '0.2', '--use_patches', 'true',
        '--patch_height', '70', '--patch_width', '70',
        '--patch_stride_h', '1', '--patch_stride_w', '60',
        '--results_dir', '/tmp/bench_out',
    ])
    cfg = apply_overrides(get_config(), args)
    assert cfg.optimization.diffusion_ts == 7
    assert cfg.optimization.grad_norm is False
    assert cfg.optimization.grad_smooth == 2.0
    assert cfg.optimization.model_blur is True
    assert cfg.optimization.ilvr_weight == 0.2
    assert cfg.optimization.patch_kernel_size == [70, 70]
    assert cfg.optimization.patch_stride == [1, 60]
    assert cfg.experiment.results_dir == '/tmp/bench_out'
