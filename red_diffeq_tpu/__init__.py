"""TPU-native RED-DiffEq: diffusion-regularized full waveform inversion in JAX.

Re-exports the public API, mirroring the reference surface
(reference: red_diffeq/__init__.py:1-33) plus the TPU-specific additions
(parallel mesh helpers, pallas ops, bench methods).
"""
__version__ = '0.1.0'

from red_diffeq_tpu.config import (
    get_config, get_marmousi_config, load_config, save_config, update_config,
    print_config,
)
from red_diffeq_tpu.core.inversion import InversionEngine
from red_diffeq_tpu.core.metrics import MetricsCalculator, calculate_metrics
from red_diffeq_tpu.models.diffusion import GaussianDiffusion
from red_diffeq_tpu.models.unet import Unet
from red_diffeq_tpu.models.trainer import Trainer, TensorDataset
from red_diffeq_tpu.solvers.acoustic import FWIForward, Geometry, forward_modeling
from red_diffeq_tpu.regularization.red import (
    RED_DiffEq, RED_DiffEq_POST_PROCESS, calculate_patches,
)
from red_diffeq_tpu.regularization.benchmark import (
    total_variation_loss, tikhonov_loss,
)
from red_diffeq_tpu.regularization.base import RegularizationMethod
from red_diffeq_tpu.utils.data_trans import (
    prepare_initial_model, v_denormalize, v_normalize, s_normalize,
    s_denormalize, s_normalize_none, add_noise_to_seismic, missing_trace,
)
from red_diffeq_tpu.utils.ssim import SSIM, ssim
from red_diffeq_tpu.utils.seed_utils import (
    set_seed, SeedContext, get_rng_state, set_rng_state, worker_init_fn,
)
from red_diffeq_tpu.io.checkpoints import (
    save_params, load_params, load_diffusion_params,
)
from red_diffeq_tpu.io.results import load_openfwi, load_marmousi

__all__ = [
    'get_config', 'get_marmousi_config', 'load_config', 'save_config',
    'update_config', 'print_config',
    'InversionEngine', 'MetricsCalculator', 'calculate_metrics',
    'GaussianDiffusion', 'Unet', 'Trainer', 'TensorDataset',
    'FWIForward', 'Geometry', 'forward_modeling',
    'RED_DiffEq', 'RED_DiffEq_POST_PROCESS', 'calculate_patches',
    'total_variation_loss', 'tikhonov_loss', 'RegularizationMethod',
    'prepare_initial_model', 'v_denormalize', 'v_normalize',
    's_normalize', 's_denormalize', 's_normalize_none',
    'add_noise_to_seismic', 'missing_trace',
    'SSIM', 'ssim',
    'set_seed', 'SeedContext', 'get_rng_state', 'set_rng_state',
    'worker_init_fn',
    'save_params', 'load_params', 'load_diffusion_params',
    'load_openfwi', 'load_marmousi',
]
