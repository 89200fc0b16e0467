"""TPU-native RED-DiffEq: diffusion-regularized full waveform inversion in JAX.

Re-exports the public API, mirroring the reference surface
(reference: red_diffeq/__init__.py:1-33).
"""
__version__ = '0.1.0'

from red_diffeq_tpu.config import (
    get_config, get_marmousi_config, load_config, save_config, update_config,
    print_config,
)
from red_diffeq_tpu.solvers.acoustic import FWIForward, Geometry, forward_modeling
from red_diffeq_tpu.utils.data_trans import (
    prepare_initial_model, v_denormalize, v_normalize, s_normalize,
    s_denormalize, s_normalize_none, add_noise_to_seismic, missing_trace,
)
from red_diffeq_tpu.utils.ssim import SSIM, ssim
from red_diffeq_tpu.utils.seed_utils import (
    set_seed, SeedContext, get_rng_state, set_rng_state, worker_init_fn,
)

__all__ = [
    'get_config', 'get_marmousi_config', 'load_config', 'save_config',
    'update_config', 'print_config',
    'FWIForward', 'Geometry', 'forward_modeling',
    'prepare_initial_model', 'v_denormalize', 'v_normalize',
    's_normalize', 's_denormalize', 's_normalize_none',
    'add_noise_to_seismic', 'missing_trace',
    'SSIM', 'ssim',
    'set_seed', 'SeedContext', 'get_rng_state', 'set_rng_state',
    'worker_init_fn',
]
