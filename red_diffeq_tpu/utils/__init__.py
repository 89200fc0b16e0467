from red_diffeq_tpu.utils.data_trans import (
    v_normalize, v_denormalize, s_normalize, s_denormalize, s_normalize_none,
    add_noise_to_seismic, prepare_initial_model, missing_trace,
    gaussian_filter_np,
)
from red_diffeq_tpu.utils.ssim import SSIM, ssim
from red_diffeq_tpu.utils.diffusion_utils import extract, diffusion_pad, diffusion_crop
from red_diffeq_tpu.utils.seed_utils import (
    set_seed, get_key, next_key, get_rng_state, set_rng_state, SeedContext,
    worker_init_fn,
)
