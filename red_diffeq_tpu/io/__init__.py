from red_diffeq_tpu.io.checkpoints import (
    save_params, load_params, load_diffusion_params,
)
