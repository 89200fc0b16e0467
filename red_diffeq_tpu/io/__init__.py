from red_diffeq_tpu.io.checkpoints import (
    save_params, load_params, load_diffusion_params,
)
from red_diffeq_tpu.io.results import load_openfwi, load_marmousi
