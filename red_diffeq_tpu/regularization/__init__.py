from red_diffeq_tpu.regularization.base import RegularizationMethod, make_reg_fn
from red_diffeq_tpu.regularization.benchmark import total_variation_loss, tikhonov_loss
from red_diffeq_tpu.regularization.red import (
    RED_DiffEq, RED_DiffEq_POST_PROCESS, calculate_patches, make_red_reg_fn,
)
