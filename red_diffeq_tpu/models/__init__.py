from red_diffeq_tpu.models.unet import Unet
from red_diffeq_tpu.models.diffusion import (
    GaussianDiffusion, DiffusionSchedule,
    linear_beta_schedule, cosine_beta_schedule, sigmoid_beta_schedule,
)
