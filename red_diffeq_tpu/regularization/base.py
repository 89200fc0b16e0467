"""Regularization dispatch.

Reference: red_diffeq/regularization/base.py:7-49. Routes a config string to
a pure regularization function ``reg_fn(mu, key) -> (per_sample_loss, t)``
where ``t`` is the diffusion timestep tensor (None for non-diffusion
methods). 'diffusion' auto-selects the patched variant when the (padded)
velocity model exceeds the denoiser input size (reference base.py:26-32).

Note: like the reference, the name 'hybrid' passes engine validation but has
no implementation and silently yields zero regularization.
"""
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from red_diffeq_tpu.regularization.benchmark import (
    tikhonov_loss, total_variation_loss,
)

RegFn = Callable[[jax.Array, Optional[jax.Array]],
                 Tuple[jax.Array, Optional[jax.Array]]]


def make_reg_fn(regularization_type: Optional[str], diffusion=None,
                use_time_weight: bool = False,
                fixed_timestep: Optional[int] = None) -> RegFn:
    """Build the regularization function.

    For 'diffusion', ``diffusion`` is a GaussianDiffusion schedule/bundle
    (its bound denoiser apply is used for the score; matches the
    reference, whose RED_DiffEq also takes only the bundle,
    regularization/diffusion.py:30-40).
    """
    if regularization_type == 'diffusion':
        if diffusion is None:
            raise ValueError("Diffusion model required for 'diffusion' regularization")
        from red_diffeq_tpu.regularization.red import make_red_reg_fn
        return make_red_reg_fn(diffusion,
                               use_time_weight=use_time_weight,
                               fixed_timestep=fixed_timestep)

    if regularization_type == 'l2':
        return lambda mu, key=None: (tikhonov_loss(mu), None)
    if regularization_type == 'tv':
        return lambda mu, key=None: (total_variation_loss(mu), None)
    # None / unimplemented ('hybrid') -> zero regularization
    return lambda mu, key=None: (
        jnp.zeros(mu.shape[0], dtype=mu.dtype), None)


class RegularizationMethod:
    """Stateful shim matching the reference class interface (base.py:7-49)."""

    def __init__(self, regularization_type: Optional[str], diffusion_model=None,
                 use_time_weight: bool = False,
                 sigma_x0: float = 0.0001, fixed_timestep: Optional[int] = None):
        self.regularization_type = regularization_type
        self.diffusion_model = diffusion_model
        self.use_time_weight = use_time_weight
        self.sigma_x0 = sigma_x0
        self.fixed_timestep = fixed_timestep
        self._fn = make_reg_fn(regularization_type, diffusion_model,
                               use_time_weight, fixed_timestep)

    def get_reg_loss(self, mu: jax.Array, key: Optional[jax.Array] = None):
        return self._fn(mu, key)
