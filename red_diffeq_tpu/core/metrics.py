"""Per-sample evaluation metrics, fully on device.

Reference: red_diffeq/core/metrics.py:7-46. MAE/RMSE are computed on
normalized ([-1, 1]) velocities, SSIM on the [0, 1] mapping. Unlike the
reference (which loops SSIM per sample), SSIM here is one batched depthwise
convolution — the per-sample reduction happens inside the conv output.
"""
from typing import Tuple

import jax
import jax.numpy as jnp

from red_diffeq_tpu.utils.data_trans import v_normalize
from red_diffeq_tpu.utils.ssim import ssim


def calculate_metrics(mu: jax.Array, mu_true_norm: jax.Array
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Return (mae, rmse, ssim) per sample.

    ``mu``: predicted velocity in [-1, 1], (B, 1, H, W).
    ``mu_true_norm``: ground truth already normalized to [-1, 1].
    """
    mu = jax.lax.stop_gradient(mu)
    diff = mu - mu_true_norm
    mae = jnp.mean(jnp.abs(diff), axis=(1, 2, 3))
    rmse = jnp.sqrt(jnp.mean(diff ** 2, axis=(1, 2, 3)))
    ssim_val = ssim((mu + 1) / 2, (mu_true_norm + 1) / 2, size_average=False)
    return mae, rmse, ssim_val


class MetricsCalculator:
    """Interface shim matching the reference class (metrics.py:7-46);
    takes ground truth in m/s and normalizes internally."""

    def __init__(self, ssim_loss=None):
        del ssim_loss  # batched ssim needs no stateful window

    def calculate(self, mu: jax.Array, mu_true: jax.Array):
        return calculate_metrics(mu, v_normalize(mu_true))
