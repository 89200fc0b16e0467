"""Data-fidelity and total loss composition.

Reference: red_diffeq/core/losses.py:8-66. Pure functions; the per-sample
observation loss is a (optionally mask-normalized) L1.
"""
from typing import Optional

import jax
import jax.numpy as jnp


def observation_loss(predicted: jax.Array, target: jax.Array,
                     mask: Optional[jax.Array] = None) -> jax.Array:
    """Per-sample L1 between predicted and observed seismograms.

    With a mask (1 = observed, 0 = missing trace), the mean is taken over
    observed elements only (reference losses.py:29-41).
    Shapes (B, ns, nt, ng) -> (B,).
    """
    err = jnp.abs(target.astype(jnp.float32) - predicted.astype(jnp.float32))
    axes = tuple(range(1, err.ndim))
    if mask is not None:
        num_observed = jnp.clip(mask.sum(axis=axes), 1.0, None)
        return (err * mask).sum(axis=axes) / num_observed
    return err.mean(axis=axes)


def total_loss(obs_loss: jax.Array, reg_loss: jax.Array,
               reg_lambda: float) -> jax.Array:
    """obs + lambda * reg, per sample (reference losses.py:55-66)."""
    return obs_loss + reg_lambda * reg_loss
