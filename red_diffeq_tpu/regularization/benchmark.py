"""Baseline regularizers: anisotropic TV and Tikhonov smoothness.

Reference: red_diffeq/regularization/benchmark.py:4-37. Per-sample means of
first differences of the velocity image (B, 1, H, W) -> (B,).
"""
import jax
import jax.numpy as jnp


def total_variation_loss(mu: jax.Array) -> jax.Array:
    """Anisotropic total variation, per-sample (reference benchmark.py:4)."""
    dx = jnp.abs(mu[:, :, :, 1:] - mu[:, :, :, :-1])
    dy = jnp.abs(mu[:, :, 1:, :] - mu[:, :, :-1, :])
    return dx.mean(axis=(1, 2, 3)) + dy.mean(axis=(1, 2, 3))


def tikhonov_loss(mu: jax.Array) -> jax.Array:
    """L2-of-gradients smoothness, per-sample (reference benchmark.py:22)."""
    dx = mu[:, :, :, 1:] - mu[:, :, :, :-1]
    dy = mu[:, :, 1:, :] - mu[:, :, :-1, :]
    return (dx ** 2).mean(axis=(1, 2, 3)) + (dy ** 2).mean(axis=(1, 2, 3))
