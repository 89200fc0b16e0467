"""Glue between the physics grid and the denoiser grid.

Reference: red_diffeq/utils/diffusion_utils.py:4-14. The 70x70 physics grid
is zero-padded by one pixel to 72x72 so U-Net feature maps divide by 8.
"""
import jax
import jax.numpy as jnp


def extract(a: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-batch schedule coefficients a[t] and reshape to (B, 1, 1, ...).

    ``ndim`` is the rank of the tensor the coefficient multiplies (the
    reference passes x.shape; we take rank to stay shape-polymorphic).
    """
    out = a[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


def diffusion_pad(x: jax.Array) -> jax.Array:
    """Zero-pad one pixel on each spatial edge: (B,C,H,W) -> (B,C,H+2,W+2)."""
    return jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))


def diffusion_crop(x: jax.Array) -> jax.Array:
    """Inverse of :func:`diffusion_pad`."""
    return x[:, :, 1:-1, 1:-1]
