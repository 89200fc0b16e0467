"""SSIM with an 11x11 Gaussian window (sigma=1.5), zero-padded convolution.

Numerically equivalent to the classic Po-Hsun-Su implementation used by the
reference (red_diffeq/utils/ssim.py:9-64): per-channel depthwise conv with
zero padding of window_size//2, C1=0.01^2, C2=0.03^2.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """Normalized 2D Gaussian window, shape (window_size, window_size)."""
    x = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    w = np.outer(g, g)
    return w.astype(np.float32)


def _filter2d(x: jax.Array, window: jax.Array) -> jax.Array:
    """Depthwise 2D convolution with zero padding of window//2 on NCHW input."""
    c = x.shape[1]
    pad = window.shape[0] // 2
    kernel = jnp.broadcast_to(window[None, None], (c, 1, *window.shape))
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,  # fp32 even on TPU (default
        # TPU conv precision is bf16, which costs ~1e-3 in SSIM terms)
    )


@partial(jax.jit, static_argnames=('window_size', 'size_average'))
def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         size_average: bool = True) -> jax.Array:
    """Structural similarity of two NCHW images in [0, 1].

    ``size_average=True`` returns a scalar mean over the whole batch;
    ``False`` returns a per-sample mean, shape (N,).
    """
    window = jnp.asarray(gaussian_window(window_size))
    mu1 = _filter2d(img1, window)
    mu2 = _filter2d(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, window) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, window) - mu2_sq
    sigma12 = _filter2d(img1 * img2, window) - mu1_mu2

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


class SSIM:
    """Callable wrapper matching the reference module interface
    (red_diffeq/utils/ssim.py:41-64)."""

    def __init__(self, window_size: int = 11, size_average: bool = True):
        self.window_size = window_size
        self.size_average = size_average

    def __call__(self, img1: jax.Array, img2: jax.Array) -> jax.Array:
        return ssim(img1, img2, window_size=self.window_size,
                    size_average=self.size_average)
