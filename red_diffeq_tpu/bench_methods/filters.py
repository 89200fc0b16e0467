"""Device-side image filters for the bench methods' gradient tricks.

The reference smooths FWI gradients on the *host* with scipy and blurs the
model with torchvision (reference diffusion_bench/diffusionfwi.py:289-296,
311-316) — a per-iteration device->CPU->device round trip. Here both are
separable convolutions that stay on the TPU inside the jitted loop.
"""
import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 * (x / sigma) ** 2)
    return (w / w.sum()).astype(np.float32)


def gaussian_smooth(x: jax.Array, sigma: float, truncate: float = 4.0
                    ) -> jax.Array:
    """Gaussian blur over the last two axes of (B, C, H, W) with
    symmetric-reflect boundaries — numerically equivalent to
    ``scipy.ndimage.gaussian_filter(x, sigma=[0, 0, s, s])`` (the
    reference's grad_smooth, diffusionfwi.py:289-296)."""
    if sigma is None or sigma <= 0:
        return x
    radius = int(truncate * float(sigma) + 0.5)
    if radius == 0:
        return x
    w = jnp.asarray(_gaussian_kernel1d(sigma, radius))

    def conv_axis(arr, axis):
        pad = [(0, 0)] * arr.ndim
        pad[axis] = (radius, radius)
        padded = jnp.pad(arr, pad, mode='symmetric')
        # Convolve along `axis` with the 1D kernel via a depthwise conv.
        moved = jnp.moveaxis(padded, axis, -1)
        shape = moved.shape
        flat = moved.reshape(1, 1, -1, shape[-1])
        kern = w[None, None, None, :]
        out = jax.lax.conv_general_dilated(
            flat, kern, (1, 1), 'VALID',
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
            precision=jax.lax.Precision.HIGHEST)
        out = out.reshape(*shape[:-1], shape[-1] - 2 * radius)
        return jnp.moveaxis(out, -1, axis)

    x = conv_axis(x, x.ndim - 2)
    x = conv_axis(x, x.ndim - 1)
    return x


def gaussian_blur_3x3(x: jax.Array, sigma: float = 0.4) -> jax.Array:
    """3x3 Gaussian blur with reflect padding — equivalent to
    ``torchvision.transforms.functional.gaussian_blur(x, [3, 3],
    [sigma, sigma])`` (the reference's model_blur, diffusionfwi.py:311-316).
    """
    xs = np.array([-1.0, 0.0, 1.0])
    w = np.exp(-0.5 * (xs / sigma) ** 2)
    w = (w / w.sum()).astype(np.float32)
    kernel = jnp.asarray(np.outer(w, w))[None, None]   # (1,1,3,3)
    b, c, h, wd = x.shape
    padded = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode='reflect')
    flat = padded.reshape(b * c, 1, h + 2, wd + 2)
    out = jax.lax.conv_general_dilated(
        flat, kernel, (1, 1), 'VALID',
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
        precision=jax.lax.Precision.HIGHEST)
    return out.reshape(b, c, h, wd)


def clip_total_norm(g: jax.Array, max_norm: jax.Array) -> jax.Array:
    """Scale ``g`` so its global L2 norm is at most ``max_norm`` —
    semantics of ``torch.nn.utils.clip_grad_norm_`` over a single tensor
    (reference diffusionfwi.py:299-304)."""
    norm = jnp.linalg.norm(g.reshape(-1))
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return g * scale
