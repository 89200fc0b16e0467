"""Normalization, observation corruption and initial-model synthesis.

JAX port of the reference transforms (reference: red_diffeq/utils/data_trans.py).
All stochastic functions take an explicit ``jax.random`` key instead of a
torch.Generator; everything is pure and jit-compatible unless noted.
"""
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Velocity range of the OpenFWI datasets: [1500, 4500] m/s.
_V_MIN, _V_RANGE = 1500.0, 3000.0


def v_normalize(v):
    """Map velocity in m/s to [-1, 1] (reference data_trans.py:8)."""
    return (v - _V_MIN) / _V_RANGE * 2.0 - 1.0


def v_denormalize(v_norm):
    """Map [-1, 1] back to m/s (reference data_trans.py:13)."""
    return (v_norm + 1.0) / 2.0 * _V_RANGE + _V_MIN


def s_normalize_none(s):
    """Identity seismic normalization (reference data_trans.py:18)."""
    return s


def s_normalize(s):
    """Map seismic amplitude in [-20, 60] to [-1, 1] (reference data_trans.py:23)."""
    return (s + 20.0) / 80.0 * 2.0 - 1.0


def s_denormalize(s_norm):
    """Inverse of :func:`s_normalize` (reference data_trans.py:28)."""
    return (s_norm + 1.0) / 2.0 * 80.0 - 20.0


def add_noise_to_seismic(y: Array, std: float, noise_type: str = 'gaussian',
                         key: Optional[Array] = None) -> Array:
    """Corrupt observations with gaussian or laplace noise.

    Laplace noise is drawn by inverse-CDF transform of a uniform, matching
    the reference semantics (reference data_trans.py:33-62).
    """
    assert std >= 0, 'The standard deviation/scale of the noise must be >= 0'
    assert noise_type in ('gaussian', 'laplace'), f'Unknown noise type: {noise_type}'
    if std == 0:
        return y
    if key is None:
        raise ValueError('a PRNG key is required when std > 0')
    if noise_type == 'gaussian':
        noise = jax.random.normal(key, y.shape, dtype=y.dtype) * std
    else:
        u = jax.random.uniform(key, y.shape, dtype=y.dtype) - 0.5
        noise = -std * jnp.sign(u) * jnp.log1p(-2.0 * jnp.abs(u))
    return y + noise


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 * (x / sigma) ** 2)
    return w / w.sum()


def gaussian_filter_np(x: np.ndarray, sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Separable Gaussian blur over every axis with symmetric-reflect
    boundaries — numerically equivalent to ``scipy.ndimage.gaussian_filter``
    (the reference's smoother, data_trans.py:89-90). Host-side numpy; runs
    once per sample at initialization.
    """
    radius = int(truncate * float(sigma) + 0.5)
    if radius == 0:
        return x.astype(np.float64)
    w = _gaussian_kernel1d(sigma, radius)
    out = x.astype(np.float64)
    for axis in range(out.ndim):
        if out.shape[axis] == 1:
            continue  # size-1 axis is invariant under reflect-mode smoothing
        pad = [(0, 0)] * out.ndim
        pad[axis] = (radius, radius)
        padded = np.pad(out, pad, mode='symmetric')
        out = np.apply_along_axis(
            lambda m: np.convolve(m, w, mode='valid'), axis, padded)
    return out


def prepare_initial_model(v_true: Union[np.ndarray, Array], initial_type: str = None,
                          sigma: float = None, linear_coeff: float = 1.0) -> np.ndarray:
    """Synthesize the starting velocity model (normalized to [-1, 1]).

    Three modes, matching reference data_trans.py:65-107:
      * ``smoothed``    — Gaussian blur of the normalized true model;
      * ``homogeneous`` — constant fill with the top-row minimum;
      * ``linear``      — linear depth gradient from the global min to max.

    Host-side (numpy) by design: runs once per sample before the jitted loop.
    Input/output shape (1, 1, H, W); output dtype float32.
    """
    assert initial_type in ('smoothed', 'homogeneous', 'linear'), \
        "please choose from 'smoothed', 'homogeneous', and 'linear'"
    v_np = v_normalize(np.asarray(v_true, dtype=np.float64))

    if initial_type == 'smoothed':
        v_init = gaussian_filter_np(v_np, sigma=sigma)
    elif initial_type == 'homogeneous':
        v_init = np.full_like(v_np, np.min(v_np[0, 0, 0, :]))
    else:  # linear
        height = v_np.shape[2]
        grad = np.linspace(np.min(v_np), np.max(v_np), height).reshape(-1, 1)
        v_init = np.tile(grad, (1, v_np.shape[3])).reshape(1, 1, height, -1)

    return v_init.astype(np.float32)


def missing_trace(y: Array, num_missing: int, return_mask: bool = True,
                  key: Optional[Array] = None
                  ) -> Union[Array, Tuple[Array, Array]]:
    """Zero out ``num_missing`` random receiver columns per sample.

    The same receivers are dropped across all shots of a sample (real
    acquisition semantics, reference data_trans.py:110-153). ``num_missing``
    must be a static Python int so shapes stay static under jit.
    """
    assert num_missing >= 0, 'The number of missing traces must be >= 0'
    mask = jnp.ones_like(y)
    if num_missing == 0:
        return (y, mask) if return_mask else y
    if key is None:
        raise ValueError('a PRNG key is required when num_missing > 0')

    batch, _, _, num_traces = y.shape

    def sample_mask(k):
        perm = jax.random.permutation(k, num_traces)
        trace_mask = jnp.ones((num_traces,), dtype=y.dtype)
        return trace_mask.at[perm[:num_missing]].set(0.0)

    keys = jax.random.split(key, batch)
    trace_masks = jax.vmap(sample_mask)(keys)           # (B, num_traces)
    mask = trace_masks[:, None, None, :] * mask
    return (y * mask, mask) if return_mask else y * mask
