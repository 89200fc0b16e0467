"""RED-DiffEq: Regularization-by-Denoising with a diffusion prior.

Reference: red_diffeq/regularization/diffusion.py:7-200. The velocity model
is noised to a random timestep, denoised once by the U-Net, and the residual
score (eps_hat - eps) — stop-gradiented — multiplies the model linearly, so
d(reg)/d(mu) = mean(score) without backprop through the U-Net (the RED
trick, reference diffusion.py:74-76).

For velocity models wider than the denoiser input (Marmousi/Overthrust
70x190), overlapping square windows are scored independently and blended
with 0.5 weights on the overlaps (reference diffusion.py:85-155). Patch
layout is static given the shape, so the loop unrolls at trace time; all
patches are scored in ONE batched U-Net call (the reference loops them
sequentially).
"""
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from red_diffeq_tpu.utils.diffusion_utils import (
    diffusion_crop, diffusion_pad, extract,
)


def calculate_patches(width: int, height: int
                      ) -> Tuple[List[Tuple[int, int]], List[int]]:
    """Overlapping square-window layout (reference diffusion.py:7-27).

    Returns ([(start_x, end_x), ...], [overlap_i]) for k = ceil(w/h)
    windows of side ``height`` evenly spread over ``width``.
    """
    m, n = height, width
    k = math.ceil(n / m)
    if k == 1:
        return [(0, n)], []
    s = (n - m) / (k - 1)
    positions = []
    for i in range(k):
        if i == k - 1:
            positions.append((n - m, n))
        else:
            start = int(i * s)
            positions.append((start, min(start + m, n)))
    overlaps = [positions[i][1] - positions[i + 1][0] for i in range(k - 1)]
    return positions, overlaps


def _score_residual(diffusion, mu, t, noise):
    """One RED evaluation: q_sample + single denoiser call + re-derived
    noise prediction; returns stop-gradiented (eps_hat - eps)."""
    x_t = diffusion.q_sample(mu, t, noise=noise)
    preds = diffusion.model_predictions(
        x_t, t, clip_x_start=True, rederive_pred_noise=True)
    return jax.lax.stop_gradient(preds.pred_noise - noise)


def _time_weight(diffusion, tensor, t):
    """w(t) = sqrt((1 - gamma_t) / gamma_t) (reference diffusion.py:42-48)."""
    gamma = extract(diffusion.schedule.alphas_cumprod, t, tensor.ndim)
    return tensor * jnp.sqrt((1.0 - gamma) / gamma)


class RED_DiffEq:
    """Interface-parity class (reference diffusion.py:30-155)."""

    def __init__(self, diffusion_model, use_time_weight: bool = False,
                 sigma_x0: float = 0.0001,
                 fixed_timestep: Optional[int] = None):
        self.diffusion_model = diffusion_model
        self.use_time_weight = use_time_weight
        self.sigma_x0 = sigma_x0
        self.fixed_timestep = fixed_timestep
        size = getattr(diffusion_model, 'image_size', (72, 72))
        self.input_size = size[0] if isinstance(size, (tuple, list)) else size

    def _sample_t_noise(self, key, batch, shape, dtype):
        max_t = self.fixed_timestep if self.fixed_timestep is not None \
            else self.diffusion_model.num_timesteps
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (batch,), 0, max_t)
        noise = jax.random.normal(kn, shape, dtype)
        return t, noise

    def get_reg_loss(self, mu: jax.Array, key: jax.Array):
        """Unpatched RED loss (reference diffusion.py:50-83).

        Returns (reg_per_sample, gradient_per_sample, t)."""
        b = mu.shape[0]
        t, noise = self._sample_t_noise(key, b, mu.shape, mu.dtype)
        gradient_field = _score_residual(self.diffusion_model, mu, t, noise)
        reg_field = gradient_field * mu
        if self.use_time_weight:
            reg_field = _time_weight(self.diffusion_model, reg_field, t)
        return (reg_field.reshape(b, -1).mean(axis=1),
                gradient_field.reshape(b, -1).mean(axis=1), t)

    def get_reg_loss_patched(self, mu: jax.Array, key: jax.Array):
        """Patched RED for wide models (reference diffusion.py:85-155).

        All k windows are denoised in a single batched U-Net call of size
        k*B, then blended by the static overlap weight map.
        """
        d = self.diffusion_model
        mu_unpadded = diffusion_crop(mu)
        b, c, h, w = mu_unpadded.shape
        positions, overlaps = calculate_patches(w, h)
        k = len(positions)

        t, noise = self._sample_t_noise(key, b, mu_unpadded.shape,
                                        mu_unpadded.dtype)

        # Assemble (k*B, c, h+2, h+2) stacked padded patches.
        x_patches, n_patches = [], []
        for (sx, ex) in positions:
            x_patches.append(diffusion_pad(mu_unpadded[:, :, :, sx:ex]))
            n_patches.append(diffusion_pad(noise[:, :, :, sx:ex]))
        x_stack = jnp.concatenate(x_patches, axis=0)
        n_stack = jnp.concatenate(n_patches, axis=0)
        t_stack = jnp.tile(t, k)

        grad_stack = _score_residual(d, x_stack, t_stack, n_stack)
        # Crop the 1px pad ring; since the pad is zero, the cropped score
        # aligns with the original (unpadded) noise patch, matching
        # reference diffusion.py:127-130.
        grad_stack = diffusion_crop(grad_stack)          # (k*B, c, h, m)
        m = positions[0][1] - positions[0][0]
        grad_patches_arr = grad_stack.reshape(k, b, c, h, m)

        gradient_field = jnp.zeros_like(mu_unpadded)
        weight_map = jnp.zeros_like(mu_unpadded)
        for idx, (sx, ex) in enumerate(positions):
            pw = ex - sx
            weight = jnp.ones((pw,), dtype=mu.dtype)
            if idx > 0:
                weight = weight.at[:overlaps[idx - 1]].set(0.5)
            if idx < k - 1:
                weight = weight.at[pw - overlaps[idx]:].set(0.5)
            wpatch = grad_patches_arr[idx, :, :, :, :pw] * weight[None, None, None, :]
            gradient_field = gradient_field.at[:, :, :, sx:ex].add(wpatch)
            weight_map = weight_map.at[:, :, :, sx:ex].add(
                jnp.broadcast_to(weight, (b, c, h, pw)))

        gradient_field = gradient_field / jnp.clip(weight_map, 1e-8, None)
        reg_field = gradient_field * mu_unpadded
        if self.use_time_weight:
            reg_field = _time_weight(d, reg_field, t)
        return (reg_field.reshape(b, -1).mean(axis=1),
                gradient_field.reshape(b, -1).mean(axis=1), t)


def make_red_reg_fn(diffusion, use_time_weight: bool = False,
                    fixed_timestep: Optional[int] = None):
    """Build the engine-facing reg_fn(mu, key) -> (loss, t); dispatches on
    static shape to the patched variant (reference base.py:26-32)."""
    red = RED_DiffEq(diffusion, use_time_weight=use_time_weight,
                     fixed_timestep=fixed_timestep)

    def reg_fn(mu, key):
        h, w = mu.shape[2], mu.shape[3]
        if w > red.input_size or h > red.input_size:
            reg, _, t = red.get_reg_loss_patched(mu, key)
        else:
            reg, _, t = red.get_reg_loss(mu, key)
        return reg, t

    return reg_fn


class RED_DiffEq_POST_PROCESS:
    """Deterministic reverse-diffusion polish of a final velocity model
    (reference diffusion.py:158-200): noise the [0,1]-mapped model to
    timestep ``timesteps`` and run the deterministic posterior-mean chain
    back to t=0. The chain is a single lax.scan program."""

    def __init__(self, diffusion_model):
        self.diffusion_model = diffusion_model

    def diffusion_denoise(self, mu: jax.Array, timesteps: int,
                          key: jax.Array) -> jax.Array:
        d = self.diffusion_model
        if timesteps > d.num_timesteps:
            raise ValueError(
                f"timesteps ({timesteps}) exceeds model's num_timesteps "
                f"({d.num_timesteps})")
        mu01 = (mu + 1.0) / 2.0
        b = mu.shape[0]
        t_full = jnp.full((b,), min(timesteps, d.num_timesteps - 1),
                          dtype=jnp.int32)
        key, kn = jax.random.split(key)
        noise = jax.random.normal(kn, mu.shape, mu.dtype)
        x_t_norm = d.q_sample(d.normalize(mu01), t_full, noise=noise)
        x_t = d.unnormalize(x_t_norm)

        def body(x_t, ti):
            x_norm, _ = d.p_sample_deterministic(d.normalize(x_t), ti)
            return d.unnormalize(x_norm), None

        ts = jnp.arange(timesteps - 1, -1, -1)
        x_t, _ = jax.lax.scan(body, x_t, ts)
        return x_t
