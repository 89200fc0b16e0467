"""ILVR-FWI: ILVR-conditioned diffusion-guided FWI baseline.

Capability parity with reference diffusion_bench/ilvr_fwi.py:41-326
(ILVR: Choi et al., ICCV 2021): after each denoise step, the low-frequency
band of the denoised model is replaced (with weight alpha) by the
low-frequency band of the q_sampled current model:

    denoised' = denoised - a*LF(denoised) + a*LF(q_sample(current, t))

where LF is an anti-aliased down/up resampling pair. The down factor
follows a 'linear' (16 -> 2) or 'stepwise' ([32, 16, 8, 4]) schedule over
the reverse chain. Here the resamplers are dense-matrix MXU products
(bench_methods/resizer.py) built once per distinct factor; the up path
maps exactly back to the original shape, so the reference's bilinear
shape fix-up (ilvr_fwi.py:299-312) is unnecessary.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from red_diffeq_tpu.bench_methods.diffusion_fwi import DiffusionFWI
from red_diffeq_tpu.bench_methods.resizer import Resizer


def ilvr_down_schedule(name: str, diffusion_ts: int) -> np.ndarray:
    """Down-factor schedule over the reverse chain (reference
    ilvr_fwi.py:92-103): 'linear' sweeps 16 -> 2; 'stepwise' uses equal
    [32, 16, 8, 4] blocks with any remainder (including the whole
    schedule when diffusion_ts < 4) padded by the finest factor."""
    if name == 'linear':
        return np.linspace(16, 2, diffusion_ts).astype(int)
    if name == 'stepwise':
        ns = [32, 16, 8, 4]
        down = np.repeat(ns, diffusion_ts // len(ns))
        if len(down) < diffusion_ts:
            down = np.pad(down, (0, diffusion_ts - len(down)),
                          constant_values=ns[-1])
        return down[:diffusion_ts]
    raise ValueError(f'Unknown ilvr_down_schedule: {name}')


# optimize()'s keyword of the same name shadows the function in its scope
ilvr_down_schedule_fn = ilvr_down_schedule


class ILVR_FWI(DiffusionFWI):
    """Reference diffusion_bench/ilvr_fwi.py:41 equivalent."""

    def __init__(self, diffusion_model, fwi_forward, ssim_loss=None):
        super().__init__(diffusion_model, fwi_forward, ssim_loss)
        self.use_ilvr = True
        self.ilvr_weight = 0.05
        self.down_n = None
        self._lowpass_cache = {}

    def optimize(self, mu, mu_true, y, fwi_forward, ts: int = 300,
                 diffusion_ts: int = 500, lr: float = 0.03,
                 noise_std: float = 0.0, noise_type: str = 'gaussian',
                 missing_number: int = 0, grad_norm: bool = True,
                 grad_smooth: Optional[float] = None,
                 model_blur: bool = False, grad_clip: float = 1.0,
                 use_ilvr: bool = True, ilvr_weight: float = 0.05,
                 ilvr_down_schedule: str = 'linear',
                 use_patches: bool = False, patch_kernel_size=None,
                 patch_stride=None, key=None, progress: bool = True):
        self.use_ilvr = use_ilvr
        self.ilvr_weight = ilvr_weight
        self.down_n = ilvr_down_schedule_fn(ilvr_down_schedule,
                                            diffusion_ts)

        return super().optimize(
            mu, mu_true, y, fwi_forward, ts=ts, diffusion_ts=diffusion_ts,
            lr=lr, noise_std=noise_std, noise_type=noise_type,
            missing_number=missing_number, grad_norm=grad_norm,
            grad_smooth=grad_smooth, model_blur=model_blur,
            grad_clip=grad_clip, use_patches=use_patches,
            patch_kernel_size=patch_kernel_size, patch_stride=patch_stride,
            key=key, progress=progress)

    def _lowpass(self, shape, down_factor: int):
        """Cached jitted LF extractor (down then up) for one factor."""
        cache_key = (tuple(shape), int(down_factor))
        if cache_key not in self._lowpass_cache:
            down = Resizer(shape, 1.0 / down_factor)
            up = Resizer((shape[0], shape[1], *down.out_hw),
                         output_shape=shape[2:])
            self._lowpass_cache[cache_key] = jax.jit(
                lambda x: up(down(x)))
        return self._lowpass_cache[cache_key]

    def _post_denoise_hook(self, denoised, prev_model, step, key):
        """ILVR conditioning after denoise (reference ilvr_fwi.py:156-158,
        268-326); skipped at t=0 like the reference."""
        if not self.use_ilvr or step <= 0:
            return denoised
        lowpass = self._lowpass(denoised.shape, self.down_n[step])
        t_tensor = jnp.full((denoised.shape[0],), step, dtype=jnp.int32)
        noise = jax.random.normal(key, prev_model.shape, prev_model.dtype)
        noised_current = self.diffusion_model.q_sample(
            prev_model, t_tensor, noise=noise)
        conditioned = (denoised
                       - self.ilvr_weight * lowpass(denoised)
                       + self.ilvr_weight * lowpass(noised_current))
        return jnp.clip(conditioned, -1.0, 1.0)
