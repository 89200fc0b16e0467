"""Gaussian diffusion: schedules, forward process, sampling, training loss.

Functional JAX counterpart of the reference DDPM wrapper
(red_diffeq/models/diffusion.py:304-555). All schedule coefficients are
precomputed in float64 on the host and stored as float32 device constants
(the reference registers fp32 buffers and pins q_sample to fp32 under AMP
— models/diffusion.py:361-385,516); sampling loops are ``lax.scan`` /
``lax.fori_loop`` programs, fully jittable.
"""
import math
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from red_diffeq_tpu.models.unet import Unet
from red_diffeq_tpu.utils.diffusion_utils import extract


class ModelPrediction(NamedTuple):
    pred_noise: jax.Array
    pred_x_start: jax.Array


# ----------------------------------------------------------------------
# Beta schedules (reference models/diffusion.py:304-326), float64 host math.
# ----------------------------------------------------------------------

def linear_beta_schedule(timesteps: int) -> np.ndarray:
    scale = 1000.0 / timesteps
    return np.linspace(scale * 1e-4, scale * 0.02, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    t = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64) / timesteps
    ac = np.cos((t + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - ac[1:] / ac[:-1]
    return np.clip(betas, 0, 0.999)


def sigmoid_beta_schedule(timesteps: int, start: float = -3, end: float = 3,
                          tau: float = 1.0) -> np.ndarray:
    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))
    t = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64) / timesteps
    v_start, v_end = sigmoid(start / tau), sigmoid(end / tau)
    ac = (-sigmoid((t * (end - start) + start) / tau) + v_end) / (v_end - v_start)
    ac = ac / ac[0]
    betas = 1 - ac[1:] / ac[:-1]
    return np.clip(betas, 0, 0.999)


_SCHEDULES = {
    'linear': linear_beta_schedule,
    'cosine': cosine_beta_schedule,
    'sigmoid': sigmoid_beta_schedule,
}


@dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed fp32 coefficient arrays (reference buffers,
    models/diffusion.py:361-385)."""
    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    loss_weight: jax.Array

    @staticmethod
    def create(timesteps: int, beta_schedule: str = 'sigmoid',
               objective: str = 'pred_noise', min_snr_loss_weight: bool = False,
               min_snr_gamma: float = 5.0,
               schedule_fn_kwargs: Optional[dict] = None) -> 'DiffusionSchedule':
        betas = _SCHEDULES[beta_schedule](timesteps,
                                          **(schedule_fn_kwargs or {}))
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.concatenate([[1.0], ac[:-1]])
        post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
        snr = ac / (1 - ac)
        clipped_snr = np.minimum(snr, min_snr_gamma) if min_snr_loss_weight \
            else snr
        if objective == 'pred_noise':
            loss_weight = clipped_snr / snr
        elif objective == 'pred_x0':
            loss_weight = clipped_snr
        elif objective == 'pred_v':
            loss_weight = clipped_snr / (snr + 1)
        else:
            raise ValueError(f'unknown objective {objective}')
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        return DiffusionSchedule(
            betas=f32(betas),
            alphas_cumprod=f32(ac),
            alphas_cumprod_prev=f32(ac_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(ac)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - ac)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - ac)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / ac)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / ac - 1)),
            posterior_variance=f32(post_var),
            posterior_log_variance_clipped=f32(
                np.log(np.clip(post_var, 1e-20, None))),
            posterior_mean_coef1=f32(betas * np.sqrt(ac_prev) / (1.0 - ac)),
            posterior_mean_coef2=f32((1.0 - ac_prev) * np.sqrt(alphas)
                                     / (1.0 - ac)),
            loss_weight=f32(loss_weight),
        )


def _normalize(x):
    return x * 2.0 - 1.0


def _unnormalize(x):
    return (x + 1.0) * 0.5


class GaussianDiffusion:
    """DDPM wrapper bundling a Unet, its params, and the schedule.

    Interface parity with reference models/diffusion.py:328-555; every
    sampling entry point is jit-compiled on first use. ``params`` may be
    swapped (e.g., EMA weights) via :meth:`with_params`.
    """

    def __init__(self, model: Unet, *, image_size, timesteps: int = 1000,
                 sampling_timesteps: Optional[int] = None,
                 objective: str = 'pred_noise', beta_schedule: str = 'sigmoid',
                 schedule_fn_kwargs: Optional[dict] = None,
                 ddim_sampling_eta: float = 0.0, auto_normalize: bool = True,
                 offset_noise_strength: float = 0.0,
                 min_snr_loss_weight: bool = False, min_snr_gamma: float = 5.0,
                 params=None, half_precision: bool = False):
        assert objective in ('pred_noise', 'pred_x0', 'pred_v')
        self.model = model
        self.params = params
        self.channels = model.channels
        self.self_condition = model.self_condition
        if isinstance(image_size, int):
            image_size = (image_size, image_size)
        self.image_size = tuple(image_size)
        self.objective = objective
        self.num_timesteps = int(timesteps)
        self.sampling_timesteps = sampling_timesteps or timesteps
        assert self.sampling_timesteps <= timesteps
        self.is_ddim_sampling = self.sampling_timesteps < timesteps
        self.ddim_sampling_eta = ddim_sampling_eta
        self.offset_noise_strength = offset_noise_strength
        self.auto_normalize = auto_normalize
        self.half_precision = half_precision
        self.schedule = DiffusionSchedule.create(
            timesteps, beta_schedule, objective, min_snr_loss_weight,
            min_snr_gamma, schedule_fn_kwargs)
        self.normalize = _normalize if auto_normalize else (lambda x: x)
        self.unnormalize = _unnormalize if auto_normalize else (lambda x: x)

    # -- params handling -------------------------------------------------

    def init_params(self, key: jax.Array):
        h, w = self.image_size
        dummy = jnp.zeros((1, self.channels, h, w), jnp.float32)
        t = jnp.zeros((1,), jnp.float32)
        variables = self.model.init(key, dummy, t)
        self.params = variables['params']
        return self.params

    def with_params(self, params) -> 'GaussianDiffusion':
        import copy
        new = copy.copy(self)
        new.params = params
        return new

    def apply_fn(self, x, t, x_self_cond=None):
        """One denoiser forward pass. Optionally runs the U-Net in bf16
        (weights + activations) with fp32 I/O — schedule math never leaves
        fp32, mirroring the reference's AMP discipline
        (models/diffusion.py:516)."""
        if self.params is None:
            raise ValueError('model params not initialized '
                             '(call init_params or load a checkpoint)')
        if self.half_precision:
            params = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p, self.params)
            # t stays fp32: bf16's 8-bit mantissa quantizes integer
            # timesteps >512 to multiples of 4, conflating adjacent steps;
            # the sinusoidal embedding computes in fp32 anyway.
            out = self.model.apply({'params': params},
                                   x.astype(jnp.bfloat16),
                                   t.astype(jnp.float32), x_self_cond)
            return out.astype(jnp.float32)
        return self.model.apply({'params': self.params}, x, t, x_self_cond)

    # -- forward process -------------------------------------------------

    def q_sample(self, x_start, t, noise=None, key=None):
        """Diffuse x_start to timestep t (reference models/diffusion.py:517)."""
        if noise is None:
            noise = jax.random.normal(key, x_start.shape, x_start.dtype)
        s = self.schedule
        return (extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
                + extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
                * noise)

    # -- prediction identities (reference models/diffusion.py:393-403) ---

    def predict_start_from_noise(self, x_t, t, noise):
        s = self.schedule
        return (extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
                - extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise)

    def predict_noise_from_start(self, x_t, t, x0):
        s = self.schedule
        return ((extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0)
                / extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim))

    def predict_v(self, x_start, t, noise):
        s = self.schedule
        return (extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * noise
                - extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
                * x_start)

    def predict_start_from_v(self, x_t, t, v):
        s = self.schedule
        return (extract(s.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
                - extract(s.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v)

    def q_posterior(self, x_start, x_t, t):
        s = self.schedule
        mean = (extract(s.posterior_mean_coef1, t, x_t.ndim) * x_start
                + extract(s.posterior_mean_coef2, t, x_t.ndim) * x_t)
        var = extract(s.posterior_variance, t, x_t.ndim)
        log_var = extract(s.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, var, log_var

    # -- model predictions (reference models/diffusion.py:411-437) -------

    def model_predictions(self, x, t, x_self_cond=None, clip_x_start=False,
                          rederive_pred_noise=False) -> ModelPrediction:
        out = self.apply_fn(x, t, x_self_cond)
        clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start \
            else (lambda v: v)
        if self.objective == 'pred_noise':
            pred_noise = out
            x_start = clip(self.predict_start_from_noise(x, t, pred_noise))
            if clip_x_start and rederive_pred_noise:
                pred_noise = self.predict_noise_from_start(x, t, x_start)
        elif self.objective == 'pred_x0':
            x_start = clip(out)
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        else:  # pred_v
            x_start = clip(self.predict_start_from_v(x, t, out))
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        return ModelPrediction(pred_noise, x_start)

    def p_mean_variance(self, x, t, x_self_cond=None, clip_denoised=True):
        preds = self.model_predictions(x, t, x_self_cond)
        x_start = preds.pred_x_start
        if clip_denoised:
            x_start = jnp.clip(x_start, -1.0, 1.0)
        mean, var, log_var = self.q_posterior(x_start, x, t)
        return mean, var, log_var, x_start

    # -- ancestral sampling (reference models/diffusion.py:440-466) ------

    def p_sample(self, x, t: jax.Array, key: jax.Array, x_self_cond=None):
        """One reverse step; ``t`` may be a traced scalar. Noise is added
        except at t == 0."""
        bt = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        mean, _, log_var, x_start = self.p_mean_variance(x, bt, x_self_cond)
        noise = jax.random.normal(key, x.shape, x.dtype)
        nz = (t > 0).astype(x.dtype)
        return mean + nz * jnp.exp(0.5 * log_var) * noise, x_start

    def p_sample_deterministic(self, x, t, x_self_cond=None):
        """Posterior mean without noise — the repo's deterministic reverse
        step (reference models/diffusion.py:448-452)."""
        bt = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        mean, _, _, x_start = self.p_mean_variance(x, bt, x_self_cond)
        return mean, x_start

    def p_sample_loop(self, shape, key: jax.Array,
                      return_all_timesteps: bool = False):
        key, init_key = jax.random.split(key)
        img = jax.random.normal(init_key, shape)

        def body(img, xs):
            t, k = xs
            img, _ = self.p_sample(img, t, k)
            return img, (img if return_all_timesteps else None)

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        keys = jax.random.split(key, self.num_timesteps)
        final, trail = jax.lax.scan(body, img, (ts, keys))
        if return_all_timesteps:
            ret = jnp.concatenate([img[None], trail], axis=0)
            ret = jnp.moveaxis(ret, 0, 1)
        else:
            ret = final
        return self.unnormalize(ret)

    def ddim_sample(self, shape, key: jax.Array,
                    return_all_timesteps: bool = False):
        """DDIM sampler (reference models/diffusion.py:469-494), expressed
        as a single ``lax.scan`` so the whole chain is one compiled
        program (the reference re-dispatches the model per step)."""
        total, sampling = self.num_timesteps, self.sampling_timesteps
        eta = self.ddim_sampling_eta
        times = np.linspace(-1, total - 1, sampling + 1).astype(int)[::-1]
        t_cur = jnp.asarray(times[:-1], jnp.int32)
        t_next = jnp.asarray(times[1:], jnp.int32)

        key, init_key = jax.random.split(key)
        img = jax.random.normal(init_key, shape)
        ac = self.schedule.alphas_cumprod
        keys = jax.random.split(key, len(times) - 1)

        def body(img, xs):
            time, time_next, k = xs
            bt = jnp.full((shape[0],), time, dtype=jnp.int32)
            pred_noise, x_start = self.model_predictions(
                img, bt, clip_x_start=True, rederive_pred_noise=True)
            is_last = time_next < 0
            alpha = ac[time]
            alpha_next = jnp.where(is_last, 1.0,
                                   ac[jnp.clip(time_next, 0, None)])
            sigma = eta * jnp.sqrt((1 - alpha / alpha_next)
                                   * (1 - alpha_next) / (1 - alpha))
            c = jnp.sqrt(jnp.clip(1 - alpha_next - sigma ** 2, 0.0, None))
            noise = jax.random.normal(k, img.shape, img.dtype)
            img_next = (x_start * jnp.sqrt(alpha_next) + c * pred_noise
                        + sigma * noise)
            img_next = jnp.where(is_last, x_start, img_next)
            return img_next, (img_next if return_all_timesteps else None)

        final, trail = jax.lax.scan(body, img, (t_cur, t_next, keys))
        if return_all_timesteps:
            ret = jnp.concatenate([img[None], trail], axis=0)
            ret = jnp.moveaxis(ret, 0, 1)
        else:
            ret = final
        return self.unnormalize(ret)

    def sample(self, batch_size: int = 16, key: Optional[jax.Array] = None,
               return_all_timesteps: bool = False):
        if key is None:
            from red_diffeq_tpu.utils.seed_utils import next_key
            key = next_key()
        h, w = self.image_size
        shape = (batch_size, self.channels, h, w)
        fn = self.ddim_sample if self.is_ddim_sampling else self.p_sample_loop
        return fn(shape, key, return_all_timesteps=return_all_timesteps)

    def interpolate(self, x1, x2, key: jax.Array, t: Optional[int] = None,
                    lam: float = 0.5):
        """Spherical-ish latent interpolation (reference
        models/diffusion.py:503-514)."""
        t = self.num_timesteps - 1 if t is None else t
        b = x1.shape[0]
        bt = jnp.full((b,), t, dtype=jnp.int32)
        key, k1, k2 = jax.random.split(key, 3)
        xt1 = self.q_sample(x1, bt, key=k1)
        xt2 = self.q_sample(x2, bt, key=k2)
        img = (1 - lam) * xt1 + lam * xt2

        def body(img, xs):
            ti, k = xs
            img, _ = self.p_sample(img, ti, k)
            return img, None

        ts = jnp.arange(t - 1, -1, -1)
        keys = jax.random.split(key, t)
        img, _ = jax.lax.scan(body, img, (ts, keys))
        return img

    # -- training loss (reference models/diffusion.py:521-554) -----------

    def p_losses(self, params, x_start, t, key: jax.Array,
                 offset_noise_strength: Optional[float] = None):
        key, k_noise, k_off = jax.random.split(key, 3)
        noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
        ons = self.offset_noise_strength if offset_noise_strength is None \
            else offset_noise_strength
        if ons > 0.0:
            offset = jax.random.normal(k_off, x_start.shape[:2])
            noise = noise + ons * offset[:, :, None, None]
        x = self.q_sample(x_start, t, noise=noise)
        # Run the denoiser at the caller's parameter precision: the
        # trainer's amp path passes bf16 params, but q_sample's fp32
        # schedule constants promote x back to fp32 — without this cast
        # flax would upcast the weights and the whole forward would
        # silently run fp32, defeating mixed precision. Loss math below
        # stays fp32 via target promotion.
        p_dtype = jax.tree_util.tree_leaves(params)[0].dtype
        model_out = self.model.apply({'params': params},
                                     x.astype(p_dtype),
                                     t.astype(jnp.float32))
        if self.objective == 'pred_noise':
            target = noise
        elif self.objective == 'pred_x0':
            target = x_start
        else:
            target = self.predict_v(x_start, t, noise)
        loss = jnp.mean((model_out - target) ** 2, axis=(1, 2, 3))
        loss = loss * extract(self.schedule.loss_weight, t, 1)
        return loss.mean()

    def loss(self, params, img, key: jax.Array):
        """Sample t ~ U and compute the denoising loss on a [0,1] batch
        (reference models/diffusion.py:549-554)."""
        b = img.shape[0]
        h, w = self.image_size
        assert img.shape[2] == h and img.shape[3] == w, \
            f'image size must be {self.image_size}'
        key, kt = jax.random.split(key)
        t = jax.random.randint(kt, (b,), 0, self.num_timesteps)
        img = self.normalize(img)
        return self.p_losses(params, img, t, key)
