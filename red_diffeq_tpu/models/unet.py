"""Denoising U-Net in Flax linen, NHWC (TPU-native) layout.

Architecture parity with the vendored lucidrains model used by the
reference (red_diffeq/models/diffusion.py:78-301): 7x7 init conv,
ResNet blocks (GroupNorm(8) + time scale/shift), linear attention at the
outer stages, full attention at the innermost stage and bottleneck,
space-to-depth downsampling, nearest-neighbor + 3x3 upsampling, RMSNorm,
sinusoidal time embedding. Channel counts dim * (1, 2, 4, 8) around a
dim*4 time MLP.

Internally everything is NHWC so convolutions map directly onto TPU
tiling; the public ``apply`` accepts NCHW to match the reference data
layout and transposes at the boundary.
"""
import math
from functools import partial
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


class RMSNorm(nn.Module):
    """Channel-wise RMS norm with learned gain, matching torch
    ``F.normalize(x, dim=channel) * g * sqrt(C)``
    (reference models/diffusion.py:84-91)."""
    dim: int

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        g = self.param('g', nn.initializers.ones, (1, 1, 1, self.dim))
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        normed = x / jnp.maximum(norm, 1e-12)
        return normed * g * math.sqrt(self.dim)


class SinusoidalPosEmb(nn.Module):
    """Classic transformer sin/cos embedding of the diffusion timestep
    (reference models/diffusion.py:93-107)."""
    dim: int
    theta: float = 10000.0

    def __call__(self, t):  # t: (B,) float
        half = self.dim // 2
        freqs = jnp.exp(
            jnp.arange(half, dtype=jnp.float32)
            * (-math.log(self.theta) / (half - 1)))
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    """Fourier-feature time embedding with (optionally frozen) random
    frequencies (reference models/diffusion.py:118-132)."""
    dim: int
    is_random: bool = False

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        w = self.param('weights', nn.initializers.normal(1.0), (half,))
        if self.is_random:
            w = jax.lax.stop_gradient(w)
        t = t.astype(jnp.float32)[:, None]
        freqs = t * w[None, :] * 2 * math.pi
        return jnp.concatenate([t, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class Block(nn.Module):
    """conv3x3 -> GroupNorm -> (scale+1)*x+shift -> SiLU
    (reference models/diffusion.py:134-149)."""
    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, scale_shift: Optional[Tuple] = None):
        x = nn.Conv(self.dim_out, (3, 3), padding=1, name='proj')(x)
        x = nn.GroupNorm(num_groups=self.groups, name='norm')(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class ResnetBlock(nn.Module):
    """Two conv blocks with a FiLM-style time conditioning and a 1x1
    residual projection (reference models/diffusion.py:151-168)."""
    dim: int
    dim_out: int
    groups: int = 8
    use_time_emb: bool = True

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if self.use_time_emb and time_emb is not None:
            h_t = nn.Dense(self.dim_out * 2, name='time_mlp')(
                nn.silu(time_emb))
            h_t = h_t[:, None, None, :]  # (B, 1, 1, 2*dim_out)
            scale_shift = jnp.split(h_t, 2, axis=-1)
        h = Block(self.dim_out, groups=self.groups, name='block1')(
            x, scale_shift)
        h = Block(self.dim_out, groups=self.groups, name='block2')(h)
        if self.dim != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), name='res_conv')(x)
        return h + x


class LinearAttention(nn.Module):
    """Linear (kernelized) attention with memory kv slots
    (reference models/diffusion.py:170-195)."""
    dim: int
    heads: int = 4
    dim_head: int = 32
    num_mem_kv: int = 4

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        hidden = self.dim_head * self.heads
        x_in = x
        x = RMSNorm(self.dim, name='norm')(x)
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, name='to_qkv')(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
        # (B, heads, dim_head, N)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 3, 1) for i in range(3)]

        mem_kv = self.param('mem_kv', nn.initializers.normal(1.0),
                            (2, self.heads, self.dim_head, self.num_mem_kv))
        mk = jnp.broadcast_to(mem_kv[0], (b, *mem_kv[0].shape))
        mv = jnp.broadcast_to(mem_kv[1], (b, *mem_kv[1].shape))
        k = jnp.concatenate([mk, k], axis=-1)
        v = jnp.concatenate([mv, v], axis=-1)

        q = jax.nn.softmax(q, axis=-2) * (self.dim_head ** -0.5)
        k = jax.nn.softmax(k, axis=-1)
        context = jnp.einsum('bhdn,bhen->bhde', k, v)
        out = jnp.einsum('bhde,bhdn->bhen', context, q)   # (B, heads, e, N)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, hidden)
        out = nn.Conv(self.dim, (1, 1), name='to_out')(out)
        out = RMSNorm(self.dim, name='out_norm')(out)
        return out + x_in


class Attention(nn.Module):
    """Full softmax attention over all spatial positions plus memory kv
    (reference models/diffusion.py:197-218). Runs only at the 9x9
    bottleneck resolutions, so the MXU matmuls stay tiny but exact."""
    dim: int
    heads: int = 4
    dim_head: int = 32
    num_mem_kv: int = 4

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.dim_head * self.heads
        x_in = x
        x = RMSNorm(self.dim, name='norm')(x)
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, name='to_qkv')(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
        # (B, heads, N, dim_head)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]

        mem_kv = self.param('mem_kv', nn.initializers.normal(1.0),
                            (2, self.heads, self.num_mem_kv, self.dim_head))
        mk = jnp.broadcast_to(mem_kv[0], (b, *mem_kv[0].shape))
        mv = jnp.broadcast_to(mem_kv[1], (b, *mem_kv[1].shape))
        k = jnp.concatenate([mk, k], axis=-2)
        v = jnp.concatenate([mv, v], axis=-2)

        attn = jnp.einsum('bhid,bhjd->bhij', q, k) * (self.dim_head ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum('bhij,bhjd->bhid', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, hidden)
        out = nn.Conv(self.dim, (1, 1), name='to_out')(out)
        return out + x_in


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); lossless downsample
    (reference Downsample, models/diffusion.py:81-82)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def nearest_upsample(x):
    """2x nearest-neighbor upsample (reference Upsample,
    models/diffusion.py:78-79)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class Unet(nn.Module):
    """The denoiser. Interface mirrors reference models/diffusion.py:220-301.

    ``__call__`` takes NCHW input (B, channels, H, W) and timesteps (B,);
    H and W must be divisible by 2**(stages-1).
    """
    dim: int
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 1
    self_condition: bool = False
    resnet_block_groups: int = 8
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    sinusoidal_pos_emb_theta: float = 10000.0
    attn_dim_head: Union[int, Sequence[int]] = 32
    attn_heads: Union[int, Sequence[int]] = 4
    full_attn: Optional[Sequence[bool]] = None
    flash_attn: bool = False  # accepted for config parity; XLA fuses attention

    @property
    def downsample_factor(self):
        return 2 ** (len(self.dim_mults) - 1)

    @nn.compact
    def __call__(self, x, time, x_self_cond=None):
        num_stages = len(self.dim_mults)

        def as_tuple(v):
            return tuple(v) if isinstance(v, (tuple, list)) else (v,) * num_stages

        full_attn = (tuple(self.full_attn) if self.full_attn is not None
                     else (False,) * (num_stages - 1) + (True,))
        heads = as_tuple(self.attn_heads)
        dim_heads = as_tuple(self.attn_dim_head)

        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=1)

        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        assert x.shape[1] % self.downsample_factor == 0 and \
            x.shape[2] % self.downsample_factor == 0, (
                f'input spatial dims {x.shape[1:3]} must divide by '
                f'{self.downsample_factor}')

        init_dim = self.init_dim or self.dim
        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        time_dim = self.dim * 4

        # Time embedding MLP (reference models/diffusion.py:233-240).
        if self.learned_sinusoidal_cond or self.random_fourier_features:
            emb = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim,
                self.random_fourier_features, name='sinu_pos_emb')(time)
        else:
            emb = SinusoidalPosEmb(self.dim,
                                   self.sinusoidal_pos_emb_theta)(time)
        # sin/cos of the exact integer timestep is computed in fp32 (bf16
        # would quantize t>512); below this point the embedding follows the
        # activation dtype so a bf16 forward stays bf16 end-to-end.
        emb = emb.astype(x.dtype)
        t = nn.Dense(time_dim, name='time_dense_0')(emb)
        t = nn.Dense(time_dim, name='time_dense_1')(
            nn.gelu(t, approximate=False))

        block = partial(ResnetBlock, groups=self.resnet_block_groups)

        x = nn.Conv(init_dim, (7, 7), padding=3, name='init_conv')(x)
        r = x

        skips = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_stages - 1
            attn_cls = Attention if full_attn[ind] else LinearAttention
            x = block(dim_in, dim_in, name=f'down_{ind}_block1')(x, t)
            skips.append(x)
            x = block(dim_in, dim_in, name=f'down_{ind}_block2')(x, t)
            x = attn_cls(dim_in, heads=heads[ind], dim_head=dim_heads[ind],
                         name=f'down_{ind}_attn')(x)
            skips.append(x)
            if not is_last:
                x = nn.Conv(dim_out, (1, 1),
                            name=f'down_{ind}_downsample')(space_to_depth(x))
            else:
                x = nn.Conv(dim_out, (3, 3), padding=1,
                            name=f'down_{ind}_downsample')(x)

        mid_dim = dims[-1]
        x = block(mid_dim, mid_dim, name='mid_block1')(x, t)
        x = Attention(mid_dim, heads=heads[-1], dim_head=dim_heads[-1],
                      name='mid_attn')(x)
        x = block(mid_dim, mid_dim, name='mid_block2')(x, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == num_stages - 1
            attn_cls = Attention if tuple(reversed(full_attn))[ind] \
                else LinearAttention
            h_ = tuple(reversed(heads))[ind]
            dh = tuple(reversed(dim_heads))[ind]
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = block(dim_out + dim_in, dim_out, name=f'up_{ind}_block1')(x, t)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = block(dim_out + dim_in, dim_out, name=f'up_{ind}_block2')(x, t)
            x = attn_cls(dim_out, heads=h_, dim_head=dh,
                         name=f'up_{ind}_attn')(x)
            if not is_last:
                x = nn.Conv(dim_in, (3, 3), padding=1,
                            name=f'up_{ind}_upsample')(nearest_upsample(x))
            else:
                x = nn.Conv(dim_in, (3, 3), padding=1,
                            name=f'up_{ind}_upsample')(x)

        out_dim = self.out_dim or self.channels * (2 if self.learned_variance
                                                   else 1)
        x = jnp.concatenate([x, r], axis=-1)
        x = block(self.dim * 2, self.dim, name='final_res_block')(x, t)
        x = nn.Conv(out_dim, (1, 1), name='final_conv')(x)
        return jnp.transpose(x, (0, 3, 1, 2))  # NHWC -> NCHW
