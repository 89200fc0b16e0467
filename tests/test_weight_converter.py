"""Weight-converter tests: leaf-transform numerics against torch oracles
and full-tree structural conversion."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent.parent / 'tools'))
from convert_torch_checkpoint import (  # noqa: E402
    conv_w, convert_state_dict, dense_w, downsample_conv_w, rms_g,
)

from flax import linen as fnn  # noqa: E402

from red_diffeq_tpu.models.unet import (  # noqa: E402
    RMSNorm, Unet, space_to_depth,
)


def test_conv_transform_matches_torch():
    tconv = torch.nn.Conv2d(3, 5, 3, padding=1)
    x = torch.randn(2, 3, 8, 8)
    ref = tconv(x).detach().numpy()

    fconv = fnn.Conv(5, (3, 3), padding=1)
    params = {'kernel': jnp.asarray(conv_w(tconv.weight.detach().numpy())),
              'bias': jnp.asarray(tconv.bias.detach().numpy())}
    out = fconv.apply({'params': params},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_dense_transform_matches_torch():
    tlin = torch.nn.Linear(6, 4)
    x = torch.randn(3, 6)
    ref = tlin(x).detach().numpy()
    fdense = fnn.Dense(4)
    params = {'kernel': jnp.asarray(dense_w(tlin.weight.detach().numpy())),
              'bias': jnp.asarray(tlin.bias.detach().numpy())}
    out = fdense.apply({'params': params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_groupnorm_transform_matches_torch():
    tgn = torch.nn.GroupNorm(2, 8)
    with torch.no_grad():
        tgn.weight.copy_(torch.randn(8))
        tgn.bias.copy_(torch.randn(8))
    x = torch.randn(2, 8, 4, 4)
    ref = tgn(x).detach().numpy()
    fgn = fnn.GroupNorm(num_groups=2)
    params = {'scale': jnp.asarray(tgn.weight.detach().numpy()),
              'bias': jnp.asarray(tgn.bias.detach().numpy())}
    out = fgn.apply({'params': params},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_rmsnorm_transform_matches_torch_formula():
    # torch: F.normalize(x, dim=1) * g * sqrt(C), g shape (1, C, 1, 1)
    g = torch.randn(1, 6, 1, 1)
    x = torch.randn(2, 6, 5, 5)
    ref = (torch.nn.functional.normalize(x, dim=1) * g
           * (6 ** 0.5)).numpy()
    params = {'g': jnp.asarray(rms_g(g.numpy()))}
    out = RMSNorm(6).apply({'params': params},
                           jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_space_to_depth_conv_matches_torch_rearrange():
    """torch: Rearrange('b c (h p1) (w p2) -> b (c p1 p2) h w') + 1x1 conv;
    ours: space_to_depth (packs (p1, p2, c)) + permuted conv weights."""
    c, o = 3, 7
    tconv = torch.nn.Conv2d(4 * c, o, 1)
    x = torch.randn(2, c, 8, 8)
    # torch rearrange
    b, _, h, w = x.shape
    xr = x.reshape(b, c, h // 2, 2, w // 2, 2)
    xr = xr.permute(0, 1, 3, 5, 2, 4).reshape(b, 4 * c, h // 2, w // 2)
    ref = tconv(xr).detach().numpy()

    fconv = fnn.Conv(o, (1, 1))
    params = {
        'kernel': jnp.asarray(
            downsample_conv_w(tconv.weight.detach().numpy(), c)),
        'bias': jnp.asarray(tconv.bias.detach().numpy())}
    xs = space_to_depth(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    out = fconv.apply({'params': params}, xs)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def _synthetic_torch_state(dim, dim_mults, channels, rng):
    """Build a torch-style U-Net state dict with the lucidrains key layout
    (reference models/diffusion.py:220-267) and random values."""
    sd = {}
    num_stages = len(dim_mults)
    dims = [dim] + [dim * m for m in dim_mults]
    in_out = list(zip(dims[:-1], dims[1:]))
    time_dim = dim * 4
    heads, dim_head, mem = 4, 32, 4
    hidden = heads * dim_head

    def t(*shape):
        return rng.randn(*shape).astype(np.float32)

    def add_block(prefix, din, dout):
        sd[f'{prefix}.proj.weight'] = t(dout, din, 3, 3)
        sd[f'{prefix}.proj.bias'] = t(dout)
        sd[f'{prefix}.norm.weight'] = t(dout)
        sd[f'{prefix}.norm.bias'] = t(dout)

    def add_resnet(prefix, din, dout):
        sd[f'{prefix}.mlp.1.weight'] = t(dout * 2, time_dim)
        sd[f'{prefix}.mlp.1.bias'] = t(dout * 2)
        add_block(f'{prefix}.block1', din, dout)
        add_block(f'{prefix}.block2', dout, dout)
        if din != dout:
            sd[f'{prefix}.res_conv.weight'] = t(dout, din, 1, 1)
            sd[f'{prefix}.res_conv.bias'] = t(dout)

    def add_attn(prefix, d, full):
        sd[f'{prefix}.norm.g'] = t(1, d, 1, 1)
        sd[f'{prefix}.to_qkv.weight'] = t(hidden * 3, d, 1, 1)
        if full:
            sd[f'{prefix}.mem_kv'] = t(2, heads, mem, dim_head)
            sd[f'{prefix}.to_out.weight'] = t(d, hidden, 1, 1)
            sd[f'{prefix}.to_out.bias'] = t(d)
        else:
            sd[f'{prefix}.mem_kv'] = t(2, heads, dim_head, mem)
            sd[f'{prefix}.to_out.0.weight'] = t(d, hidden, 1, 1)
            sd[f'{prefix}.to_out.0.bias'] = t(d)
            sd[f'{prefix}.to_out.1.g'] = t(1, d, 1, 1)

    sd['init_conv.weight'] = t(dim, channels, 7, 7)
    sd['init_conv.bias'] = t(dim)
    sd['time_mlp.1.weight'] = t(time_dim, dim)
    sd['time_mlp.1.bias'] = t(time_dim)
    sd['time_mlp.3.weight'] = t(time_dim, time_dim)
    sd['time_mlp.3.bias'] = t(time_dim)

    full_attn = (False,) * (num_stages - 1) + (True,)
    for i, (din, dout) in enumerate(in_out):
        is_last = i == num_stages - 1
        add_resnet(f'downs.{i}.0', din, din)
        add_resnet(f'downs.{i}.1', din, din)
        add_attn(f'downs.{i}.2', din, full_attn[i])
        if is_last:
            sd[f'downs.{i}.3.weight'] = t(dout, din, 3, 3)
            sd[f'downs.{i}.3.bias'] = t(dout)
        else:
            sd[f'downs.{i}.3.1.weight'] = t(dout, din * 4, 1, 1)
            sd[f'downs.{i}.3.1.bias'] = t(dout)

    mid = dims[-1]
    add_resnet('mid_block1', mid, mid)
    add_attn('mid_attn', mid, True)
    add_resnet('mid_block2', mid, mid)

    for i, (din, dout) in enumerate(reversed(in_out)):
        is_last = i == num_stages - 1
        add_resnet(f'ups.{i}.0', dout + din, dout)
        add_resnet(f'ups.{i}.1', dout + din, dout)
        add_attn(f'ups.{i}.2', dout, tuple(reversed(full_attn))[i])
        if is_last:
            sd[f'ups.{i}.3.weight'] = t(din, dout, 3, 3)
            sd[f'ups.{i}.3.bias'] = t(din)
        else:
            sd[f'ups.{i}.3.1.weight'] = t(din, dout, 3, 3)
            sd[f'ups.{i}.3.1.bias'] = t(din)

    add_resnet('final_res_block', dim * 2, dim)
    sd['final_conv.weight'] = t(channels, dim, 1, 1)
    sd['final_conv.bias'] = t(channels)
    return sd


def test_full_tree_conversion_structure():
    """Converted tree must match the flax init tree exactly (same paths,
    same shapes) and load into the model."""
    dim, mults, ch = 8, (1, 2), 1
    rng = np.random.RandomState(0)
    sd = _synthetic_torch_state(dim, mults, ch, rng)
    params = convert_state_dict(sd, dim, mults, ch)

    model = Unet(dim=dim, dim_mults=mults, channels=ch)
    x = jnp.zeros((1, ch, 16, 16))
    ref_params = model.init(jax.random.PRNGKey(0), x,
                            jnp.array([0.0]))['params']
    ref_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                 jax.tree_util.tree_leaves_with_path(ref_params)}
    got_paths = {jax.tree_util.keystr(k): np.shape(v) for k, v in
                 jax.tree_util.tree_leaves_with_path(params)}
    assert ref_paths == got_paths

    out = model.apply({'params': params}, x, jnp.array([3.0]))
    assert out.shape == (1, ch, 16, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_full_model_numeric_parity_vs_torch_oracle():
    """Assemble a tiny lucidrains-layout torch U-Net in-test (ground
    truth: reference models/diffusion.py:220-301), convert its state
    dict, and assert full-forward numeric parity with the flax Unet.
    Catches wiring bugs — skip order, qkv channel order, scale/shift
    order — that per-layer transform tests cannot see (VERDICT r1 #5)."""
    import math as _math
    from functools import partial as _partial

    import torch
    import torch.nn.functional as F
    from torch import nn as tnn

    torch.manual_seed(0)
    dim, mults, ch = 8, (1, 2), 1
    heads, dim_head, mem = 4, 32, 4
    time_dim = dim * 4

    class TRMSNorm(tnn.Module):
        def __init__(self, d):
            super().__init__()
            self.g = tnn.Parameter(torch.randn(1, d, 1, 1))

        def forward(self, x):
            return F.normalize(x, dim=1) * self.g * x.shape[1] ** 0.5

    class TBlock(tnn.Module):
        def __init__(self, din, dout):
            super().__init__()
            self.proj = tnn.Conv2d(din, dout, 3, padding=1)
            self.norm = tnn.GroupNorm(8, dout)

        def forward(self, x, scale_shift=None):
            x = self.norm(self.proj(x))
            if scale_shift is not None:
                s, sh = scale_shift
                x = x * (s + 1) + sh
            return F.silu(x)

    class TResnet(tnn.Module):
        def __init__(self, din, dout):
            super().__init__()
            self.mlp = tnn.Sequential(tnn.SiLU(), tnn.Linear(time_dim, dout * 2))
            self.block1 = TBlock(din, dout)
            self.block2 = TBlock(dout, dout)
            self.res_conv = tnn.Conv2d(din, dout, 1) if din != dout \
                else tnn.Identity()

        def forward(self, x, t):
            te = self.mlp(t)[:, :, None, None]
            h = self.block1(x, scale_shift=te.chunk(2, dim=1))
            h = self.block2(h)
            return h + self.res_conv(x)

    class TLinearAttn(tnn.Module):
        def __init__(self, d):
            super().__init__()
            hidden = heads * dim_head
            self.norm = TRMSNorm(d)
            self.mem_kv = tnn.Parameter(torch.randn(2, heads, dim_head, mem))
            self.to_qkv = tnn.Conv2d(d, hidden * 3, 1, bias=False)
            self.to_out = tnn.Sequential(tnn.Conv2d(hidden, d, 1), TRMSNorm(d))

        def forward(self, x):
            b, c, h, w = x.shape
            xn = self.norm(x)
            qkv = self.to_qkv(xn).chunk(3, dim=1)
            q, k, v = [t.reshape(b, heads, dim_head, h * w) for t in qkv]
            mk = self.mem_kv[0].expand(b, -1, -1, -1)
            mv = self.mem_kv[1].expand(b, -1, -1, -1)
            k = torch.cat([mk, k], dim=-1)
            v = torch.cat([mv, v], dim=-1)
            q = q.softmax(dim=-2) * dim_head ** -0.5
            k = k.softmax(dim=-1)
            context = torch.einsum('bhdn,bhen->bhde', k, v)
            out = torch.einsum('bhde,bhdn->bhen', context, q)
            out = out.reshape(b, heads * dim_head, h, w)
            return self.to_out(out)

    class TFullAttn(tnn.Module):
        def __init__(self, d):
            super().__init__()
            hidden = heads * dim_head
            self.norm = TRMSNorm(d)
            self.mem_kv = tnn.Parameter(torch.randn(2, heads, mem, dim_head))
            self.to_qkv = tnn.Conv2d(d, hidden * 3, 1, bias=False)
            self.to_out = tnn.Conv2d(hidden, d, 1)

        def forward(self, x):
            b, c, h, w = x.shape
            xn = self.norm(x)
            qkv = self.to_qkv(xn).chunk(3, dim=1)
            q, k, v = [t.reshape(b, heads, dim_head, h * w).transpose(-2, -1)
                       for t in qkv]
            mk = self.mem_kv[0].expand(b, -1, -1, -1)
            mv = self.mem_kv[1].expand(b, -1, -1, -1)
            k = torch.cat([mk, k], dim=-2)
            v = torch.cat([mv, v], dim=-2)
            sim = torch.einsum('bhid,bhjd->bhij', q, k) * dim_head ** -0.5
            out = torch.einsum('bhij,bhjd->bhid', sim.softmax(dim=-1), v)
            out = out.transpose(-2, -1).reshape(b, heads * dim_head, h, w)
            return self.to_out(out)

    def t_downsample(din, dout):
        class S2D(tnn.Module):
            def forward(self, x):
                b, c, h, w = x.shape
                x = x.reshape(b, c, h // 2, 2, w // 2, 2)
                x = x.permute(0, 1, 3, 5, 2, 4)
                return x.reshape(b, c * 4, h // 2, w // 2)
        return tnn.Sequential(S2D(), tnn.Conv2d(din * 4, dout, 1))

    def t_upsample(din, dout):
        return tnn.Sequential(tnn.Upsample(scale_factor=2, mode='nearest'),
                              tnn.Conv2d(din, dout, 3, padding=1))

    class TUnet(tnn.Module):
        def __init__(self):
            super().__init__()
            dims = [dim] + [dim * m for m in mults]
            in_out = list(zip(dims[:-1], dims[1:]))
            self.init_conv = tnn.Conv2d(ch, dim, 7, padding=3)
            self.time_mlp = tnn.Sequential(
                tnn.Identity(),  # placeholder for sinu emb (applied manually)
                tnn.Linear(dim, time_dim), tnn.GELU(),
                tnn.Linear(time_dim, time_dim))
            full = (False,) * (len(mults) - 1) + (True,)
            self.downs = tnn.ModuleList()
            for i, (di, do) in enumerate(in_out):
                last = i == len(in_out) - 1
                self.downs.append(tnn.ModuleList([
                    TResnet(di, di), TResnet(di, di),
                    TFullAttn(di) if full[i] else TLinearAttn(di),
                    tnn.Conv2d(di, do, 3, padding=1) if last
                    else t_downsample(di, do)]))
            mid = dims[-1]
            self.mid_block1 = TResnet(mid, mid)
            self.mid_attn = TFullAttn(mid)
            self.mid_block2 = TResnet(mid, mid)
            self.ups = tnn.ModuleList()
            for i, (di, do) in enumerate(reversed(in_out)):
                last = i == len(in_out) - 1
                self.ups.append(tnn.ModuleList([
                    TResnet(do + di, do), TResnet(do + di, do),
                    TFullAttn(do) if tuple(reversed(full))[i]
                    else TLinearAttn(do),
                    tnn.Conv2d(do, di, 3, padding=1) if last
                    else t_upsample(do, di)]))
            self.final_res_block = TResnet(dim * 2, dim)
            self.final_conv = tnn.Conv2d(dim, ch, 1)

        def forward(self, x, time):
            x = self.init_conv(x)
            r = x.clone()
            half = dim // 2
            emb = _math.log(10000) / (half - 1)
            emb = torch.exp(torch.arange(half) * -emb)
            emb = time[:, None] * emb[None, :]
            emb = torch.cat([emb.sin(), emb.cos()], dim=-1)
            t = self.time_mlp(emb)
            h = []
            for b1, b2, attn, down in self.downs:
                x = b1(x, t); h.append(x)
                x = b2(x, t)
                x = attn(x) + x; h.append(x)
                x = down(x)
            x = self.mid_block1(x, t)
            x = self.mid_attn(x) + x
            x = self.mid_block2(x, t)
            for b1, b2, attn, up in self.ups:
                x = torch.cat([x, h.pop()], dim=1); x = b1(x, t)
                x = torch.cat([x, h.pop()], dim=1); x = b2(x, t)
                x = attn(x) + x
                x = up(x)
            x = torch.cat([x, r], dim=1)
            return self.final_conv(self.final_res_block(x, t))

    tmodel = TUnet().eval()
    # randomize all params so parity is non-trivial
    with torch.no_grad():
        for p in tmodel.parameters():
            p.normal_(0.0, 0.5)

    # map in-test module names to reference state-dict keys
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_state_dict(sd, dim, mults, ch)

    x_t = torch.randn(2, ch, 16, 16)
    t_t = torch.tensor([3.0, 777.0])
    with torch.no_grad():
        want = tmodel(x_t, t_t).numpy()

    model = Unet(dim=dim, dim_mults=mults, channels=ch)
    got = np.asarray(model.apply({'params': params},
                                 jnp.asarray(x_t.numpy()),
                                 jnp.asarray(t_t.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-4 * np.abs(want).max())
