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
