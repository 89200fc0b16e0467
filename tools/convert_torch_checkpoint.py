"""Convert a reference PyTorch diffusion checkpoint to flax params.

The reference trainer saves ``model-<k>.pt`` dicts with keys
``{step, model, opt, ema, scaler, version}`` (reference
red_diffeq/models/diffusion.py:617-625); ``model`` holds the
GaussianDiffusion state dict whose U-Net weights live under the
``model.`` prefix, and ``ema`` under ``ema_model.model.``. This tool maps
those tensors onto the explicitly-named flax parameter tree of
``red_diffeq_tpu.models.unet.Unet`` and writes a ``.ckpt`` loadable by
``red_diffeq_tpu.io.checkpoints.load_diffusion_params``.

Layout transforms:
* Conv2d (O, I, kh, kw)      -> flax kernel (kh, kw, I, O)
* Linear (O, I)              -> flax kernel (I, O)
* GroupNorm weight/bias      -> scale/bias
* RMSNorm g (1, C, 1, 1)     -> (1, 1, 1, C)
* space-to-depth conv input channels: torch Rearrange packs (c, p1, p2),
  our space_to_depth packs (p1, p2, c) — the I axis is permuted.

Usage:
    python tools/convert_torch_checkpoint.py model-4.pt model-4.ckpt \
        [--source ema|model] [--dim 64] [--dim-mults 1 2 4 8]
"""
import argparse
import sys
from pathlib import Path

import numpy as np


def conv_w(t):
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def dense_w(t):
    return np.transpose(np.asarray(t), (1, 0))


def rms_g(t):
    return np.transpose(np.asarray(t), (0, 2, 3, 1))


def downsample_conv_w(t, base_channels):
    """1x1 conv after space-to-depth: permute packed input channels from
    torch's (c, p1, p2) order to our (p1, p2, c) order, then conv_w."""
    t = np.asarray(t)                       # (O, 4C, 1, 1)
    o, four_c = t.shape[:2]
    c = base_channels
    assert four_c == 4 * c, (four_c, c)
    t = t.reshape(o, c, 2, 2, 1, 1).transpose(0, 2, 3, 1, 4, 5)
    t = t.reshape(o, 4 * c, 1, 1)
    return conv_w(t)


def _block(sd, prefix):
    """Map one `Block` (proj conv + group norm)."""
    return {
        'proj': {'kernel': conv_w(sd[f'{prefix}.proj.weight']),
                 'bias': np.asarray(sd[f'{prefix}.proj.bias'])},
        'norm': {'scale': np.asarray(sd[f'{prefix}.norm.weight']),
                 'bias': np.asarray(sd[f'{prefix}.norm.bias'])},
    }


def _resnet_block(sd, prefix):
    out = {
        'time_mlp': {'kernel': dense_w(sd[f'{prefix}.mlp.1.weight']),
                     'bias': np.asarray(sd[f'{prefix}.mlp.1.bias'])},
        'block1': _block(sd, f'{prefix}.block1'),
        'block2': _block(sd, f'{prefix}.block2'),
    }
    if f'{prefix}.res_conv.weight' in sd:
        out['res_conv'] = {
            'kernel': conv_w(sd[f'{prefix}.res_conv.weight']),
            'bias': np.asarray(sd[f'{prefix}.res_conv.bias'])}
    return out


def _attention(sd, prefix, full: bool):
    out = {
        'norm': {'g': rms_g(sd[f'{prefix}.norm.g'])},
        'mem_kv': np.asarray(sd[f'{prefix}.mem_kv']),
        'to_qkv': {'kernel': conv_w(sd[f'{prefix}.to_qkv.weight'])},
    }
    if full:
        out['to_out'] = {
            'kernel': conv_w(sd[f'{prefix}.to_out.weight']),
            'bias': np.asarray(sd[f'{prefix}.to_out.bias'])}
    else:
        out['to_out'] = {
            'kernel': conv_w(sd[f'{prefix}.to_out.0.weight']),
            'bias': np.asarray(sd[f'{prefix}.to_out.0.bias'])}
        out['out_norm'] = {'g': rms_g(sd[f'{prefix}.to_out.1.g'])}
    return out


def convert_state_dict(sd, dim: int, dim_mults, channels: int = 1,
                       full_attn=None):
    """Torch U-Net state dict (un-prefixed keys) -> flax param tree."""
    num_stages = len(dim_mults)
    if full_attn is None:
        full_attn = (False,) * (num_stages - 1) + (True,)
    dims = [dim] + [dim * m for m in dim_mults]

    params = {
        'init_conv': {'kernel': conv_w(sd['init_conv.weight']),
                      'bias': np.asarray(sd['init_conv.bias'])},
        'time_dense_0': {'kernel': dense_w(sd['time_mlp.1.weight']),
                         'bias': np.asarray(sd['time_mlp.1.bias'])},
        'time_dense_1': {'kernel': dense_w(sd['time_mlp.3.weight']),
                         'bias': np.asarray(sd['time_mlp.3.bias'])},
        'mid_block1': _resnet_block(sd, 'mid_block1'),
        'mid_attn': _attention(sd, 'mid_attn', full=True),
        'mid_block2': _resnet_block(sd, 'mid_block2'),
        'final_res_block': _resnet_block(sd, 'final_res_block'),
        'final_conv': {'kernel': conv_w(sd['final_conv.weight']),
                       'bias': np.asarray(sd['final_conv.bias'])},
    }

    for i in range(num_stages):
        is_last = i == num_stages - 1
        params[f'down_{i}_block1'] = _resnet_block(sd, f'downs.{i}.0')
        params[f'down_{i}_block2'] = _resnet_block(sd, f'downs.{i}.1')
        params[f'down_{i}_attn'] = _attention(sd, f'downs.{i}.2',
                                              full=full_attn[i])
        if is_last:
            params[f'down_{i}_downsample'] = {
                'kernel': conv_w(sd[f'downs.{i}.3.weight']),
                'bias': np.asarray(sd[f'downs.{i}.3.bias'])}
        else:
            params[f'down_{i}_downsample'] = {
                'kernel': downsample_conv_w(sd[f'downs.{i}.3.1.weight'],
                                            dims[i]),
                'bias': np.asarray(sd[f'downs.{i}.3.1.bias'])}

    rev_full = tuple(reversed(full_attn))
    for i in range(num_stages):
        is_last = i == num_stages - 1
        params[f'up_{i}_block1'] = _resnet_block(sd, f'ups.{i}.0')
        params[f'up_{i}_block2'] = _resnet_block(sd, f'ups.{i}.1')
        params[f'up_{i}_attn'] = _attention(sd, f'ups.{i}.2',
                                            full=rev_full[i])
        if is_last:
            params[f'up_{i}_upsample'] = {
                'kernel': conv_w(sd[f'ups.{i}.3.weight']),
                'bias': np.asarray(sd[f'ups.{i}.3.bias'])}
        else:
            params[f'up_{i}_upsample'] = {
                'kernel': conv_w(sd[f'ups.{i}.3.1.weight']),
                'bias': np.asarray(sd[f'ups.{i}.3.1.bias'])}
    return params


def strip_prefix(state_dict, source: str):
    """Extract U-Net tensors: 'model' -> 'model.*', 'ema' -> either
    'ema_model.model.*' (ema-pytorch) or 'online_model.model.*'."""
    prefixes = {'model': ['model.'],
                'ema': ['ema_model.model.', 'ema_model.online_model.model.']}
    for prefix in prefixes[source]:
        sub = {k[len(prefix):]: v for k, v in state_dict.items()
               if k.startswith(prefix)}
        if sub:
            return sub
    raise KeyError(f'no U-Net weights found for source={source}')


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('torch_ckpt', type=Path)
    p.add_argument('out_ckpt', type=Path)
    p.add_argument('--source', choices=['model', 'ema'], default='model')
    p.add_argument('--dim', type=int, default=64)
    p.add_argument('--dim-mults', type=int, nargs='+', default=[1, 2, 4, 8])
    p.add_argument('--channels', type=int, default=1)
    args = p.parse_args(argv)

    import torch
    from flax import serialization

    data = torch.load(args.torch_ckpt, map_location='cpu',
                      weights_only=False)
    state = data[args.source] if args.source in data else data
    if hasattr(state, 'items'):
        state = {k: v.numpy() if hasattr(v, 'numpy') else v
                 for k, v in state.items()}
    sd = strip_prefix(state, args.source)
    params = convert_state_dict(sd, args.dim, tuple(args.dim_mults),
                                args.channels)
    args.out_ckpt.parent.mkdir(parents=True, exist_ok=True)
    with open(args.out_ckpt, 'wb') as f:
        f.write(serialization.to_bytes(params))
    print(f'Converted {args.torch_ckpt} ({args.source}) -> {args.out_ckpt}')


if __name__ == '__main__':
    main()
