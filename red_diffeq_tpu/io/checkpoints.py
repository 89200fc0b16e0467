"""Checkpoint I/O for denoiser weights.

Two formats are supported:
* native: orbax/msgpack files written by our Trainer
  (``model-<k>.ckpt`` — a flax state dict);
* converted: the output of ``tools/convert_torch_checkpoint.py``, which
  maps a reference PyTorch ``model-<k>.pt`` (state-dict layout of
  reference models/diffusion.py:617-625) onto the flax parameter tree.
"""
from pathlib import Path
from typing import Optional

import jax
from flax import serialization


import os


def atomic_write_bytes(path, data: bytes) -> None:
    """Write via tmp + os.replace so a kill mid-write can't truncate the
    only copy (docs/outage_runbook.md: kill-by-pidfile is the normal
    recovery workflow here). Shared by every checkpoint writer."""
    path = Path(path)
    tmp = path.with_suffix(path.suffix + '.tmp')
    with open(tmp, 'wb') as f:
        f.write(data)
    os.replace(tmp, path)


def save_params(params, path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    atomic_write_bytes(path, serialization.to_bytes(params))


def load_params(path, template=None):
    """Load a flax param pytree. ``template`` (a matching pytree) restores
    exact structure; without it, a raw state dict is returned."""
    with open(path, 'rb') as f:
        data = f.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)


def load_diffusion_params(diffusion, path: Optional[str], verbose: bool = True):
    """Populate ``diffusion.params`` from ``path`` if it exists; otherwise
    keep/initialize random weights (mirrors the reference's warn-and-continue
    behavior, scripts/run_inversion.py:64-71)."""
    if diffusion.params is None:
        diffusion.init_params(jax.random.PRNGKey(0))
    if path and Path(path).exists():
        raw = load_params(path)
        # Trainer-native milestone checkpoints are full training state
        # ({'step', 'params', 'ema_params', 'opt_state', ...}); bare
        # EMA exports are just the param tree. Accept both — inference
        # wants the EMA weights (reference models/diffusion.py:617-625
        # loads 'ema' the same way).
        if isinstance(raw, dict) and 'ema_params' in raw:
            raw = raw['ema_params']
        diffusion.params = serialization.from_state_dict(
            diffusion.params, raw)
        if verbose:
            print(f'Loaded pretrained model from: {path}')
    else:
        if verbose:
            print(f'WARNING: Pretrained model not found at {path}')
            print('Continuing with randomly initialized model...')
    return diffusion
