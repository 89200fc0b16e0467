"""Device mesh and sharding helpers.

The workload is embarrassingly parallel over (sample, shot): inversion
state, observations and metrics all carry a leading batch dim, and every
shot propagates independently until the per-sample loss reduction
(SURVEY.md §2.2). We therefore use a 2-D mesh ('data', 'shot'):

* 'data'  shards the sample batch — zero communication;
* 'shot'  shards the ns sources of each sample — XLA inserts one psum per
  loss reduction over ICI.

The reference has no explicit distribution at inversion time and relies on
HF Accelerate/DDP only for diffusion pretraining
(reference models/diffusion.py:578,592,602); here both paths go through
``jax.sharding`` + jit auto-parallelization.
"""
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, shot: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'shot') mesh. ``data=-1`` uses all remaining
    devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % shot == 0, f'{n} devices not divisible by shot={shot}'
        data = n // shot
    assert data * shot <= n, (data, shot, n)
    dev_array = np.asarray(devices[:data * shot]).reshape(data, shot)
    return Mesh(dev_array, ('data', 'shot'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding: (B, ...) over 'data'."""
    return NamedSharding(mesh, P('data'))


def batch_shot_sharding(mesh: Mesh) -> NamedSharding:
    """(B, ns, ...) arrays: batch over 'data', shots over 'shot'."""
    return NamedSharding(mesh, P('data', 'shot'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_inversion_inputs(mesh: Mesh, mu, mu_true, y):
    """Place the engine inputs for data x shot parallel execution.

    mu/mu_true: (B, 1, H, W) -> sharded over 'data'.
    y: (B, ns, nt, ng) -> sharded over ('data', 'shot').
    """
    mu = jax.device_put(mu, batch_sharding(mesh))
    mu_true = jax.device_put(mu_true, batch_sharding(mesh))
    y = jax.device_put(y, batch_shot_sharding(mesh))
    return mu, mu_true, y
