"""Determinism controls.

JAX is deterministic by construction on TPU — randomness flows only through
explicit PRNG keys — so the reference's heavy seeding machinery
(red_diffeq/utils/seed_utils.py:12-94: cudnn determinism, CUBLAS workspace,
TF32 toggles) collapses to key management plus host-side numpy/python seeds
for the few host-side operations (data shuffling, initial-model synthesis).
"""
import random
from typing import Optional

import jax
import numpy as np

_GLOBAL_KEY: Optional[jax.Array] = None


def set_seed(seed: int, verbose: bool = False) -> jax.Array:
    """Seed python/numpy RNGs and install a global PRNG key.

    Returns the key so callers can thread it explicitly (preferred).
    """
    global _GLOBAL_KEY
    random.seed(seed)
    np.random.seed(seed)
    _GLOBAL_KEY = jax.random.PRNGKey(seed)
    if verbose:
        print(f'Random seed set to {seed} (python, numpy, jax PRNGKey)')
    return _GLOBAL_KEY


def get_key() -> jax.Array:
    """Return the global key, installing a default if none was set."""
    global _GLOBAL_KEY
    if _GLOBAL_KEY is None:
        _GLOBAL_KEY = jax.random.PRNGKey(0)
    return _GLOBAL_KEY


def next_key() -> jax.Array:
    """Split the global key and return a fresh subkey (stateful convenience)."""
    global _GLOBAL_KEY
    _GLOBAL_KEY, sub = jax.random.split(get_key())
    return sub


def get_rng_state():
    """Snapshot host RNG state plus the global key (reference seed_utils.py:114)."""
    return {
        'python': random.getstate(),
        'numpy': np.random.get_state(),
        'jax_key': None if _GLOBAL_KEY is None else np.asarray(_GLOBAL_KEY),
    }


def set_rng_state(state) -> None:
    """Restore a snapshot from :func:`get_rng_state` (reference seed_utils.py:133)."""
    global _GLOBAL_KEY
    random.setstate(state['python'])
    np.random.set_state(state['numpy'])
    if state['jax_key'] is not None:
        _GLOBAL_KEY = jax.numpy.asarray(state['jax_key'])


class SeedContext:
    """Context manager that seeds on entry and restores RNG state on exit
    (reference seed_utils.py:148-170)."""

    def __init__(self, seed: int):
        self.seed = seed
        self._saved = None

    def __enter__(self):
        self._saved = get_rng_state()
        return set_seed(self.seed)

    def __exit__(self, *exc):
        set_rng_state(self._saved)
        return False


def worker_init_fn(worker_id: int, base_seed: int = 0) -> None:
    """Seed a data-loading worker process deterministically
    (reference seed_utils.py:97)."""
    seed = base_seed + worker_id
    random.seed(seed)
    np.random.seed(seed)
