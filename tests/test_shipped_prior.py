"""Gate on the committed pretrained prior.

Round 5 commits `pretrained_models/model-synthetic-ema.ckpt` in-tree
(every published quality table and notebook golden depends on that
exact artifact, and a VM reset destroyed the gitignored copy once).
This test asserts the committed bytes still deserialize into a param
tree that structurally matches the production U-Net config, so a
corrupted or accidentally swapped checkpoint fails the suite instead
of surfacing as silently wrong metrics.
"""
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
CKPT = REPO / 'pretrained_models' / 'model-synthetic-ema.ckpt'


@pytest.mark.skipif(not CKPT.exists(), reason='shipped prior not present')
def test_shipped_prior_matches_production_unet():
    import jax
    import jax.numpy as jnp
    from red_diffeq_tpu.config.default_config import get_config
    from red_diffeq_tpu.io.checkpoints import load_params

    raw = load_params(str(CKPT))
    if isinstance(raw, dict) and 'ema_params' in raw:
        raw = raw['ema_params']

    cfg = get_config()
    from red_diffeq_tpu.models.unet import Unet
    net = Unet(dim=cfg.model.dim, dim_mults=tuple(cfg.model.dim_mults),
               channels=cfg.model.channels,
               flash_attn=cfg.model.flash_attn)
    x = jnp.zeros((1, cfg.model.channels, cfg.diffusion.image_size,
                   cfg.diffusion.image_size), jnp.float32)  # NCHW surface
    t = jnp.zeros((1,), jnp.int32)
    template = net.init(jax.random.PRNGKey(0), x, t)['params']

    raw_params = raw['params'] if isinstance(raw, dict) and 'params' in raw \
        else raw
    # from_state_dict raises on missing keys but silently accepts
    # shape-mismatched leaves (verified empirically), so the real gate
    # is per-leaf SHAPE equality against the template: restored leaves
    # carry the checkpoint's shapes, the template carries the production
    # config's. A checkpoint from a same-topology, different-width U-Net
    # (the 'accidentally swapped prior' case) fails here.
    import flax.serialization as ser
    restored = ser.from_state_dict(template, raw_params)
    t_leaves = jax.tree_util.tree_flatten_with_path(template)[0]
    r_leaves = jax.tree_util.tree_flatten_with_path(restored)[0]
    assert len(t_leaves) == len(r_leaves) > 0
    for (tp, tl), (rp, rl) in zip(t_leaves, r_leaves):
        assert jax.tree_util.keystr(tp) == jax.tree_util.keystr(rp)
        assert tuple(rl.shape) == tuple(tl.shape), (
            f'{jax.tree_util.keystr(tp)}: checkpoint {rl.shape} '
            f'vs production U-Net {tl.shape}')

    # every leaf finite and not all-zero (a truncated msgpack file
    # typically restores zeros)
    leaves = jax.tree_util.tree_leaves(restored)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0
    import numpy as np
    for leaf in leaves:
        assert np.isfinite(np.asarray(leaf)).all()
