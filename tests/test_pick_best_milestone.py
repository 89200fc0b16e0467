"""pick_best_milestone: the automated early-stopping export used by
tools/recovery_chain.sh to restore the shipped prior after the
2026-08-19 VM reset (docs/outage_runbook.md, failure mode 5).

Selection contract: max refined SSIM, tie-broken by clean SSIM, over
rows whose checkpoint still exists; the export is the bare EMA tree
(loadable by io.checkpoints.load_diffusion_params).
"""
import json
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tools'))
import pick_best_milestone  # noqa: E402

from red_diffeq_tpu.io.checkpoints import load_params, save_params


def _row(ckpt, step, ssim_refined, ssim_clean):
    return {'ckpt': str(ckpt), 'step': step,
            'clean': {'MAE': 0.05, 'SSIM': ssim_clean, 'secs': 1.0},
            'refined': {'MAE': 0.07, 'SSIM': ssim_refined, 'secs': 1.0}}


@pytest.fixture
def run(tmp_path):
    """Two tiny trainer-style milestones + a milestone_eval sidecar."""
    key = jax.random.PRNGKey(0)
    trees, rows = {}, []
    for k, step in ((1, 2500), (2, 5000)):
        key, sub = jax.random.split(key)
        tree = {'w': jax.random.normal(sub, (4, 3)),
                'b': jax.random.normal(sub, (3,))}
        ck = tmp_path / f'model-{k}.ckpt'
        save_params({'ema_params': tree, 'step': step}, ck)
        trees[k] = tree
        rows.append(_row(ck, step, 0.0, 0.0))
    md = tmp_path / 'eval.md'
    md.write_text('# eval\n')
    return tmp_path, md, rows, trees


def _assert_exported(out, tree):
    got = load_params(out)
    assert set(got) == set(tree)
    for name in tree:
        np.testing.assert_array_equal(np.asarray(got[name]),
                                      np.asarray(tree[name]))


def test_picks_max_refined_ssim(run):
    tmp, md, rows, trees = run
    rows[0]['refined']['SSIM'] = 0.95   # milestone 1 wins on refined
    rows[1]['refined']['SSIM'] = 0.80
    rows[1]['clean']['SSIM'] = 0.99     # clean must NOT override
    md.with_suffix('.json').write_text(json.dumps(rows))
    out = tmp / 'ema.ckpt'
    pick_best_milestone.main(['--eval', str(md), '--out', str(out)])
    _assert_exported(out, trees[1])


def test_tiebreak_by_clean_ssim(run):
    tmp, md, rows, trees = run
    for r in rows:
        r['refined']['SSIM'] = 0.9
    rows[1]['clean']['SSIM'] = 0.93
    md.with_suffix('.json').write_text(json.dumps(rows))
    out = tmp / 'ema.ckpt'
    pick_best_milestone.main(['--eval', str(md), '--out', str(out)])
    _assert_exported(out, trees[2])


def test_skips_rows_with_deleted_ckpts(run):
    tmp, md, rows, trees = run
    rows[1]['refined']['SSIM'] = 0.99   # best row, but ckpt deleted
    rows[0]['refined']['SSIM'] = 0.5
    Path(rows[1]['ckpt']).unlink()
    md.with_suffix('.json').write_text(json.dumps(rows))
    out = tmp / 'ema.ckpt'
    pick_best_milestone.main(['--eval', str(md), '--out', str(out)])
    _assert_exported(out, trees[1])


def test_errors_when_no_ckpt_exists(run):
    tmp, md, rows, _ = run
    for r in rows:
        Path(r['ckpt']).unlink()
    md.with_suffix('.json').write_text(json.dumps(rows))
    with pytest.raises(SystemExit):
        pick_best_milestone.main(['--eval', str(md),
                                  '--out', str(tmp / 'ema.ckpt')])
