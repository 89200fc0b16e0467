"""Golden-run pinning for the executed example notebooks.

The reference's example notebooks carry captured outputs that act as its
de-facto regression baselines (reference example/example_openfwi.ipynb
cell 1 is the source of BASELINE.md itself). Our notebooks are executed
on TPU (`make notebooks`) and committed WITH outputs; these tests parse
the captured metrics and pin them to documented tolerances, so a silent
quality regression in a committed notebook re-execution fails CI.

Skips (not fails) when a notebook has no outputs yet — the unexecuted
state only exists mid-development; executed notebooks are the committed
artifact.
"""
import json
import re
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parent.parent / 'examples'

# Documented tolerances for the captured single-sample runs (seed 8888).
# MAE upper bounds sit well under the reference's captured FINAL OpenFWI
# MAE of 0.116 (BASELINE.md); SSIM lower bounds are conservative floors
# under the captured values so reruns on other chips stay green.
GOLDEN = {
    'example_openfwi.ipynb': {'mae_max': 0.10, 'ssim_min': 0.80},
    'example_marmousi.ipynb': {'mae_max': 0.20, 'ssim_min': 0.55},
}


def _stream_text(nb):
    out = []
    for cell in nb['cells']:
        for o in cell.get('outputs', []):
            if o.get('output_type') == 'stream':
                out.append(''.join(o.get('text', [])))
    return '\n'.join(out)


@pytest.mark.parametrize('name', sorted(GOLDEN))
def test_notebook_golden_metrics(name):
    nb = json.loads((EXAMPLES / name).read_text())
    text = _stream_text(nb)
    if not text:
        pytest.skip(f'{name} has no captured outputs (not yet executed)')
    m = re.search(r'final MAE ([\d.]+)\s+RMSE ([\d.]+)\s+SSIM ([\d.]+)',
                  text)
    assert m, f'{name}: captured outputs lack the final-metrics line'
    mae, rmse, ssim = (float(g) for g in m.groups())
    g = GOLDEN[name]
    assert mae <= g['mae_max'], (name, mae)
    assert rmse >= mae, (name, 'RMSE must dominate MAE')
    assert g['ssim_min'] <= ssim <= 1.0, (name, ssim)


def test_notebooks_have_plots():
    """Each executed notebook must capture at least one rendered figure
    (the GT/result/error panel) — the reference notebooks' evidentiary
    function."""
    executed = 0
    for name in GOLDEN:
        nb = json.loads((EXAMPLES / name).read_text())
        if not _stream_text(nb):
            continue
        executed += 1
        has_img = any(
            'image/png' in o.get('data', {})
            for cell in nb['cells'] for o in cell.get('outputs', [])
            if o.get('output_type') in ('display_data', 'execute_result'))
        assert has_img, f'{name}: no captured figure'
    if not executed:
        pytest.skip('no executed notebooks yet')
