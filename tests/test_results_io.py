"""Result-aggregation tests (reference notebook_visualization parity)."""
import numpy as np

from red_diffeq_tpu.io.results import load_marmousi, load_openfwi


def _write_npz(path, offset):
    np.savez(path,
             mae=np.array([0.3, 0.2, 0.1]) + offset,
             rmse=np.array([0.4, 0.3, 0.2]) + offset,
             ssim=np.array([0.5, 0.6, 0.7]) - offset,
             result=np.zeros((4, 4)))


def test_load_openfwi_averages_families(tmp_path):
    for fam, off in zip(['CF', 'CV'], [0.0, 0.1]):
        d = tmp_path / fam
        d.mkdir()
        _write_npz(d / '0_results.npz', off)
    out = load_openfwi(tmp_path)
    np.testing.assert_allclose(out['mae'], [0.35, 0.25, 0.15], atol=1e-7)
    final = load_openfwi(tmp_path, return_final_only=True)
    assert final['MAE'] == np.float32(0.15).item() or \
        abs(final['MAE'] - 0.15) < 1e-6
    assert abs(final['SSIM'] - 0.65) < 1e-6


def test_load_openfwi_missing(tmp_path):
    assert load_openfwi(tmp_path / 'nope') is None
    assert load_openfwi(tmp_path) is None  # exists but empty


def test_load_marmousi_flat_and_subdir(tmp_path):
    _write_npz(tmp_path / '0_results.npz', 0.0)
    out = load_marmousi(tmp_path)
    np.testing.assert_allclose(out['mae'], [0.3, 0.2, 0.1], atol=1e-7)

    root2 = tmp_path / 'run2'
    (root2 / 'marmousi').mkdir(parents=True)
    _write_npz(root2 / 'marmousi' / '0_results.npz', 0.1)
    out2 = load_marmousi(root2, return_final_only=True)
    assert abs(out2['MAE'] - 0.2) < 1e-6


def test_synthetic_generator_families():
    from red_diffeq_tpu.io.synthetic import (
        generate_mixed_dataset, generate_velocity_models,
    )
    for fam in ('FlatVel', 'CurveVel', 'FlatFault', 'CurveFault'):
        v = generate_velocity_models(3, family=fam, seed=2)
        assert v.shape == (3, 1, 70, 70)
        assert v.min() >= 1500.0 and v.max() <= 4500.0
        # velocity increases with depth on average
        prof = v.mean(axis=(0, 1, 3))
        assert prof[-1] > prof[0]
        # flat families have laterally-invariant columns
        if fam == 'FlatVel':
            assert np.allclose(v[:, :, :, 0], v[:, :, :, -1])
    mixed = generate_mixed_dataset(11, seed=0)
    assert mixed.shape == (11, 1, 70, 70)
    # deterministic under the same seed
    np.testing.assert_array_equal(mixed, generate_mixed_dataset(11, seed=0))


def test_ablation_config_grid(tmp_path):
    import subprocess, sys
    r = subprocess.run(
        [sys.executable, 'configs/ablation/generate_ablations.py',
         '--out', str(tmp_path)], capture_output=True, text=True,
        cwd='/root/repo')
    assert r.returncode == 0, r.stderr
    import yaml
    files = sorted(tmp_path.rglob('*.yaml'))
    assert len(files) == 30  # 5 trick sets x 3 budgets x 2 datasets
    cfg = yaml.safe_load(files[0].read_text())
    assert 'optimization' in cfg and 'diffusion_ts' in cfg['optimization']


def test_partial_npz_skipped_whole(tmp_path, capsys):
    """A result file missing one metric must be skipped entirely —
    appending its present metrics would leave the per-metric lists
    averaging different sample sets (round-5 fix in io/results._collect)."""
    fam = tmp_path / 'CF'
    fam.mkdir()
    _write_npz(fam / '0_results.npz', 0.0)
    # partial file: mae present, rmse/ssim missing
    np.savez(fam / '1_results.npz', mae=np.array([9.0, 9.0, 9.0]),
             result=np.zeros((4, 4)))
    out = load_openfwi(tmp_path)
    # only the complete file contributes, to every metric alike
    np.testing.assert_allclose(out['mae'], [0.3, 0.2, 0.1], atol=1e-7)
    np.testing.assert_allclose(out['ssim'], [0.5, 0.6, 0.7], atol=1e-7)
    assert 'Failed to load' in capsys.readouterr().out


def test_load_marmousi_multiple_subdirs_deterministic(tmp_path, capsys):
    """With both marmousi/ and overthrust/ present, the loader picks the
    lexicographically first and says so (iterdir order is fs-dependent)."""
    (tmp_path / 'overthrust').mkdir()
    (tmp_path / 'marmousi').mkdir()
    _write_npz(tmp_path / 'overthrust' / '0_results.npz', 0.1)
    _write_npz(tmp_path / 'marmousi' / '0_results.npz', 0.0)
    out = load_marmousi(tmp_path, return_final_only=True)
    assert abs(out['MAE'] - 0.1) < 1e-6  # marmousi's final mae
    assert 'multiple dataset subdirs' in capsys.readouterr().out
