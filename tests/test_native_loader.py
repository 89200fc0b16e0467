"""Native npy loader tests: parity with numpy, prefetch, bounds."""
import numpy as np
import pytest

from red_diffeq_tpu.io.native_loader import NpyBatchLoader, _build_library


@pytest.fixture(scope='module')
def npy_file(tmp_path_factory):
    root = tmp_path_factory.mktemp('npy')
    data = np.random.RandomState(0).rand(37, 2, 5, 7).astype(np.float32)
    path = root / 'data.npy'
    np.save(path, data)
    return path, data


def test_native_library_builds():
    assert _build_library() is not None, \
        'g++ toolchain present but native loader failed to build'


def test_loader_matches_numpy(npy_file):
    path, data = npy_file
    loader = NpyBatchLoader(path)
    assert loader.native
    assert len(loader) == 37
    np.testing.assert_array_equal(loader[0:4], data[0:4])
    np.testing.assert_array_equal(loader[30:37], data[30:37])
    np.testing.assert_array_equal(loader[5], data[5:6])
    loader.close()


def test_loader_prefetch_and_bounds(npy_file):
    path, data = npy_file
    loader = NpyBatchLoader(path)
    loader.prefetch(8, 8)            # async; result must still be exact
    np.testing.assert_array_equal(loader[8:16], data[8:16])
    loader.prefetch(30, 100)         # over-long prefetch clamps silently
    np.testing.assert_array_equal(loader[30:40], data[30:37])  # numpy clamp
    with pytest.raises(IndexError):
        loader[50]                   # out-of-range integer index raises
    loader.close()


def test_loader_fallback(monkeypatch, npy_file):
    path, data = npy_file
    import red_diffeq_tpu.io.native_loader as nl
    monkeypatch.setattr(nl, '_build_library', lambda: None)
    loader = nl.NpyBatchLoader(path)
    assert not loader.native
    np.testing.assert_array_equal(loader[3:9], data[3:9])
    loader.prefetch(0, 4)            # no-op on fallback
