"""ctypes bindings for the native .npy batch reader.

``NpyBatchLoader`` mmaps a .npy file through the C++ loader
(io/native/npy_loader.cpp) and serves contiguous leading-axis batches,
prefetching the *next* batch on a background thread so host IO overlaps
TPU compute. Falls back transparently to ``np.load(mmap_mode='r')`` when
the shared library can't be built (no toolchain).

Header parsing uses numpy's own ``np.lib.format`` — the C side deals only
in byte ranges.
"""
import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_SRC = Path(__file__).parent / 'native' / 'npy_loader.cpp'
_LIB_PATH = Path(__file__).parent / 'native' / 'libnpy_loader.so'
_lib = None
_lib_failed = False


def _build_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    try:
        if not _LIB_PATH.exists() or \
                _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
                 '-o', str(_LIB_PATH), str(_SRC), '-lpthread'],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.npy_open.restype = ctypes.c_void_p
        lib.npy_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                 ctypes.c_uint64, ctypes.c_int64]
        lib.npy_close.argtypes = [ctypes.c_void_p]
        lib.npy_read_rows.restype = ctypes.c_int
        lib.npy_read_rows.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_void_p]
        lib.npy_prefetch_rows.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                          ctypes.c_int64]
        lib.npy_nrows.restype = ctypes.c_int64
        lib.npy_nrows.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib
    except Exception as e:  # toolchain missing / sandboxed build failure
        print(f'native npy loader unavailable ({e}); '
              'falling back to numpy mmap')
        _lib_failed = True
        return None


def _parse_header(path: Path) -> Tuple[tuple, np.dtype, int]:
    """(shape, dtype, data_offset) via numpy's own format parser."""
    with open(path, 'rb') as f:
        version = np.lib.format.read_magic(f)
        if version == (1, 0):
            shape, fortran, dtype = np.lib.format.read_array_header_1_0(f)
        else:
            shape, fortran, dtype = np.lib.format.read_array_header_2_0(f)
        if fortran:
            raise ValueError('fortran-ordered .npy not supported')
        return shape, dtype, f.tell()


class NpyBatchLoader:
    """Batched reader over the leading axis of a .npy file.

    ``loader[start:end]`` returns a fresh C-contiguous array; call
    :meth:`prefetch` with the next window to overlap its page-in with
    compute on the current one.
    """

    def __init__(self, path):
        self.path = Path(path)
        self.shape, self.dtype, self._offset = _parse_header(self.path)
        self._row_bytes = int(np.prod(self.shape[1:])) * self.dtype.itemsize
        self._lib = _build_library()
        self._handle = None
        self._mmap = None
        if self._lib is not None:
            self._handle = self._lib.npy_open(
                str(self.path).encode(), self._offset, self._row_bytes,
                self.shape[0])
            if not self._handle:
                self._lib = None
        if self._lib is None:
            self._mmap = np.load(self.path, mmap_mode='r')

    @property
    def native(self) -> bool:
        return self._handle is not None

    def __len__(self):
        return self.shape[0]

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            start, stop, step = idx.indices(self.shape[0])
            assert step == 1, 'only contiguous slices supported'
        else:
            start, stop = int(idx), int(idx) + 1
        count = stop - start
        if self._handle is not None:
            out = np.empty((count, *self.shape[1:]), self.dtype)
            rc = self._lib.npy_read_rows(
                self._handle, start, count,
                out.ctypes.data_as(ctypes.c_void_p))
            if rc != 0:
                raise IndexError(f'rows [{start}, {stop}) out of range')
            return out
        return np.array(self._mmap[start:stop])

    def prefetch(self, start: int, count: int) -> None:
        """Fault in rows [start, start+count) on a background thread."""
        if self._handle is not None and count > 0:
            self._lib.npy_prefetch_rows(self._handle, start, count)

    def close(self):
        if self._handle is not None:
            self._lib.npy_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
