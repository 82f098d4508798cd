"""ctypes bindings for the native C++ shard loader (native/shard_loader.cpp).

Drop-in accelerator for the batch-gather half of NpyPatchLoader: .npy
parsing + mmap + a worker pool doing the row copies in parallel (the cold
path is page faults; the warm path is memcpy — both scale with threads).
Python keeps the shuffle order (numpy RNG, reproducible seeds) and the
device-prefetch thread.

The shared library builds on first use with g++ (cached next to the
source); everything degrades gracefully to the pure-numpy gather when a
compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "shard_loader.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "libshard_loader.so")
_build_lock = threading.Lock()
_lib_handle = None


def build_native(force: bool = False) -> str | None:
    """Compile the shared library if needed; returns its path or None."""
    global _lib_handle
    with _build_lock:
        if not force and os.path.exists(_LIB) and \
                os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                 "-fPIC", "-pthread", _SRC, "-o", _LIB],
                check=True, capture_output=True, text=True)
            _lib_handle = None  # force re-dlopen
            return _LIB
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            msg = getattr(e, "stderr", str(e))
            print(f"[native_loader] build failed, using numpy fallback: {msg}")
            return None


def _load_lib():
    global _lib_handle
    if _lib_handle is not None:
        return _lib_handle
    if build_native() is None:
        return None
    lib = ctypes.CDLL(_LIB)
    lib.psl_open.restype = ctypes.c_void_p
    lib.psl_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                             ctypes.c_int]
    lib.psl_error.restype = ctypes.c_char_p
    lib.psl_error.argtypes = [ctypes.c_void_p]
    lib.psl_total_rows.restype = ctypes.c_int64
    lib.psl_total_rows.argtypes = [ctypes.c_void_p]
    lib.psl_row_ndim.restype = ctypes.c_int
    lib.psl_row_ndim.argtypes = [ctypes.c_void_p]
    lib.psl_row_shape.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int64)]
    lib.psl_gather.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
                               ctypes.POINTER(ctypes.c_float)]
    lib.psl_close.argtypes = [ctypes.c_void_p]
    _lib_handle = lib
    return lib


class NativeShardGather:
    """mmap'd multi-shard float32 row gather backed by the C++ pool.

    Raises RuntimeError if the native library can't build or the shards
    are unsupported — callers fall back to numpy.
    """

    def __init__(self, paths: list[str], n_threads: int = 8):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._lib = lib
        self._h = lib.psl_open(arr, len(paths), n_threads)
        err = lib.psl_error(self._h)
        if err:
            msg = err.decode()
            lib.psl_close(self._h)
            self._h = None
            raise RuntimeError(f"native loader: {msg}")
        ndim = lib.psl_row_ndim(self._h)
        dims = (ctypes.c_int64 * ndim)()
        lib.psl_row_shape(self._h, dims)
        self.row_shape = tuple(int(d) for d in dims)
        self.total_rows = int(lib.psl_total_rows(self._h))

    def gather(self, rows: np.ndarray) -> np.ndarray:
        rows = np.ascontiguousarray(rows, np.int64)
        if rows.size and (rows.min() < 0 or rows.max() >= self.total_rows):
            raise IndexError("row index out of range")
        out = np.empty((len(rows), *self.row_shape), np.float32)
        self._lib.psl_gather(
            self._h,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(rows),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def close(self):
        if self._h is not None:
            self._lib.psl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
