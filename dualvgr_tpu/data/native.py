"""ctypes loader for the native host-data-path kernels (_gather.cpp).

Compiles the C++ source with the system g++ on first use (cached next to
the source; rebuilt when the source is newer) and exposes

    gather_rows(src, rows, out=None, n_threads=None) -> np.ndarray
    cast_f32_to_bf16(src, out=None, n_threads=None) -> np.ndarray

a threaded row-gather used by FeatureStore for RAM-cached batch assembly,
and a threaded round-to-nearest-even float32 -> bfloat16 cast used by the
bfloat16 transfer path (halves host RAM cache + host->device bytes).
Every failure path (no compiler, unwritable dir, dlopen error) degrades to
``None`` so callers fall back to numpy fancy indexing — the native path is
a throughput optimization, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_gather.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "_gather.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _LIB_PATH,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, timeout=120)
        return proc.returncode == 0
    except Exception:
        return False


def _load():
    """Compile (if needed) and dlopen the library; None on any failure."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            stale = (not os.path.exists(_LIB_PATH)) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
            )
            if stale and not _build():
                return None
            lib = ctypes.CDLL(_LIB_PATH)
            lib.gather_rows.restype = ctypes.c_int
            lib.gather_rows.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_char_p, ctypes.c_int,
            ]
            lib.cast_f32_bf16.restype = ctypes.c_int
            lib.cast_f32_bf16.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int64, ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def gather_rows(src: np.ndarray, rows: np.ndarray, out=None, n_threads=None):
    """Threaded ``src[rows]`` for a C-contiguous src; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src)
    rows64 = np.ascontiguousarray(rows, dtype=np.int64)
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64))
    n_out = len(rows64)
    if out is None:
        out = np.empty((n_out,) + src.shape[1:], src.dtype)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 8)
    rc = lib.gather_rows(
        src.ctypes.data_as(ctypes.c_char_p),
        src.shape[0],
        row_bytes,
        rows64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_out,
        out.ctypes.data_as(ctypes.c_char_p),
        int(n_threads),
    )
    if rc != 0:
        raise IndexError("gather_rows: row index out of range")
    return out


def cast_f32_to_bf16(src: np.ndarray, out=None, n_threads=None):
    """Threaded RNE float32 -> bfloat16 cast; None if the lib is unavailable.

    Bit-identical to ``src.astype(ml_dtypes.bfloat16)`` (numpy's single-core
    C loop) — the threading matters for the one-time RAM-cache conversion
    (GBs) and the per-batch casts of file-backed stores.
    """
    lib = _load()
    if lib is None:
        return None
    import ml_dtypes

    src = np.ascontiguousarray(src, dtype=np.float32)
    if out is None:
        out = np.empty(src.shape, dtype=ml_dtypes.bfloat16)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 8)
    lib.cast_f32_bf16(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        int(src.size),
        int(n_threads),
    )
    return out
