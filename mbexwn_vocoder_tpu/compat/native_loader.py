"""ctypes bindings for the native C++ segment loader (native/segment_loader.cc).

Builds on demand with the repo Makefile if the shared object is missing and a
compiler is available; `available()` gates the fast path so pure-Python
environments keep working (training/data.py falls back transparently).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libsegment_loader.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.sl_create.restype = ctypes.c_void_p
    lib.sl_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint,
    ]
    lib.sl_next_batch.restype = ctypes.c_int
    lib.sl_next_batch.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.sl_total_samples.restype = ctypes.c_long
    lib.sl_total_samples.argtypes = [ctypes.c_void_p]
    lib.sl_n_files.restype = ctypes.c_int
    lib.sl_n_files.argtypes = [ctypes.c_void_p]
    lib.sl_destroy.restype = None
    lib.sl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeSegmentLoader:
    """Random float32 audio segments served by C++ worker threads."""

    def __init__(self, paths: Sequence[str], segment_len: int, sample_rate: int,
                 n_workers: int = 2, queue_depth: int = 64, seed: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native segment loader unavailable (no compiler / build failed)")
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._lib = lib
        self._h = lib.sl_create(arr, len(paths), segment_len, sample_rate, n_workers, queue_depth, seed)
        if not self._h:
            raise RuntimeError(
                "native segment loader: no usable WAV files (check sample rate and format)"
            )
        self.segment_len = segment_len

    @property
    def n_files(self) -> int:
        return self._lib.sl_n_files(self._h)

    @property
    def total_samples(self) -> int:
        return self._lib.sl_total_samples(self._h)

    def next_batch(self, batch: int) -> np.ndarray:
        out = np.empty((batch, self.segment_len), dtype=np.float32)
        rc = self._lib.sl_next_batch(self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), batch)
        if rc != 0:
            raise RuntimeError("native segment loader stopped")
        return out

    def close(self):
        if self._h:
            self._lib.sl_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
