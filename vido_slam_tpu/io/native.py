"""ctypes bindings for the native dataloader (native/dataloader.cpp).

Builds the shared library on first use if the toolchain is available; every
entry point has a pure-Python fallback so the package works without it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvido_native.so")
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.vido_demosaic_bg2bgr.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vido_read_flo.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.vido_read_flo.restype = ctypes.c_int
    lib.vido_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.vido_prefetcher_create.restype = ctypes.c_void_p
    lib.vido_prefetcher_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.vido_prefetcher_get.restype = ctypes.c_int64
    lib.vido_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def demosaic_bg2bgr(raw: np.ndarray) -> np.ndarray:
    """Native bilinear BayerBG->BGR; falls back to the Python path."""
    lib = _load()
    if lib is None:
        from vido_slam_tpu.io.datasets import demosaic_bayer_bg2bgr

        return demosaic_bayer_bg2bgr(raw)
    raw = np.ascontiguousarray(raw, np.uint8)
    h, w = raw.shape
    out = np.empty((h, w, 3), np.uint8)
    lib.vido_demosaic_bg2bgr(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def read_flo_native(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        from vido_slam_tpu.io.datasets import read_flo

        return read_flo(path)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.vido_read_flo(path.encode(), None, 0, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise ValueError(f"read_flo({path}) failed: {rc}")
    buf = np.empty(h.value * w.value * 2, np.float32)
    rc = lib.vido_read_flo(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.size, ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise ValueError(f"read_flo({path}) failed: {rc}")
    return buf.reshape(h.value, w.value, 2)


class FilePrefetcher:
    """Threaded read-ahead over a file list (native worker threads)."""

    def __init__(self, paths: List[str], n_threads: int = 2, max_ahead: int = 8):
        self.paths = list(paths)
        lib = _load()
        self._lib = lib
        self._handle = None
        if lib is not None:
            arr = (ctypes.c_char_p * len(paths))(
                *[p.encode() for p in paths]
            )
            self._handle = lib.vido_prefetcher_create(
                arr, len(paths), n_threads, max_ahead
            )

    def get(self, idx: int) -> bytes:
        if self._handle is None:
            with open(self.paths[idx], "rb") as f:
                return f.read()
        sz = self._lib.vido_prefetcher_get(self._handle, idx, None, 0)
        if sz < 0:
            raise IOError(f"prefetch {self.paths[idx]}: {sz}")
        buf = np.empty(sz, np.uint8)
        got = self._lib.vido_prefetcher_get(
            self._handle, idx, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sz
        )
        if got != sz:
            raise IOError(f"prefetch {self.paths[idx]}: {got}")
        return buf.tobytes()

    def close(self):
        if self._handle is not None:
            self._lib.vido_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        self.close()
