"""ctypes bindings for the native host runtime (native/lis_host.cpp).

Builds lazily via `make -C native` if the shared library is missing; every
entry point has a pure-numpy fallback so the Python pipeline works without a
compiler (the native path is the production data loader).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_NATIVE_DIR = _REPO_ROOT / "native"
_LIB_PATH = _NATIVE_DIR / "liblis_host.so"

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.lis_read_bin.restype = ctypes.c_int64
    lib.lis_read_bin.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_int64]
    lib.lis_range_filter.restype = ctypes.c_int64
    lib.lis_range_filter.argtypes = [ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64, ctypes.c_float,
                                     ctypes.c_float]
    lib.lis_voxel_filter.restype = ctypes.c_int64
    lib.lis_voxel_filter.argtypes = [ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64, ctypes.c_float,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64]
    lib.lis_loader_create.restype = ctypes.c_void_p
    lib.lis_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
    ]
    lib.lis_loader_pop.restype = ctypes.c_int64
    lib.lis_loader_pop.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.POINTER(ctypes.c_int64)]
    lib.lis_loader_remaining.restype = ctypes.c_int64
    lib.lis_loader_remaining.argtypes = [ctypes.c_void_p]
    lib.lis_loader_destroy.restype = None
    lib.lis_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_bin(path: str, max_points: int) -> np.ndarray:
    """(n, 4) float32 via the native reader (numpy fallback)."""
    lib = _load()
    if lib is None:
        data = np.fromfile(path, dtype=np.float32)
        return data.reshape(-1, 4)[:max_points]
    buf = np.empty((max_points, 4), np.float32)
    n = lib.lis_read_bin(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_points)
    if n < 0:
        raise FileNotFoundError(path)
    return buf[:n]


def range_filter(pts: np.ndarray, min_range: float, max_range: float):
    lib = _load()
    pts = np.ascontiguousarray(pts, np.float32)
    if lib is None:
        r2 = np.sum(pts[:, :3] ** 2, axis=1)
        keep = np.isfinite(pts).all(1) & (r2 >= min_range**2) & \
            (r2 <= max_range**2) & (r2 > 1e-6)
        return pts[keep]
    n = lib.lis_range_filter(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
        min_range, max_range)
    return pts[:n]


def voxel_filter(pts: np.ndarray, leaf: float) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(pts[:, :3], np.float32)
    if lib is None:
        cells = np.floor(pts / leaf).astype(np.int64)
        _, idx = np.unique(cells, axis=0, return_index=True)
        return pts[np.sort(idx)]
    out = np.empty_like(pts)
    n = lib.lis_voxel_filter(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts), leaf,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts))
    return out[:n]


class AsyncScanLoader:
    """Multithreaded .bin prefetcher (native); preserves file order on the
    consumer side by reordering popped scans."""

    def __init__(self, files: list[str], max_points: int, capacity: int = 20,
                 n_threads: int = 2, min_range: float = 0.0,
                 max_range: float = 1e9):
        self.files = list(files)
        self.max_points = max_points
        lib = _load()
        self._lib = lib
        self._pending: dict[int, tuple[np.ndarray, int]] = {}
        self._next = 0
        if lib is None:
            self._handle = None
            return
        arr = (ctypes.c_char_p * len(files))(
            *[f.encode() for f in self.files])
        self._paths_keepalive = arr
        self._handle = lib.lis_loader_create(
            arr, len(files), max_points, capacity, n_threads,
            min_range, max_range)

    def __iter__(self):
        return self

    def __next__(self):
        if self._handle is None:  # numpy fallback, synchronous
            if self._next >= len(self.files):
                raise StopIteration
            pts = read_bin(self.files[self._next], self.max_points)
            self._next += 1
            buf = np.zeros((self.max_points, 4), np.float32)
            buf[: len(pts)] = pts
            return buf, len(pts)
        while self._next not in self._pending:
            buf = np.empty((self.max_points, 4), np.float32)
            idx = ctypes.c_int64(-1)
            n = self._lib.lis_loader_pop(
                self._handle,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(idx))
            if n < 0:
                if self._next < len(self.files) and self._pending:
                    continue
                raise StopIteration
            self._pending[int(idx.value)] = (buf, int(n))
        out = self._pending.pop(self._next)
        self._next += 1
        return out

    def close(self):
        if self._handle is not None:
            self._lib.lis_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
