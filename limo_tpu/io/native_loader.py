"""ctypes bindings for the native runtime (native/limo_native.cpp).

Builds on demand with the repo Makefile (g++); all entry points have numpy
fallbacks in their callers, so a missing toolchain only costs speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblimo_native.so")

_lib = None
# build + dlopen must be serialized: prefetch workers (pipeline/executor)
# can hit a cold get_lib concurrently, and two parallel `make`s would
# CDLL a half-written .so
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib or None
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        if not os.path.exists(_LIB_PATH) and not _build():
            _lib = False
            return None
        return _load_lib()


def _load_lib():
    global _lib
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ln_read_velodyne.restype = ctypes.c_int64
    lib.ln_read_velodyne.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64]
    lib.ln_velodyne_size.restype = ctypes.c_int64
    lib.ln_velodyne_size.argtypes = [ctypes.c_char_p]
    lib.ln_read_velodyne_batch.restype = None
    lib.ln_read_velodyne_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int32]
    lib.ln_tracktable_new.restype = ctypes.c_void_p
    lib.ln_tracktable_new.argtypes = [ctypes.c_int32]
    lib.ln_tracktable_free.argtypes = [ctypes.c_void_p]
    lib.ln_tracktable_push.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64]
    lib.ln_tracktable_num_tracks.restype = ctypes.c_int64
    lib.ln_tracktable_num_tracks.argtypes = [ctypes.c_void_p]
    lib.ln_tracktable_num_stamps.restype = ctypes.c_int32
    lib.ln_tracktable_num_stamps.argtypes = [ctypes.c_void_p]
    lib.ln_tracktable_export.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_velodyne(path: str) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    n = lib.ln_velodyne_size(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    out = np.empty((n, 4), np.float32)
    got = lib.ln_read_velodyne(path.encode(), _fptr(out), n)
    return out[:got]


def read_velodyne_batch(paths: List[str], capacity_pts: int,
                        n_threads: int = 0):
    """Threaded batch read → (points [B,capacity,4] zero-padded, counts [B])."""
    lib = get_lib()
    if lib is None:
        out = np.zeros((len(paths), capacity_pts, 4), np.float32)
        counts = np.zeros(len(paths), np.int64)
        for i, p in enumerate(paths):
            pts = np.fromfile(p, dtype=np.float32).reshape(-1, 4)[:capacity_pts]
            out[i, : len(pts)] = pts
            counts[i] = len(pts)
        return out, counts
    out = np.zeros((len(paths), capacity_pts, 4), np.float32)
    counts = np.zeros(len(paths), np.int64)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    lib.ln_read_velodyne_batch(
        arr, len(paths), _fptr(out), capacity_pts,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n_threads)
    return out, counts


class NativeTrackTable:
    """C++-backed track table — drop-in fast path for TrackletBuilder."""

    def __init__(self, max_track_length: int = 100):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.ln_tracktable_new(max_track_length)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ln_tracktable_free(self._h)
            self._h = None

    def push_frame(self, stamp: float, uv: np.ndarray,
                   prev_match: Optional[np.ndarray] = None,
                   depth: Optional[np.ndarray] = None) -> None:
        n = uv.shape[0]
        uv32 = np.ascontiguousarray(uv, np.float32)
        d32 = (np.ascontiguousarray(depth, np.float32)
               if depth is not None else None)
        pm = (np.ascontiguousarray(prev_match, np.int64)
              if prev_match is not None else None)
        self._lib.ln_tracktable_push(
            self._h, float(stamp), _fptr(uv32),
            _fptr(d32) if d32 is not None else None,
            pm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)) if pm is not None else None,
            n)

    def to_tracklets(self, window: Optional[int] = None):
        from ..pipeline.tracklets import Tracklets

        lib = self._lib
        N = lib.ln_tracktable_num_tracks(self._h)
        S = lib.ln_tracktable_num_stamps(self._h)
        uvd = np.zeros((N, S, 3), np.float32)
        mask = np.zeros((N, S), np.uint8)
        ids = np.zeros(N, np.int64)
        ages = np.zeros(N, np.int32)
        stamps = np.zeros(S, np.float64)
        lib.ln_tracktable_export(
            self._h, _fptr(uvd),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ages.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            stamps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if window is not None and window < S:
            uvd, mask, stamps = uvd[:, :window], mask[:, :window], stamps[:window]
        return Tracklets(stamps=stamps, uvd=uvd.astype(np.float64),
                         mask=mask.astype(bool), ids=ids, age=ages,
                         is_outlier=np.zeros(N, bool),
                         label=np.full(N, -2, np.int32))
