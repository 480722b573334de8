"""ctypes bindings for the native C++ radar data loader (io/native/).

Builds `libradar_loader.so` on first use (g++ + libpng, both baked into the
image) and exposes:

  * `decode_radar_png_native(path, cfg)` — drop-in for `oxford.decode_radar_png`
  * `NativeLoader(paths, cfg)` — multi-threaded, in-order prefetching iterator

Falls back cleanly when the toolchain is unavailable: callers check
`native_available()` and use the PIL path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, List, Optional

import numpy as np

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.io.oxford import RadarFrame

_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_DIR, "radar_loader.cpp")
_SO = os.path.join(_DIR, "libradar_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

RAW_COLS = 11 + 3768  # Oxford PNG layout: metadata + power bins


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", _SRC, "-lpng", "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.rsl_decode.restype = ctypes.c_int
        lib.rsl_decode_u8.restype = ctypes.c_int
        lib.rsl_loader_create.restype = ctypes.c_void_p
        lib.rsl_loader_next.restype = ctypes.c_int
        lib.rsl_loader_next_u8.restype = ctypes.c_int
        lib.rsl_loader_destroy.restype = None
        _lib = lib
        return lib


def native_available() -> bool:
    return _load() is not None


def _alloc(cfg: SlamConfig, raw_u8: bool = False):
    A = cfg.num_azimuths
    return (
        np.zeros((A, cfg.polar_width_padded), np.uint8 if raw_u8 else np.float32),
        np.zeros(A, np.float32),
        np.zeros(A, np.uint8),
        np.zeros(A, np.int64),
    )


def _ptrs(power, az, valid, ts):
    power_ct = ctypes.c_uint8 if power.dtype == np.uint8 else ctypes.c_float
    return (
        power.ctypes.data_as(ctypes.POINTER(power_ct)),
        az.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )


def decode_radar_png_native(path: str, cfg: SlamConfig,
                            raw_u8: bool = False) -> RadarFrame:
    """Native decode; `raw_u8=True` keeps power as raw PNG bytes so the /255
    dequantisation runs on the accelerator (4x less host->device traffic)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    power, az, valid, ts = _alloc(cfg, raw_u8)
    fn = lib.rsl_decode_u8 if raw_u8 else lib.rsl_decode
    rc = fn(
        path.encode(), cfg.num_azimuths, RAW_COLS, cfg.clipped_range_bins,
        cfg.polar_width_padded, *_ptrs(power, az, valid, ts)
    )
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    stamp = int(os.path.basename(path)[:-4])
    return RadarFrame(power, az, valid.astype(bool), ts, stamp)


class NativeLoader:
    """Multi-threaded in-order prefetching frame iterator (C++ thread pool)."""

    def __init__(self, paths: List[str], cfg: SlamConfig, workers: int = 4,
                 depth: int = 8, raw_u8: bool = False):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._cfg = cfg
        self._raw_u8 = raw_u8
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.rsl_loader_create(
            arr, len(self._paths), workers, depth, cfg.num_azimuths, RAW_COLS,
            cfg.clipped_range_bins, cfg.polar_width_padded,
        )
        self._n = len(paths)
        self._stamps = [int(os.path.basename(p)[:-4]) for p in paths]

    def __iter__(self) -> Iterator[RadarFrame]:
        next_fn = (self._lib.rsl_loader_next_u8 if self._raw_u8
                   else self._lib.rsl_loader_next)
        for i in range(self._n):
            power, az, valid, ts = _alloc(self._cfg, self._raw_u8)
            rc = next_fn(
                ctypes.c_void_p(self._handle), *_ptrs(power, az, valid, ts)
            )
            if rc == -2:
                return
            if rc != 0:
                raise IOError(f"native decode failed at frame {i}")
            yield RadarFrame(power, az, valid.astype(bool), ts, self._stamps[i])
        self.close()

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.rsl_loader_destroy(ctypes.c_void_p(self._handle))
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
