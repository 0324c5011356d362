"""Native host ops: ctypes bindings over vsr_host_ops.cpp.

Builds the shared library on first use (g++ -O3 -shared, cached next to the
source); every entry point has a pure-cv2 fallback so a missing toolchain
never blocks the pipeline — it only costs host-loop speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "vsr_host_ops.cpp")
_LIB = os.path.join(_DIR, "libvsr_host_ops.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

DEFAULT_THREADS = min(8, os.cpu_count() or 1)


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", _SRC, "-o", _LIB]
    try:
        subprocess.check_output(cmd, stderr=subprocess.STDOUT, timeout=120)
        return _LIB
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if os.environ.get("VSR_DISABLE_NATIVE"):
            _build_failed = True
            return None
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.paste_band_blend.argtypes = [
            u8p, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.crop_resize.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def paste_band_blend(
    frame: np.ndarray,      # [H, W, 3] uint8, modified in place
    comp: np.ndarray,       # [comp_h, comp_w, 3] uint8
    mask01: np.ndarray,     # [band_h, W] uint8 {0,1}
    y0: int,
    band_h: int,
    threads: int = DEFAULT_THREADS,
) -> bool:
    """Fused resize+masked-blend of comp into frame rows [y0, y0+band_h).

    Returns False (caller must use the cv2 fallback) when the native library
    is unavailable or buffers are not contiguous."""
    lib = get_lib()
    if lib is None:
        return False
    if not (frame.flags.c_contiguous and comp.flags.c_contiguous
            and mask01.flags.c_contiguous):
        return False
    H, W = frame.shape[:2]
    lib.paste_band_blend(
        _ptr(frame), W, _ptr(comp), comp.shape[0], comp.shape[1],
        _ptr(mask01), y0, band_h, W, threads)
    return True


def crop_resize(
    frame: np.ndarray,  # [H, W, 3] uint8
    y0: int,
    crop_h: int,
    out_w: int,
    out_h: int,
    threads: int = 1,
    out: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    """Bilinear resize of frame[y0:y0+crop_h] to (out_h, out_w). None when
    native unavailable. ``out`` writes into a caller buffer (e.g. one row of
    a preallocated chunk stack — skips the np.stack copy on the hot path)."""
    lib = get_lib()
    if lib is None or not frame.flags.c_contiguous:
        return None
    H, W = frame.shape[:2]
    if out is None:
        out = np.empty((out_h, out_w, 3), np.uint8)
    else:
        assert out.shape == (out_h, out_w, 3) and out.dtype == np.uint8 \
            and out.flags.c_contiguous
    lib.crop_resize(_ptr(frame), W, y0, crop_h, W, _ptr(out), out_h, out_w,
                    threads)
    return out
