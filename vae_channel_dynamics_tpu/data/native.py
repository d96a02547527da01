"""ctypes binding for the native C++ preprocessing kernel (csrc/preprocess.cpp).

Builds ``build/libvcdprep.so`` on first use with g++ (no pybind11 needed —
the kernel exposes a C ABI). Opt in with ``VCD_NATIVE_PREPROCESS=1``; the
PIL path remains the parity reference (the native filter is the same
triangle family PIL uses for antialiased bilinear, matching within ~1/255
per pixel)."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "csrc", "preprocess.cpp")
_SRC_DECODE = os.path.join(_REPO_ROOT, "csrc", "decode.cpp")
_LIB = os.path.join(_REPO_ROOT, "build", "libvcdprep.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    """Compile the native library. Preferred build includes the JPEG/PNG
    decode unit (links libjpeg/libpng); if those dev libraries are missing
    the build degrades to the preprocess-only kernel so resize/crop/normalize
    keeps working and only ``decode_available()`` turns false."""
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    base = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17"]
    attempts = [
        base + [_SRC, _SRC_DECODE, "-o", _LIB, "-ljpeg", "-lpng"],
        base + [_SRC, "-o", _LIB],
    ]
    for cmd in attempts:
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            logger.info(
                "Built native preprocess library (%s): %s",
                "with decode" if _SRC_DECODE in cmd else "preprocess only",
                _LIB,
            )
            return True
        except Exception as e:  # noqa: BLE001
            logger.warning("Native build failed (%s): %s", cmd, e)
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        stale = not os.path.exists(_LIB) or any(
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB)
            for src in (_SRC, _SRC_DECODE)
        )
        if stale:
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.vcd_preprocess_image.restype = ctypes.c_int
            lib.vcd_preprocess_image.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
            ]
            if hasattr(lib, "vcd_decode_preprocess"):
                lib.vcd_decode_preprocess.restype = ctypes.c_int
                lib.vcd_decode_preprocess.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_long,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int,
                    ctypes.c_int,
                ]
            _lib = lib
        except OSError as e:
            logger.warning("Failed to load native preprocess library: %s", e)
            _failed = True
    return _lib


def available() -> bool:
    return get_lib() is not None


def decode_available() -> bool:
    """True when the library was linked against libjpeg/libpng and can run
    the fused decode+preprocess path."""
    lib = get_lib()
    return lib is not None and hasattr(lib, "vcd_decode_preprocess")


def decode_preprocess(
    data: bytes, out_res: int, dct_scaling: bool = True
) -> np.ndarray:
    """JPEG/PNG bytes -> float32 (out_res, out_res, 3) in [-1, 1], decoded
    and preprocessed in one native call. ``dct_scaling`` lets libjpeg decode
    at 1/2-1/8 size when the source is much larger than the target (the
    resample filter still runs; numerics differ from a full-size decode at
    the ~1/255 level). Raises on unsupported containers/color spaces — the
    pipeline falls back to PIL."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "vcd_decode_preprocess"):
        raise RuntimeError("native decode library unavailable")
    buf = np.frombuffer(data, np.uint8)
    dst = np.empty((out_res, out_res, 3), np.float32)
    rc = lib.vcd_decode_preprocess(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(data),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_res,
        1 if dct_scaling else 0,
    )
    if rc != 0:
        raise RuntimeError(f"native decode failed with code {rc}")
    return dst


def preprocess_image(img_hwc_uint8: np.ndarray, out_res: int) -> np.ndarray:
    """uint8 HWC (1 or 3 channels) -> float32 (out_res, out_res, 3) in [-1, 1]."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native preprocess library unavailable")
    src = np.ascontiguousarray(img_hwc_uint8)
    if src.ndim == 2:
        src = src[:, :, None]
    if src.dtype != np.uint8 or src.ndim != 3 or src.shape[2] not in (1, 3):
        raise ValueError(f"Unsupported image array: {src.shape} {src.dtype}")
    h, w, c = src.shape
    dst = np.empty((out_res, out_res, 3), np.float32)
    rc = lib.vcd_preprocess_image(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_res,
    )
    if rc != 0:
        raise RuntimeError(f"native preprocess failed with code {rc}")
    return dst
