"""Native data-loader bindings (ctypes).

Builds ``decoder.cpp`` into ``libcoin_native.so`` on first use (g++ +
libjpeg) and exposes:

- ``decode_batch(blobs, scales, canvas_hw)`` — threaded JPEG decode +
  bilinear resize straight into a packed uint8 canvas batch.
- ``jpeg_size(blob)`` — header-only dimension probe.

``available()`` is False when the toolchain/libjpeg is missing; callers
(coin_tpu.data.loader) fall back to PIL.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "decoder.cpp")
_LIB = os.path.join(_HERE, "libcoin_native.so")

_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _LIB, "-ljpeg", "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.info("native decoder build failed (%s); using PIL", e)
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                    < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError as e:
        logger.info("native decoder load failed (%s); using PIL", e)
        return None
    lib.coin_decode_batch.restype = ctypes.c_int
    lib.coin_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    lib.coin_jpeg_size.restype = ctypes.c_int
    lib.coin_jpeg_size.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                   ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def jpeg_size(blob: bytes) -> Optional[Tuple[int, int]]:
    lib = _load()
    if lib is None:
        return None
    hw = (ctypes.c_int32 * 2)()
    if lib.coin_jpeg_size(blob, len(blob), hw) != 0:
        return None
    return int(hw[0]), int(hw[1])


def decode_batch(blobs: Sequence[bytes], scales: Sequence[float],
                 canvas_hw: Tuple[int, int],
                 num_threads: int = 8):
    """Returns (canvases (N, H, W, 3) uint8, out_hw (N, 4) int32
    [nh, nw, orig_h, orig_w]) or None when the native path is
    unavailable / any image failed."""
    lib = _load()
    if lib is None:
        return None
    n = len(blobs)
    ch, cw = canvas_hw
    canvases = np.zeros((n, ch, cw, 3), np.uint8)
    out_hw = np.zeros((n, 4), np.int32)
    datas = (ctypes.c_char_p * n)(*blobs)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    sc = (ctypes.c_float * n)(*[float(s) for s in scales])
    fails = lib.coin_decode_batch(
        datas, lens, sc, n,
        canvases.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ch, cw,
        out_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_threads)
    if fails:
        logger.warning("native decode: %d/%d images failed", fails, n)
        return None
    return canvases, out_hw
