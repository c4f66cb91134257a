"""Native runtime bindings (ctypes) for the C++ decode engine.

Builds ``libyolo_runtime.so`` from ``src/decoder.cpp`` on first use (g++,
links libjpeg) and exposes :class:`NativeDecoder`. Falls back cleanly — the
data pipeline uses PIL when the native engine is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "decoder.cpp")
_LIB = os.path.join(_HERE, "libyolo_runtime.so")
_BUILD_LOCK = threading.Lock()


def build_native(force: bool = False) -> Optional[str]:
    """Compile the runtime library; returns its path or None on failure."""
    with _BUILD_LOCK:
        if not force and os.path.exists(_LIB) and \
                os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
        base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                "-o", _LIB, "-ljpeg", "-lpthread"]
        # -march=native lets the resize inner loops auto-vectorize to the
        # host's widest SIMD; fall back to portable codegen if unsupported
        for extra in (["-march=native", "-funroll-loops"], []):
            try:
                subprocess.run(base[:1] + extra + base[1:], check=True,
                               capture_output=True, text=True)
                return _LIB
            except subprocess.CalledProcessError:
                continue
            except FileNotFoundError:
                return None
        return None


_lib_handle = None


def _load():
    global _lib_handle
    if _lib_handle is not None:
        return _lib_handle
    path = build_native()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.yt_pool_create.restype = ctypes.c_void_p
    lib.yt_pool_create.argtypes = [ctypes.c_int]
    lib.yt_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.yt_decode_resize_batch.restype = ctypes.c_int
    lib.yt_decode_resize_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    _lib_handle = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class NativeDecoder:
    """Threaded JPEG decode + resize into one contiguous uint8 batch."""

    def __init__(self, num_threads: int = 8):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native runtime unavailable (g++/libjpeg)")
        self._pool = self._lib.yt_pool_create(num_threads)

    def __del__(self):
        if getattr(self, "_pool", None) and self._lib is not None:
            self._lib.yt_pool_destroy(self._pool)
            self._pool = None

    def decode_batch(self, paths: List[str], out_h: int, out_w: int,
                     fast: bool = False
                     ) -> Tuple[np.ndarray, np.ndarray, int]:
        """paths → (images (n, out_h, out_w, 3) u8,
        orig_sizes (n, 2) [w, h] int32, n_failures).

        ``fast=True`` selects the serving decode path: JDCT_IFAST (±1 LSB)
        + libjpeg DCT-domain prescaling toward the resize target (the
        block-IDCT downsample is a DIFFERENT resampling than the triangle
        filter — visually equivalent on natural images but not pixel-exact;
        measured-neutral on fixture mAP, docs/SERVING.md). Training keeps
        ``fast=False`` (bit-exact PIL-parity decode)."""
        n = len(paths)
        out = np.empty((n, out_h, out_w, 3), np.uint8)
        sizes = np.zeros((n, 2), np.int32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = self._lib.yt_decode_resize_batch(
            self._pool, arr, n, out_h, out_w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            1 if fast else 0)
        return out, sizes, int(failures)
