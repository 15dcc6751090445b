"""Native (C++) host-runtime components.

The TPU compute path is jax/XLA/Pallas; the host runtime around it — here
the image-decode feed for ImageFolder datasets — is native C++ where the
per-call Python overhead would otherwise bound training throughput on this
single-core host (the reference's analogue is torchvision/PIL decode inside
16 DataLoader worker processes, reference mngrdata.py:158-163).

imgcodec: PNG/JPEG decode fused with bilinear resize (imgcodec.cpp),
compiled on first use with the system toolchain into a cached shared
library and bound via ctypes (the env bakes g++ but not pybind11). Every
entry point degrades gracefully: if the toolchain or codec libraries are
missing, callers fall back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "imgcodec.cpp")
_LIB_DIR = os.path.join(_HERE, "build")
_LIB = os.path.join(_LIB_DIR, "libimgcodec.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    """Compile imgcodec.cpp → build/libimgcodec.so (atomic rename so
    concurrent processes never load a half-written library)."""
    os.makedirs(_LIB_DIR, exist_ok=True)
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-lpng", "-ljpeg", "-o", tmp]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if r.returncode != 0:
            return False
        os.replace(tmp, _LIB)
        return True
    except (OSError, subprocess.SubprocessError):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.cn_decode_file.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int,
            ]
            lib.cn_decode_file.restype = ctypes.c_int
            lib.cn_image_size.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.cn_image_size.restype = ctypes.c_int
            _lib = lib
        except OSError:
            _load_failed = True
    return _lib


def available() -> bool:
    """True when the native codec is built (or buildable) on this host."""
    if os.environ.get("CONVNETS_TPU_NATIVE_DECODE", "1") == "0":
        return False
    return _load() is not None


def image_size(path: str):
    """(h, w) of the image at `path`, or None if the native probe fails."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int(0)
    w = ctypes.c_int(0)
    if lib.cn_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def decode_image(path: str, out_hw=None) -> Optional[np.ndarray]:
    """Decode (and bilinearly resize to `out_hw`, if given) into an RGB
    uint8 array of shape (h, w, 3). Returns None on any failure — callers
    fall back to PIL. The foreign call releases the GIL, so DataLoader
    decode worker threads overlap with the dispatch thread."""
    lib = _load()
    if lib is None:
        return None
    if out_hw is None:
        out_hw = image_size(path)
        if out_hw is None:
            return None
    h, w = int(out_hw[0]), int(out_hw[1])
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.cn_decode_file(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w
    )
    if rc != 0:
        return None
    return out
