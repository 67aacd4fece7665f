"""ctypes bindings for the native IO runtime (native/libd3roma_io.so).

Provides threaded EXR decode for the data-loader hot path. The library is
built on demand with the repo Makefile; every entry point falls back to the
pure-Python implementation (d3roma_tpu/utils/exr.py) when no compiler or
.so is available, so the framework stays importable everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libd3roma_io.so")

_lib = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.exr_header.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.exr_header.restype = ctypes.c_int
    lib.exr_read.argtypes = [ctypes.c_char_p,
                             np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                             ctypes.c_int]
    lib.exr_read.restype = ctypes.c_int
    lib.exr_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
    ]
    lib.exr_read_batch.restype = None
    lib.exr_write.argtypes = [ctypes.c_char_p,
                              np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                              ctypes.c_int, ctypes.c_int]
    lib.exr_write.restype = ctypes.c_int
    lib.exr_channel_names.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                      ctypes.c_int]
    lib.exr_channel_names.restype = ctypes.c_int
    _lib = lib
    return lib


def _rgb_reorder(img: np.ndarray, path: str) -> np.ndarray:
    """Match the pure-Python decoder's channel convention (utils/exr.py):
    storage is alphabetical (B,G,R); return RGB-ordered when R/G/B are
    all present. Without this the native and Python decoders returned
    different channel orders depending on which host built the lib."""
    lib = _load()
    buf = ctypes.create_string_buffer(4096)
    if lib.exr_channel_names(path.encode(), buf, len(buf)) != 0:
        return img
    names = buf.value.decode().split(";")
    if set(names) >= {"R", "G", "B"}:
        idx = [names.index("R"), names.index("G"), names.index("B")]
        idx += [i for i in range(img.shape[-1]) if i not in idx]
        return img[..., idx]
    return img


def available() -> bool:
    return _load() is not None


def read_exr(path: str) -> np.ndarray:
    """Native EXR read; raises on failure (callers fall back to Python)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    if lib.exr_header(path.encode(), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c)) != 0:
        raise ValueError(f"bad EXR header: {path}")
    total = h.value * w.value * c.value
    if not 0 < total < 2**31:  # c_int capacity + sane allocation bound
        raise ValueError(f"unreasonable EXR size {total}: {path}")
    out = np.empty(total, np.float32)
    n = lib.exr_read(path.encode(), out, out.size)
    if n < 0:
        raise NotImplementedError(f"native EXR decode failed ({n}): {path}")
    img = out.reshape(h.value, w.value, c.value)
    return img[..., 0] if c.value == 1 else _rgb_reorder(img, path)


def read_exr_batch(paths: List[str], num_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Parallel decode of same-shaped EXR files -> ([N,H,W(,C)], status [N])."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO unavailable")
    if not paths:
        return np.empty((0,), np.float32), np.empty((0,), np.int32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    if lib.exr_header(paths[0].encode(), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c)) != 0:
        raise ValueError(f"bad EXR header: {paths[0]}")
    per = h.value * w.value * c.value
    n = len(paths)
    out = np.empty(n * per, np.float32)
    status = np.empty(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.exr_read_batch(arr, n, out, per, status, num_threads)
    shape = (n, h.value, w.value) if c.value == 1 else (n, h.value, w.value, c.value)
    res = out.reshape(shape)
    if c.value > 1:
        res = _rgb_reorder(res, paths[0])  # same-shaped files share names
    return res, status


def write_exr(path: str, image: np.ndarray) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO unavailable")
    img = np.ascontiguousarray(np.asarray(image, np.float32))
    assert img.ndim == 2, "native writer is single-channel"
    if lib.exr_write(path.encode(), img, img.shape[0], img.shape[1]) != 0:
        raise IOError(f"native EXR write failed: {path}")
