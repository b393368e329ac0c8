"""Native C++ host components (ctypes binding with lazy self-build).

The .so is compiled from mapmerge_native.cpp with g++ on first use and
cached next to the source. Everything degrades gracefully to the pure
Python implementations when the toolchain is unavailable
(set MAPMERGE_NATIVE=0 to force the fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mapmerge_native.cpp")
_SO = os.path.join(_DIR, "libmapmerge_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _SO, _SRC,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on first call; None if unavailable."""
    global _lib, _tried
    if os.environ.get("MAPMERGE_NATIVE", "1") == "0":
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.lzf_decompress.restype = ctypes.c_int
        lib.lzf_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.merge_graph_solve.restype = ctypes.c_int
        lib.merge_graph_solve.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            ctypes.c_float,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def lzf_decompress(data: bytes, expected: int) -> Optional[bytes]:
    """Native LZF decompression; None if the library is unavailable or the
    payload is malformed (callers fall back to the Python path)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(expected, np.uint8)
    n = lib.lzf_decompress(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        expected,
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def merge_graph_solve(
    src: np.ndarray,
    tgt: np.ndarray,
    conf: np.ndarray,
    transforms: np.ndarray,
    conf_threshold: float,
) -> Optional[np.ndarray]:
    """Native global-consistency solve; None if unavailable.

    Returns (n_nodes, 4, 4) float32 global transforms.
    """
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    tgt = np.ascontiguousarray(tgt, np.int32)
    conf = np.ascontiguousarray(conf, np.float32)
    transforms = np.ascontiguousarray(transforms, np.float32).reshape(-1, 16)
    n_edges = len(src)
    cap = int(max(src.max(initial=-1), tgt.max(initial=-1)) + 1) if n_edges else 0
    out = np.zeros((max(cap, 1), 16), np.float32)
    n = lib.merge_graph_solve(
        src, tgt, conf, transforms.reshape(-1), n_edges,
        float(conf_threshold), out.reshape(-1), out.shape[0],
    )
    if n < 0:
        return None
    return out[:n].reshape(n, 4, 4)
