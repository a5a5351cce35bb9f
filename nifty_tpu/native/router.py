"""Loader for the native Euler-split edge colorer (router.cc).

Built on first use with plain ``g++ -O3 -shared``; when no compiler is
available callers fall back to the pure-Python traversal in
:mod:`nifty_tpu.ops.route` (same algorithm, ~50x slower at millions of
edges)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "router.cc")
_LIB_PATH = os.path.join(_HERE, "_libnifty_router.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(
                _LIB_PATH
            ) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.router_euler_color.argtypes = [
                ctypes.c_int64, i64p, i64p, ctypes.c_int64,
                ctypes.c_int64, i64p,
            ]
            lib.router_euler_color.restype = ctypes.c_int
            _lib = lib
        except Exception as e:  # pragma: no cover - fallback path
            print(
                f"nifty_tpu.native.router: C++ build unavailable ({e}); "
                "using Python Euler split",
                file=sys.stderr,
            )
            _lib = None
    return _lib


def euler_color_native(src, dst, n, n_colors):
    """Proper edge coloring via the native library, or None when the
    native build is unavailable (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    out = np.empty(src.size, dtype=np.int64)
    rc = lib.router_euler_color(src.size, src, dst, int(n), int(n_colors), out)
    if rc != 0:
        raise ValueError(f"router_euler_color failed (rc={rc})")
    return out
