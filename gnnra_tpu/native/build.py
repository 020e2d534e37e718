"""Lazy ctypes build/load of the native host library."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "blocking.cpp")


def _build(so_path: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", so_path],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so_path = os.path.join(os.path.dirname(__file__), "_blocking.so")
        if not os.path.exists(so_path) or (
                os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
            if not _build(so_path):
                return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.fill_receiver_blocks.argtypes = [
            i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, i32p, i32p, f32p, i32p]
        lib.fill_receiver_blocks.restype = ctypes.c_int32
        lib.count_ring_cells.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, i64p]
        lib.count_ring_cells.restype = None
        lib.fill_ring_cells.argtypes = [
            i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, i32p, i32p, f32p]
        lib.fill_ring_cells.restype = ctypes.c_int32
        lib.bfs_order.argtypes = [i64p, i32p, ctypes.c_int32, i32p]
        lib.bfs_order.restype = None
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return get_lib() is not None
