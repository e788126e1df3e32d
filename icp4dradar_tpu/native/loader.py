"""ctypes wrapper for the native prefetching loader (radario.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "radario.cpp")
_SO = os.path.join(_DIR, "libradario.so")
_BUILD_LOCK = threading.Lock()


def build_native_lib(src: str, so: str, extra_flags=(),
                     force: bool = False) -> str:
    """Compile a native C++ source -> shared library (mtime-cached).
    Shared by every native component (radario, bagio). Raises on failure."""
    with _BUILD_LOCK:
        if not force and os.path.exists(so) and (
            os.path.getmtime(so) >= os.path.getmtime(src)
        ):
            return so
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
            src, "-o", so, *extra_flags,
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return so


def build_native(force: bool = False) -> str:
    """Compile radario.cpp -> libradario.so (cached). Raises on failure."""
    return build_native_lib(_SRC, _SO, force=force)


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        so = build_native()
        lib = ctypes.CDLL(so)
        lib.rl_open.restype = ctypes.c_void_p
        lib.rl_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int]
        lib.rl_num_frames.restype = ctypes.c_int
        lib.rl_num_frames.argtypes = [ctypes.c_void_p]
        lib.rl_load.restype = ctypes.c_int
        lib.rl_load.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.rl_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class NativeBinLoader:
    """Prefetching .bin frame loader. load(k) -> (xyz, intensity, doppler, n)."""

    def __init__(self, folder: str, max_points: int,
                 prefetch_depth: int = 8, num_threads: int = 2):
        self._lib = _get_lib()
        self.max_points = max_points
        self._h = self._lib.rl_open(
            folder.encode(), max_points, prefetch_depth, num_threads
        )
        if not self._h:
            raise RuntimeError(f"rl_open failed for {folder}")
        self.num_frames = self._lib.rl_num_frames(self._h)

    def load(self, order: int):
        xyz = np.zeros((self.max_points, 3), dtype=np.float32)
        intensity = np.zeros(self.max_points, dtype=np.float32)
        doppler = np.zeros(self.max_points, dtype=np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        n = self._lib.rl_load(
            self._h, order,
            xyz.ctypes.data_as(fp), intensity.ctypes.data_as(fp),
            doppler.ctypes.data_as(fp),
        )
        if n < 0:
            raise IndexError(f"frame {order} out of range")
        return xyz, intensity, doppler, n

    def close(self):
        if getattr(self, "_h", None):
            self._lib.rl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self):
        return self.num_frames
