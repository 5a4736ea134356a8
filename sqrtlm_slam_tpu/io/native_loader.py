"""ctypes binding for the native prefetching KITTI loader.

Wraps native/dataloader/libkittiloader.so (C++ thread-pool PNG/velodyne
decoder — the production replacement for `kittiHelper`'s foreground feeding,
/root/reference/Node/kittiHelper.cpp:74-172). Compiles the library on first
use if the .so is missing; falls back cleanly when no toolchain is present
(`NativeKittiLoader.available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "dataloader",
)
_SO = os.path.join(_NATIVE_DIR, "libkittiloader.so")

_lib: Optional[ctypes.CDLL] = None


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.kl_open.restype = ctypes.c_void_p
    lib.kl_open.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.kl_close.argtypes = [ctypes.c_void_p]
    lib.kl_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.kl_frame_info.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.kl_copy_image.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float)
    ]
    lib.kl_copy_velodyne.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float)
    ]
    _lib = lib
    return lib


class NativeKittiLoader:
    """Background-prefetching frame reader for one KITTI sequence."""

    def __init__(
        self,
        image_dir: Optional[str],
        velo_dir: Optional[str],
        num_frames: int,
        n_threads: int = 4,
        window: int = 8,
    ):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable (no toolchain/libpng)")
        self._lib = lib
        self._h = lib.kl_open(
            (image_dir or "").encode(), (velo_dir or "").encode(),
            num_frames, n_threads, window,
        )
        self.num_frames = num_frames

    @staticmethod
    def available() -> bool:
        return _load_lib() is not None

    def prefetch(self, idx: int):
        self._lib.kl_prefetch(self._h, idx)

    def frame(self, idx: int):
        """Returns (image (H, W) float32 or None, velodyne (N, 4) or None)."""
        h = ctypes.c_int()
        w = ctypes.c_int()
        n = ctypes.c_int()
        self._lib.kl_frame_info(self._h, idx, h, w, n)
        img = None
        if h.value > 0:
            img = np.empty((h.value, w.value), np.float32)
            self._lib.kl_copy_image(
                self._h, idx, img.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
        velo = None
        if n.value > 0:
            velo = np.empty((n.value, 4), np.float32)
            self._lib.kl_copy_velodyne(
                self._h, idx, velo.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
        return img, velo

    def close(self):
        if self._h:
            self._lib.kl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
