"""ctypes bindings + lazy build for the native (C++) evaluator kernels.

Builds csrc/box_iou.cpp into a shared library on first use (g++ is part of
the image). Falls back to the pure-numpy path when a compiler is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.join(_CSRC, "libbox_iou.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_CSRC, "box_iou.cpp")
    if not os.path.isfile(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, src],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _stale() -> bool:
    """A prebuilt .so must never silently outlive the committed source."""
    src = os.path.join(_CSRC, "box_iou.cpp")
    try:
        return os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
    except OSError:
        return True


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if (not os.path.isfile(_LIB_PATH) or _stale()) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.box3d_iou_pairs.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.box3d_iou_pairs.restype = None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def box3d_iou_pairs(dets: np.ndarray, gts: np.ndarray) -> Optional[np.ndarray]:
    """(nd, 8, 3) x (ng, 8, 3) -> (nd, ng) rotated 3D IoU, or None when the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    dets = np.ascontiguousarray(dets, np.float32)
    gts = np.ascontiguousarray(gts, np.float32)
    out = np.zeros((dets.shape[0], gts.shape[0]), np.float32)
    lib.box3d_iou_pairs(
        dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dets.shape[0],
        gts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), gts.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
