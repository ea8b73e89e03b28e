"""Native host kernels — ctypes bindings for the C++ NMS/IoU library.

The reference shipped one in-repo native component (the Cython greedy NMS,
vdetlib/utils/cython_nms.pyx); this package is its rebuild. The shared library
is built with ``make -C vdetlib_tpu/native`` (auto-attempted on first import);
a vectorized numpy fallback with identical semantics keeps everything working
when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libvdet_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried_build = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried_build
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _tried_build:
        _tried_build = True
        if os.environ.get("VDETLIB_TPU_NO_NATIVE_BUILD") != "1":
            try:
                subprocess.run(
                    ["make", "-C", _DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vdet_nms.restype = ctypes.c_int32
    lib.vdet_nms.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.vdet_iou_matrix.restype = None
    lib.vdet_iou_matrix.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def nms(dets, thresh: float, offset: float = 1.0) -> list[int]:
    """Greedy NMS over dets[N, 5] = (x1,y1,x2,y2,score) → ranked keep indices."""
    dets = np.ascontiguousarray(dets, dtype=np.float32).reshape(-1, 5)
    n = dets.shape[0]
    if n == 0:
        return []
    lib = _load()
    if lib is not None:
        keep = np.empty(n, dtype=np.int32)
        n_keep = lib.vdet_nms(
            dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            np.int32(n),
            np.float32(thresh),
            np.float32(offset),
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return keep[:n_keep].tolist()
    return _nms_numpy(dets, thresh, offset)


def iou_matrix(boxes_a, boxes_b, offset: float = 1.0) -> np.ndarray:
    a = np.ascontiguousarray(boxes_a, dtype=np.float32).reshape(-1, 4)
    b = np.ascontiguousarray(boxes_b, dtype=np.float32).reshape(-1, 4)
    lib = _load()
    if lib is not None:
        out = np.empty((a.shape[0], b.shape[0]), dtype=np.float32)
        lib.vdet_iou_matrix(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            np.int32(a.shape[0]),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            np.int32(b.shape[0]),
            np.float32(offset),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    from vdetlib_tpu.utils.common import iou

    return iou(a, b, offset).astype(np.float32)


def _nms_numpy(dets: np.ndarray, thresh: float, offset: float) -> list[int]:
    """Vectorized numpy fallback, identical semantics to the C++ kernel."""
    x1, y1, x2, y2, scores = dets.T.astype(np.float64)
    areas = (x2 - x1 + offset) * (y2 - y1 + offset)
    # stable sort on -score keeps index-ascending tie order.
    order = np.argsort(-scores, kind="stable")
    keep: list[int] = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        ix1 = np.maximum(x1[i], x1[rest])
        iy1 = np.maximum(y1[i], y1[rest])
        ix2 = np.minimum(x2[i], x2[rest])
        iy2 = np.minimum(y2[i], y2[rest])
        iw = np.maximum(ix2 - ix1 + offset, 0.0)
        ih = np.maximum(iy2 - iy1 + offset, 0.0)
        inter = iw * ih
        union = areas[i] + areas[rest] - inter
        iou = np.where(union > 0, inter / union, 0.0)
        order = rest[iou <= thresh]
    return keep
