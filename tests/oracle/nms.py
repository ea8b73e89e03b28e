"""Oracle greedy NMS — Fast R-CNN semantics (vdetlib/utils/cython_nms.pyx).

Canonical tie-break contract for the whole framework: boxes are visited in
order of (score descending, original index ascending); a box is suppressed when
its IoU with any previously-kept box exceeds ``thresh`` (strict >).
Areas use the legacy +1 pixel convention.
"""

from __future__ import annotations

import numpy as np


def iou_single(a, b, offset: float = 1.0) -> float:
    ix1 = max(a[0], b[0])
    iy1 = max(a[1], b[1])
    ix2 = min(a[2], b[2])
    iy2 = min(a[3], b[3])
    iw = max(ix2 - ix1 + offset, 0.0)
    ih = max(iy2 - iy1 + offset, 0.0)
    inter = iw * ih
    area_a = (a[2] - a[0] + offset) * (a[3] - a[1] + offset)
    area_b = (b[2] - b[0] + offset) * (b[3] - b[1] + offset)
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def nms(dets: np.ndarray, thresh: float, offset: float = 1.0) -> list[int]:
    """Greedy NMS over dets[N, 5] = (x1, y1, x2, y2, score) → keep indices.

    Returns original indices in visit order (descending score, index tiebreak).
    """
    dets = np.asarray(dets, dtype=np.float64)
    n = dets.shape[0]
    order = sorted(range(n), key=lambda i: (-dets[i, 4], i))
    keep: list[int] = []
    for i in order:
        ok = True
        for j in keep:
            if iou_single(dets[i, :4], dets[j, :4], offset) > thresh:
                ok = False
                break
        if ok:
            keep.append(i)
    return keep
