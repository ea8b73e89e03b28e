"""Oracle MGP box shifting: ground-truth-motion reference for flow tests.

The flow kernel's acceptance criterion is BOX-SHIFT tolerance (SURVEY.md §7):
a detection propagated from frame t to t+1 should land near where the object
actually moved, which for synthetic videos is known exactly from gt_boxes.
"""

from __future__ import annotations

import numpy as np


def gt_shift(gt_boxes: np.ndarray, k: int, t: int) -> np.ndarray:
    """True (dx, dy) center shift of object k between frames t and t+1."""
    a, b = gt_boxes[k, t], gt_boxes[k, t + 1]
    ca = np.array([(a[0] + a[2]) / 2, (a[1] + a[3]) / 2])
    cb = np.array([(b[0] + b[2]) / 2, (b[1] + b[3]) / 2])
    return cb - ca
