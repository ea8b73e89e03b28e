"""Box geometry — IoU, clipping, R-CNN delta transforms, padding conventions.

All functions are jnp-based, jittable, and operate on the trailing ``(..., 4)``
axis so they compose with ``vmap`` over frames/classes/tracks. Conventions are
pinned to the reference's Fast R-CNN lineage (SURVEY.md "hard parts"):
pixel-space ``[x1, y1, x2, y2]`` with the legacy ``+1`` width/height offset
used by ``vdetlib/utils/cython_nms.pyx`` and ``vdetlib/utils/common.py::iou``.
"""

from vdetlib_tpu.geometry.boxes import (  # noqa: F401
    LEGACY_OFFSET,
    box_wh,
    box_area,
    box_center,
    pairwise_iou,
    elementwise_iou,
    clip_boxes,
    apply_deltas,
    encode_deltas,
    shift_boxes,
)
