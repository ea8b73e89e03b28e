"""Device kernels (XLA + Pallas) for the post-processing hot path.

Reference parity: the reference's single in-repo native kernel is the Cython
greedy NMS (``vdetlib/utils/cython_nms.pyx``); everything else ran in external
C++/CUDA (Caffe convs, OpenCV optical flow). Here the whole hot path is
device-resident: NMS (XLA masked-greedy + Pallas fused kernel), seq-NMS DP
linking, pyramidal correlation optical flow, and fused frame preprocessing.
"""

from vdetlib_tpu.kernels.nms import (  # noqa: F401
    nms_xla,
    batched_nms,
    sort_by_score,
)
