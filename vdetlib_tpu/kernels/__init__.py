"""Device kernels (XLA + Pallas) for the post-processing hot path.

Reference parity: the reference's single in-repo native kernel is the Cython
greedy NMS (``vdetlib/utils/cython_nms.pyx``); everything else ran in external
C++/CUDA (Caffe convs, OpenCV optical flow). Here the whole hot path is
device-resident: NMS (XLA masked-greedy + Pallas fused kernel), seq-NMS DP
linking, pyramidal correlation optical flow, and fused frame preprocessing.
"""

from vdetlib_tpu.kernels.nms import (  # noqa: F401
    batched_nms,
    nms_fixpoint,
    nms_unsorted_fixpoint,
    nms_xla,
    sort_by_score,
)
from vdetlib_tpu.kernels.flow import (  # noqa: F401
    flow_video,
    mean_flow_in_boxes,
)
from vdetlib_tpu.kernels.seq_nms import seq_nms_batch, seq_nms_single  # noqa: F401
from vdetlib_tpu.kernels.preprocess import fused_resize_normalize  # noqa: F401
