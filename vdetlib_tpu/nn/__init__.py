"""Neural nets (Flax) — detector backbone, R-CNN head, correlation tracker.

Replaces the reference's external Caffe CNNs (SURVEY.md §2.3): the per-frame
proposal-scoring network behind ``vdetlib/vid/detect.py::det_vid`` and the
FCN-style tracker behind ``vdetlib/vid/track.py::fcn_tracker``. Everything is
bfloat16 compute / float32 params, static shapes, built to batch over
(frames × proposals) in a single XLA program.
"""

from vdetlib_tpu.nn.backbone import Backbone, BackboneConfig  # noqa: F401
from vdetlib_tpu.nn.heads import RCNNHead, roi_align  # noqa: F401
from vdetlib_tpu.nn.detector import Detector, DetectorConfig  # noqa: F401
