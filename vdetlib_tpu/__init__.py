"""vdetlib_tpu — TPU-native video object detection framework.

A from-scratch, TPU-first rebuild of the capabilities of ``myfavouritekk/vdetlib``
(the support library behind the T-CNN ImageNet VID pipeline):

- wire-compatible JSON protocols (``vid_proto``/``box_proto``/``det_proto``/
  ``track_proto``/``score_proto``/``annot_proto``) — see :mod:`vdetlib_tpu.protos`
  (reference: vdetlib/utils/protocol.py);
- batched per-frame detection (JAX CNN replacing external Caffe) —
  :mod:`vdetlib_tpu.nn` + :mod:`vdetlib_tpu.video.detect`
  (reference: vdetlib/vid/detect.py);
- NMS as an XLA/Pallas kernel — :mod:`vdetlib_tpu.kernels.nms`
  (reference: vdetlib/utils/cython_nms.pyx);
- motion-guided propagation, tubelet tracking, temporal rescoring, and seq-NMS
  linking as scanned/vmapped device programs — :mod:`vdetlib_tpu.video`
  (reference: vdetlib/vid/track.py and the T-CNN pipeline tools);
- stage-oriented CLI tools with atomic writes and resume-by-existence —
  :mod:`vdetlib_tpu.cli`, :mod:`vdetlib_tpu.pipeline`;
- video-level data parallelism over a ``jax.sharding.Mesh`` —
  :mod:`vdetlib_tpu.dist`.

The reference delegated heavy compute to Caffe/OpenCV (C++/CUDA); here the
compute path is JAX/XLA/Pallas on TPU and the host-side hot loop (greedy NMS on
CPU for the pure-CPU configs) has a C++ fast path in
:mod:`vdetlib_tpu.native`.
"""

__version__ = "0.1.0"
