"""Frame-wise detection stage — det_vid, TPU-native.

Reference parity: ``vdetlib/vid/detect.py::det_vid`` (SURVEY.md §3.1): for
each frame, score its proposals with the CNN, apply bbox-regression deltas,
assemble a det_proto. The reference's nested Python loops (frames ×
proposal-minibatches through pycaffe) become one jitted program per frame
batch: backbone → ROI-align → head → softmax → per-class delta apply → clip,
all device-resident; the host only decodes JPEGs (threaded) and pads
proposals.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vdetlib_tpu.data.loader import FrameLoader
from vdetlib_tpu.geometry.boxes import apply_deltas, clip_boxes
from vdetlib_tpu.nn.detector import Detector, preprocess_images
from vdetlib_tpu.protos.accessors import boxes_at_frame
from vdetlib_tpu.utils.log import StageMetrics


@dataclass(frozen=True)
class DetectOptions:
    batch_size: int = 8
    max_rois: int = 128
    image_hw: tuple = (240, 320)  # static network input (H, W)
    score_thresh: float = 0.005  # drop per-class entries below this
    regress: bool = True  # apply per-class bbox regression
    class_names: Optional[tuple] = None
    # Resize on device (fused MXU resize+normalize, kernels/preprocess.py):
    # frames cross PCIe at native resolution as uint8; host cv2 resize is
    # skipped. Requires constant native frame size within a video.
    device_resize: bool = False
    # Image pyramid (reference det_fun ran multi-scale): each entry scales
    # the network input; per-box scores are max-pooled over scales on device.
    # (1.0,) = single scale.
    pyramid: tuple = (1.0,)


@functools.partial(
    jax.jit, static_argnames=("model", "regress", "net_hw", "pyramid")
)
def _detect_step_pyramid(
    model: Detector, params, images_u8, rois, regress: bool, pyramid: tuple,
    net_hw=None,
):
    """Multi-scale detection: run the net at each pyramid scale and max-pool.

    Scores are per-(box, class) maxima over scales (the reference's pyramid
    scoring); regressed boxes come from the best-scoring scale's deltas.
    """
    from vdetlib_tpu.kernels.preprocess import fused_resize_normalize

    base_hw = net_hw if net_hw is not None else images_u8.shape[1:3]
    all_probs, all_boxes = [], []
    for s in pyramid:
        hw = (
            max(int(round(base_hw[0] * s / 16)) * 16, 16),
            max(int(round(base_hw[1] * s / 16)) * 16, 16),
        )
        sc = jnp.asarray(
            [hw[1] / base_hw[1], hw[0] / base_hw[0]] * 2, jnp.float32
        )  # per-axis [sx, sy, sx, sy]
        probs_s, boxes_s = _detect_step(
            model, params, images_u8, rois * sc, regress, net_hw=hw
        )
        # boxes back to base scale
        all_probs.append(probs_s)
        all_boxes.append(boxes_s / sc)
    probs = jnp.stack(all_probs)  # (S, B, R, K)
    boxes = jnp.stack(all_boxes)
    best = jnp.argmax(probs, axis=0)  # (B, R, K)
    probs = jnp.max(probs, axis=0)
    boxes = jnp.take_along_axis(
        boxes, best[None, ..., None].repeat(4, -1), axis=0
    )[0]
    return probs, boxes


@functools.partial(jax.jit, static_argnames=("model", "regress", "net_hw"))
def _detect_step(
    model: Detector, params, images_u8, rois, regress: bool, net_hw=None
):
    """One device step: (B,H,W,3) u8 + (B,R,4) rois → probs (B,R,K), boxes (B,R,K,4).

    With ``net_hw`` set, frames arrive at NATIVE resolution and are resized
    on device by the fused MXU resize+normalize kernel; ``rois`` must already
    be in net coordinates.
    """
    if net_hw is not None and net_hw != images_u8.shape[1:3]:
        from vdetlib_tpu.kernels.preprocess import fused_resize_normalize

        images = fused_resize_normalize(
            images_u8,
            net_hw,
            pixel_mean=model.config.pixel_mean,
            pixel_scale=model.config.pixel_scale,
        )
    else:
        images = preprocess_images(images_u8, model.config)
    scores, deltas = model.apply(params, images, rois, train=False)
    probs = jax.nn.softmax(scores, axis=-1)  # (B, R, K)
    H, W = net_hw if net_hw is not None else images_u8.shape[1:3]
    if regress:
        boxes = apply_deltas(rois[:, :, None, :], deltas)  # (B, R, K, 4)
    else:
        boxes = jnp.broadcast_to(rois[:, :, None, :], deltas.shape)
    boxes = clip_boxes(boxes, H, W)
    return probs, boxes


def detect_arrays(model, params, frames_u8, rois, roi_mask, opts: DetectOptions):
    """In-memory detection over (T, H, W, 3) frames.

    Args:
      frames_u8: (T, H, W, 3) uint8 at the network size.
      rois: (T, R, 4) padded proposals in network pixel space.
      roi_mask: (T, R) bool.
    Returns:
      probs (T, R, K) and boxes (T, R, K, 4) numpy arrays.
    """
    T = frames_u8.shape[0]
    B = opts.batch_size
    probs_out, boxes_out = [], []
    for start in range(0, T, B):
        idx = np.arange(start, min(start + B, T))
        pad = B - len(idx)
        sel = np.concatenate([idx, np.repeat(idx[-1:], pad)]) if pad else idx
        p, b = _detect_step(
            model,
            params,
            jnp.asarray(frames_u8[sel]),
            jnp.asarray(rois[sel]),
            opts.regress,
        )
        probs_out.append(np.asarray(p[: len(idx)]))
        boxes_out.append(np.asarray(b[: len(idx)]))
    probs = np.concatenate(probs_out, axis=0)
    boxes = np.concatenate(boxes_out, axis=0)
    probs = probs * roi_mask[..., None]
    return probs, boxes


def det_vid(
    model,
    params,
    vid_proto: dict,
    box_proto: dict,
    opts: DetectOptions = DetectOptions(),
) -> dict:
    """Full detection stage: vid_proto + box_proto → det_proto.

    Emits one detection entry per (proposal, class) whose softmax probability
    clears ``score_thresh``, carrying that class's regressed box (pixel space
    of the ORIGINAL frames — network-space boxes are scaled back).
    """
    metrics = StageMetrics("detect")
    loader = FrameLoader(
        vid_proto, target_hw=None if opts.device_resize else opts.image_hw
    )
    R = opts.max_rois
    K = model.config.num_classes
    detections = []
    n_frames = 0

    def emit(fids, scales, mask, probs_dev, boxes_dev):
        # np.asarray here is the fence — by now the NEXT batch has already
        # been dispatched, so device compute overlaps this host work.
        probs = np.asarray(probs_dev)
        boxes = np.asarray(boxes_dev)
        for bi, fid in enumerate(fids):
            sy, sx = scales[bi]
            inv = np.array([1 / sx, 1 / sy, 1 / sx, 1 / sy], dtype=np.float32)
            for ri in range(R):
                if not mask[bi, ri]:
                    continue
                for ci in range(1, K):
                    sc = float(probs[bi, ri, ci])
                    if sc < opts.score_thresh:
                        continue
                    name = (
                        opts.class_names[ci]
                        if opts.class_names is not None
                        else str(ci)
                    )
                    detections.append(
                        {
                            "frame": int(fid),
                            "bbox": [float(v) for v in boxes[bi, ri, ci] * inv],
                            "scores": [
                                {"class": name, "class_index": ci, "score": sc}
                            ],
                        }
                    )

    pending = None
    for fids, images, scales in loader.iter_batches(opts.batch_size):
        B = images.shape[0]
        if opts.device_resize:
            h, w = images.shape[1:3]
            scales = [(opts.image_hw[0] / h, opts.image_hw[1] / w)] * len(fids)
        rois = np.zeros((B, R, 4), dtype=np.float32)
        mask = np.zeros((B, R), dtype=bool)
        for bi, fid in enumerate(fids):
            sy, sx = scales[bi]
            props = boxes_at_frame(box_proto, fid)[:R]
            for ri, bb in enumerate(props):
                rois[bi, ri] = [bb[0] * sx, bb[1] * sy, bb[2] * sx, bb[3] * sy]
                mask[bi, ri] = True
        net_hw = opts.image_hw if opts.device_resize else None
        if tuple(opts.pyramid) != (1.0,):
            probs_dev, boxes_dev = _detect_step_pyramid(
                model, params, jnp.asarray(images), jnp.asarray(rois),
                opts.regress, tuple(opts.pyramid),
                net_hw=net_hw or tuple(opts.image_hw),
            )
        else:
            probs_dev, boxes_dev = _detect_step(
                model, params, jnp.asarray(images), jnp.asarray(rois),
                opts.regress, net_hw=net_hw,
            )
        if pending is not None:
            emit(*pending)
        pending = (fids, scales, mask, probs_dev, boxes_dev)
        n_frames += len(fids)
    if pending is not None:
        emit(*pending)
    loader.close()
    metrics.set("frames", n_frames)
    metrics.set("dets_out", len(detections))
    metrics.finish()
    return {"video": vid_proto["video"], "detections": detections}
