"""Per-frame, per-class NMS over a det_proto (pipeline suppression stage).

This is config 1 of the capability contract (BASELINE.json:7): load a
vid_proto + precomputed det_proto, apply greedy NMS independently per frame
and per class, and write the filtered det_proto — pure CPU, JSON in/out, the
reference's minimal path (SURVEY.md §3.5).

Two backends with identical semantics:
- ``host``: the native C++/numpy greedy NMS per (frame, class) — the
  reference's cython_nms shape, zero device involvement.
- ``xla``: pad to (T, C, N) and run the batched masked-greedy device kernel
  (kernels/nms.py) in one fused program.

A detection participates in class c's NMS only where it carries an explicit
score entry for c; its surviving entry list is the set of classes where it was
kept, and detections with no surviving classes are dropped.
"""

from __future__ import annotations

import numpy as np

from vdetlib_tpu.kernels.nms import batched_nms, nms_host
from vdetlib_tpu.protos.accessors import det_class_indices, frame_ids
from vdetlib_tpu.geometry.boxes import LEGACY_OFFSET


def frame_nms(
    vid_proto: dict,
    det_proto: dict,
    thresh: float = 0.3,
    backend: str = "host",
    offset: float = LEGACY_OFFSET,
    max_boxes: int = 512,
) -> dict:
    """Apply per-frame per-class NMS; returns a filtered det_proto."""
    if backend == "host":
        return _frame_nms_host(vid_proto, det_proto, thresh, offset)
    if backend in ("xla", "fixpoint", "pallas"):
        return _frame_nms_device(
            vid_proto, det_proto, thresh, offset, max_boxes, backend
        )
    raise ValueError(f"unknown backend: {backend}")


def _collect(det_proto: dict):
    """Group detections by frame preserving file order.

    Returns {frame_id: [(det_index, det_dict), ...]} plus the det list.
    """
    by_frame: dict[int, list[tuple[int, dict]]] = {}
    for i, d in enumerate(det_proto["detections"]):
        by_frame.setdefault(int(d["frame"]), []).append((i, d))
    return by_frame


def _frame_nms_host(vid_proto, det_proto, thresh, offset) -> dict:
    by_frame = _collect(det_proto)
    classes = det_class_indices(det_proto)
    # (det_index, class_index) pairs that survive.
    kept_pairs: set[tuple[int, int]] = set()
    for fid in frame_ids(vid_proto):
        entries = by_frame.get(fid, [])
        if not entries:
            continue
        for c in classes:
            rows = []
            idxs = []
            for det_idx, d in entries:
                for s in d["scores"]:
                    if int(s["class_index"]) == c:
                        rows.append(list(d["bbox"]) + [float(s["score"])])
                        idxs.append(det_idx)
                        break
            if not rows:
                continue
            keep = nms_host(np.asarray(rows, dtype=np.float32), thresh, offset)
            for k in keep:
                kept_pairs.add((idxs[k], c))
    return _filter_det_proto(det_proto, kept_pairs)


def _frame_nms_device(vid_proto, det_proto, thresh, offset, max_boxes, backend) -> dict:
    import jax
    import jax.numpy as jnp

    by_frame = _collect(det_proto)
    classes = det_class_indices(det_proto)
    fids = frame_ids(vid_proto)
    T, C, N = len(fids), len(classes), max_boxes
    boxes = np.zeros((T, N, 4), dtype=np.float32)
    scores = np.zeros((T, C, N), dtype=np.float32)
    has_entry = np.zeros((T, C, N), dtype=bool)
    det_index = -np.ones((T, N), dtype=np.int64)
    class_slot = {ci: c for c, ci in enumerate(classes)}  # O(1) per entry
    for t, fid in enumerate(fids):
        entries = by_frame.get(fid, [])[:N]
        for n, (det_idx, d) in enumerate(entries):
            boxes[t, n] = np.asarray(d["bbox"], dtype=np.float32)
            det_index[t, n] = det_idx
            for s in d["scores"]:
                c = class_slot.get(int(s["class_index"]))
                if c is not None:
                    scores[t, c, n] = float(s["score"])
                    has_entry[t, c, n] = True
    boxes_tc = jnp.broadcast_to(jnp.asarray(boxes)[:, None], (T, C, N, 4))
    if backend == "fixpoint":
        from vdetlib_tpu.kernels.nms import nms_fixpoint

        keep = nms_fixpoint(
            boxes_tc.reshape(T * C, N, 4),
            jnp.asarray(scores).reshape(T * C, N),
            jnp.asarray(has_entry).reshape(T * C, N),
            thresh,
            offset=offset,
        ).reshape(T, C, N)
    elif backend == "pallas":
        from vdetlib_tpu.kernels.nms_pallas import batched_nms_pallas

        # Compiled Mosaic kernels need a real TPU; interpret elsewhere.
        interpret = jax.default_backend() == "cpu"
        keep = batched_nms_pallas(
            boxes_tc,
            jnp.asarray(scores),
            jnp.asarray(has_entry),
            thresh,
            offset=offset,
            interpret=interpret,
        )
    else:
        keep = batched_nms(
            boxes_tc, jnp.asarray(scores), jnp.asarray(has_entry), thresh, offset=offset
        )
    keep = np.asarray(keep) & has_entry
    kept_pairs: set[tuple[int, int]] = set()
    for t in range(T):
        for c in range(C):
            for n in np.nonzero(keep[t, c])[0]:
                kept_pairs.add((int(det_index[t, n]), classes[c]))
    return _filter_det_proto(det_proto, kept_pairs)


def _filter_det_proto(det_proto: dict, kept_pairs: set[tuple[int, int]]) -> dict:
    detections = []
    for i, d in enumerate(det_proto["detections"]):
        surviving = [s for s in d["scores"] if (i, int(s["class_index"])) in kept_pairs]
        if surviving:
            detections.append({"frame": d["frame"], "bbox": d["bbox"], "scores": surviving})
    out = {k: v for k, v in det_proto.items() if k != "detections"}
    out["detections"] = detections
    return out
