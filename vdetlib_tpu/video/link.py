"""Seq-NMS suppression stage — protos in/out around the device DP kernel.

Reference parity: the final suppression stage of the T-CNN pipeline
(SURVEY.md §3.4). Consumes the (rescored) det_proto, runs per-class seq-NMS
on device (kernels/seq_nms.py), and emits the suppressed det_proto plus the
extracted tubelets as a track_proto (each DP path is a tubelet).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from vdetlib_tpu.kernels.seq_nms import seq_nms_batch
from vdetlib_tpu.protos.accessors import frame_ids as get_frame_ids
from vdetlib_tpu.protos.arrays import arrays_to_det_proto, det_proto_to_arrays
from vdetlib_tpu.utils.log import StageMetrics


@dataclass(frozen=True)
class LinkOptions:
    link_thresh: float = 0.5
    suppress_thresh: float = 0.3
    max_paths: int = 100
    rescore: str = "avg"  # avg | max
    max_boxes: int = 64
    num_classes: int = 31
    min_score: float = 0.0  # drop rescored entries at/below this
    backend: str = "device"  # device (XLA while_loop) | host (numpy)


def tubelets_from_path_ids(
    boxes: np.ndarray,  # (T, N, 4)
    out_scores: np.ndarray,  # (L, T, N) per-class seq-NMS scores
    path_ids: np.ndarray,  # (L, T, N) int path ids (-1 = none)
    fids,
    video: str,
    first_class: int = 1,
) -> dict:
    """Extract seq-NMS paths as a track_proto (one track per (class, path)).

    ``out_scores``/``path_ids`` lanes map to class indices
    ``first_class + lane`` — shared by the staged stage (which passes lanes
    1..C-1) and the fused pipeline (which computes only foreground lanes).
    """
    boxes = np.asarray(boxes)
    out_scores = np.asarray(out_scores)
    path_ids = np.asarray(path_ids)
    tracks = []
    L, T = path_ids.shape[:2]
    for lane in range(L):
        c = first_class + lane
        pids = path_ids[lane]
        for pid in range(int(pids.max()) + 1 if pids.size else 0):
            entries = []
            for t in range(T):
                ns = np.nonzero(pids[t] == pid)[0]
                if ns.size == 0:
                    continue
                n = int(ns[0])
                entries.append(
                    {
                        "frame": int(fids[t]),
                        "bbox": [float(v) for v in boxes[t, n]],
                        "score": float(out_scores[lane, t, n]),
                        "class_index": c,
                    }
                )
            if entries:
                tracks.append(entries)
    return {"video": video, "method": "seq_nms", "tracks": tracks}


def seq_nms_video(
    vid_proto: dict,
    det_proto: dict,
    opts: LinkOptions = LinkOptions(),
) -> tuple[dict, dict]:
    """Run seq-NMS over one video → (det_proto, track_proto of tubelets)."""
    metrics = StageMetrics("seq_nms")
    fids = get_frame_ids(vid_proto)
    boxes, scores, mask = det_proto_to_arrays(
        det_proto, fids, opts.max_boxes, opts.num_classes
    )
    # per-class problems share boxes; participation = explicit positive score
    cls_scores = np.moveaxis(scores, 2, 0)  # (C, T, N)
    cls_mask = (cls_scores > 0) & mask[None]
    if opts.backend == "host":
        from vdetlib_tpu.kernels.seq_nms_host import seq_nms_batch_host

        out_scores, path_ids = seq_nms_batch_host(
            boxes, cls_scores, cls_mask, opts.link_thresh, opts.suppress_thresh,
            max_paths=opts.max_paths, rescore=opts.rescore,
        )
    else:
        out_scores, path_ids = seq_nms_batch(
            jnp.asarray(boxes),
            jnp.asarray(cls_scores),
            jnp.asarray(cls_mask),
            opts.link_thresh,
            opts.suppress_thresh,
            max_paths=opts.max_paths,
            rescore=opts.rescore,
        )
        out_scores = np.asarray(out_scores)  # (C, T, N); -1 = suppressed
        path_ids = np.asarray(path_ids)

    # det proto: surviving entries carry rescored scores
    new_scores = np.moveaxis(np.maximum(out_scores, 0.0), 0, 2)  # (T, N, C)
    det_out = arrays_to_det_proto(
        boxes,
        new_scores,
        mask,
        fids,
        vid_proto["video"],
        score_thresh=opts.min_score,
    )

    # tubelets: one track per (class, path id)
    track_proto = tubelets_from_path_ids(
        boxes, out_scores[1:], path_ids[1:], fids, vid_proto["video"],
        first_class=1,
    )
    metrics.set("frames", len(fids))
    metrics.set("dets_in", len(det_proto["detections"]))
    metrics.set("dets_out", len(det_out["detections"]))
    metrics.set("tubelets", len(track_proto["tracks"]))
    metrics.finish()
    return det_out, track_proto
