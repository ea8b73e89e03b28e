"""Oracle tubelet rescoring — plain-python reference for rescore_arrays."""

from __future__ import annotations

import math

import numpy as np

from tests.oracle.nms import iou_single


def rescore(
    det_boxes,  # (T, N, 4)
    det_scores,  # (T, N, C)
    det_mask,  # (T, N)
    trk_boxes,  # (K, T, 4)
    trk_mask,  # (K, T)
    match_thresh=0.5,
    bg_decay=1.0,
    top_ratio=0.5,
    boost="max",
    min_matched_frac=0.0,
    stat_floor=0,
):
    T, N, C = det_scores.shape
    K = trk_boxes.shape[0]
    match = np.zeros((T, K, N), bool)
    for t in range(T):
        for k in range(K):
            if not trk_mask[k, t]:
                continue
            for n in range(N):
                if not det_mask[t, n]:
                    continue
                if iou_single(trk_boxes[k, t], det_boxes[t, n]) > match_thresh:
                    match[t, k, n] = True

    stats = np.zeros((K, C))
    for k in range(K):
        live = int(trk_mask[k].sum())
        kk = max(int(math.ceil(live * top_ratio)), 1)
        for c in range(C):
            per_frame = np.zeros(T)
            for t in range(T):
                vals = [det_scores[t, n, c] for n in range(N) if match[t, k, n]]
                per_frame[t] = max(vals) if vals else 0.0
            top = np.sort(per_frame)[::-1][:kk]
            # length prior: denominator floored at stat_floor frames
            stats[k, c] = top.sum() / max(len(top), stat_floor, 1)

    # track-quality gate: tracks matched on too few of their live frames
    # contribute no statistic (neither boost nor downstream injection)
    for k in range(K):
        live = int(trk_mask[k].sum())
        matched = int(match[:, k, :].any(axis=1).sum())
        if matched / max(live, 1) < min_matched_frac:
            stats[k, :] = 0.0

    new_scores = det_scores.copy()
    for t in range(T):
        for n in range(N):
            if not det_mask[t, n]:
                new_scores[t, n] = 0.0
                continue
            ks = [k for k in range(K) if match[t, k, n]]
            if not ks:
                new_scores[t, n] *= bg_decay
                continue
            for c in range(C):
                stat = max(stats[k, c] for k in ks)
                if boost == "max":
                    new_scores[t, n, c] = max(det_scores[t, n, c], stat)
                else:
                    new_scores[t, n, c] = 0.5 * (
                        det_scores[t, n, c] + max(det_scores[t, n, c], stat)
                    )
    return new_scores, stats
