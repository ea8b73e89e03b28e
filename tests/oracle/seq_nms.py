"""Oracle seq-NMS — Han et al. 2016 (PAPERS.md: arXiv 1602.08465) semantics.

Plain-python dynamic programming, the ground truth for the device kernel:

repeat until no boxes remain (or max_paths):
  1. Build the frame-adjacency graph: detection j at frame t+1 is linked to
     detection i at frame t when IoU(i, j) > link_thresh.
  2. Find the max-total-score path over consecutive frames (Viterbi DP).
  3. Re-assign every path box's score to the path statistic (avg or max).
  4. Remove the path's boxes and greedily NMS-suppress, per frame, the
     remaining boxes overlapping the path box by > suppress_thresh.

Scores are per-class; the procedure runs independently per class.
"""

from __future__ import annotations

import numpy as np

from tests.oracle.nms import iou_single


def best_path(frames_boxes, frames_scores, link_thresh=0.5, offset=1.0):
    """Viterbi over T frames of ragged box lists.

    Args:
      frames_boxes: list of T arrays (N_t, 4).
      frames_scores: list of T arrays (N_t,).
    Returns:
      (total_score, [(t, index) for each path element]) — the path is over a
      contiguous frame range; empty frames break paths. Returns (0, []) when
      every frame is empty.
    """
    T = len(frames_boxes)
    # dp[t][i] = best cumulative score of a path ending at det i of frame t
    dp = [np.array(s, dtype=np.float64).copy() for s in frames_scores]
    back = [np.full(len(s), -1, dtype=np.int64) for s in frames_scores]
    for t in range(1, T):
        for j in range(len(frames_boxes[t])):
            best, arg = 0.0, -1
            for i in range(len(frames_boxes[t - 1])):
                if (
                    iou_single(frames_boxes[t - 1][i], frames_boxes[t][j], offset)
                    > link_thresh
                ):
                    if dp[t - 1][i] > best:
                        best, arg = dp[t - 1][i], i
            if arg >= 0:
                dp[t][j] = best + frames_scores[t][j]
                back[t][j] = arg
    # find global best ending point
    best_score, bt, bi = 0.0, -1, -1
    for t in range(T):
        for i in range(len(dp[t])):
            if dp[t][i] > best_score:
                best_score, bt, bi = dp[t][i], t, i
    if bt < 0:
        return 0.0, []
    path = []
    t, i = bt, bi
    while i >= 0:
        path.append((t, i))
        i = back[t][i]
        t -= 1
    path.reverse()
    return float(best_score), path


def seq_nms(
    frames_boxes,
    frames_scores,
    link_thresh: float = 0.5,
    suppress_thresh: float = 0.3,
    max_paths: int = 100,
    rescore: str = "avg",
    offset: float = 1.0,
):
    """Full seq-NMS over one class. Mutates copies; returns (new_scores, paths).

    new_scores: list of T arrays — rescored surviving boxes keep their new
    score, suppressed boxes get score -1 (sentinel for "removed").
    paths: list of (score_stat, [(t, i), ...]).
    """
    boxes = [np.asarray(b, dtype=np.float64).reshape(-1, 4) for b in frames_boxes]
    scores = [np.asarray(s, dtype=np.float64).copy() for s in frames_scores]
    alive = [np.ones(len(s), dtype=bool) for s in scores]
    out_scores = [s.copy() for s in scores]
    paths = []
    for _ in range(max_paths):
        fb = [b[a] for b, a in zip(boxes, alive)]
        fs = [s[a] for s, a in zip(scores, alive)]
        total, path = best_path(fb, fs, link_thresh, offset)
        if not path:
            break
        # map alive-local indices back to original indices
        orig_path = []
        for t, li in path:
            orig = np.nonzero(alive[t])[0][li]
            orig_path.append((t, int(orig)))
        path_scores = [scores[t][i] for t, i in orig_path]
        stat = float(np.mean(path_scores)) if rescore == "avg" else float(np.max(path_scores))
        for t, i in orig_path:
            out_scores[t][i] = stat
            alive[t][i] = False
        # suppress overlapping boxes per frame
        for t, i in orig_path:
            pb = boxes[t][i]
            for j in np.nonzero(alive[t])[0]:
                if iou_single(pb, boxes[t][j], offset) > suppress_thresh:
                    alive[t][j] = False
                    out_scores[t][j] = -1.0
        paths.append((stat, orig_path))
    return out_scores, paths
