"""Seq-NMS tubelet linking — device-resident dynamic programming.

Reference parity: the seq-NMS suppression stage (SURVEY.md §2.2, §3.4;
Han et al. 2016, PAPERS.md): repeat {Viterbi max-score path over the
frame-adjacency graph (IoU > link_thresh between consecutive frames) →
re-assign path scores to the path statistic (avg/max) → remove the path and
NMS-suppress per-frame overlaps} until no boxes remain. Shared semantics with
the numpy oracle in tests/oracle/seq_nms.py.

TPU design (SURVEY.md §7 hard parts): the whole repeat-extract-suppress loop
runs ON DEVICE as a ``lax.while_loop`` with a static ``max_paths`` bound and
an early-exit condition, so one dispatch handles a full (video, class)
problem. Inside: the Viterbi forward pass is a ``lax.scan`` over T carrying
the dp row (the max-plus "matmul" against the (N, N) adjacency is one
broadcast-max per step); backtracking is a reverse scan over the stored
backpointers with the backpointer rows STREAMED as scan inputs (v1 gathered
``bp[t, cur]`` from the full closed-over array each step, which lowered to a
whole-array gather and dominated the kernel at ~2.3× the Viterbi step cost);
suppression is a masked IoU row update. Classes batch via ``vmap``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vdetlib_tpu.geometry.boxes import LEGACY_OFFSET, pairwise_iou

import numpy as np

# numpy scalar, NOT jnp: a module-level device array would initialize the
# XLA backend at import time (breaking jax.distributed.initialize ordering)
NEG = np.float32(-1e30)


@functools.partial(
    jax.jit,
    static_argnames=("max_paths", "rescore", "offset", "unroll"),
)
def seq_nms_single(
    boxes,  # (T, N, 4)
    scores,  # (T, N)
    mask,  # (T, N) bool
    link_thresh,
    suppress_thresh,
    max_paths: int = 100,
    rescore: str = "avg",
    offset: float = LEGACY_OFFSET,
    unroll: int = 8,
):
    """Seq-NMS over one class of one video.

    Returns:
      out_scores: (T, N) — path boxes carry the path statistic, suppressed
        boxes carry -1, untouched boxes (max_paths exhausted) keep their
        original score.
      path_id: (T, N) int32 — 0-based path index per box, -1 when none.
    """
    T, N = scores.shape
    # adjacency once: A[t, i, j] = link between det i@t and det j@t+1
    adj = pairwise_iou(boxes[:-1], boxes[1:], offset=offset) > link_thresh
    # (T-1, N, N)
    iota_n = jnp.arange(N)

    def viterbi(alive):
        """Forward DP → dp (T, N). The hot scan carries ONLY the dp row and
        runs max+add+select per step; backpointers are NOT materialized here
        (the in-scan (N, N) argmax cost ~55% of the pass) — the backtrack
        recomputes the one backpointer it needs per step from the adjacency
        column, bit-identically."""
        s = jnp.where(alive, scores, NEG)

        def step(dp_prev, inp):
            a_t, s_t, alive_t = inp  # (N, N), (N,), (N,)
            # max-plus product over linked, alive predecessors
            cand = jnp.where(a_t, dp_prev[:, None], NEG)  # (N_prev, N)
            prev_best = jnp.max(cand, axis=0)  # (N,)
            dp_t = jnp.where(alive_t, s_t + jnp.maximum(prev_best, 0.0), NEG)
            return dp_t, dp_t

        dp0 = jnp.where(alive[0], scores[0], NEG)
        _, dp_rest = jax.lax.scan(
            step, dp0, (adj, s[1:], alive[1:]), unroll=unroll
        )
        return jnp.concatenate([dp0[None], dp_rest], axis=0)

    def extract_path(dp, alive):
        """Backtrack the global best path → onehot (T, N) membership.

        Early-exit walk: starts at the dp argmax and follows backpointers
        only while the path continues, so the trip count is the PATH LENGTH
        (mean ~3 frames on VID-like data), not T. Each step recomputes the
        needed backpointer as ``argmax_j(adj[t-1][j, cur] ? dp[t-1][j] :
        NEG)`` — exactly the argmax the Viterbi recursion would have stored
        (same values, same first-max tie-break). Under vmap the trip count
        is the max live path length across class lanes; all updates are
        monotone (.max) so finished lanes are no-ops."""
        flat = jnp.argmax(dp)
        t_star = flat // N
        i_star = flat % N
        best = dp[t_star, i_star]

        def wcond(state):
            return state[1][2]

        def wbody(state):
            onehot, (t, cur, walking) = state
            onehot = onehot.at[t, cur].max(walking)
            tp = jnp.maximum(t - 1, 0)
            col = adj[tp, :, cur]  # (N,) edges (t-1 → t) into cur
            cand = jnp.where(col, dp[tp], NEG)
            nxt = jnp.argmax(cand)
            ok = walking & (t > 0) & (cand[nxt] > 0)
            return onehot, (tp, jnp.where(ok, nxt, cur), ok)

        state = (
            jnp.zeros((T, N), bool),
            (t_star.astype(jnp.int32), i_star.astype(jnp.int32), best > 0),
        )
        onehot, _ = jax.lax.while_loop(wcond, wbody, state)
        return onehot, best

    def body(state):
        alive, out_scores, path_id, n_paths, _ = state
        # VMAP SEMANTICS: under vmap the while_loop runs a lane's body past
        # its own convergence (until every lane's cond is false), so every
        # state update below must be a no-op for finished lanes — gate on
        # ``active`` and on the masked onehot, never on the raw backtrack
        # output (garbage when dp is all -inf).
        dp = viterbi(alive)
        onehot_raw, best = extract_path(dp, alive)
        active = (best > 0) & (n_paths < max_paths)
        onehot = onehot_raw & alive & active
        frame_on_path = jnp.any(onehot, axis=1)  # (T,)
        path_scores = jnp.sum(jnp.where(onehot, scores, 0.0), axis=1)
        n_on = jnp.maximum(jnp.sum(frame_on_path), 1)
        if rescore == "avg":
            stat = jnp.sum(jnp.where(frame_on_path, path_scores, 0.0)) / n_on
        else:
            stat = jnp.max(jnp.where(frame_on_path, path_scores, NEG))
        out_scores = jnp.where(onehot, stat, out_scores)
        path_id = jnp.where(onehot, n_paths, path_id)
        alive = alive & ~onehot
        # per-frame suppression against the path box
        path_box = jnp.einsum(
            "tn,tnk->tk", onehot.astype(jnp.float32), boxes
        )  # (T, 4)
        iou_row = jax.vmap(lambda pb, bx: pairwise_iou(pb[None], bx, offset=offset)[0])(
            path_box, boxes
        )  # (T, N)
        kill = (iou_row > suppress_thresh) & frame_on_path[:, None] & alive
        out_scores = jnp.where(kill, -1.0, out_scores)
        alive = alive & ~kill
        return alive, out_scores, path_id, n_paths + active.astype(jnp.int32), best

    def cond(state):
        alive, _, _, n_paths, last_best = state
        return (n_paths < max_paths) & jnp.any(alive) & (last_best > 0)

    state0 = (
        mask,
        scores * mask,
        jnp.full((T, N), -1, jnp.int32),
        jnp.int32(0),
        jnp.float32(1.0),
    )
    alive, out_scores, path_id, n_paths, _ = jax.lax.while_loop(cond, body, state0)
    return out_scores, path_id


@functools.partial(
    jax.jit, static_argnames=("max_paths", "rescore", "offset", "unroll")
)
def seq_nms_batch(
    boxes,  # (T, N, 4) — shared across classes
    scores,  # (C, T, N) per-class scores
    mask,  # (C, T, N) per-class participation
    link_thresh,
    suppress_thresh,
    max_paths: int = 100,
    rescore: str = "avg",
    offset: float = LEGACY_OFFSET,
    unroll: int = 8,
):
    """Per-class seq-NMS, classes vmapped. Returns (C, T, N) scores + ids."""
    fn = lambda s, m: seq_nms_single(
        boxes,
        s,
        m,
        link_thresh,
        suppress_thresh,
        max_paths=max_paths,
        rescore=rescore,
        offset=offset,
        unroll=unroll,
    )
    return jax.vmap(fn)(scores, mask)
