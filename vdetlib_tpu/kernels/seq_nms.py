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
broadcast-max per step), backtracking is a reverse scan over the stored
backpointers, and suppression is a masked IoU row update. Classes batch via
``vmap``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vdetlib_tpu.geometry.boxes import LEGACY_OFFSET, pairwise_iou

NEG = jnp.float32(-1e30)


@functools.partial(
    jax.jit,
    static_argnames=("max_paths", "rescore", "offset"),
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

    def viterbi(alive):
        """Forward DP. Returns dp (T, N) and backpointers (T, N) int32."""
        s = jnp.where(alive, scores, NEG)

        def step(dp_prev, inp):
            a_t, s_t, alive_t = inp  # (N, N), (N,), (N,)
            # max-plus product over linked, alive predecessors
            cand = jnp.where(a_t, dp_prev[:, None], NEG)  # (N_prev, N)
            prev_best = jnp.max(cand, axis=0)  # (N,)
            prev_arg = jnp.argmax(cand, axis=0)
            use_prev = prev_best > 0
            dp_t = jnp.where(alive_t, s_t + jnp.maximum(prev_best, 0.0), NEG)
            bp_t = jnp.where(use_prev & alive_t, prev_arg, -1)
            return dp_t, (dp_t, bp_t.astype(jnp.int32))

        dp0 = jnp.where(alive[0], scores[0], NEG)
        _, (dp_rest, bp_rest) = jax.lax.scan(
            step, dp0, (adj, s[1:], alive[1:])
        )
        dp = jnp.concatenate([dp0[None], dp_rest], axis=0)
        bp = jnp.concatenate(
            [jnp.full((1, N), -1, jnp.int32), bp_rest], axis=0
        )
        return dp, bp

    def extract_path(dp, bp):
        """Backtrack the global best path → (T,) idx, (T,) on_path bool."""
        flat = jnp.argmax(dp)
        t_star = flat // N
        i_star = flat % N
        best = dp[t_star, i_star]

        # walk backwards from T-1; inactive until t == t_star
        def step(carry, t):
            cur, active = carry
            start = t == t_star
            active = jnp.logical_or(active, start)
            cur = jnp.where(start, i_star, cur)
            emit_idx = jnp.where(active, cur, -1)
            nxt = jnp.where(active, bp[t, cur], -1)
            # path continues while backpointer valid
            active_next = active & (nxt >= 0)
            return (jnp.where(active_next, nxt, cur), active_next), emit_idx

        ts = jnp.arange(T - 1, -1, -1)
        _, idx_rev = jax.lax.scan(step, (jnp.int32(0), False), ts)
        idx = idx_rev[::-1]  # (T,) det index on path at frame t, -1 if none
        on_path = idx >= 0
        return idx, on_path, best

    def body(state):
        alive, out_scores, path_id, n_paths, _ = state
        # VMAP SEMANTICS: under vmap the while_loop runs a lane's body past
        # its own convergence (until every lane's cond is false), so every
        # state update below must be a no-op for finished lanes — gate on
        # ``active`` and on the onehot-derived per-frame path presence, never
        # on the raw backtrack output (garbage when dp is all -inf).
        dp, bp = viterbi(alive)
        idx, on_path, best = extract_path(dp, bp)
        active = (best > 0) & (n_paths < max_paths)
        # one-hot per frame (N,) — avoids scatters
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (T, N), 1) == idx[:, None]
        ) & on_path[:, None]
        onehot = onehot & alive & active
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
    jax.jit, static_argnames=("max_paths", "rescore", "offset")
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
    )
    return jax.vmap(fn)(scores, mask)
