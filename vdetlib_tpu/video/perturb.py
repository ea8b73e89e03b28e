"""Tubelet box perturbation + max-pooling rescoring.

Reference parity: the T-CNN variant noted in SURVEY.md §2.2 (temporal
rescoring row): around each tubelet box, sample perturbed boxes (scale and
translation jitter), re-score them all with the detector, and max-pool — the
tubelet box adopts the best perturbation's score (and optionally its box).
Recovers detections the tracker localized imperfectly.

TPU design: perturbations are generated on device from a counter-based PRNG,
stacked into the ROI axis, and scored by the SAME jitted detector program the
detection stage uses — one program over (frames × tracks × perturbations).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vdetlib_tpu.geometry.boxes import box_center, box_wh, clip_boxes
from vdetlib_tpu.nn.detector import preprocess_images


@dataclass(frozen=True)
class PerturbOptions:
    num_perturb: int = 8  # perturbations per tubelet box (incl. identity)
    shift_sigma: float = 0.05  # stddev of center shift, in box-size units
    scale_sigma: float = 0.10  # stddev of log-scale jitter
    take_best_box: bool = True  # move the tubelet box to the best perturbation
    seed: int = 0


def perturb_boxes(boxes, key, opts: PerturbOptions, height, width):
    """(..., 4) boxes → (..., P, 4) perturbed (first one is the identity)."""
    P = opts.num_perturb
    shape = boxes.shape[:-1] + (P,)
    kx, ky, ks = jax.random.split(key, 3)
    dx = jax.random.normal(kx, shape) * opts.shift_sigma
    dy = jax.random.normal(ky, shape) * opts.shift_sigma
    ds = jnp.exp(jax.random.normal(ks, shape) * opts.scale_sigma)
    identity = jnp.zeros(shape).at[..., 0].set(1.0)
    dx = dx * (1 - identity)
    dy = dy * (1 - identity)
    ds = ds * (1 - identity) + identity
    w, h = box_wh(boxes)
    cx, cy = box_center(boxes)
    ncx = cx[..., None] + dx * w[..., None]
    ncy = cy[..., None] + dy * h[..., None]
    nw = w[..., None] * ds
    nh = h[..., None] * ds
    out = jnp.stack(
        [ncx - 0.5 * (nw - 1), ncy - 0.5 * (nh - 1),
         ncx + 0.5 * (nw - 1), ncy + 0.5 * (nh - 1)],
        axis=-1,
    )
    return clip_boxes(out, height, width)


@functools.partial(jax.jit, static_argnames=("model", "opts"))
def perturb_rescore_arrays(
    model,
    params,
    frames_u8,  # (T, H, W, 3)
    trk_boxes,  # (K, T, 4)
    trk_mask,  # (K, T)
    opts: PerturbOptions = PerturbOptions(),
):
    """Max-pooled detector scores over perturbed tubelet boxes.

    Returns:
      best_scores: (K, T, C) per-class max over perturbations.
      best_boxes: (K, T, 4) box of the best perturbation (by best class
        score) when ``take_best_box`` else the original.
    """
    T, H, W = frames_u8.shape[:3]
    K = trk_boxes.shape[0]
    P = opts.num_perturb
    key = jax.random.PRNGKey(opts.seed)
    pboxes = perturb_boxes(trk_boxes, key, opts, H, W)  # (K, T, P, 4)
    rois = jnp.transpose(pboxes, (1, 0, 2, 3)).reshape(T, K * P, 4)

    images = preprocess_images(frames_u8, model.config)
    scores, _ = model.apply(params, images, rois, train=False)
    probs = jax.nn.softmax(scores, axis=-1)  # (T, K*P, C)
    C = probs.shape[-1]
    probs = jnp.transpose(probs.reshape(T, K, P, C), (1, 0, 2, 3))  # (K,T,P,C)

    best_scores = jnp.max(probs, axis=2)  # (K, T, C)
    best_scores = best_scores * trk_mask[..., None]
    if opts.take_best_box:
        quality = jnp.max(probs[..., 1:], axis=-1)  # (K, T, P)
        best_p = jnp.argmax(quality, axis=-1)  # (K, T)
        best_boxes = jnp.take_along_axis(
            pboxes, best_p[..., None, None].repeat(4, -1), axis=2
        )[..., 0, :]
    else:
        best_boxes = trk_boxes
    return best_scores, best_boxes


def perturb_rescore_track_proto(
    model,
    params,
    frames_u8: np.ndarray,
    track_proto: dict,
    frame_ids,
    opts: PerturbOptions = PerturbOptions(),
    batch_frames: int = 32,
) -> dict:
    """Apply perturbation max-pooling to a track_proto → updated track_proto.

    Each track box gains ``perturb_scores`` (per-class max-pooled) and is
    optionally moved to the best perturbation.
    """
    from vdetlib_tpu.protos.arrays import track_proto_to_arrays

    trk_boxes, _, trk_mask = track_proto_to_arrays(track_proto, frame_ids)
    if trk_boxes.shape[0] == 0:
        return track_proto
    all_scores = []
    all_boxes = []
    T = len(frame_ids)
    for s in range(0, T, batch_frames):
        e = min(s + batch_frames, T)
        sc, bx = perturb_rescore_arrays(
            model,
            params,
            jnp.asarray(frames_u8[s:e]),
            jnp.asarray(trk_boxes[:, s:e]),
            jnp.asarray(trk_mask[:, s:e]),
            opts,
        )
        all_scores.append(np.asarray(sc))
        all_boxes.append(np.asarray(bx))
    scores = np.concatenate(all_scores, axis=1)
    boxes = np.concatenate(all_boxes, axis=1)

    fmap = {int(f): i for i, f in enumerate(frame_ids)}
    out_tracks = []
    for k, track in enumerate(track_proto["tracks"]):
        track_boxes = track["boxes"] if isinstance(track, dict) else track
        new_track = []
        for box in track_boxes:
            t = fmap.get(int(box["frame"]))
            e = dict(box)
            if t is not None and trk_mask[k, t]:
                if opts.take_best_box:
                    e["bbox"] = [float(v) for v in boxes[k, t]]
                cls_scores = scores[k, t]
                best_c = int(np.argmax(cls_scores[1:])) + 1
                e["perturb_scores"] = [
                    {"class_index": best_c, "score": float(cls_scores[best_c])}
                ]
            new_track.append(e)
        out_tracks.append(new_track)
    return {**{k: v for k, v in track_proto.items() if k != "tracks"},
            "tracks": out_tracks}
