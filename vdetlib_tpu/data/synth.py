"""Synthetic video snippets + protos for tests, benchmarks, and demos.

The reference had no fixtures (SURVEY.md §4); golden tests here run on
deterministic synthetic videos: textured rectangles moving linearly over a
noise background, with ground-truth tracks emitted as annot_proto and
derived box/det protos (ground truth + jitter + distractors).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class SynthConfig:
    num_frames: int = 30
    height: int = 240
    width: int = 320
    num_objects: int = 3
    num_classes: int = 4  # including background index 0
    seed: int = 0
    min_size: int = 30
    max_size: int = 80
    max_speed: float = 4.0
    proposals_per_frame: int = 24
    jitter: float = 3.0
    scale_rate: float = 0.0  # per-frame relative size change (e.g. 0.02)
    # Tie object appearance (color/texture) to the class label so that
    # classification is learnable across videos. Off by default to keep the
    # original fixture pixels stable; training/eval tools turn it on.
    class_coded_appearance: bool = False


@dataclass
class SynthVideo:
    config: SynthConfig
    frames: np.ndarray  # (T, H, W, 3) uint8, BGR
    gt_boxes: np.ndarray  # (K, T, 4) float32
    gt_classes: np.ndarray  # (K,) int32 in [1, num_classes)
    video: str = "synth"
    frame_ids: list = field(default_factory=list)

    def __post_init__(self):
        if not self.frame_ids:
            self.frame_ids = list(range(1, self.frames.shape[0] + 1))


def make_video(cfg: SynthConfig, video: str = "synth") -> SynthVideo:
    rng = np.random.default_rng(cfg.seed)
    T, H, W, K = cfg.num_frames, cfg.height, cfg.width, cfg.num_objects
    # static textured background (a real camera's background doesn't change
    # pixel noise every frame — and optical flow / tracking rely on that)
    background = rng.integers(20, 60, size=(H, W, 3), dtype=np.uint8)
    frames = np.repeat(background[None], T, axis=0).copy()

    sizes = rng.uniform(cfg.min_size, cfg.max_size, size=(K, 2))
    pos0 = np.stack(
        [
            rng.uniform(0, W - sizes[:, 0]),
            rng.uniform(0, H - sizes[:, 1]),
        ],
        axis=1,
    )
    vel = rng.uniform(-cfg.max_speed, cfg.max_speed, size=(K, 2))
    classes = rng.integers(1, cfg.num_classes, size=K).astype(np.int32)
    if cfg.class_coded_appearance:
        # Class-seeded palette + texture with small per-object jitter: the
        # label is recoverable from appearance by a detector that
        # generalizes, and NOT by one that memorizes objects.
        colors = np.zeros((K, 3), np.uint8)
        textures = np.zeros((K, 16, 16, 3), np.int16)
        for k in range(K):
            c = int(classes[k])
            crng = np.random.default_rng(1000 + c)
            # dominant channel c % 3 keeps palettes far apart; the rest of
            # the base color and the texture are class-seeded randomness
            base = crng.integers(40, 90, size=3)
            base[c % 3] = 200 + crng.integers(0, 50)
            tex = crng.integers(-35, 35, size=(16, 16, 3))
            colors[k] = np.clip(base + rng.integers(-10, 11, size=3), 0, 255)
            textures[k] = tex + rng.integers(-6, 7, size=(16, 16, 3))
    else:
        colors = rng.integers(100, 255, size=(K, 3)).astype(np.uint8)
        # Per-object texture so the correlation tracker has structure to
        # latch on.
        textures = rng.integers(-40, 40, size=(K, 16, 16, 3)).astype(np.int16)

    gt = np.zeros((K, T, 4), dtype=np.float32)
    for t in range(T):
        for k in range(K):
            x = pos0[k, 0] + vel[k, 0] * t
            y = pos0[k, 1] + vel[k, 1] * t
            grow = (1.0 + cfg.scale_rate) ** t
            w = min(sizes[k, 0] * grow, W * 0.6)
            h = min(sizes[k, 1] * grow, H * 0.6)
            # bounce off edges
            x = _bounce(x, W - w)
            y = _bounce(y, H - h)
            x1, y1, x2, y2 = x, y, x + w - 1, y + h - 1
            gt[k, t] = (x1, y1, x2, y2)
            xi1, yi1 = int(round(x1)), int(round(y1))
            xi2, yi2 = int(round(x2)) + 1, int(round(y2)) + 1
            patch = frames[t, yi1:yi2, xi1:xi2].astype(np.int16)
            ph, pw = patch.shape[:2]
            if ph <= 0 or pw <= 0:
                continue
            tex = np.kron(
                textures[k], np.ones((max(1, ph // 16 + 1), max(1, pw // 16 + 1), 1), np.int16)
            )[:ph, :pw]
            filled = colors[k][None, None, :].astype(np.int16) + tex
            frames[t, yi1:yi2, xi1:xi2] = np.clip(filled, 0, 255).astype(np.uint8)
    return SynthVideo(config=cfg, frames=frames, gt_boxes=gt, gt_classes=classes, video=video)


def _bounce(x: float, limit: float) -> float:
    if limit <= 0:
        return 0.0
    period = 2 * limit
    x = x % period
    return period - x if x > limit else x


def write_frames(sv: SynthVideo, root: str) -> dict:
    """Write JPEG frames and return the vid_proto."""
    import cv2

    frame_dir = os.path.join(root, sv.video)
    os.makedirs(frame_dir, exist_ok=True)
    frames_entries = []
    for i, fid in enumerate(sv.frame_ids):
        rel = os.path.join(sv.video, f"{fid:06d}.jpg")
        cv2.imwrite(os.path.join(root, rel), sv.frames[i])
        frames_entries.append({"frame": int(fid), "path": rel})
    return {"video": sv.video, "root_path": root, "frames": frames_entries}


def vid_proto_in_memory(sv: SynthVideo) -> dict:
    """vid_proto with placeholder paths, for fully in-memory pipelines."""
    return {
        "video": sv.video,
        "root_path": "",
        "frames": [{"frame": int(f), "path": f"{f:06d}.jpg"} for f in sv.frame_ids],
    }


def annot_proto(sv: SynthVideo, class_names=None) -> dict:
    anns = []
    for k in range(sv.gt_boxes.shape[0]):
        track = []
        for t, fid in enumerate(sv.frame_ids):
            name = (
                class_names[sv.gt_classes[k]]
                if class_names is not None
                else str(int(sv.gt_classes[k]))
            )
            track.append(
                {
                    "frame": int(fid),
                    "bbox": [float(v) for v in sv.gt_boxes[k, t]],
                    "class": name,
                    "class_index": int(sv.gt_classes[k]),
                }
            )
        anns.append({"id": k, "track": track})
    return {"video": sv.video, "annotations": anns}


def box_proto(sv: SynthVideo) -> dict:
    """Proposals: jittered ground truth + uniform random distractors."""
    cfg = sv.config
    rng = np.random.default_rng(cfg.seed + 1)
    K, T = sv.gt_boxes.shape[:2]
    boxes = []
    for t, fid in enumerate(sv.frame_ids):
        for k in range(K):
            for _ in range(max(1, cfg.proposals_per_frame // (2 * K))):
                jit = rng.normal(0, cfg.jitter, size=4)
                b = sv.gt_boxes[k, t] + jit
                boxes.append({"frame": int(fid), "bbox": _clipped(b, cfg)})
        n_rand = cfg.proposals_per_frame - len(
            [b for b in boxes if b["frame"] == int(fid)]
        )
        for _ in range(max(0, n_rand)):
            x1 = rng.uniform(0, cfg.width - cfg.min_size)
            y1 = rng.uniform(0, cfg.height - cfg.min_size)
            w = rng.uniform(cfg.min_size, cfg.max_size)
            h = rng.uniform(cfg.min_size, cfg.max_size)
            boxes.append(
                {"frame": int(fid), "bbox": _clipped([x1, y1, x1 + w, y1 + h], cfg)}
            )
    return {"video": sv.video, "boxes": boxes}


def det_proto_from_gt(
    sv: SynthVideo,
    dets_per_object: int = 4,
    distractors_per_frame: int = 6,
    class_names=None,
    drop_rate: float = 0.0,
) -> dict:
    """A plausible detector output: jittered GT boxes with decaying scores
    plus low-scoring random distractors. Deterministic given the seed."""
    cfg = sv.config
    rng = np.random.default_rng(cfg.seed + 2)
    K, T = sv.gt_boxes.shape[:2]
    detections = []

    def name(ci):
        return class_names[ci] if class_names is not None else str(int(ci))

    for t, fid in enumerate(sv.frame_ids):
        for k in range(K):
            if drop_rate > 0 and rng.uniform() < drop_rate:
                continue
            for j in range(dets_per_object):
                jit = rng.normal(0, cfg.jitter * (1 + j), size=4)
                b = _clipped(sv.gt_boxes[k, t] + jit, cfg)
                ci = int(sv.gt_classes[k])
                score = float(np.clip(0.95 - 0.12 * j + rng.normal(0, 0.02), 0.05, 1.0))
                detections.append(
                    {
                        "frame": int(fid),
                        "bbox": b,
                        "scores": [
                            {"class": name(ci), "class_index": ci, "score": score}
                        ],
                    }
                )
        for _ in range(distractors_per_frame):
            x1 = rng.uniform(0, cfg.width - cfg.min_size)
            y1 = rng.uniform(0, cfg.height - cfg.min_size)
            w = rng.uniform(cfg.min_size, cfg.max_size)
            h = rng.uniform(cfg.min_size, cfg.max_size)
            ci = int(rng.integers(1, cfg.num_classes))
            detections.append(
                {
                    "frame": int(fid),
                    "bbox": _clipped([x1, y1, x1 + w, y1 + h], cfg),
                    "scores": [
                        {
                            "class": name(ci),
                            "class_index": ci,
                            "score": float(rng.uniform(0.02, 0.3)),
                        }
                    ],
                }
            )
    return {"video": sv.video, "detections": detections}


def _clipped(b, cfg: SynthConfig) -> list[float]:
    return [
        float(np.clip(b[0], 0, cfg.width - 1)),
        float(np.clip(b[1], 0, cfg.height - 1)),
        float(np.clip(b[2], 0, cfg.width - 1)),
        float(np.clip(b[3], 0, cfg.height - 1)),
    ]
