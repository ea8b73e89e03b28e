"""Train the detector on synthetic videos and save an Orbax checkpoint.

The reference consumed externally-trained Caffe weights; this tool makes the
framework self-contained: it can produce working detector weights end-to-end
(synthetic data now; plug a real VID loader via --data_root later).

Training recipe (round 2): class-coded appearance so the label is learnable
across videos, photometric + flip augmentation, and held-out mAP evaluation
every ``--eval_every`` steps with best-checkpoint selection — long runs can
no longer end worse than short ones (the round-1 overfit failure mode).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass


def evaluate_heldout_map(model, params, videos, num_classes, max_rois, nms_thresh=0.3):
    """Detection mAP@0.5 on held-out SynthVideos (in-memory, no disk).

    Proposals are each video's box_proto (jittered GT + distractors); the
    detector scores them; per-class NMS; greedy-matched VOC AP.
    """
    import jax.numpy as jnp
    import numpy as np

    from vdetlib_tpu.data.synth import annot_proto, box_proto
    from vdetlib_tpu.evaluation.vid_map import vid_map
    from vdetlib_tpu.kernels.nms import batched_nms
    from vdetlib_tpu.protos.arrays import arrays_to_det_proto, box_proto_to_arrays
    from vdetlib_tpu.video.detect import DetectOptions, detect_arrays

    opts = DetectOptions(max_rois=max_rois)
    pairs = []
    for sv in videos:
        bp = box_proto(sv)
        rois, roi_mask = box_proto_to_arrays(bp, sv.frame_ids, max_rois)
        probs, boxes = detect_arrays(model, params, sv.frames, rois, roi_mask, opts)
        T, R, K = probs.shape
        # per-class NMS over the regressed boxes (scores zeroed when culled)
        cls_scores = np.transpose(probs, (0, 2, 1))  # (T, K, R)
        cls_boxes = np.transpose(boxes, (0, 2, 1, 3))  # (T, K, R, 4)
        valid = (cls_scores > 0.01) & roi_mask[:, None, :]
        keep = np.asarray(
            batched_nms(
                jnp.asarray(cls_boxes), jnp.asarray(cls_scores),
                jnp.asarray(valid), nms_thresh,
            )
        )
        kept_scores = np.where(keep & valid, cls_scores, 0.0)
        det = {"video": sv.video, "detections": []}
        for c in range(1, K):
            sub = arrays_to_det_proto(
                cls_boxes[:, c],
                np.eye(K, dtype=np.float32)[None, None, c] * kept_scores[:, c, :, None],
                kept_scores[:, c] > 0,
                sv.frame_ids, sv.video, score_thresh=0.01,
            )
            det["detections"].extend(sub["detections"])
        pairs.append((det, annot_proto(sv)))
    m, per_class = vid_map(pairs)
    return m, per_class


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("output", help="orbax checkpoint dir")
    p.add_argument("--model", default="tiny", choices=["base", "small", "tiny"])
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_rois", type=int, default=64)
    p.add_argument("--image_hw", type=int, nargs=2, default=[240, 320])
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr_schedule", default="const", choices=["const", "cosine"],
                   help="cosine: 5%% warmup then cosine decay to lr/100 over "
                   "--steps (for longer-schedule recipes)")
    p.add_argument("--num_videos", type=int, default=8)
    p.add_argument("--frames_per_video", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--eval_every", type=int, default=100,
                   help="held-out mAP eval period; 0 disables")
    p.add_argument("--eval_videos", type=int, default=4)
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--no_class_coded", action="store_true",
                   help="legacy round-1 data: appearance independent of class")
    p.add_argument("--tier", default="easy", choices=["easy", "hard"],
                   help="hard: train on the hard-tier distribution "
                   "(occlusion/distractors/camera motion — gen_synth --tier)")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from vdetlib_tpu.data.synth import SynthConfig, make_video
    from vdetlib_tpu.nn.detector import init_detector
    from vdetlib_tpu.nn.presets import detector_preset
    from vdetlib_tpu.nn.train import (
        init_train_state,
        make_optimizer,
        make_training_batch,
        train_step,
    )
    from vdetlib_tpu.pipeline.checkpoint import save_params
    from vdetlib_tpu.utils.log import get_logger

    log = get_logger("train_detector")
    h, w = args.image_hw
    cfg = detector_preset(args.model, num_classes=args.num_classes)
    model, params = init_detector(cfg, (h, w), max_rois=args.max_rois, seed=args.seed)
    tx = make_optimizer(args.lr, schedule=args.lr_schedule,
                        total_steps=args.steps)
    state = init_train_state(model, params, tx)

    class_coded = not args.no_class_coded

    def synth_cfg(seed):
        common = dict(
            num_frames=args.frames_per_video,
            height=h,
            width=w,
            num_classes=args.num_classes,
            seed=seed,
        )
        if args.tier == "hard":
            from vdetlib_tpu.data.synth import hard_config

            return hard_config(**common)
        return SynthConfig(class_coded_appearance=class_coded, **common)

    videos = [make_video(synth_cfg(args.seed + i)) for i in range(args.num_videos)]
    # held-out videos live in a disjoint seed space
    heldout = [
        make_video(synth_cfg(args.seed + 10_000 + i))
        for i in range(args.eval_videos)
    ]

    @dataclass
    class Opts:
        batch_size: int
        max_rois: int
        augment: bool

    opts = Opts(args.batch_size, args.max_rois, not args.no_augment)
    rng = np.random.default_rng(args.seed)
    best_map, best_step, best_params = -1.0, -1, None
    for step in range(args.steps):
        sv = videos[int(rng.integers(0, len(videos)))]
        batch = make_training_batch(sv, rng, opts, args.num_classes)
        state, aux = train_step(model, state, tx, batch)
        if step % args.log_every == 0 or step == args.steps - 1:
            log.info(
                "step %d loss=%.4f cls=%.4f reg=%.4f",
                step,
                float(aux["loss"]),
                float(aux["cls_loss"]),
                float(aux["reg_loss"]),
            )
        last = step == args.steps - 1
        if args.eval_every and (
            (step + 1) % args.eval_every == 0 or last
        ):
            m, per_class = evaluate_heldout_map(
                model, state.params, heldout, args.num_classes, args.max_rois
            )
            log.info(
                "step %d held-out mAP@0.5 = %.4f (per-class %s)",
                step, m,
                {k: round(v, 3) for k, v in sorted(per_class.items())},
            )
            if m > best_map:
                best_map, best_step = m, step
                best_params = jax.tree.map(np.asarray, state.params)

    if best_params is not None:
        log.info("saving best checkpoint: step %d mAP %.4f", best_step, best_map)
        save_params(args.output, best_params)
    else:
        save_params(args.output, state.params)
    print(f"saved weights to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
