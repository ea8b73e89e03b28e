"""Train the detector on synthetic videos and save an Orbax checkpoint.

The reference consumed externally-trained Caffe weights; this tool makes the
framework self-contained: it can produce working detector weights end-to-end
(synthetic data now; plug a real VID loader via --data_root later).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass


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
    p.add_argument("--num_videos", type=int, default=8)
    p.add_argument("--frames_per_video", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=20)
    args = p.parse_args(argv)

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
    tx = make_optimizer(args.lr)
    state = init_train_state(model, params, tx)

    videos = [
        make_video(
            SynthConfig(
                num_frames=args.frames_per_video,
                height=h,
                width=w,
                num_classes=args.num_classes,
                seed=args.seed + i,
            )
        )
        for i in range(args.num_videos)
    ]

    @dataclass
    class Opts:
        batch_size: int
        max_rois: int

    opts = Opts(args.batch_size, args.max_rois)
    rng = np.random.default_rng(args.seed)
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
    save_params(args.output, state.params)
    print(f"saved weights to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
