"""Train the correlation tracker on synthetic motion; save Orbax weights."""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("output", help="orbax checkpoint dir")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--image_hw", type=int, nargs=2, default=[240, 320])
    p.add_argument("--num_videos", type=int, default=8)
    p.add_argument("--frames_per_video", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from vdetlib_tpu.data.synth import SynthConfig, make_video
    from vdetlib_tpu.nn.tracker_net import TrackerConfig
    from vdetlib_tpu.nn.tracker_train import train_tracker
    from vdetlib_tpu.pipeline.checkpoint import save_params
    from vdetlib_tpu.video.track import init_tracker

    h, w = args.image_hw
    cfg = TrackerConfig()
    model, params = init_tracker(cfg, image_hw=(h, w), seed=args.seed)
    videos = [
        make_video(
            SynthConfig(
                num_frames=args.frames_per_video, height=h, width=w,
                seed=args.seed + i,
            )
        )
        for i in range(args.num_videos)
    ]
    params = train_tracker(
        model, cfg, params, videos,
        steps=args.steps, batch_size=args.batch_size, lr=args.lr, seed=args.seed,
    )
    save_params(args.output, params)
    print(f"saved tracker weights to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
