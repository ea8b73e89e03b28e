"""CLI tools — one entry point per pipeline stage.

Reference parity: the reference's ``tools/`` argparse scripts (SURVEY.md §2.2
"CLI tools"): gen vid_proto, detect, MGP, track, rescore, suppress/seq-NMS,
visualize, eval writer. Same JSON protos in/out on disk; invoked as
``python -m vdetlib_tpu <tool> ...`` or ``python -m vdetlib_tpu.cli.<tool>``.
"""

from __future__ import annotations

import importlib

TOOLS = {
    "gen_vid_proto": "vdetlib_tpu.cli.gen_vid_proto",
    "frame_nms": "vdetlib_tpu.cli.frame_nms",
    "detect": "vdetlib_tpu.cli.detect",
    "train_detector": "vdetlib_tpu.cli.train_detector",
    "train_tracker": "vdetlib_tpu.cli.train_tracker",
    "mgp": "vdetlib_tpu.cli.mgp",
    "track": "vdetlib_tpu.cli.track",
    "rescore": "vdetlib_tpu.cli.rescore",
    "seq_nms": "vdetlib_tpu.cli.seq_nms",
    "show_det": "vdetlib_tpu.cli.show",
    "show_track": "vdetlib_tpu.cli.show",
    "write_submission": "vdetlib_tpu.cli.write_submission",
    "eval_vid": "vdetlib_tpu.cli.eval_vid",
    "pipeline": "vdetlib_tpu.cli.pipeline_tool",
    "gen_synth": "vdetlib_tpu.cli.gen_synth",
    "gen_box_proto": "vdetlib_tpu.cli.gen_box_proto",
    "serve": "vdetlib_tpu.cli.serve",
    "stream": "vdetlib_tpu.cli.stream",
    "import_vid": "vdetlib_tpu.cli.import_vid",
    "calibrate": "vdetlib_tpu.cli.calibrate",
}


def dispatch(tool: str, argv: list[str]) -> int:
    if tool not in TOOLS:
        raise SystemExit(
            f"unknown tool '{tool}'; available: {', '.join(sorted(TOOLS))}"
        )
    mod = importlib.import_module(TOOLS[tool])
    return mod.main(argv, tool=tool) if "show" in tool else mod.main(argv)
