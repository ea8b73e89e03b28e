"""Evaluation — ImageNet VID detection mAP + submission writer."""

from vdetlib_tpu.evaluation.vid_map import vid_map, per_class_ap  # noqa: F401
from vdetlib_tpu.evaluation.submission import (  # noqa: F401
    submission_lines,
    write_submission,
)
