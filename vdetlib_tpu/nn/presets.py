"""Named detector configurations."""

from __future__ import annotations

from vdetlib_tpu.nn.backbone import BackboneConfig
from vdetlib_tpu.nn.detector import DetectorConfig


def detector_preset(name: str, num_classes: int = 31) -> DetectorConfig:
    if name == "base":
        # ~38M params, resnet18-class capacity — the flagship VID detector.
        return DetectorConfig(num_classes=num_classes)
    if name == "small":
        return DetectorConfig(
            num_classes=num_classes,
            backbone=BackboneConfig(
                stem_features=32, stage_sizes=(1, 1, 1), stage_features=(64, 128, 256)
            ),
            head_hidden=512,
        )
    if name == "tiny":
        # test-size net: fast CPU compiles, same code paths.
        return DetectorConfig(
            num_classes=num_classes,
            backbone=BackboneConfig(
                stem_features=16, stage_sizes=(1, 1, 1), stage_features=(32, 64, 128)
            ),
            head_hidden=128,
        )
    raise ValueError(f"unknown detector preset: {name}")
