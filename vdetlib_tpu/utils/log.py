"""Structured logging (reference parity: vdetlib/utils/log.py, extended).

The reference configured a module logger with level+format; the rebuild adds
per-stage structured counters (frames/sec, boxes in/out, tracks emitted) and an
optional JSONL metrics sink (SURVEY.md §5.5).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Optional

_FORMAT = "[%(asctime)s %(levelname)s %(name)s] %(message)s"


def get_logger(name: str = "vdetlib_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(level)
        logger.propagate = False
    return logger


class StageMetrics:
    """Per-stage counters with wall-clock timing and optional JSONL sink."""

    def __init__(self, stage: str, jsonl_path: Optional[str] = None):
        self.stage = stage
        self.jsonl_path = jsonl_path or os.environ.get("VDETLIB_TPU_METRICS")
        self.counters: dict[str, float] = {}
        self._t0 = time.perf_counter()

    def add(self, name: str, value: float = 1.0) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + value

    def set(self, name: str, value: Any) -> None:
        self.counters[name] = value

    def finish(self) -> dict:
        elapsed = time.perf_counter() - self._t0
        record = {"stage": self.stage, "wall_s": elapsed, **self.counters}
        frames = self.counters.get("frames")
        if frames and elapsed > 0:
            record["frames_per_sec"] = frames / elapsed
        get_logger().info("%s done: %s", self.stage, record)
        if self.jsonl_path:
            with open(self.jsonl_path, "a", encoding="utf-8") as f:
                f.write(json.dumps(record) + "\n")
        return record
