"""proto_load / proto_dump — JSON (+gzip) codec for pipeline protocols.

Reference parity: ``vdetlib/utils/protocol.py`` ``proto_load``/``proto_dump``
(thin json wrappers; SURVEY.md §2.1). Additions over the reference:

- transparent ``.gz`` support (reference at LOW confidence had gzip; we accept
  both on read and choose by extension on write);
- atomic writes (tmp + rename) so a crashed stage never leaves a truncated
  proto — this is the pipeline's checkpoint/resume mechanism (SURVEY.md §5.3/5.4).
"""

from __future__ import annotations

import gzip
import json
import os
import tempfile
from typing import Any


def _is_gzip_path(path: str) -> bool:
    return path.endswith(".gz")


def proto_load(path: str) -> dict:
    """Load a protocol JSON file (optionally gzip-compressed) into a dict."""
    # Sniff gzip magic so protos renamed without .gz still load.
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"\x1f\x8b":
        with gzip.open(path, "rt", encoding="utf-8") as f:
            return json.load(f)
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def proto_dump(proto: dict, path: str) -> None:
    """Atomically write a protocol dict as JSON (gzip when path ends in .gz).

    The write goes to a temp file in the destination directory followed by an
    ``os.replace``; a concurrent reader either sees the old file or the new
    complete one, never a partial write. Stage idempotence + this atomicity is
    the framework's crash-recovery story (SURVEY.md §5.3).
    """
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        if _is_gzip_path(path):
            with os.fdopen(fd, "wb") as raw:
                with gzip.open(raw, "wt", encoding="utf-8") as f:
                    json.dump(proto, f, default=_json_default)
        else:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                json.dump(proto, f, default=_json_default)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def proto_exists(path: str) -> bool:
    """True when a stage output proto already exists (resume-by-existence)."""
    return os.path.exists(path)


def _json_default(obj: Any):
    """Serialize numpy/jax scalars and arrays that leak into proto dicts."""
    if hasattr(obj, "item") and not hasattr(obj, "ndim"):
        return obj.item()
    if hasattr(obj, "ndim"):
        if obj.ndim == 0:
            return obj.item()
        return obj.tolist()
    raise TypeError(f"Object of type {type(obj)} is not JSON serializable")
