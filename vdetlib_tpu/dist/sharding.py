"""Mesh construction + sharding helpers (TPU-native parallelism story).

Reference reality (SURVEY.md §2.4): the reference had NO intra-job
parallelism — users sharded the video list across independent process
launches over a shared filesystem. The TPU-native mapping (SURVEY.md §5.8):

- ``data`` mesh axis: frame batches / videos sharded across chips over ICI
  (data parallelism — the dominant axis; the CNNs fit per-chip).
- ``model`` mesh axis (optional): tensor-parallel sharding of the wide head
  matmuls for very large heads; off (size 1) by default.
- collectives: gradient psum in training, metric psum (mAP accumulation,
  throughput counters) in eval — all inserted by XLA from shardings.
- the JSON-protos-on-disk interface stays the inter-stage transport,
  now per-shard (shard_videos).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, model_parallel: int = 1, devices=None
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, tree):
    """Shard every array's leading axis along 'data' (batch parallelism)."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    """Replicate arrays (params) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def psum_metrics(tree, axis_name: str = "data"):
    """Sum metric pytrees across the data axis (inside shard_map/pjit)."""
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), tree)


def shard_videos(video_paths: Sequence[str], shard_index: int, num_shards: int):
    """Deterministic round-robin split of a video list across pipeline shards.

    This is the process-level data parallelism the reference achieved with
    manual launches; outputs stay resume-safe per video (stage idempotence).
    """
    return [p for i, p in enumerate(video_paths) if i % num_shards == shard_index]
