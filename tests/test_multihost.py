"""Multi-host runtime test (VERDICT r1 item 8 / SURVEY.md §5.8).

Spawns TWO coordinated CPU processes through jax.distributed.initialize —
the same code path a TPU pod slice takes (coordination service + cross-host
collectives), minus the ICI. Each process takes its disjoint video shard,
"processes" it, and the metric all-reduce must see both shards' counts.
"""

import contextlib
import fcntl
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Inter-worker mutex: under pytest-xdist the 2-process jax.distributed
# fixture used to crash when sibling test processes contended for the
# coordinator port / CPUs (VERDICT r3 weak #5). Serializing just these
# tests (they spawn 2 subprocesses each) fixes both; serial runs pay an
# uncontended flock. A bound-then-closed probe port can still be stolen in
# the close->coordinator-bind window, so launches also retry on failure
# with a fresh port.
_LOCK_PATH = "/tmp/vdetlib_tpu_multihost_test.lock"


@contextlib.contextmanager
def _serialized():
    with open(_LOCK_PATH, "w") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_pair(make_args, env, timeout, attempts=3, before_attempt=None):
    """Run the 2-process coordinated pair, retrying with a fresh port."""
    for attempt in range(attempts):
        if before_attempt is not None:
            before_attempt()
        port = _free_port()
        procs = [
            subprocess.Popen(
                make_args(port, i), cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for i in range(2)
        ]
        logs = [p.communicate(timeout=timeout)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            return logs
        if attempt == attempts - 1:
            raise AssertionError(f"multihost pair failed {attempts}x: {logs}")
    raise AssertionError("unreachable")

WORKER = r"""
import json, os, sys
import jax

jax.config.update("jax_platforms", "cpu")

from vdetlib_tpu.dist.multihost import (
    allreduce_metrics, init_multihost, process_video_shard,
)

port, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
assert init_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2
videos = [f"v{i}" for i in range(7)]
mine = process_video_shard(videos)
# disjoint round-robin: process 0 gets even indices, 1 gets odd
want = videos[pid::2]
assert mine == want, (mine, want)
metrics = {"videos": len(mine), "frames": 10.0 * len(mine)}
total = allreduce_metrics(metrics)
with open(out, "w") as f:
    json.dump({"pid": pid, "mine": mine, "total": total}, f)
"""


def test_two_process_shard_and_allreduce(tmp_path):
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    with _serialized():
        _launch_pair(
            lambda port, i: [
                sys.executable, "-c", WORKER, str(port), str(i), outs[i]
            ],
            env, timeout=300,
        )

    import json

    results = [json.load(open(o)) for o in outs]
    shards = [set(r["mine"]) for r in results]
    assert shards[0].isdisjoint(shards[1])
    assert shards[0] | shards[1] == {f"v{i}" for i in range(7)}
    # both processes saw the global totals: 7 videos, 70 frames
    for r in results:
        assert r["total"] == {"frames": 70.0, "videos": 7.0}, results


PIPELINE_WORKER = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")

port, pid, data, work = sys.argv[1:5]
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = pid

from vdetlib_tpu.cli.pipeline_tool import main

raise SystemExit(main([
    data, work, "--model", "tiny", "--num_classes", "4",
    "--image_hw", "96", "128", "--max_rois", "16",
    "--multihost", "--eval",
]))
"""


def test_multihost_pipeline_sweep(tmp_path):
    """Two coordinated processes sweep disjoint shards; proc 0 evals globally."""
    import re

    data = tmp_path / "data"
    work = tmp_path / "work"
    data.mkdir()
    gen = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from vdetlib_tpu.data.synth import SynthConfig, make_video, write_frames"
        ", annot_proto, det_proto_from_gt;"
        "from vdetlib_tpu.protos import proto_dump;"
        f"root = {str(data)!r};"
        "exec('''\n"
        "for i in range(2):\n"
        "    sv = make_video(SynthConfig(num_frames=4, height=96, width=128,\n"
        "                                num_classes=4, seed=i), video=f'mv{i}')\n"
        "    vid = write_frames(sv, root)\n"
        "    proto_dump(vid, f'{root}/mv{i}.vid.json')\n"
        "    boxes = [\n"
        "        {'frame': int(f['frame']), 'bbox': [float(10+j*8), 10.0, float(50+j*8), 50.0]}\n"
        "        for f in vid['frames'] for j in range(4)\n"
        "    ]\n"
        "    proto_dump({'video': sv.video, 'boxes': boxes}, f'{root}/mv{i}.box.json')\n"
        "    proto_dump(annot_proto(sv), f'{root}/mv{i}.annot.json')\n"
        "''')"
    )
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    subprocess.run([sys.executable, "-c", gen], check=True, cwd=REPO, env=env)

    def _fresh_workdir():
        import shutil

        shutil.rmtree(work, ignore_errors=True)

    with _serialized():
        logs = _launch_pair(
            lambda port, i: [
                sys.executable, "-c", PIPELINE_WORKER, str(port), str(i),
                str(data), str(work),
            ],
            env, timeout=600, before_attempt=_fresh_workdir,
        )
    # each process ran exactly its shard (round-robin by process index)
    assert "mv0" in logs[0] and "mv1" in logs[1]
    for i in range(2):
        assert os.path.exists(work / f"mv{i}" / "final.json"), logs
    # only process 0 printed the GLOBAL eval, over both videos
    assert re.search(r"mAP = [\d.]+ over 2 videos", logs[0]), logs[0]
    assert "mAP" not in logs[1]
