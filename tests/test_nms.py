"""NMS kernel parity: XLA masked-greedy and native C++ vs the numpy oracle.

Exact keep-set equality including deterministic tie-breaks (SURVEY.md §4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import random_boxes
from tests.oracle.nms import nms as oracle_nms
from vdetlib_tpu.kernels.nms import batched_nms, nms_host, nms_xla
from vdetlib_tpu.native import _nms_numpy, native_available, nms as native_nms


def _problem(rng, n, tie_fraction=0.0):
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0.01, 1.0, size=n).astype(np.float32)
    if tie_fraction > 0:
        # Quantize so ties are common; tie-break order must still match.
        scores = np.round(scores * 8) / 8.0
        scores = scores.astype(np.float32)
    dets = np.concatenate([boxes, scores[:, None]], axis=1)
    return boxes, scores, dets


@pytest.mark.parametrize("n", [1, 7, 64, 300])
@pytest.mark.parametrize("thresh", [0.1, 0.3, 0.5, 0.9])
def test_xla_matches_oracle(rng, n, thresh):
    boxes, scores, dets = _problem(rng, n)
    want = set(oracle_nms(dets, thresh))
    keep, _ = nms_xla(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), thresh)
    got = set(np.nonzero(np.asarray(keep))[0].tolist())
    assert got == want


def test_xla_tie_breaking(rng):
    boxes, scores, dets = _problem(rng, 128, tie_fraction=1.0)
    want = set(oracle_nms(dets, 0.3))
    keep, _ = nms_xla(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(128, bool), 0.3)
    assert set(np.nonzero(np.asarray(keep))[0].tolist()) == want


def test_xla_padding_invariance(rng):
    boxes, scores, dets = _problem(rng, 50)
    want = set(oracle_nms(dets, 0.3))
    pad = 78
    boxes_p = np.concatenate([boxes, np.zeros((pad, 4), np.float32)])
    scores_p = np.concatenate([scores, np.full(pad, 0.99, np.float32)])
    valid = np.concatenate([np.ones(50, bool), np.zeros(pad, bool)])
    keep, _ = nms_xla(jnp.asarray(boxes_p), jnp.asarray(scores_p), jnp.asarray(valid), 0.3)
    keep = np.asarray(keep)
    assert not keep[50:].any()
    assert set(np.nonzero(keep[:50])[0].tolist()) == want


def test_permutation_property(rng):
    """Keep-SET is invariant under permutation of box order (scores distinct)."""
    boxes, scores, dets = _problem(rng, 60)
    keep1, _ = nms_xla(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(60, bool), 0.4)
    perm = rng.permutation(60)
    keep2, _ = nms_xla(
        jnp.asarray(boxes[perm]), jnp.asarray(scores[perm]), jnp.ones(60, bool), 0.4
    )
    kept1 = set(map(int, np.nonzero(np.asarray(keep1))[0]))
    kept2 = {int(perm[i]) for i in np.nonzero(np.asarray(keep2))[0]}
    assert kept1 == kept2


@pytest.mark.parametrize("impl_name", ["native_or_fallback", "numpy"])
def test_host_matches_oracle(rng, impl_name):
    for n in (1, 13, 200):
        _, _, dets = _problem(rng, n, tie_fraction=1.0)
        want = oracle_nms(dets, 0.3)
        if impl_name == "numpy":
            got = _nms_numpy(np.asarray(dets, np.float32), 0.3, 1.0)
        else:
            got = native_nms(dets, 0.3)
        assert got == want  # ranked order equality, not just set


def test_native_library_builds():
    # The C++ path must actually be exercised in this environment.
    assert native_available()


def test_batched_nms_consistent(rng):
    T, C, N = 3, 2, 40
    boxes = np.stack([random_boxes(rng, N) for _ in range(T * C)]).reshape(T, C, N, 4)
    scores = rng.uniform(0.01, 1, size=(T, C, N)).astype(np.float32)
    valid = rng.uniform(size=(T, C, N)) > 0.2
    keep = np.asarray(batched_nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.3))
    for t in range(T):
        for c in range(C):
            k1, _ = nms_xla(
                jnp.asarray(boxes[t, c]),
                jnp.asarray(scores[t, c]),
                jnp.asarray(valid[t, c]),
                0.3,
            )
            np.testing.assert_array_equal(keep[t, c], np.asarray(k1))


def test_host_empty():
    assert nms_host(np.zeros((0, 5), np.float32), 0.3) == []


@pytest.mark.parametrize("n", [7, 64, 200])
def test_unsorted_fixpoint_matches_oracle(rng, n):
    from vdetlib_tpu.kernels.nms import nms_unsorted_fixpoint

    boxes, scores, dets = _problem(rng, n, tie_fraction=1.0)
    want = set(oracle_nms(dets, 0.3))
    keep = nms_unsorted_fixpoint(
        jnp.asarray(boxes)[None], jnp.asarray(scores)[None], jnp.ones((1, n), bool), 0.3
    )
    got = set(np.nonzero(np.asarray(keep)[0])[0].tolist())
    assert got == want


def test_grouped_nms_matches_per_group_oracle(rng):
    """nms_grouped == independent per-group greedy NMS (block-diagonal fixpoint)."""
    from vdetlib_tpu.kernels.nms import nms_grouped

    n, g_count = 96, 5
    for trial in range(5):
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0.0, 1.0, n).astype(np.float32)
        valid = rng.uniform(size=n) > 0.2
        groups = rng.integers(0, g_count, n).astype(np.int32)
        # a few exact score ties to exercise index tie-breaking within groups
        scores[10] = scores[20] = scores[30]
        keep = np.asarray(
            nms_grouped(
                jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
                jnp.asarray(groups), 0.4,
            )
        )
        want = np.zeros(n, bool)
        for g in range(g_count):
            idx = np.nonzero(valid & (groups == g))[0]
            if idx.size == 0:
                continue
            dets = np.concatenate([boxes[idx], scores[idx, None]], axis=1)
            for k in oracle_nms(dets, 0.4):
                want[idx[k]] = True
        np.testing.assert_array_equal(keep, want, err_msg=f"trial {trial}")
