"""Randomized cross-engine differential corpus (VERDICT r3 item #2).

CI-budget subset of the fuzz harness (vdetlib_tpu/testing/differential.py):
a pinned, screened corpus of (config, data) draws asserting staged == fused
final protos exactly, plus corpus-level variation coverage — the
precondition-asserting pattern from the round-3 MGP-bug lesson (CLAUDE.md
"Parity-test blind spots") applied to the whole corpus, so sampler drift
that quietly removes a variation regime fails the suite.

The long sweep lives in scripts/fuzz_differential.py; any divergence it
finds should be pinned here as a (cfg_seed, data_seed) pair.
"""

import pytest

from vdetlib_tpu.testing import differential as D

# Screened so the union covers every variation axis (see corpus_coverage):
# cfg 0: matched-frac gate, window 2, boost mean, bg_decay, high thresh
# cfg 1: window 2, boost mean, link_rescore max, high thresh
# cfg 2: low thresh, bg_decay
# cfg 3: tubelet_boxes, low thresh
# data 0: hard tier, varying roi counts, jittered-GT proposals, full T
# data 1: hard tier, padded tail (t_real=6), random proposals
# data 2: easy tier, varying roi counts
# data 5: hard tier, FULL roi counts (mask all-True), mixed proposals
CI_CORPUS = [
    (0, 0), (0, 1),
    (1, 2), (1, 5),
    (2, 0), (2, 2),
    (3, 1), (3, 5),
]


@pytest.fixture(scope="module")
def models():
    return D.init_models()


def test_fuzz_corpus_engines_agree(models, tmp_path):
    reports = []
    for cfg_seed, data_seed in CI_CORPUS:
        cd = D.sample_config(cfg_seed)
        dd = D.sample_data(data_seed)
        rep = D.run_case(models, cd, dd, root=str(tmp_path / f"c{cfg_seed}d{data_seed}"))
        reports.append(((cfg_seed, data_seed), rep))

    bad = [(k, r["mismatches"]) for k, r in reports if not r["ok"]]
    assert not bad, f"cross-engine divergence in {len(bad)} cases: {bad}"

    cov = D.corpus_coverage([r for _, r in reports])
    missing = [k for k, v in cov.items() if not v]
    assert not missing, (
        "fuzz corpus lost variation coverage (sampler or seed drift): "
        f"{missing}; re-screen seeds in CI_CORPUS"
    )


@pytest.mark.parametrize("seed", [101, 202])
def test_stream_chunked_agreement_fuzz(models, seed):
    rep = D.run_stream_agreement_case(models, seed)
    assert rep["ok"], rep
    assert rep["union"] > 0
