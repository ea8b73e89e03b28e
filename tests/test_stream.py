"""Streaming pipeline: chunked processing with carried tracker state."""

import numpy as np
import jax.numpy as jnp
import pytest

from vdetlib_tpu.data.synth import SynthConfig, make_video
from vdetlib_tpu.nn.detector import init_detector
from vdetlib_tpu.nn.presets import detector_preset
from vdetlib_tpu.nn.tracker_net import TrackerConfig
from vdetlib_tpu.utils.common import iou
from vdetlib_tpu.video.stream import StreamOptions, stream_video, track_chunk
from vdetlib_tpu.video.track import init_tracker, tracker_features, extract_template

HW = (96, 128)
C = 4
R = 16


@pytest.fixture(scope="module")
def models():
    det_cfg = detector_preset("tiny", num_classes=C)
    det_model, det_params = init_detector(det_cfg, HW, max_rois=R, seed=0)
    trk_cfg = TrackerConfig()
    trk_model, trk_params = init_tracker(trk_cfg, image_hw=HW, seed=0)
    return det_model, det_params, trk_model, trk_params, trk_cfg


def test_track_chunk_carries_state(models):
    """Chunked tracking ≈ one-shot tracking over the concatenated frames."""
    _, _, trk_model, trk_params, trk_cfg = models
    sv = make_video(SynthConfig(num_frames=16, height=HW[0], width=HW[1], seed=31, max_speed=2.0))
    feats = tracker_features(trk_model, trk_params, jnp.asarray(sv.frames))
    box0 = jnp.asarray(sv.gt_boxes[0, 0])
    tmpl = extract_template(feats[0], box0, trk_cfg)[None]
    # one shot over frames 1..15
    b_all, c_all, a_all, be, ae, _ = track_chunk(
        trk_cfg, feats[1:], tmpl, box0[None], jnp.asarray([True]), 0.2
    )
    # two chunks: 1..8, then 9..15 with carried state
    b1, c1, a1, be1, ae1, _ = track_chunk(
        trk_cfg, feats[1:9], tmpl, box0[None], jnp.asarray([True]), 0.2
    )
    b2, c2, a2, be2, ae2, _ = track_chunk(
        trk_cfg, feats[9:], tmpl, be1, ae1, 0.2
    )
    np.testing.assert_allclose(
        np.asarray(b_all[0]), np.concatenate([np.asarray(b1[0]), np.asarray(b2[0])]),
        rtol=1e-4, atol=1e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(a_all[0]),
        np.concatenate([np.asarray(a1[0]), np.asarray(a2[0])]),
    )


def test_stream_video_end_to_end(models):
    det_model, det_params, trk_model, trk_params, trk_cfg = models
    T = 24
    sv = make_video(
        SynthConfig(num_frames=T, height=HW[0], width=HW[1], num_classes=C,
                    seed=32, max_speed=2.0)
    )
    rng = np.random.default_rng(0)
    # proposals: jittered GT + randoms per frame
    rois = np.zeros((T, R, 4), np.float32)
    K = sv.gt_boxes.shape[0]
    for t in range(T):
        n = 0
        for k in range(K):
            for _ in range(3):
                rois[t, n] = np.clip(
                    sv.gt_boxes[k, t] + rng.normal(0, 2, 4),
                    0, [HW[1]-1, HW[0]-1, HW[1]-1, HW[0]-1],
                )
                n += 1
        while n < R:
            x1, y1 = rng.uniform(0, HW[1]-20), rng.uniform(0, HW[0]-20)
            rois[t, n] = [x1, y1, x1 + rng.uniform(10, 50), y1 + rng.uniform(10, 50)]
            n += 1

    def chunks():
        for s in range(0, T, 8):
            yield sv.frames[s : s + 8]

    opts = StreamOptions(
        chunk=8, max_rois=R, num_classes=C, track_slots=6, seed_thresh=0.2,
        conf_thresh=0.2, max_paths=20,
    )
    out = stream_video(
        det_model, det_params, trk_model, trk_params, trk_cfg,
        chunks(), rois, opts,
    )
    assert out["num_frames"] == T
    # MGP is on by default: slot axis = 3R blocks [native, fwd, bwd]
    assert out["boxes"].shape == (T, 3 * R, 4)
    assert out["seq_scores"].shape == (C - 1, T, 3 * R)
    # tracks were seeded and carried across chunk boundaries
    assert len(out["tracks"]) >= 1
    spans = [
        (min(t for t, _, _ in seg), max(t for t, _, _ in seg))
        for seg in out["tracks"].values()
    ]
    assert any(hi - lo >= 10 for lo, hi in spans), spans  # crosses ≥1 boundary


def _make_inputs(T, seed, max_speed=2.0):
    sv = make_video(
        SynthConfig(num_frames=T, height=HW[0], width=HW[1], num_classes=C,
                    seed=seed, max_speed=max_speed)
    )
    rng = np.random.default_rng(seed)
    rois = np.zeros((T, R, 4), np.float32)
    K = sv.gt_boxes.shape[0]
    for t in range(T):
        n = 0
        for k in range(K):
            for _ in range(3):
                rois[t, n] = np.clip(
                    sv.gt_boxes[k, t] + rng.normal(0, 2, 4),
                    0, [HW[1]-1, HW[0]-1, HW[1]-1, HW[0]-1],
                )
                n += 1
        while n < R:
            x1, y1 = rng.uniform(0, HW[1]-20), rng.uniform(0, HW[0]-20)
            rois[t, n] = [x1, y1, x1 + rng.uniform(10, 50), y1 + rng.uniform(10, 50)]
            n += 1
    return sv, rois


def test_backward_retracking_extends_seeds(models):
    """A track seeded mid-stream gains frames BEFORE its anchor (SURVEY §3.2).

    Forward-only online tracking can never cover frames before the seed;
    with backtrack=True the sliding-window re-tracking must."""
    det_model, det_params, trk_model, trk_params, trk_cfg = models
    T = 16
    sv, rois = _make_inputs(T, seed=77, max_speed=1.0)

    def chunks():
        for s in range(0, T, 8):
            yield sv.frames[s : s + 8]

    def run(backtrack):
        opts = StreamOptions(
            chunk=8, max_rois=R, num_classes=C, track_slots=6,
            seed_thresh=0.2, conf_thresh=0.15, max_paths=20,
            backtrack=backtrack,
        )
        return stream_video(
            det_model, det_params, trk_model, trk_params, trk_cfg,
            chunks(), rois, opts,
        )

    base = run(False)
    bt = run(True)

    def pre_anchor_counts(out):
        total = 0
        for seg in out["tracks"].values():
            anchor_t = seg[0][0] if not any(s == 0.0 for _, _, s in seg) else None
            # anchor entry carries the detector seed score; backtracked
            # entries carry 0.0 — count entries strictly before the max-score
            # entry's frame
            best = max(seg, key=lambda e: e[2])
            total += sum(1 for t, _, _ in seg if t < best[0])
        return total

    assert pre_anchor_counts(bt) > pre_anchor_counts(base)
    # segments stay sorted and within bounds
    for seg in bt["tracks"].values():
        ts = [t for t, _, _ in seg]
        assert ts == sorted(ts)
        assert min(ts) >= 0 and max(ts) < T


def test_fused_engine_matches_host(models):
    """engine="fused" (one dispatch/chunk) output-matches engine="host".

    Fixture-precondition pattern (CLAUDE.md "Parity-test blind spots"): the
    run must actually exercise the regimes where the engines could diverge —
    seeds in multiple chunks, tracks crossing chunk boundaries, backtracked
    window entries, and a short final chunk — and each is asserted below so
    fixture drift can't silently restore a blind spot.
    """
    det_model, det_params, trk_model, trk_params, trk_cfg = models
    T = 36  # NOT a multiple of chunk → exercises the padded short final chunk
    sv, rois = _make_inputs(T, seed=85, max_speed=2.0)

    def run(engine):
        def chunks():
            for s in range(0, T, 8):
                yield sv.frames[s : s + 8]

        opts = StreamOptions(
            engine=engine, chunk=8, max_rois=R, num_classes=C, track_slots=6,
            seed_thresh=0.2, conf_thresh=0.3, max_paths=20,
        )
        return stream_video(
            det_model, det_params, trk_model, trk_params, trk_cfg,
            chunks(), rois, opts,
        )

    host = run("host")
    fused = run("fused")

    # --- fixture preconditions: the case is hard enough to be meaningful ---
    assert T % 8 != 0  # short final chunk
    # the anchor entry carries the detector seed score (max in its segment)
    seed_chunks = {
        max(seg, key=lambda e: e[2])[0] // 8 for seg in host["tracks"].values()
    }
    assert len(seed_chunks) >= 2, seed_chunks  # seeding in multiple chunks
    spans = [
        (min(t for t, _, _ in seg), max(t for t, _, _ in seg))
        for seg in host["tracks"].values()
    ]
    assert any(lo // 8 != hi // 8 for lo, hi in spans), spans  # crosses chunks
    assert any(
        s == 0.0 for seg in host["tracks"].values() for _, _, s in seg
    )  # backtracked entries present

    # --- output parity: BIT-EXACT. Both engines execute the same compiled
    # subprograms for every tracker-affecting computation (shared
    # _extract_templates_core / track_chunk / backtrack_seeds; the fused
    # program pins them with optimization_barriers). Exactness is the only
    # meaningful contract here: the NCC rollout is chaotic (a 1e-6 template
    # diff measured 6 px of box drift by frame 30), so any tolerance either
    # passes at 0 or fails at pixels. ---
    assert fused["num_frames"] == host["num_frames"] == T
    np.testing.assert_array_equal(fused["keep"], host["keep"])
    np.testing.assert_array_equal(fused["boxes"], host["boxes"])
    np.testing.assert_array_equal(fused["scores"], host["scores"])
    np.testing.assert_array_equal(fused["path_ids"], host["path_ids"])
    np.testing.assert_array_equal(fused["seq_scores"], host["seq_scores"])
    assert set(fused["tracks"]) == set(host["tracks"])
    for tid, hseg in host["tracks"].items():
        fseg = fused["tracks"][tid]
        assert [t for t, _, _ in fseg] == [t for t, _, _ in hseg], tid
        np.testing.assert_array_equal(
            np.stack([b for _, b, _ in fseg]),
            np.stack([b for _, b, _ in hseg]),
        )
        np.testing.assert_array_equal(
            np.array([s for _, _, s in fseg]),
            np.array([s for _, _, s in hseg]),
        )


def test_stream_to_protos_wire_contract(models):
    """stream_to_protos emits the batch link stage's wire format faithfully:
    det entries are exactly the positive seq-NMS scores, tubelets mirror
    path ids, and online-tracker segments arrive sorted and in range."""
    from vdetlib_tpu.video.stream import stream_to_protos

    det_model, det_params, trk_model, trk_params, trk_cfg = models
    T = 16
    sv, rois = _make_inputs(T, seed=79)

    def chunks():
        for s in range(0, T, 8):
            yield sv.frames[s : s + 8]

    opts = StreamOptions(
        chunk=8, max_rois=R, num_classes=C, track_slots=6,
        seed_thresh=0.2, conf_thresh=0.2, max_paths=20,
    )
    out = stream_video(
        det_model, det_params, trk_model, trk_params, trk_cfg,
        chunks(), rois, opts,
    )
    fids = list(range(1, T + 1))
    det_proto, tubelets, track_proto = stream_to_protos(out, fids, "sv")

    # every positive seq-NMS score appears as exactly one det score entry
    n_positive = int((out["seq_scores"] > 0).sum())
    n_entries = sum(len(d["scores"]) for d in det_proto["detections"])
    assert n_entries == n_positive > 0
    for d in det_proto["detections"]:
        assert d["frame"] in set(fids)
        x1, y1, x2, y2 = d["bbox"]
        # MGP-propagated boxes are unclipped by convention (the batch stage
        # emits the same — video/mgp.py::_propagate_hop), so allow the
        # per-hop motion margin around the frame
        assert x1 <= x2 and y1 <= y2
        assert -32 <= x1 and x2 <= HW[1] + 31 and -32 <= y1 and y2 <= HW[0] + 31

    # tubelets: one track per (class, path id), entries frame-sorted
    n_paths = sum(
        int(out["path_ids"][l].max()) + 1
        for l in range(out["path_ids"].shape[0])
        if out["path_ids"][l].size and out["path_ids"][l].max() >= 0
    )
    assert len(tubelets["tracks"]) == n_paths > 0
    for trk in tubelets["tracks"]:
        frames = [e["frame"] for e in trk]
        assert frames == sorted(frames)

    # online tracker segments: sorted, in range, one track per id
    assert len(track_proto["tracks"]) == len(out["tracks"])
    for trk in track_proto["tracks"]:
        frames = [e["frame"] for e in trk]
        assert frames == sorted(frames)
        assert all(f in set(fids) for f in frames)


def test_stream_cli_end_to_end(models, tmp_path):
    """The stream tool drives the full wire contract: vid+box protos in,
    final/tubelets/track protos out, resume-by-existence on rerun."""
    import vdetlib_tpu.cli.stream as stream_cli
    from vdetlib_tpu.data.synth import box_proto as synth_box_proto
    from vdetlib_tpu.data.synth import write_frames
    from vdetlib_tpu.protos import proto_dump, proto_load

    sv = make_video(
        SynthConfig(num_frames=12, height=HW[0], width=HW[1], num_classes=C,
                    seed=80, max_speed=2.0, proposals_per_frame=R),
        video="svid",
    )
    vid = write_frames(sv, str(tmp_path / "frames"))
    proto_dump(vid, str(tmp_path / "svid.vid.json"))
    proto_dump(synth_box_proto(sv), str(tmp_path / "svid.box.json"))

    argv = [
        str(tmp_path / "svid.vid.json"), str(tmp_path / "work"),
        "--model", "tiny", "--num_classes", str(C),
        "--image_hw", str(HW[0]), str(HW[1]),
        "--max_rois", str(R), "--chunk", "8", "--seed_thresh", "0.2",
    ]
    assert stream_cli.main(argv) == 0
    vdir = tmp_path / "work" / "svid"
    final = proto_load(str(vdir / "final.json"))
    tubelets = proto_load(str(vdir / "tubelets.json"))
    track = proto_load(str(vdir / "track.json"))
    assert final["video"] == "svid"
    assert track["method"] == "stream_tracker"
    assert len(final["detections"]) > 0
    # resume-by-existence: rerun must not rewrite (mtime unchanged)
    mtime = (vdir / "final.json").stat().st_mtime_ns
    assert stream_cli.main(argv) == 0
    assert (vdir / "final.json").stat().st_mtime_ns == mtime
    # emitted protos compose with the downstream eval tooling
    from vdetlib_tpu.evaluation.vid_map import vid_map

    from vdetlib_tpu.data.synth import annot_proto as synth_annot_proto

    m, _ = vid_map([(final, synth_annot_proto(sv))])
    assert 0.0 <= m <= 1.0


def test_stream_cli_stdin_survives_bad_video(models, tmp_path, monkeypatch):
    """Queue (--stdin) mode: a video with missing proposals is logged and
    skipped; the queue keeps draining (batch mode still fails fast)."""
    import io

    import vdetlib_tpu.cli.stream as stream_cli
    from vdetlib_tpu.data.synth import box_proto as synth_box_proto
    from vdetlib_tpu.data.synth import write_frames
    from vdetlib_tpu.protos import proto_dump, proto_load

    sv = make_video(
        SynthConfig(num_frames=8, height=HW[0], width=HW[1], num_classes=C,
                    seed=81, max_speed=2.0, proposals_per_frame=R),
        video="good",
    )
    vid = write_frames(sv, str(tmp_path / "frames"))
    proto_dump(vid, str(tmp_path / "good.vid.json"))
    proto_dump(synth_box_proto(sv), str(tmp_path / "good.box.json"))
    # bad entry: vid proto exists but its box proto does not
    bad = make_video(
        SynthConfig(num_frames=8, height=HW[0], width=HW[1], num_classes=C,
                    seed=82, proposals_per_frame=R),
        video="bad",
    )
    bad_vid = write_frames(bad, str(tmp_path / "frames"))
    proto_dump(bad_vid, str(tmp_path / "bad.vid.json"))

    monkeypatch.setattr(
        "sys.stdin",
        io.StringIO(
            f"{tmp_path / 'bad.vid.json'}\n{tmp_path / 'good.vid.json'}\n"
        ),
    )
    argv = [
        str(tmp_path / "work"), "--stdin",
        "--model", "tiny", "--num_classes", str(C),
        "--image_hw", str(HW[0]), str(HW[1]),
        "--max_rois", str(R), "--chunk", "8", "--seed_thresh", "0.2",
    ]
    assert stream_cli.main(argv) == 0
    assert not (tmp_path / "work" / "bad").exists()
    final = proto_load(str(tmp_path / "work" / "good" / "final.json"))
    assert final["video"] == "good"


def test_stream_chunked_agrees_with_unchunked(models):
    """Chunked processing with carried state ≈ one big chunk (agreement, not
    exactness: the causal bwd-hop at chunk tails and the finite backtrack
    window differ by construction)."""
    det_model, det_params, trk_model, trk_params, trk_cfg = models
    T = 32
    sv, rois = _make_inputs(T, seed=78)

    def run(chunk):
        def chunks():
            for s in range(0, T, chunk):
                yield sv.frames[s : s + chunk]

        opts = StreamOptions(
            chunk=chunk, max_rois=R, num_classes=C, track_slots=6,
            seed_thresh=0.2, conf_thresh=0.2, max_paths=20,
        )
        return stream_video(
            det_model, det_params, trk_model, trk_params, trk_cfg,
            chunks(), rois, opts,
        )

    big = run(T)
    small = run(8)
    # detection keep masks agree except at chunk-boundary MGP effects
    agree = (big["keep"] == small["keep"]).mean()
    assert agree > 0.95, agree
    # surviving seq-NMS detections overlap strongly
    b_live = big["seq_scores"] > 0
    s_live = small["seq_scores"] > 0
    inter = (b_live & s_live).sum()
    union = (b_live | s_live).sum()
    assert union > 0 and inter / union > 0.5, (inter, union)


def _run_stream(models, sv, rois, T, engine, stride, chunk=8, conf=0.3):
    det_model, det_params, trk_model, trk_params, trk_cfg = models

    def chunks():
        for st in range(0, T, chunk):
            yield sv.frames[st : st + chunk]

    opts = StreamOptions(
        engine=engine, chunk=chunk, max_rois=R, num_classes=C, track_slots=6,
        seed_thresh=0.2, conf_thresh=conf, max_paths=20, track_stride=stride,
    )
    return stream_video(
        det_model, det_params, trk_model, trk_params, trk_cfg,
        chunks(), rois, opts,
    )


def test_stream_stride2_engine_parity(models):
    """host/fused BIT-EXACT parity holds at track_stride=2.

    The stride path adds three cross-engine couplings beyond the stride-1
    parity contract (test_fused_engine_matches_host): the in-program
    upsampling (track_chunk_strided, shared compiled), the boundary fill
    threaded through the carry, and the numpy backtrack upsampler
    (_backtrack_entries_strided, shared host code). Fixture preconditions
    assert each is actually exercised.
    """
    T = 36  # short final chunk
    sv, rois = _make_inputs(T, seed=85, max_speed=2.0)
    host = _run_stream(models, sv, rois, T, "host", 2)
    fused = _run_stream(models, sv, rois, T, "fused", 2)

    # --- fixture preconditions ---
    seed_chunks = {
        max(seg, key=lambda e: e[2])[0] // 8 for seg in host["tracks"].values()
    }
    assert len(seed_chunks) >= 2, seed_chunks
    spans = [
        (min(t for t, _, _ in seg), max(t for t, _, _ in seg))
        for seg in host["tracks"].values()
    ]
    assert any(lo // 8 != hi // 8 for lo, hi in spans), spans
    # boundary-fill entries present: some track emits at a chunk's LAST
    # frame (local 7) having also emitted the surrounding samples
    assert any(
        t % 8 == 7
        for seg in host["tracks"].values()
        for t, _, _ in seg
    ), "no boundary-fill entries — fixture too easy"
    assert any(
        s == 0.0 for seg in host["tracks"].values() for _, _, s in seg
    )  # backtracked entries present

    # --- BIT-EXACT output parity (same contract as stride 1) ---
    assert fused["num_frames"] == host["num_frames"] == T
    np.testing.assert_array_equal(fused["keep"], host["keep"])
    np.testing.assert_array_equal(fused["boxes"], host["boxes"])
    np.testing.assert_array_equal(fused["scores"], host["scores"])
    np.testing.assert_array_equal(fused["path_ids"], host["path_ids"])
    np.testing.assert_array_equal(fused["seq_scores"], host["seq_scores"])
    assert set(fused["tracks"]) == set(host["tracks"])
    for tid, hseg in host["tracks"].items():
        fseg = fused["tracks"][tid]
        assert [t for t, _, _ in fseg] == [t for t, _, _ in hseg], tid
        np.testing.assert_array_equal(
            np.stack([b for _, b, _ in fseg]),
            np.stack([b for _, b, _ in hseg]),
        )
        np.testing.assert_array_equal(
            np.array([s for _, _, s in fseg]),
            np.array([s for _, _, s in hseg]),
        )


def test_stream_stride2_interpolation_semantics(models):
    """Skipped frames are exact linear midpoints of their sampled neighbors.

    Verifies the stride contract on real segments (host engine): for a track
    alive over [t-1, t, t+1] with t odd and none of the three the seed or a
    backtracked entry, box[t] == 0.5*(box[t-1] + box[t+1]) — including the
    CHUNK-BOUNDARY frame (local 7), whose fill arrives one chunk late; and
    the stream's final frame holds the last sample.
    """
    T = 32
    sv, rois = _make_inputs(T, seed=78)
    out = _run_stream(models, sv, rois, T, "host", 2, conf=0.2)

    checked = boundary_checked = 0
    for seg in out["tracks"].values():
        by_t = {t: (b, s) for t, b, s in seg}
        seed_t = max(seg, key=lambda e: e[2])[0]
        for t in range(1, T - 1):
            if t % 2 == 0 or not {t - 1, t, t + 1} <= set(by_t):
                continue
            # skip seeds/backtracked entries (score 0.0) among the triple
            if any(by_t[u][1] == 0.0 for u in (t - 1, t, t + 1)):
                continue
            if seed_t in (t - 1, t, t + 1):
                continue
            mid = 0.5 * (by_t[t - 1][0] + by_t[t + 1][0])
            np.testing.assert_allclose(by_t[t][0], mid, rtol=0, atol=1e-5)
            checked += 1
            if t % 8 == 7:
                boundary_checked += 1
        # final-frame hold: if both T-2 and T-1 are present (and not the
        # seed), the last frame repeats the last sample exactly
        if (
            T - 2 in by_t and T - 1 in by_t
            and seed_t not in (T - 2, T - 1)
            and by_t[T - 2][1] != 0.0 and by_t[T - 1][1] != 0.0
        ):
            np.testing.assert_array_equal(by_t[T - 1][0], by_t[T - 2][0])
    assert checked >= 5, checked
    assert boundary_checked >= 1, "no cross-boundary interpolation exercised"


def test_stream_stride2_structural_contract(models):
    """stride-2 streams keep the stream_video output contract: segments
    sorted, unique frames, in range; det arrays unaffected by the stride
    (bit-identical to the stride-1 run — the stride only touches tracker
    segments and seeding coverage)."""
    T = 24
    sv, rois = _make_inputs(T, seed=77, max_speed=1.0)
    s1 = _run_stream(models, sv, rois, T, "host", 1, conf=0.2)
    s2 = _run_stream(models, sv, rois, T, "host", 2, conf=0.2)
    assert len(s2["tracks"]) >= 1
    for seg in s2["tracks"].values():
        ts = [t for t, _, _ in seg]
        assert ts == sorted(ts)
        assert len(ts) == len(set(ts)), "duplicate frame entries"
        assert min(ts) >= 0 and max(ts) < T
    # detection + MGP arrays do not depend on the tracker stride
    np.testing.assert_array_equal(s1["boxes"], s2["boxes"])
    np.testing.assert_array_equal(s1["scores"], s2["scores"])
    np.testing.assert_array_equal(s1["keep"], s2["keep"])
