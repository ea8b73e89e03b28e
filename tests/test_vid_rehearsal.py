"""Real-data dress rehearsal (VERDICT r3 item 7 / SURVEY.md §2.2 Eval row).

End-to-end through the CLIs on a synthetic ILSVRC-devkit-layout tree:
JPEG snippets + XML annots → ``import_vid`` → Selective-Search-style ``.mat``
proposals → ``gen_box_proto`` → ``pipeline`` (staged, --eval) →
``write_submission`` → ``eval_vid``. Proves the real-data on-ramp works the
day actual VID data lands — every hop uses the same tool a user would run,
no in-process shortcuts.

The detector is untrained (no network, nothing to train on — BASELINE.json
north star is environment-blocked), so the asserted contract is structural:
every stage completes, the submission file is format-exact, and both eval
paths return a finite mAP over the imported annotations.
"""

import os
import re
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from vdetlib_tpu.data.synth import SynthConfig, make_video
from vdetlib_tpu.data.vid_dataset import VID_WNIDS, WNID_TO_INDEX

HW = (96, 128)  # (H, W)
T = 6
NUM_SNIPPETS = 2
R = 16  # proposals per frame


def _write_xml(path, size_wh, objs):
    root = ET.Element("annotation")
    ET.SubElement(root, "folder").text = "VID"
    sz = ET.SubElement(root, "size")
    ET.SubElement(sz, "width").text = str(size_wh[0])
    ET.SubElement(sz, "height").text = str(size_wh[1])
    for tid, wnid, bbox in objs:
        o = ET.SubElement(root, "object")
        ET.SubElement(o, "trackid").text = str(tid)
        ET.SubElement(o, "name").text = wnid
        bb = ET.SubElement(o, "bndbox")
        for k, v in zip(("xmin", "ymin", "xmax", "ymax"), bbox):
            ET.SubElement(bb, k).text = str(int(round(v)))
        ET.SubElement(o, "occluded").text = "0"
        ET.SubElement(o, "generated").text = "0"
    ET.ElementTree(root).write(path)


def _make_devkit_from_synth(root):
    """Render REAL synthetic videos into the devkit layout (JPEG + XML)."""
    import cv2

    names, synth = [], []
    for s in range(NUM_SNIPPETS):
        sv = make_video(
            SynthConfig(num_frames=T, height=HW[0], width=HW[1],
                        num_classes=4, seed=100 + s)
        )
        name = f"ILSVRC2015_val_{s:08d}"
        fdir = os.path.join(root, "Data", "VID", "val", name)
        adir = os.path.join(root, "Annotations", "VID", "val", name)
        os.makedirs(fdir)
        os.makedirs(adir)
        K = sv.gt_boxes.shape[0]
        for t in range(T):
            assert cv2.imwrite(
                os.path.join(fdir, f"{t:06d}.JPEG"), sv.frames[t]
            )
            objs = [
                # synth class k in [1, 4) → the k-th VID wnid, so the
                # imported class_index round-trips to k (WNID_TO_INDEX)
                (k, VID_WNIDS[int(sv.gt_classes[k]) - 1], sv.gt_boxes[k, t])
                for k in range(K)
            ]
            _write_xml(
                os.path.join(adir, f"{t:06d}.xml"), (HW[1], HW[0]), objs
            )
        names.append(name)
        synth.append(sv)
    return names, synth


def _write_ss_mat(path, sv, rng):
    """Selective-Search-style .mat: (T,) cell of (N, 4) yxyx 1-based boxes."""
    import scipy.io

    K = sv.gt_boxes.shape[0]
    cells = np.empty((T, 1), dtype=object)
    for t in range(T):
        rows = []
        for n in range(R):
            if n < 2 * K:  # GT-jittered so the pipeline has signal
                b = sv.gt_boxes[n % K, t] + rng.normal(0, 2, 4)
            else:
                x1 = rng.uniform(0, HW[1] - 24)
                y1 = rng.uniform(0, HW[0] - 24)
                b = [x1, y1, x1 + rng.uniform(12, 60), y1 + rng.uniform(12, 60)]
            x1, y1, x2, y2 = np.clip(
                b, 0, [HW[1] - 1, HW[0] - 1, HW[1] - 1, HW[0] - 1]
            )
            # yxyx, 1-based (MATLAB Selective Search convention)
            rows.append([y1 + 1, x1 + 1, max(y2, y1 + 2) + 1, max(x2, x1 + 2) + 1])
        cells[t, 0] = np.asarray(rows, np.float64)
    scipy.io.savemat(path, {"boxes": cells})


def test_devkit_to_submission_rehearsal(tmp_path, capsys):
    from vdetlib_tpu.cli import eval_vid, gen_box_proto, import_vid
    from vdetlib_tpu.cli import pipeline_tool, write_submission

    devkit = str(tmp_path / "devkit")
    protos = str(tmp_path / "protos")
    work = str(tmp_path / "work")
    names, synth = _make_devkit_from_synth(devkit)
    rng = np.random.default_rng(0)

    # 1. devkit → vid/annot protos
    assert import_vid.main([devkit, protos]) == 0
    for name in names:
        assert os.path.exists(os.path.join(protos, f"{name}.vid.json"))
        assert os.path.exists(os.path.join(protos, f"{name}.annot.json"))

    # 2. SS .mat → box protos (the reference's proposal on-ramp)
    for name, sv in zip(names, synth):
        mat = str(tmp_path / f"{name}.mat")
        _write_ss_mat(mat, sv, rng)
        assert gen_box_proto.main([
            mat, os.path.join(protos, f"{name}.box.json"),
            "--video", name,
        ]) == 0

    # imported class indices must round-trip the synth classes
    from vdetlib_tpu.protos import proto_load

    annot = proto_load(os.path.join(protos, f"{names[0]}.annot.json"))
    got = sorted({a["track"][0]["class_index"] for a in annot["annotations"]})
    want = sorted({int(c) for c in synth[0].gt_classes})
    assert got == want
    for a in annot["annotations"]:
        assert a["track"][0]["class_index"] == WNID_TO_INDEX[a["wnid"]]

    # 3. full staged pipeline over the imported protos, with eval
    assert pipeline_tool.main([
        protos, work, "--model", "tiny", "--num_classes", "31",
        "--image_hw", str(HW[0]), str(HW[1]), "--max_rois", str(R),
        "--eval",
    ]) == 0
    out = capsys.readouterr().out
    m = re.search(r"mAP = ([\d.]+) over 2 videos", out)
    assert m, out
    assert np.isfinite(float(m.group(1)))

    # 4. final det protos → ILSVRC submission file
    sub = str(tmp_path / "submission.txt")
    pairs = []
    for name in names:
        pairs += [
            os.path.join(protos, f"{name}.vid.json"),
            os.path.join(work, name, "final.json"),
        ]
    assert write_submission.main([sub, "--pairs", *pairs]) == 0
    lines = open(sub).read().splitlines()
    assert lines, "submission is empty"
    # coords may leave the frame slightly: MGP propagates boxes by mean
    # flow without clipping (shared by both engines; ILSVRC eval tolerates)
    pat = re.compile(
        r"^\d+ \d+ \d+\.\d{6} -?\d+\.\d{2} -?\d+\.\d{2} -?\d+\.\d{2} -?\d+\.\d{2}$"
    )
    for line in lines:
        assert pat.match(line), line
    # global frame numbering: second video's frames offset by T
    frames = [int(l.split()[0]) for l in lines]
    assert min(frames) >= 1 and max(frames) <= 2 * T
    cls = {int(l.split()[1]) for l in lines}
    assert all(1 <= c <= 30 for c in cls)

    # 5. standalone eval over (final det, imported annot) pairs
    ev = str(tmp_path / "eval.json")
    pairs = []
    for name in names:
        pairs += [
            os.path.join(work, name, "final.json"),
            os.path.join(protos, f"{name}.annot.json"),
        ]
    assert eval_vid.main(["--pairs", *pairs, "--json_out", ev]) == 0
    import json

    res = json.load(open(ev))
    assert np.isfinite(res["mAP"]) and 0.0 <= res["mAP"] <= 1.0
