"""ILSVRC VID importer tests on a synthetic devkit-layout tree."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from vdetlib_tpu.data.vid_dataset import (
    VID_WNIDS,
    WNID_TO_INDEX,
    import_vid_snippet,
    import_vid_split,
    parse_vid_xml,
)


def _write_xml(path, objs, size=(320, 240)):
    root = ET.Element("annotation")
    ET.SubElement(root, "folder").text = "VID"
    sz = ET.SubElement(root, "size")
    ET.SubElement(sz, "width").text = str(size[0])
    ET.SubElement(sz, "height").text = str(size[1])
    for tid, wnid, bbox in objs:
        o = ET.SubElement(root, "object")
        ET.SubElement(o, "trackid").text = str(tid)
        ET.SubElement(o, "name").text = wnid
        bb = ET.SubElement(o, "bndbox")
        for k, v in zip(("xmin", "ymin", "xmax", "ymax"), bbox):
            ET.SubElement(bb, k).text = str(v)
        ET.SubElement(o, "occluded").text = "0"
        ET.SubElement(o, "generated").text = "0"
    ET.ElementTree(root).write(path)


def _make_devkit(root, split="val", snippets=2, frames=3):
    import cv2

    names = []
    for s in range(snippets):
        name = f"ILSVRC2015_val_{s:08d}"
        fdir = os.path.join(root, "Data", "VID", split, name)
        adir = os.path.join(root, "Annotations", "VID", split, name)
        os.makedirs(fdir)
        os.makedirs(adir)
        for f in range(frames):
            img = np.full((240, 320, 3), 40 + 10 * f, np.uint8)
            cv2.imwrite(os.path.join(fdir, f"{f:06d}.JPEG"), img)
            objs = [
                (0, VID_WNIDS[2], [10 + f, 20, 60 + f, 80]),  # bear track
                (1, VID_WNIDS[6], [100, 100 + f, 180, 160 + f]),  # car track
            ]
            _write_xml(os.path.join(adir, f"{f:06d}.xml"), objs)
        names.append(name)
    return names


def test_parse_xml(tmp_path):
    p = str(tmp_path / "a.xml")
    _write_xml(p, [(3, VID_WNIDS[0], [1, 2, 3, 4])])
    objs = parse_vid_xml(p)
    assert objs == [
        {
            "trackid": 3,
            "wnid": VID_WNIDS[0],
            "bbox": [1.0, 2.0, 3.0, 4.0],
            "occluded": False,
            "generated": False,
        }
    ]


def test_import_snippet(tmp_path):
    _make_devkit(str(tmp_path), snippets=1)
    name = "ILSVRC2015_val_00000000"
    vid, annot = import_vid_snippet(
        os.path.join(tmp_path, "Data", "VID", "val", name),
        os.path.join(tmp_path, "Annotations", "VID", "val", name),
    )
    assert vid["video"] == name
    assert len(vid["frames"]) == 3
    assert vid["frames"][0]["frame"] == 1
    assert len(annot["annotations"]) == 2
    bear = annot["annotations"][0]
    assert bear["id"] == 0
    assert bear["track"][0]["class_index"] == WNID_TO_INDEX[VID_WNIDS[2]] == 3
    assert bear["track"][0]["class"] == "bear"
    assert [b["frame"] for b in bear["track"]] == [1, 2, 3]
    # bbox tracks the per-frame motion in the XMLs
    assert bear["track"][2]["bbox"][0] == 12.0


def test_import_split(tmp_path):
    _make_devkit(str(tmp_path), snippets=2)
    out = str(tmp_path / "protos")
    names = import_vid_split(str(tmp_path), out, split="val")
    assert len(names) == 2
    files = sorted(os.listdir(out))
    assert len([f for f in files if f.endswith(".vid.json")]) == 2
    assert len([f for f in files if f.endswith(".annot.json")]) == 2
    from vdetlib_tpu.protos import proto_load

    vid = proto_load(os.path.join(out, names[0] + ".vid.json"))
    assert os.path.exists(
        os.path.join(vid["root_path"], vid["frames"][0]["path"])
    )
    # limit
    names2 = import_vid_split(str(tmp_path), str(tmp_path / "p2"), limit=1)
    assert len(names2) == 1
