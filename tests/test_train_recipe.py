"""Round-2 training recipe: class-coded synth appearance + augmentation.

VERDICT r1 item 6 context: the round-1 synthetic task assigned object
appearance independently of the class label, so classification was only
learnable by memorizing training objects — the overfit mechanism. The
class-coded appearance mode makes the label recoverable across videos, and
photometric/flip augmentation breaks absolute-color memorization.
"""

from dataclasses import dataclass

import numpy as np

from vdetlib_tpu.data.synth import SynthConfig, make_video
from vdetlib_tpu.nn.train import augment_photometric, make_training_batch


def _mean_colors(sv):
    """Per-object mean BGR color inside the t=0 ground-truth box."""
    out = []
    for k in range(sv.gt_boxes.shape[0]):
        x1, y1, x2, y2 = sv.gt_boxes[k, 0].astype(int)
        out.append(sv.frames[0, y1 : y2 + 1, x1 : x2 + 1].mean(axis=(0, 1)))
    return np.stack(out)


def test_class_coded_appearance_is_class_separable():
    cfg = lambda seed: SynthConfig(
        num_frames=2, num_objects=5, num_classes=3, seed=seed,
        class_coded_appearance=True,
    )
    a, b = make_video(cfg(1)), make_video(cfg(2))
    colors = np.concatenate([_mean_colors(a), _mean_colors(b)])
    classes = np.concatenate([a.gt_classes, b.gt_classes])
    same, diff = [], []
    for i in range(len(classes)):
        for j in range(i + 1, len(classes)):
            d = float(np.linalg.norm(colors[i] - colors[j]))
            (same if classes[i] == classes[j] else diff).append(d)
    assert same and diff  # both kinds of pairs exist at these seeds
    # same-class objects look alike across videos; different classes do not
    assert np.mean(same) < np.mean(diff) * 0.5


def test_legacy_appearance_unchanged_by_flag_default():
    """Default config must keep the original round-1 pixels (fixtures)."""
    sv_default = make_video(SynthConfig(num_frames=2, seed=3))
    sv_explicit = make_video(
        SynthConfig(num_frames=2, seed=3, class_coded_appearance=False)
    )
    np.testing.assert_array_equal(sv_default.frames, sv_explicit.frames)


def test_augment_photometric_valid_and_nontrivial():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(4, 32, 48, 3)).astype(np.uint8)
    out = augment_photometric(imgs, rng)
    assert out.shape == imgs.shape and out.dtype == np.uint8
    assert not np.array_equal(out, imgs)


@dataclass
class _Opts:
    batch_size: int
    max_rois: int
    augment: bool = True


def test_augmented_batch_flips_images_and_boxes_together():
    """Foreground ROIs must still cover bright object pixels after the flip
    — catches image-flipped-but-boxes-not (and vice versa)."""
    sv = make_video(
        SynthConfig(num_frames=8, height=96, width=128, num_objects=2, seed=4)
    )
    rng = np.random.default_rng(5)
    batch = make_training_batch(sv, rng, _Opts(8, 16), num_classes=4)
    images = np.asarray(batch["images_u8"]).astype(np.float32)
    rois = np.asarray(batch["rois"])
    labels = np.asarray(batch["labels"])
    checked = 0
    for b in range(images.shape[0]):
        frame_mean = images[b].mean()
        for n in range(rois.shape[1]):
            if labels[b, n] <= 0:
                continue
            x1, y1, x2, y2 = rois[b, n].astype(int)
            patch = images[b, y1 : y2 + 1, x1 : x2 + 1]
            if patch.size == 0:
                continue
            # objects are drawn bright (>=100-ish) over a dark background
            assert patch.mean() > frame_mean + 10
            checked += 1
    assert checked >= 8  # augmentation kept plenty of foreground ROIs


def test_augmented_targets_match_unaugmented_geometry():
    """With augment off, the batch builder is unchanged (regression guard)."""
    sv = make_video(SynthConfig(num_frames=6, height=96, width=128, seed=6))
    b1 = make_training_batch(
        sv, np.random.default_rng(7), _Opts(4, 12, augment=False), 4
    )
    b2 = make_training_batch(sv, np.random.default_rng(7), _Opts(4, 12, False), 4)
    np.testing.assert_array_equal(
        np.asarray(b1["images_u8"]), np.asarray(b2["images_u8"])
    )
    np.testing.assert_array_equal(np.asarray(b1["rois"]), np.asarray(b2["rois"]))
