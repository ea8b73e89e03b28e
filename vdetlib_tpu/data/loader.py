"""Host-side frame loading: threaded JPEG decode + resize, batched uint8.

Reference parity: ``common.imread`` (cv2, BGR) called inside per-frame loops
(SURVEY.md §3.1). Here decode runs in a thread pool overlapping device
compute, frames are resized on host to the detector's static shape (cv2, area
resampling like the reference's cv2.resize default for shrink), and cross the
PCIe boundary as uint8 — 4x less transfer than float32. Mean subtraction and
the float cast happen on device (nn/detector.py::preprocess_images).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from vdetlib_tpu.protos.accessors import frame_path_at
from vdetlib_tpu.utils.common import imread


def load_frame(path: str, target_hw: Optional[tuple[int, int]] = None):
    """Read one frame (BGR uint8), optionally resized to (H, W).

    Returns (frame, (scale_y, scale_x)) mapping original → resized coords.
    """
    img = imread(path)
    h, w = img.shape[:2]
    if target_hw is None or (h, w) == tuple(target_hw):
        return img, (1.0, 1.0)
    th, tw = target_hw
    interp = cv2.INTER_AREA if (th < h or tw < w) else cv2.INTER_LINEAR
    out = cv2.resize(img, (tw, th), interpolation=interp)
    return out, (th / h, tw / w)


class FrameLoader:
    """Threaded prefetching loader over a vid_proto's frames."""

    def __init__(
        self,
        vid_proto: dict,
        target_hw: Optional[tuple[int, int]] = None,
        num_threads: int = 8,
    ):
        self.vid_proto = vid_proto
        self.target_hw = target_hw
        self.frame_ids = [f["frame"] for f in vid_proto["frames"]]
        self._pool = ThreadPoolExecutor(max_workers=num_threads)

    def __len__(self):
        return len(self.frame_ids)

    def iter_frames(self) -> Iterator[tuple[int, np.ndarray, tuple[float, float]]]:
        paths = [frame_path_at(self.vid_proto, f) for f in self.frame_ids]
        futures = [
            self._pool.submit(load_frame, p, self.target_hw) for p in paths
        ]
        for fid, fut in zip(self.frame_ids, futures):
            img, scale = fut.result()
            yield fid, img, scale

    def iter_batches(
        self, batch_size: int
    ) -> Iterator[tuple[list[int], np.ndarray, list[tuple[float, float]]]]:
        """Yield (frame_ids, uint8 (B, H, W, 3), scales); last batch padded by
        repeating its final frame so shapes stay static."""
        ids, imgs, scales = [], [], []
        for fid, img, scale in self.iter_frames():
            ids.append(fid)
            imgs.append(img)
            scales.append(scale)
            if len(ids) == batch_size:
                yield ids, np.stack(imgs), scales
                ids, imgs, scales = [], [], []
        if ids:
            n_pad = batch_size - len(ids)
            imgs = imgs + [imgs[-1]] * n_pad
            yield ids, np.stack(imgs), scales

    def close(self):
        self._pool.shutdown(wait=False)


def batch_frames_from_array(
    frames: np.ndarray, batch_size: int
) -> Iterator[tuple[list[int], np.ndarray]]:
    """Batch an in-memory (T, H, W, 3) array; pads the tail by repetition."""
    T = frames.shape[0]
    for start in range(0, T, batch_size):
        idx = list(range(start, min(start + batch_size, T)))
        batch = frames[idx]
        if len(idx) < batch_size:
            pad = np.repeat(batch[-1:], batch_size - len(idx), axis=0)
            batch = np.concatenate([batch, pad], axis=0)
        yield idx, batch
