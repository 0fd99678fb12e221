"""In-memory training data without materializing offset/Y tensors.

Observation the reference misses: with the training convention
(data_generator.js:125-134) the subpixel offsets — and therefore the GT
weight maps — are purely functions of (x mod S, y mod S): they are SxS tiles
repeated over the image (no clamping enters GT generation). Storing
[H_sr, W_sr, 16] float32 per image (~180 MB for a 2K frame) is 5 orders of
magnitude of redundancy. This loader keeps only the LR images in memory and
the trainer synthesizes the target tiles per patch — exactly equal to what
the stored dataset would contain for scale-aligned crops.

The .bin pipeline (data/div2k.py) still exists for on-disk format parity.
"""

from __future__ import annotations

import pathlib

import numpy as np

from ..ops.downsample import downsample_np
from ..utils import imageio
from .div2k import IMAGE_EXTS, align_crop


def load_hr_dir(hr_dir, *, scale: int = 4, down_method: str = "cubic",
                limit: int | None = None, keep_hr: bool = False,
                log=print) -> dict[str, dict]:
    """HR image dir → {id: {"X": LR float32 HWC/255 [, "HR": uint8]}}."""
    hr_dir = pathlib.Path(hr_dir)
    files = sorted(p for p in hr_dir.iterdir() if p.suffix.lower() in IMAGE_EXTS)
    if limit is not None:
        files = files[:limit]
    out = {}
    for p in files:
        try:
            hr = align_crop(imageio.load_rgba(p), scale)
            lr = downsample_np(hr, float(scale), down_method)
            rec = {"X": lr.astype(np.float32) / 255.0}
            if keep_hr:
                rec["HR"] = hr
            out[p.stem] = rec
        except Exception as e:
            log(f"skip {p.name}: {e}")
    return out


def target_tiles(patch_lr: int, scale: int, a: float = -0.5):
    """(offset, Y) maps for a scale-aligned patch of patch_lr LR pixels —
    identical to any aligned crop of the full-image maps."""
    from ..ops.learned import gt_weight_map, offset_map
    n = patch_lr * scale
    off = np.asarray(offset_map(n, n, float(scale), "train"))
    y = np.asarray(gt_weight_map(n, n, float(scale), "train", a))
    return off, y
