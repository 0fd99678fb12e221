"""Host-side image IO.

Fills the role sharp/pngjs/canvas play in the reference (decode/encode PNG,
raw RGBA buffers). Prefers the native C++ codec (runtime.native) when built;
falls back to PIL. Always returns HWC uint8 RGBA (ensureAlpha semantics,
reference bicubic_super_resolution.js:95-98).
"""

from __future__ import annotations

import pathlib

import numpy as np


def _native():
    try:
        from ..runtime import native
        return native if native.available() else None
    except Exception:
        return None


def load_rgba(path) -> np.ndarray:
    """Decode an image file to HWC uint8 RGBA."""
    n = _native()
    lower = str(path).lower()
    if n is not None and lower.endswith(".png"):
        arr = n.decode_png(path)
        if arr is not None:
            return arr
    if n is not None and lower.endswith((".jpg", ".jpeg")):
        arr = n.decode_jpeg(path)   # None for progressive → PIL below
        if arr is not None:
            return arr
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGBA"))


def load_rgb(path) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def save_png(path, img: np.ndarray) -> None:
    """Encode HWC uint8 (RGB/RGBA/gray) to PNG."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    img = np.ascontiguousarray(img)
    n = _native()
    if n is not None and img.ndim == 3 and img.shape[2] == 4:
        if n.encode_png(path, img):
            return
    from PIL import Image
    if img.ndim == 2:
        mode = "L"
    else:
        mode = {1: "L", 3: "RGB", 4: "RGBA"}[img.shape[2]]
        if img.shape[2] == 1:
            img = img[..., 0]
    Image.fromarray(img, mode=mode).save(path)
