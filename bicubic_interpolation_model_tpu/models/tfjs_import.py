"""Import the reference's TFJS layers-format checkpoints
(model/<run>/model.json + weights.bin, e.g. model/1e-3-30) into
:class:`..models.weight_predictor.WeightPredictor` params.

Format: model.json carries ``weightsManifest`` — an ordered list of tensors
(name, shape, dtype) concatenated raw in weights.bin (float32 LE). The
conv kernels are [kh, kw, in, out] (same as flax); the transpose-conv kernel
is [kh, kw, out, in], which equals our PixelShuffleUpsample layout directly.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

# manifest tensor name → (flax module name, param name)
_NAME_MAP = {
    "conv2d_Conv2D1": "conv_in",
    "conv2d_Conv2D2": "conv_res",
    "conv2d_transpose_Conv2DTranspose1": "upsample",
    "conv2d_Conv2D3": "conv_att",
    "conv2d_Conv2D4": "conv_off",
    "conv2d_Conv2D5": "conv_out",
}


def read_tfjs_weights(model_dir) -> dict[str, np.ndarray]:
    """Parse model.json + weights.bin into {tensor_name: array}."""
    model_dir = pathlib.Path(model_dir)
    spec = json.loads((model_dir / "model.json").read_text())
    tensors = {}
    for group in spec["weightsManifest"]:
        buf = b"".join((model_dir / p).read_bytes() for p in group["paths"])
        off = 0
        for wspec in group["weights"]:
            if wspec["dtype"] != "float32":
                raise ValueError(f"unsupported dtype {wspec['dtype']}")
            n = int(np.prod(wspec["shape"])) if wspec["shape"] else 1
            arr = np.frombuffer(buf, dtype="<f4", count=n, offset=off)
            tensors[wspec["name"]] = arr.reshape(wspec["shape"]).copy()
            off += n * 4
        if off != len(buf):
            raise ValueError(f"weights.bin size mismatch: {off} != {len(buf)}")
    return tensors


def load_weight_predictor(model_dir):
    """Returns (model, params) with the checkpoint's weights."""
    from .weight_predictor import WeightPredictor

    tensors = read_tfjs_weights(model_dir)
    params = {}
    for tfjs_name, flax_name in _NAME_MAP.items():
        params[flax_name] = {
            "kernel": tensors[f"{tfjs_name}/kernel"],
            "bias": tensors[f"{tfjs_name}/bias"],
        }
    return WeightPredictor(scale=4), {"params": params}


def reference_model_names(reference_root="/root/reference/version3.0") -> list[str]:
    d = pathlib.Path(reference_root) / "model"
    if not d.exists():
        return []
    return sorted(p.name for p in d.iterdir() if (p / "model.json").exists())
