"""Checkpoint save/load.

The reference persists TFJS layers format (model.json + weights.bin,
train.js:239 / model_super_resolution.js:197); here the native format is a
flax msgpack params file + a JSON sidecar (model class, scale, history), and
:mod:`..models.tfjs_import` reads the reference's checkpoints for parity.
"""

from __future__ import annotations

import json
import pathlib

import jax
from flax import serialization


def save(ckpt_dir, params, *, meta: dict | None = None) -> pathlib.Path:
    d = pathlib.Path(ckpt_dir)
    d.mkdir(parents=True, exist_ok=True)
    params = jax.device_get(params)
    (d / "params.msgpack").write_bytes(serialization.to_bytes(params))
    (d / "meta.json").write_text(json.dumps(meta or {}, indent=2))
    return d


def load(ckpt_dir, params_template):
    """Restore params into the structure of ``params_template``."""
    d = pathlib.Path(ckpt_dir)
    raw = (d / "params.msgpack").read_bytes()
    params = serialization.from_bytes(params_template, raw)
    meta = {}
    mp = d / "meta.json"
    if mp.exists():
        meta = json.loads(mp.read_text())
    return params, meta
