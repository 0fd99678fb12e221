"""Learned-model SR inference — the ``npm run msr`` flow
(model_super_resolution.js:125-220) as one jit-compiled program:

  offsets (inference convention) → model.predict([img/255, offsets]) →
  apply_weights (16-tap neighborhood sum) → clip/round u8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.learned import apply_weights, offset_map


@functools.partial(jax.jit, static_argnames=("model", "scale", "convention"))
def _predict_weights(model, params, lr_f32, scale, convention):
    h, w = lr_f32.shape[:2]
    off = offset_map(h * scale, w * scale, float(scale), convention)
    pred = model.apply(params, lr_f32[None], off[None])
    return pred[0]


def predict_weights(model, params, lr_u8, scale: int = 4,
                    convention: str = "inference"):
    """[H_lr,W_lr,C] uint8 → [H_sr,W_sr,16] predicted weights."""
    lr_f32 = jnp.asarray(lr_u8).astype(jnp.float32) / 255.0
    return _predict_weights(model, params, lr_f32, scale, convention)


def super_resolve(model, params, lr_u8, scale: int = 4,
                  convention: str = "inference"):
    """Full learned SR: uint8 LR in, uint8 SR out.

    ``convention`` defaults to the reference's inference-time offsets
    (model_super_resolution.js:33-55); use "train" for self-consistent
    offsets matching the training data (§2.3 of SURVEY.md documents the
    reference's inconsistency).
    """
    weights = predict_weights(model, params, lr_u8, scale, convention)
    sr = apply_weights(jnp.asarray(lr_u8).astype(jnp.float32), weights)
    return jnp.asarray(sr, dtype=jnp.uint8)


@functools.partial(jax.jit, static_argnames=("model",))
def _apply_direct(model, params, x):
    return model.apply(params, x)


def super_resolve_direct(model, params, lr_u8):
    """Direct-regression SR models (ESPCN family): float [0,1] in/out.

    The model is a static jit argument (flax Modules hash by config), so the
    compiled program is reused across calls — `jax.jit(model.apply)` would
    re-trace every time because bound methods are fresh objects per access."""
    x = jnp.asarray(lr_u8).astype(jnp.float32) / 255.0
    y = _apply_direct(model, params, x[None])[0]
    return jnp.clip(jnp.floor(y * 255.0 + 0.5), 0, 255).astype(jnp.uint8)
