"""The v1.0 / v2.0 model families: MLP weight predictors.

The reference evolved through four versions of one idea (SURVEY.md §2.1):

- v1.0: an MLP over a flattened 4x4x4 LR patch predicting the 16 weights
  (version1.0/utils/train.js:46-66, dense 256→128→16). The checked-in v1 is
  broken (its INPUT_FEATURES constant of 32*32*4 mismatches the generator's
  4x4x4 patches); :class:`PatchMLP` implements the evident intent with
  input = 64 patch values.
- v2.0: a per-output-pixel MLP over patch + (dx, dy) = 66 features
  (version2.0/utils/train.js:54-90): dense 64 → 32 → 16, SGD, he-normal
  init, max-norm(3) kernel constraint, and NO bias on the output layer.
  :class:`PixelMLP` reproduces that topology; the max-norm constraint is
  applied by :func:`apply_max_norm` after each optimizer step (Keras
  semantics: clip each output-unit's incoming-weight column to L2 norm 3).

Both consume features built by :func:`extract_pixel_features` — fully
vectorized (one gather of the 4x4 patch planes per image), in contrast to the
reference's per-pixel JS loops — and both feed the same
:func:`..ops.learned.apply_weights` op for reconstruction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class PatchMLP(nn.Module):
    """v1.0: flattened 4x4xC patch → 16 weights."""

    hidden: tuple[int, ...] = (128,)
    n_weights: int = 16

    @nn.compact
    def __call__(self, patch_flat):
        x = patch_flat
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(self.n_weights)(x)


class PixelMLP(nn.Module):
    """v2.0: 4x4xC patch + (dx, dy) → 16 weights; 64-32-16 dense stack,
    he-normal init, no bias on the output layer."""

    n_weights: int = 16

    @nn.compact
    def __call__(self, features):
        x = nn.relu(nn.Dense(64, kernel_init=nn.initializers.he_normal(),
                             name="dense1")(features))
        x = nn.relu(nn.Dense(32, kernel_init=nn.initializers.he_normal(),
                             name="dense2")(x))
        return nn.Dense(self.n_weights, use_bias=False,
                        kernel_init=nn.initializers.he_normal(),
                        name="dense_out")(x)


def apply_max_norm(params, max_norm: float = 3.0):
    """Keras maxNorm kernel constraint (version2.0/utils/train.js:60-66):
    clip each Dense kernel column (incoming weights of one unit) to L2 norm
    ``max_norm``. Applied after each update step."""

    def clip_kernel(path, leaf):
        if path[-1].key != "kernel" or leaf.ndim != 2:
            return leaf
        norms = jnp.linalg.norm(leaf, axis=0, keepdims=True)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norms, 1e-7))
        return leaf * scale

    return jax.tree_util.tree_map_with_path(clip_kernel, params)


def extract_pixel_features(lr_float, h_sr: int, w_sr: int, scale: int,
                           convention: str = "train"):
    """Per-HR-pixel features: the 4x4 LR patch around the base cell flattened
    (64 floats for RGBA) + (dx, dy) → [H_sr*W_sr, 66].

    Vectorized: the 16 patch planes are shifted slices of the edge-padded LR
    image (== the reference's clamped per-pixel gathers), phase-repeated to
    HR resolution.
    """
    from ..ops.learned import offset_map

    h_lr, w_lr, c = lr_float.shape
    padded = jnp.pad(lr_float, ((1, 2), (1, 2), (0, 0)), mode="edge")
    patches = jnp.stack([
        padded[dy:dy + h_lr, dx:dx + w_lr]
        for dy in range(4) for dx in range(4)
    ], axis=2)                                        # [Hl, Wl, 16, C]
    patches = patches.reshape(h_lr, w_lr, 16 * c)
    up = jnp.repeat(jnp.repeat(patches, scale, axis=0), scale, axis=1)
    up = up[:h_sr, :w_sr]
    off = offset_map(h_sr, w_sr, float(scale), convention)
    feats = jnp.concatenate([up, off], axis=-1)
    return feats.reshape(h_sr * w_sr, 16 * c + 2)


def super_resolve_mlp(model, params, lr_u8, scale: int = 4,
                      convention: str = "train", include_offsets: bool = True):
    """SR via an MLP weight predictor + apply_weights."""
    from ..ops.learned import apply_weights

    lr = jnp.asarray(lr_u8).astype(jnp.float32) / 255.0
    h_lr, w_lr = lr.shape[:2]
    h_sr, w_sr = h_lr * scale, w_lr * scale
    feats = extract_pixel_features(lr, h_sr, w_sr, scale, convention)
    if not include_offsets:
        feats = feats[:, :-2]
    w = model.apply(params, feats).reshape(h_sr, w_sr, 16)
    sr = apply_weights(jnp.asarray(lr_u8).astype(jnp.float32), w)
    return jnp.asarray(sr, dtype=jnp.uint8)
