"""Ops for the learned-weights pipeline: subpixel offset maps, ground-truth
Keys-weight maps, and the 16-tap apply-weights resampling op.

Replaces, TPU-natively (vectorized jnp under jit instead of per-pixel JS
loops / 16 gatherND calls):

- offset generation  — data_generator.js:125-134 (training convention) and
  model_super_resolution.js:33-55 (inference convention; the reference is
  internally inconsistent between the two — we support both, defaulting to
  the training convention, and document the delta).
- GT weight maps     — data_generator.js:136-179.
- applyWeights       — model_super_resolution.js:68-124: per output pixel the
  weighted sum of its 4x4 LR neighborhood from base (floor(y/s)-1,
  floor(x/s)-1) with clamped indices; weight channel i maps to neighbor
  (dy=i//4, dx=i%4).

TPU formulation of applyWeights for integer scale: edge-pad the LR image by
(1, 2) in each axis (identical to index clamping), take the 16 shifted slices
(the 4x4 patch tensor at LR resolution), and contract with the HR-resolution
weight map reshaped to expose the phase grid:

    out[Y*s+py, X*s+px, c] = sum_i W[Y*s+py, X*s+px, i] * P[i, Y, X, c]

— one einsum, no gathers, fully fusable by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def cubic_keys_jnp(t, a: float = -0.5):
    t = jnp.abs(t)
    w1 = (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0
    w2 = a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a
    return jnp.where(t <= 1.0, w1, jnp.where(t <= 2.0, w2, 0.0))


def _axis_offsets(n_sr: int, scale: float, convention: str):
    x = jnp.arange(n_sr, dtype=jnp.float32)
    if convention == "train":
        # dx = frac((x+0.5)/s) - 0.5  in [-0.5, 0.5)
        xl = (x + 0.5) / scale
        return xl - jnp.floor(xl) - 0.5
    elif convention == "inference":
        # dx = x/s - (floor(x/s) + 0.5)
        xl = x / scale
        return xl - (jnp.floor(xl) + 0.5)
    raise ValueError(f"unknown offset convention {convention!r}")


@functools.partial(jax.jit, static_argnames=("h_sr", "w_sr", "scale", "convention"))
def offset_map(h_sr: int, w_sr: int, scale: float,
               convention: str = "train") -> jnp.ndarray:
    """[H_sr, W_sr, 2] float32 map of (dx, dy) subpixel offsets."""
    dx = _axis_offsets(w_sr, scale, convention)
    dy = _axis_offsets(h_sr, scale, convention)
    dxg = jnp.broadcast_to(dx[None, :], (h_sr, w_sr))
    dyg = jnp.broadcast_to(dy[:, None], (h_sr, w_sr))
    return jnp.stack([dxg, dyg], axis=-1)


def gt_weights_from_offsets(dx, dy, a: float = -0.5) -> jnp.ndarray:
    """16 normalized Keys weights per pixel from (dx, dy) offsets.

    Tap arguments per axis are (1+d, d, 1-d, 2-d); the 4x4 grid is flattened
    y-tap-major (i = 4*ytap + xtap). Zeros if the weight sum <= 1e-6.
    """
    def taps(d):
        return jnp.stack([cubic_keys_jnp(1.0 + d, a), cubic_keys_jnp(d, a),
                          cubic_keys_jnp(1.0 - d, a), cubic_keys_jnp(2.0 - d, a)],
                         axis=-1)                                   # [..., 4]
    tx = taps(dx)
    ty = taps(dy)
    grid = ty[..., :, None] * tx[..., None, :]                      # [..., 4y, 4x]
    w = grid.reshape(grid.shape[:-2] + (16,))
    s = w.sum(axis=-1, keepdims=True)
    return jnp.where(s > 1e-6, w / s, 0.0)


@functools.partial(jax.jit, static_argnames=("h_sr", "w_sr", "scale", "convention", "a"))
def gt_weight_map(h_sr: int, w_sr: int, scale: float,
                  convention: str = "train", a: float = -0.5) -> jnp.ndarray:
    """[H_sr, W_sr, 16] ground-truth weight map (separable per axis, so it is
    computed from the two 1-D offset vectors and broadcast)."""
    off = offset_map(h_sr, w_sr, scale, convention)
    return gt_weights_from_offsets(off[..., 0], off[..., 1], a=a)


def _apply_weights_phase(lr: jnp.ndarray, weights: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Phase-planar apply: one FMA chain per (row-phase, col-phase) plane at
    LR resolution, channels planar (CHW) so every elementwise op runs on
    [H_lr, W_lr] arrays with a full-width minor dim.

    The round-1 formulation (einsum "hawqi,ihwc->hawqc") asked XLA for a
    per-pixel 16x16x4 contraction — it lowered as tiny batched matmuls and
    measured 31 ms at 0020 geometry on a v5e; this layout runs the same
    FLOPs in 4.4 ms (docs/PERF_NOTES.md round 2, "phase-planar apply").
    Tap order matches _apply_weights_gather (row-major taps), so the two
    agree to fp-associativity noise.
    """
    h_lr, w_lr, c = lr.shape
    h_sr, w_sr, _ = weights.shape
    s = int(scale)
    padded = jnp.pad(lr, ((1, 2), (1, 2), (0, 0)), mode="edge")
    chw = jnp.transpose(padded, (2, 0, 1))              # [C, Hl+3, Wl+3]
    wr = weights.reshape(h_lr, s, w_lr, s, 16)
    cols = []
    for ay in range(s):
        planes = []
        for qx in range(s):
            acc = None
            for i in range(16):
                dy, dx = i // 4, i % 4
                tap = chw[:, dy:dy + h_lr, dx:dx + w_lr]     # [C, Hl, Wl]
                wi = wr[:, ay, :, qx, i][None]               # [1, Hl, Wl]
                t = wi * tap
                acc = t if acc is None else acc + t
            planes.append(acc)
        cols.append(planes)
    grid = jnp.stack([jnp.stack(r, axis=-1) for r in cols], axis=2)
    return grid.transpose(1, 2, 3, 4, 0).reshape(h_sr, w_sr, c)


def _apply_weights_gather(lr: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    h_lr, w_lr, _ = lr.shape
    h_sr, w_sr, _ = weights.shape
    scale_y = h_sr / h_lr
    scale_x = w_sr / w_lr
    y_base = jnp.floor(jnp.arange(h_sr) / scale_y).astype(jnp.int32) - 1
    x_base = jnp.floor(jnp.arange(w_sr) / scale_x).astype(jnp.int32) - 1
    out = jnp.zeros((h_sr, w_sr, lr.shape[2]), jnp.float32)
    for r in range(4):
        rows = jnp.take(lr, jnp.clip(y_base + r, 0, h_lr - 1), axis=0)
        for cx in range(4):
            tap = jnp.take(rows, jnp.clip(x_base + cx, 0, w_lr - 1), axis=1)
            out = out + tap * weights[..., 4 * r + cx:4 * r + cx + 1]
    return out


@jax.jit
def _apply_round(out):
    # jnp.round = round-half-to-even, matching the learned path's tf.round
    # (model_super_resolution.js:121). Note the reference itself rounds
    # differently here than in its classical kernels (Math.round = half-up);
    # each of our paths matches its counterpart's semantics.
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.int32)


def apply_weights(lr_img, weights, *, rounded: bool = True):
    """Apply a [H_sr, W_sr, 16] weight map to an LR image (values 0..255).

    Returns the SR image; with ``rounded`` (default, matching the reference's
    clipByValue(0,255).round().cast('int32')) an int32 array, else float32.
    """
    lr = jnp.asarray(lr_img).astype(jnp.float32)
    weights = jnp.asarray(weights)
    h_lr, w_lr = lr.shape[:2]
    h_sr, w_sr = weights.shape[:2]
    if h_sr % h_lr == 0 and w_sr % w_lr == 0 and h_sr // h_lr == w_sr // w_lr:
        out = _apply_weights_phase(lr, weights, h_sr // h_lr)
    else:
        out = _apply_weights_gather(lr, weights)
    return _apply_round(out) if rounded else out
