"""Adaptive bicubic ops.

1. :func:`adaptive_resize` — device version of the reference's
   ``ultimateBicubicInterpolation`` (version3.0/utils/
   adaptive_bicubic_super_resolution.js:10-145): Keys weights modulated per
   tap by local luma contrast. Unlike the classical kernels this is NOT
   separable (the modulation couples the axes), so the TPU formulation is
   phase decomposition: for an integer scale S every output phase (py, px)
   shares its tap geometry, so the whole image is computed as S^2 vectorized
   [H_lr, W_lr] passes over 16 pre-sliced tap planes, then phase-interleaved.
   All JS quirks are preserved for parity with the float64 oracle:

   * cubic weights quantize |t| to 2 decimals (the JS Map memo keyed on
     ``toFixed(2)``, :28-42);
   * weights are evaluated at *clamped* tap positions (:112-119);
   * the modulation skips the tap that coincides with the center pixel by
     *position equality* (:122), which at image borders can also exempt
     clamped duplicates — reproduced via per-axis equality masks;
   * region classification (5x5 luma variance, flat<10 / edge>50, :45-66)
     and the three modulation laws (:69-89), BT.709 luma on raw u8 (:21-25).

2. :func:`adaptive_gt_factors` — the v4.0 data-generation variant
   (version4.0/utils/data_generator.js:196-244): per-tap factors from a 4x4
   LR luma window (contrast = max-min on [0,1] luma; edge>0.3, flat<0.1),
   used to modulate GT weights before normalization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.kernels import cubic_keys
from .resize import round_u8


def _cubic_memo_np(t, a: float = -0.5):
    """Keys cubic at |t| rounded to 2 decimals (JS toFixed(2) memo), float64.

    Decimal-vs-binary rounding caveat documented in
    core/oracle.py::adaptive_bicubic_oracle.cubic_memo — same approximation,
    same (sub-LSB) worst case.
    """
    t = np.abs(np.asarray(t, np.float64))
    t = np.floor(t * 100.0 + 0.5) / 100.0
    return cubic_keys(t, a=a)


def luma_bt709(img_f32_rgb_first3):
    r, g, b = (img_f32_rgb_first3[..., i] for i in range(3))
    return r * 0.2126 + g * 0.7152 + b * 0.0722


def _variance5x5(luma):
    """5x5 clamped-window variance (analyzeLocalContrast, radius 2)."""
    p = jnp.pad(luma, 2, mode="edge")
    h, w = luma.shape
    s = jnp.zeros_like(luma)
    sq = jnp.zeros_like(luma)
    for dy in range(5):
        for dx in range(5):
            v = p[dy:dy + h, dx:dx + w]
            s = s + v
            sq = sq + v * v
    return (sq - s * s / 25.0) / 25.0


@functools.partial(jax.jit, static_argnames=("scale", "a"))
def _adaptive_resize_u8(img, scale: int, a: float):
    h, w, c = img.shape
    x = img.astype(jnp.float32)
    luma = luma_bt709(x)

    var = _variance5x5(luma)
    is_flat = var < 10.0
    is_edge = var > 50.0

    # tap planes: padded by (1 top/left, 2 bottom/right) == index clamping
    xp = jnp.pad(x, ((1, 2), (1, 2), (0, 0)), mode="edge")
    lp = jnp.pad(luma, ((1, 2), (1, 2)), mode="edge")
    tap_pix = [[xp[n:n + h, m:m + w] for m in range(4)] for n in range(4)]
    tap_lum = [[lp[n:n + h, m:m + w] for m in range(4)] for n in range(4)]

    # center variants: offsets {0, 1} per axis (round(ox) is base or base+1)
    lp1 = jnp.pad(luma, ((0, 1), (0, 1)), mode="edge")
    cen_lum = [[lp1[oy:oy + h, ox:ox + w] for ox in range(2)] for oy in range(2)]
    fp = jnp.pad(is_flat, ((0, 1), (0, 1)), mode="edge")
    ep = jnp.pad(is_edge, ((0, 1), (0, 1)), mode="edge")
    cen_flat = [[fp[oy:oy + h, ox:ox + w] for ox in range(2)] for oy in range(2)]
    cen_edge = [[ep[oy:oy + h, ox:ox + w] for ox in range(2)] for oy in range(2)]

    # per-axis clamped tap positions & weights (exact JS border semantics).
    # Host-side NumPy float64 at trace time — matches the oracle's JS-double
    # math exactly instead of re-deriving the weights in device float32.
    def axis_geometry(n_in, phase_over_scale, tap):
        base = np.arange(n_in, dtype=np.float64)         # LR cell index
        ox = base + phase_over_scale
        pos = np.clip(base + tap - 1, 0, n_in - 1)
        wgt = _cubic_memo_np(ox - pos, a).astype(np.float32)
        return pos.astype(np.int64), wgt

    def center_offset(phase_over_scale):
        # JS Math.round half-up of p/s in [0,1): 1 if p/s >= 0.5 else 0
        return int(phase_over_scale >= 0.5)

    # The modulation factor F (laws + region select + center-tap exemption)
    # depends only on the CENTER-VARIANT (cy_off, cx_off) and the tap — not
    # on the phase — so the 16 phases share their group's 16 F maps: 64 maps
    # computed instead of 256 (the round-1 implementation re-derived the
    # laws per phase-tap, 4x the work and the reason it ran at 0.96 GPix/s).
    # The positional-equality exemption is also group-level: it compares
    # CLAMPED tap rows/cols to the clamped center row/col, which depend on
    # (tap, cy_off) per axis only.
    phase_groups = {}
    for p in range(scale):
        phase_groups.setdefault(center_offset(p / scale), []).append(p)

    out_planes = [[None] * scale for _ in range(scale)]
    for cy_off, pys in phase_groups.items():
        for cx_off, pxs in phase_groups.items():
            cl = cen_lum[cy_off][cx_off]
            flat_r = cen_flat[cy_off][cx_off]
            edge_r = cen_edge[cy_off][cx_off]
            cy_pos = np.clip(np.arange(h) + cy_off, 0, h - 1)
            cx_pos = np.clip(np.arange(w) + cx_off, 0, w - 1)
            fmaps = [[None] * 4 for _ in range(4)]
            for n in range(4):
                eq_y = np.clip(np.arange(h) + n - 1, 0, h - 1) == cy_pos
                for m in range(4):
                    eq_x = np.clip(np.arange(w) + m - 1, 0, w - 1) == cx_pos
                    ld = jnp.abs(cl - tap_lum[n][m])
                    edge_f = 1.0 + 0.5 * jnp.minimum(1.0, ld / 50.0)
                    flat_f = jnp.maximum(0.5, 1.0 - ld / 30.0)
                    text_f = 0.8 + 0.4 * jnp.exp(-ld / 20.0)
                    fmap = jnp.where(edge_r, edge_f,
                                     jnp.where(flat_r, flat_f, text_f))
                    eq = jnp.asarray(eq_y)[:, None] & jnp.asarray(eq_x)[None, :]
                    fmaps[n][m] = jnp.where(eq, 1.0, fmap)

            for py in pys:
                fy = py / scale
                wys = [jnp.asarray(axis_geometry(h, fy, n)[1])[:, None]
                       for n in range(4)]
                for px in pxs:
                    fx = px / scale
                    wxs = [jnp.asarray(axis_geometry(w, fx, m)[1])[None, :]
                           for m in range(4)]
                    acc = jnp.zeros((h, w, c), jnp.float32)
                    wsum = jnp.zeros((h, w), jnp.float32)
                    for n in range(4):
                        for m in range(4):
                            wgt = wys[n] * wxs[m] * fmaps[n][m]
                            acc = acc + wgt[..., None] * tap_pix[n][m]
                            wsum = wsum + wgt
                    out_planes[py][px] = acc / wsum[..., None]

    # interleave phases: [S, S, H, W, C] -> [H*S, W*S, C]
    ph = jnp.stack([jnp.stack(r) for r in out_planes])   # [Sy, Sx, H, W, C]
    out = ph.transpose(2, 0, 3, 1, 4).reshape(h * scale, w * scale, c)
    return round_u8(out)


def adaptive_resize(img_u8, scale: int, a: float = -0.5, *,
                    impl: str = "auto"):
    """Adaptive bicubic SR of an HWC uint8 image (integer scale).

    ``impl``: "auto" (fused Pallas kernel on TPU, jnp elsewhere),
    "pallas", or "jnp"."""
    if float(scale) != int(scale) or scale < 1:
        raise ValueError("adaptive_resize requires an integer upscale factor")
    img = jnp.asarray(img_u8)
    if img.dtype != jnp.uint8:
        raise ValueError("adaptive_resize expects uint8 input")
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if impl == "pallas":
        from .pallas_adaptive import adaptive_resize_pallas
        return adaptive_resize_pallas(img, int(scale), float(a))
    return _adaptive_resize_u8(img, int(scale), float(a))


@functools.partial(jax.jit, static_argnames=("scale",))
def adaptive_gt_factors(lr_float, scale: int):
    """v4.0 per-tap adaptive factors, upsampled to [H_sr, W_sr, 16].

    ``lr_float`` is the [H_lr, W_lr, >=3] float image in [0,1]; factors are a
    function of the LR base cell only (all S^2 HR phases of a cell share them),
    so they are computed at LR resolution and phase-repeated.
    """
    h, w = lr_float.shape[:2]
    luma = luma_bt709(lr_float.astype(jnp.float32))
    lp = jnp.pad(luma, ((1, 2), (1, 2)), mode="edge")
    taps = jnp.stack([lp[n:n + h, m:m + w]
                      for n in range(4) for m in range(4)])   # [16, H, W]
    mx = taps.max(axis=0)
    mn = taps.min(axis=0)
    contrast = mx - mn
    is_edge = contrast > 0.3
    is_flat = contrast < 0.1
    ld = jnp.abs(taps - luma[None])
    edge_f = 1.0 + 0.5 * (1.0 - ld / 0.3)
    flat_f = jnp.maximum(0.7, 1.0 - ld / 0.2)
    text_f = 0.8 + 0.4 * jnp.exp(-ld / 0.15)
    f = jnp.where(is_edge[None], edge_f,
                  jnp.where(is_flat[None], flat_f, text_f))   # [16, H, W]
    f = jnp.moveaxis(f, 0, -1)                                # [H, W, 16]
    f = jnp.repeat(jnp.repeat(f, scale, axis=0), scale, axis=1)
    return f
