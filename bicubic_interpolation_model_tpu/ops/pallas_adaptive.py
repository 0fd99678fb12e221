"""Fused Pallas kernel for adaptive bicubic (VERDICT r1 item 2).

The adaptive interpolator (reference version3.0/utils/
adaptive_bicubic_super_resolution.js:10-145) is NOT separable: each tap's
Keys weight is modulated by the luma contrast between the tap and the output
pixel's center, with the modulation law chosen by the center's 5x5-variance
region class. The jnp phase-decomposed implementation materializes dozens of
HW-resolution intermediates in HBM; this kernel keeps the whole computation
(variance, region classes, modulation laws, 16-tap weighted sum,
normalization, rounding) in VMEM per tile.

Round-2 "vA2" redesign (the first cut measured 0.73 GPix/s HWC / 2.0 planar
— slower than the jnp path end-to-end; see docs/PERF_NOTES.md):

* TWO-PHASE body. Phase A walks the 16 taps x (center-variant cy,cx)
  combinations ONCE, evaluates the modulation law at LR-row resolution,
  expands to interleaved output rows, folds the per-axis row weights in
  (G1 = wy*F, G2 = (wy*eqy)*(1-F)) and parks the 2*16*n_cx maps in VMEM
  scratch. Phase B then runs one column-phase plane at a time with only
  FIVE live accumulators (4 channel accs + the weight sum) — the first cut
  kept 10 live [rows, wstep] arrays across a 32-iteration loop and spilled
  vregs exactly like the round-1 phase kernel's 16-plane stack did.
* the modulation laws in min/max form (edge: min(1.5, 1 + d/100); flat:
  max(0.5, 1 - d/30); texture: 0.8 + 0.4*exp(-d/20)) — 3 ops each instead
  of the literal 1 + 0.5*min(1, d/50) chains.
* channels are packed into one uint32 lane at the end of phase B
  (v0 | v1<<8 | v2<<16 | v3<<24), so the kernel output is [S, R, X] u32 and
  the HWC epilogue is a plain 3-D u32 transpose + bitcast — the first cut's
  [S, C, R, X] u8 output needed a 4-D transpose with TWO size-4 minors,
  which cost 2.4 ms at 0020 geometry (more than the kernel itself).
* rows stay at interleaved output-row resolution via sublane repeat
  (the vR phase-kernel trick); the row-phase-dependent center variant is
  blended with one host-built phase mask; channels planar INSIDE the body
  (lane-dim broadcasts don't lower) but interleaved in the output word.

Edge handling: inputs are edge-REPLICATE padded (adaptive needs the clamped
PIXEL VALUES — for luma diffs and the variance window — not just folded
weights, so zero-padding + weight-folding as in the phase kernel is not
enough). Mosaic note: select() with BOOL VALUES fails (i8->i1 trunc) —
region masks are carried as f32 and compared at use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .adaptive import _cubic_memo_np
from .pallas_resize import _round_up

_LEFT = 2          # window rows/cols before the base cell (variance reach)
_HALO = 5          # extra rows/cols a tile needs beyond its own slab


def _axis_vectors(n_in: int, scale: int, a: float):
    """Per-axis host arrays (float64 → float32), exact JS border semantics.

    Returns (w_i [n_in*S, 4], eq_i [n_in*S, 4]) in interleaved layout
    (row or = b*S + phase) where w_i[or, n] is the Keys weight evaluated at
    the CLAMPED tap position and eq_i[or, n] is 1.0 where that clamped tap
    position equals the clamped center position (the JS modulation
    exemption, adaptive_bicubic_super_resolution.js:122).
    """
    base = np.arange(n_in, dtype=np.float64)
    w = np.zeros((n_in, scale, 4), np.float32)
    eq = np.zeros((n_in, scale, 4), np.float32)
    for p in range(scale):
        f = p / scale
        ox = base + f
        cen = np.clip(base + int(f >= 0.5), 0, n_in - 1)
        for n in range(4):
            pos = np.clip(base + n - 1, 0, n_in - 1)
            w[:, p, n] = _cubic_memo_np(ox - pos, a)
            eq[:, p, n] = (pos == cen).astype(np.float32)
    return (w.reshape(n_in * scale, 4), eq.reshape(n_in * scale, 4))


def _adaptive_kernel(wyi_ref, eqy_ref, wx_ref,
                     xa, xb, xc, xd, la, lb, lc, ld_,
                     cy_ref, out_ref, fs_ref, *, scale, step, wstep, c):
    s = scale
    rows = step * s
    n_cx = 2 if s > 1 else 1
    cys = (0, 1) if s > 1 else (0,)

    def window(a_ref, b_ref, c_ref, d_ref, lead):
        top = jnp.concatenate([a_ref[lead], b_ref[lead][:, :_HALO]], axis=1)
        bot = jnp.concatenate([c_ref[lead][:_HALO], d_ref[lead][:_HALO, :_HALO]],
                              axis=1)
        return jnp.concatenate([top, bot], axis=0)   # [step+5, wstep+5]

    lwin = window(la, lb, lc, ld_, 0)

    # 5x5 variance at candidate center positions (rel rows 2..step+2,
    # rel cols 2..wstep+2) — region classes of analyzeLocalContrast
    vh, vw = step + 1, wstep + 1
    sm = None
    sq = None
    for dy in range(5):
        for dx in range(5):
            v = lwin[dy:dy + vh, dx:dx + vw]
            sm = v if sm is None else sm + v
            sq = v * v if sq is None else sq + v * v
    var = (sq - sm * sm / 25.0) / 25.0
    # region masks as f32 0/1 (Mosaic cannot select() BOOL VALUES)
    is_flat = (var < 10.0).astype(jnp.float32)
    is_edge = (var > 50.0).astype(jnp.float32)

    cym = cy_ref[:, 0][:, None] > 0.5                 # [rows, 1] bool

    # ---- phase A: modulation maps, row weights folded in, to scratch ----
    # fs[( g2, cx, n, m )] with linear index ((g*n_cx + cx)*4 + n)*4 + m
    # G1 = wy * F (interleaved rows), G2 = (wy*eqy) * (1 - F).
    wy_n = [wyi_ref[:, n][:, None] for n in range(4)]
    wye_n = [eqy_ref[:, n][:, None] for n in range(4)]
    variants = []                                     # per cx: (cl, fl, ed)
    for cx in range(n_cx):
        per_cy = []
        for cy in cys:
            cl = lwin[2 + cy:2 + cy + step, 2 + cx:2 + cx + wstep]
            fl = is_flat[cy:cy + step, cx:cx + wstep]
            ed = is_edge[cy:cy + step, cx:cx + wstep]
            per_cy.append((cl, fl > 0.5, ed > 0.5))
        variants.append(per_cy)

    # m outer so the expensive LANE-shifted column slice happens 4x, with
    # the 16 (n, cx) bodies reading cheap sublane slices of it
    for m in range(4):
        lcol = lwin[:, m + 1:m + 1 + wstep]           # [step+5, wstep]
        for n in range(4):
            tl = lcol[n + 1:n + 1 + step]
            for cx in range(n_cx):
                f_by_cy = []
                for k, cy in enumerate(cys):
                    cl, flm, edm = variants[cx][k]
                    ldm = jnp.abs(cl - tl)
                    edge_f = jnp.minimum(1.5, 1.0 + ldm * 0.01)
                    flat_f = jnp.maximum(0.5, 1.0 - ldm * (1.0 / 30.0))
                    text_f = 0.8 + 0.4 * jnp.exp(ldm * (-1.0 / 20.0))
                    f = jnp.where(edm, edge_f,
                                  jnp.where(flm, flat_f, text_f))
                    f_by_cy.append(jnp.repeat(f, s, axis=0))  # [rows, wstep]
                fexp = (jnp.where(cym, f_by_cy[1], f_by_cy[0])
                        if len(cys) == 2 else f_by_cy[0])
                base = (cx * 4 + n) * 4 + m
                fs_ref[base] = wy_n[n] * fexp
                fs_ref[n_cx * 16 + base] = wye_n[n] * (1.0 - fexp)

    # channel windows at interleaved-row resolution
    xreps = []
    for ch in range(c):
        xw = window(xa, xb, xc, xd, ch)
        xw = xw.astype(jnp.int32).astype(jnp.float32)
        xreps.append(jnp.repeat(xw, s, axis=0))

    # ---- phase B: one column-phase plane at a time (5 live accs); m outer
    # so each channel window is lane-shifted 4x and tap reads are sublane
    # slices of the shifted copy ----
    for px in range(s):
        cx = 1 if (n_cx == 2 and px / s >= 0.5) else 0
        wsum = None
        accs = [None] * c
        for m in range(4):
            xcols = [xreps[ch][:, m + 1:m + 1 + wstep] for ch in range(c)]
            wxv = wx_ref[px * 4 + m:px * 4 + m + 1, :]
            wxev = wx_ref[(s + px) * 4 + m:(s + px) * 4 + m + 1, :]
            for n in range(4):
                base = (cx * 4 + n) * 4 + m
                g1 = fs_ref[base]
                g2 = fs_ref[n_cx * 16 + base]
                wgt = g1 * wxv + g2 * wxev
                wsum = wgt if wsum is None else wsum + wgt
                for ch in range(c):
                    tap = xcols[ch][(n + 1) * s:(n + 1) * s + rows]
                    t = wgt * tap
                    accs[ch] = t if accs[ch] is None else accs[ch] + t
        rec = 1.0 / wsum
        packed = None
        for ch in range(c):
            v = jnp.clip((accs[ch] * rec + 0.5).astype(jnp.int32),
                         0, 255).astype(jnp.uint32)
            word = v if ch == 0 else (v << (8 * ch))
            packed = word if packed is None else packed | word
        out_ref[px] = packed


@functools.partial(jax.jit, static_argnames=("scale", "a", "step", "wstep",
                                             "interpret", "layout"))
def _adaptive_resize_pallas(img, scale: int, a: float, step: int, wstep: int,
                            interpret: bool, layout: str = "hwc"):
    h, w, c = img.shape
    s = int(scale)
    n_i = _round_up(h, step) // step
    n_j = _round_up(w, wstep) // wstep
    n_cx = 2 if s > 1 else 1

    wyi_np, eqy_np = _axis_vectors(h, s, a)
    wxi_np, eqx_np = _axis_vectors(w, s, a)
    pad_rows = n_i * step * s - wyi_np.shape[0]
    wyi = jnp.asarray(np.pad(wyi_np, ((0, pad_rows), (0, 0)), mode="edge"))
    # exemption vectors enter premultiplied: wye = wy*eqy, wxe = wx*eqx
    wye = jnp.asarray(np.pad(wyi_np * eqy_np, ((0, pad_rows), (0, 0)),
                             mode="edge"))
    # column vectors go phase-major [S*4, n_cols]; wx and wx*eqx stacked
    def colmajor(v):
        out = v.reshape(w, s, 4).transpose(1, 2, 0).reshape(s * 4, w)
        return np.pad(out, ((0, 0), (0, n_j * wstep - w)), mode="edge")
    wx = jnp.asarray(np.concatenate(
        [colmajor(wxi_np), colmajor(wxi_np * eqx_np)], axis=0))
    # phase mask: 1.0 where the row phase uses center offset cy=1
    cymask = np.tile((np.arange(s) / s >= 0.5).astype(np.float32),
                     n_i * step)[:, None]
    cym = jnp.asarray(np.ascontiguousarray(
        np.broadcast_to(cymask, (n_i * step * s, 8))))

    xf = img.astype(jnp.float32)
    luma = (xf[..., 0] * 0.2126 + xf[..., 1] * 0.7152 + xf[..., 2] * 0.0722)
    # edge-replicate pads (adaptive needs clamped VALUES, not just weights)
    xp = jnp.pad(jnp.transpose(img, (2, 0, 1)),
                 ((0, 0), (_LEFT, (n_i + 1) * step - h - _LEFT),
                  (_LEFT, (n_j + 1) * wstep - w - _LEFT)), mode="edge")
    lp = jnp.pad(luma, ((_LEFT, (n_i + 1) * step - h - _LEFT),
                        (_LEFT, (n_j + 1) * wstep - w - _LEFT)),
                 mode="edge")[None]

    kernel = functools.partial(_adaptive_kernel, scale=s, step=step,
                               wstep=wstep, c=c)
    x_spec = lambda di, dj: pl.BlockSpec(
        (c, step, wstep), lambda i, j: (0, i + di, j + dj),
        memory_space=pltpu.VMEM)
    l_spec = lambda di, dj: pl.BlockSpec(
        (1, step, wstep), lambda i, j: (0, i + di, j + dj),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((step * s, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((step * s, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * s * 4, wstep), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            x_spec(0, 0), x_spec(0, 1), x_spec(1, 0), x_spec(1, 1),
            l_spec(0, 0), l_spec(0, 1), l_spec(1, 0), l_spec(1, 1),
            pl.BlockSpec((step * s, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s, step * s, wstep),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (s, n_i * step * s, n_j * wstep), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2 * n_cx * 16, step * s, wstep), jnp.float32)],
        interpret=interpret,
    )(wyi, wye, wx, xp, xp, xp, xp, lp, lp, lp, lp, cym)
    if layout == "planar":
        return out
    return unpack_planar(out, h, w, s, c)


def unpack_planar(packed_u32, h: int, w: int, scale: int, c: int):
    """[S, R_pad, X_pad] channel-packed u32 planar output → HWC uint8.

    Word (px, r, X) holds the c channels of output pixel (r, X*S + px) as
    little-endian bytes. Bitcast to u8 FIRST, then transpose: the resulting
    [S, R, X, 4]u8 → [R, X, S, 4] transpose is the exact shape class XLA
    handles best (the phase kernel's measured-fastest epilogue); the
    u32-first ordering costs 2.7x more (docs/PERF_NOTES.md round 2).
    """
    s = int(scale)
    bytes_ = jax.lax.bitcast_convert_type(packed_u32, jnp.uint8)
    o = bytes_[:, :h * s, :w].transpose(1, 2, 0, 3)         # [hS, w, S, 4]
    return o[..., :c].reshape(h * s, w * s, c)


def adaptive_resize_pallas(img_u8, scale: int, a: float = -0.5, *,
                           step: int = 8, wstep: int = 256,
                           interpret: bool | None = None,
                           layout: str = "hwc"):
    """Fused adaptive-bicubic SR of an HWC uint8 image (integer scale).

    ``layout="planar"`` returns the kernel's native output — [S, R, X]
    uint32 with the c channels packed little-endian in each word, rows
    fully interleaved, column phase planar, spatial extents padded to the
    tile grid; :func:`unpack_planar` materializes HWC.
    """
    if float(scale) != int(scale) or scale < 1:
        raise ValueError("adaptive pallas path requires an integer upscale")
    img = jnp.asarray(img_u8)
    if img.dtype != jnp.uint8 or img.ndim != 3:
        raise ValueError("adaptive_resize_pallas expects HWC uint8")
    if img.shape[-1] > 4:
        raise ValueError("adaptive_resize_pallas packs channels into u32 "
                         "words: c must be <= 4")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = img.shape[:2]
    step_eff = min(step, _round_up(h, 8))
    wstep_eff = min(wstep, _round_up(w, 128))
    return _adaptive_resize_pallas(img, int(scale), float(a), step_eff,
                                   wstep_eff, bool(interpret), layout)
