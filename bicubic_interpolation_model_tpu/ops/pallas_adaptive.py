"""Fused Pallas kernel for adaptive bicubic (VERDICT r1 item 2).

The adaptive interpolator (reference version3.0/utils/
adaptive_bicubic_super_resolution.js:10-145) is NOT separable: each tap's
Keys weight is modulated by the luma contrast between the tap and the output
pixel's center, with the modulation law chosen by the center's 5x5-variance
region class. The jnp phase-decomposed implementation materializes dozens of
HW-resolution intermediates in HBM; this kernel keeps the whole computation
(variance, region classes, modulation laws, 16-tap weighted sum,
normalization, rounding) in VMEM per tile.

Design (builds on the vR phase kernel's lab results):

* rows run at INTERLEAVED output-row resolution: the luma/pixel windows are
  sublane-repeated by S, so output row r*S+py addresses everything through
  static slices; the row-phase-dependent center values (luma at b+cy,
  region masks) are selected with one host-built phase-mask blend;
* channels are PLANAR inside the kernel ([C, H, W] u8 input prepass):
  Mosaic cannot broadcast a [.., W] weight map over interleaved [.., W*C]
  lanes (lane-dim repeats don't lower), but per-channel FMA planes are
  plain [rows, wstep] arrays;
* modulation maps F (laws + region select) depend only on the column-center
  variant cx — NOT on the column phase px — so the S column planes share
  S/2.. two map sets (16 taps x 2 variants instead of x S);
* clamped-position tap weights and the center-tap positional-equality
  exemption ride in per-axis HOST-built vectors (float64 math, exact JS
  border semantics), interleaved/folded like the phase kernel's wrow/wcol;
* column phases and channels stay planar in the kernel output
  [S, C, rows, cols]; one XLA transpose interleaves them (layout="hwc"),
  or layout="planar" skips it.

Edge handling: inputs are edge-REPLICATE padded (adaptive needs the clamped
PIXEL VALUES — for luma diffs and the variance window — not just folded
weights, so zero-padding + weight-folding as in the phase kernel is not
enough).
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
                     cy_ref, out_ref, *, scale, step, wstep, c):
    s = scale
    rows = step * s

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
    # keep region masks as f32 0/1: Mosaic cannot select() BOOL VALUES
    # (i8->i1 truncation is unsupported); comparisons at use sites are fine
    is_flat = (var < 10.0).astype(jnp.float32)
    is_edge = (var > 50.0).astype(jnp.float32)

    # interleaved-row repeats + row-phase (cy) selection
    cym = cy_ref[:, 0][:, None] > 0.5                 # [rows, 1] bool
    lrep = jnp.repeat(lwin, s, axis=0)

    def rowsel_f(rep, off):
        a0 = rep[off * s:off * s + rows]
        a1 = rep[(off + 1) * s:(off + 1) * s + rows]
        return jnp.where(cym, a1, a0)

    frep = jnp.repeat(is_flat, s, axis=0)
    erep = jnp.repeat(is_edge, s, axis=0)
    flat_r = rowsel_f(frep, 0)                        # [rows, wstep+1]
    edge_r = rowsel_f(erep, 0)
    cl_r = rowsel_f(lrep, 2)                          # [rows, wstep+5]

    # channel windows at interleaved-row resolution
    xreps = []
    for ch in range(c):
        xw = window(xa, xb, xc, xd, ch)
        xw = xw.astype(jnp.int32).astype(jnp.float32)
        xreps.append(jnp.repeat(xw, s, axis=0))

    # accumulation, cx-variant outer / tap outer / plane inner:
    # each modulation map F is computed ONCE, used immediately by the two
    # column planes that share its center variant, and released — at most
    # one F is live (the first cut of this kernel kept 32 alive and spilled,
    # measuring 1.7 GPix/s; see docs/PERF_NOTES.md). The positional
    # exemption enters as wgt = wy*wx*F + (wy*eqy)x(wx*eqx)*(1-F), with the
    # eq-folded vectors premultiplied on the HOST (wxe rows of wx_ref hold
    # wx*eqx at offset 4*S).
    planes_of = {0: [p for p in range(s) if p / s < 0.5],
                 1: [p for p in range(s) if p / s >= 0.5]}
    for cx in (0, 1):
        cl = cl_r[:, 2 + cx:2 + cx + wstep]
        fl = flat_r[:, cx:cx + wstep]
        ed = edge_r[:, cx:cx + wstep]
        edm = ed > 0.5
        flm = fl > 0.5
        pxs = planes_of[cx]
        accs = {px: [None] * c for px in pxs}
        wsums = {px: None for px in pxs}
        for n in range(4):
            tl_rows = lrep[(n + 1) * s:(n + 1) * s + rows]
            wyv = wyi_ref[:, n][:, None]               # [rows, 1]
            wyev = eqy_ref[:, n][:, None]              # host-folded wy*eqy
            for m in range(4):
                ldm = jnp.abs(cl - tl_rows[:, m + 1:m + 1 + wstep])
                edge_f = 1.0 + 0.5 * jnp.minimum(1.0, ldm * (1.0 / 50.0))
                flat_f = jnp.maximum(0.5, 1.0 - ldm * (1.0 / 30.0))
                text_f = 0.8 + 0.4 * jnp.exp(ldm * (-1.0 / 20.0))
                f = jnp.where(edm, edge_f, jnp.where(flm, flat_f, text_f))
                wyf = wyv * f                          # shared by the planes
                wyg = wyev * (1.0 - f)
                taps = [xreps[ch][(n + 1) * s:(n + 1) * s + rows,
                                  m + 1:m + 1 + wstep] for ch in range(c)]
                for px in pxs:
                    wxv = wx_ref[px * 4 + m:px * 4 + m + 1, :]
                    wxev = wx_ref[(s + px) * 4 + m:(s + px) * 4 + m + 1, :]
                    wgt = wyf * wxv + wyg * wxev
                    wsums[px] = wgt if wsums[px] is None \
                        else wsums[px] + wgt
                    for ch in range(c):
                        t = wgt * taps[ch]
                        accs[px][ch] = t if accs[px][ch] is None \
                            else accs[px][ch] + t
        for px in pxs:
            rec = 1.0 / wsums[px]
            for ch in range(c):
                v = accs[px][ch] * rec + 0.5
                out_ref[px, ch] = jnp.clip(
                    v.astype(jnp.int32), 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("scale", "a", "step", "wstep",
                                             "interpret", "layout"))
def _adaptive_resize_pallas(img, scale: int, a: float, step: int, wstep: int,
                            interpret: bool, layout: str = "hwc"):
    h, w, c = img.shape
    s = int(scale)
    n_i = _round_up(h, step) // step
    n_j = _round_up(w, wstep) // wstep

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
        out_specs=pl.BlockSpec((s, c, step * s, wstep),
                               lambda i, j: (0, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (s, c, n_i * step * s, n_j * wstep), jnp.uint8),
        interpret=interpret,
    )(wyi, wye, wx, xp, xp, xp, xp, lp, lp, lp, lp, cym)
    if layout == "planar":
        return out
    # [S, C, R, X] -> [R, X, S, C] -> [R, X*S, C]
    o = out[:, :, :h * s, :w].transpose(2, 3, 0, 1)
    return o.reshape(h * s, w * s, c)


def adaptive_resize_pallas(img_u8, scale: int, a: float = -0.5, *,
                           step: int = 8, wstep: int = 256,
                           interpret: bool | None = None,
                           layout: str = "hwc"):
    """Fused adaptive-bicubic SR of an HWC uint8 image (integer scale)."""
    if float(scale) != int(scale) or scale < 1:
        raise ValueError("adaptive pallas path requires an integer upscale")
    img = jnp.asarray(img_u8)
    if img.dtype != jnp.uint8 or img.ndim != 3:
        raise ValueError("adaptive_resize_pallas expects HWC uint8")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = img.shape[:2]
    step_eff = min(step, _round_up(h, 8))
    wstep_eff = min(wstep, _round_up(w, 128))
    return _adaptive_resize_pallas(img, int(scale), float(a), step_eff,
                                   wstep_eff, bool(interpret), layout)
