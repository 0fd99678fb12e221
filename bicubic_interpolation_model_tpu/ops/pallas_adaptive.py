"""Fused Pallas kernel for adaptive bicubic (VERDICT r1 item 2).

The adaptive interpolator (reference version3.0/utils/
adaptive_bicubic_super_resolution.js:10-145) is NOT separable: each tap's
Keys weight is modulated by the luma contrast between the tap and the output
pixel's center, with the modulation law chosen by the center's 5x5-variance
region class. The jnp phase-decomposed implementation materializes dozens of
HW-resolution intermediates in HBM; this kernel keeps the whole computation
(variance, region classes, modulation laws, 16-tap weighted sum,
normalization, rounding) in VMEM per tile.

Round-2 "vA3" design — third iteration, 0.95 (jnp) → 0.73 (vA1) → 2.4 (vA2)
→ 6.7 GPix/s planar at 1080p→4x (lab history in docs/PERF_NOTES.md):

* EVERYTHING RUNS AT LR RESOLUTION. The S² output phase planes (row phase
  q x column phase px) are computed one at a time as [step, wstep] arrays:
  the center variant cy is STATIC per q (no phase masks, no selects), tap
  reads are static sublane slices of the un-repeated windows (no
  jnp.repeat anywhere — vA2's sublane repeats at interleaved-row
  resolution were its real bottleneck, not the VMEM scratch traffic the
  fsE experiment disproved), and only 5 accumulators are live (vA1 kept 10
  and spilled).
* the modulation law is evaluated ONCE per (tap n,m x center-variant
  cy,cx) at LR resolution into VMEM scratch (64 maps, [16*n_cx*n_cy,
  step, wstep] f32), in min/max form (edge: min(1.5, 1 + d/100); flat:
  max(0.5, 1 - d/30); texture: 0.8 + 0.4*exp(-d/20)); each (q, px) plane
  reads the (cy(q), cx(px)) variant.
* channels are packed into one uint32 word per plane
  (v0|v1<<8|v2<<16|v3<<24), and the S row-phase planes of one px are
  interleaved with a single SUBLANE stack+reshape (legal in Mosaic; lane
  interleaves are not) — kernel output [S, R, X] u32, column phase planar.
* HWC materialization (`unpack_planar`) = byte bitcast + the standard
  [S,*,*,C]→[*,*,S,C] transpose. NOTE (PERF_NOTES "checksum fusion"): this
  u32→u8 boundary relayout is expensive (~33 ms at 4x-1080p as a
  default-layout program output); planar is the serving layout, HWC is for
  convenience/parity paths.

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

    Returns (w [n_in, S, 4], eq [n_in, S, 4]) where w[b, q, n] is the Keys
    weight evaluated at the CLAMPED tap position for base cell b, phase q,
    tap n, and eq[b, q, n] is 1.0 where that clamped tap position equals
    the clamped center position (the JS modulation exemption,
    adaptive_bicubic_super_resolution.js:122).
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
    return w, eq


def _exp2_neg(ldm):
    """exp(-ldm/20) for ldm in [0, 255] via exponent-bit construction.

    2^k with k = -ldm/(20 ln2): split k = floor(k) + r; 2^floor(k) is built
    by writing floor(k)+127 into the f32 exponent field; 2^r on [0,1) is a
    degree-3 minimax polynomial. Max |error| on exp(-d/20) over the full
    domain is 1.07e-4 (4.3e-5 on the 0.4-scaled texture factor) — measured
    exhaustively in tests/test_pallas_adaptive.py — vs the VPU
    transcendental's ~0.2 ms/frame at 1080p (PERF_NOTES r3).
    """
    k = ldm * (-1.0 / (20.0 * 0.6931471805599453))
    kf = jnp.floor(k)
    r = k - kf
    p = (0.9998929657
         + r * (0.6964573950 + r * (0.2243383648 + r * 0.0792042402)))
    e = jax.lax.bitcast_convert_type(
        (kf.astype(jnp.int32) + 127) << 23, jnp.float32)
    return e * p


def _adaptive_kernel(wy_ref, wye_ref, wx_ref,
                     xa, xb, xc, xd, la, lb, lc, ld_,
                     out_ref, fs_ref, *, scale, step, wstep, c,
                     i_hi, opaque_alpha=False):
    s = scale
    n_cx = 2 if s > 1 else 1
    cys = (0, 1) if s > 1 else (0,)
    n_cy = len(cys)

    def window(a_ref, b_ref, c_ref, d_ref, lead):
        top = jnp.concatenate([a_ref[lead], b_ref[lead][:, :_HALO]], axis=1)
        bot = jnp.concatenate([c_ref[lead][:_HALO], d_ref[lead][:_HALO, :_HALO]],
                              axis=1)
        return jnp.concatenate([top, bot], axis=0)   # [step+5, wstep+5]

    lwin = window(la, lb, lc, ld_, 0)

    # 5x5 variance at candidate center positions — region classes of
    # analyzeLocalContrast (kept as f32: Mosaic can't select() BOOL VALUES)
    vh, vw = step + 1, wstep + 1
    sm = None
    sq = None
    for dy in range(5):
        for dx in range(5):
            v = lwin[dy:dy + vh, dx:dx + vw]
            sm = v if sm is None else sm + v
            sq = v * v if sq is None else sq + v * v
    var = (sq - sm * sm / 25.0) / 25.0
    is_flat = (var < 10.0).astype(jnp.float32)
    is_edge = (var > 50.0).astype(jnp.float32)

    variants = []                                     # [cx][cy] → (cl, fl, ed)
    for cx in range(n_cx):
        per_cy = []
        for cy in cys:
            cl = lwin[2 + cy:2 + cy + step, 2 + cx:2 + cx + wstep]
            fl = is_flat[cy:cy + step, cx:cx + wstep]
            ed = is_edge[cy:cy + step, cx:cx + wstep]
            per_cy.append((cl, fl > 0.5, ed > 0.5))
        variants.append(per_cy)

    # ---- phase A: modulation map F per (n, m, cy, cx), LR res, scratch ----
    # m outer so the LANE-shifted column slice happens 4x; the (n, cx, cy)
    # bodies read cheap sublane slices of it
    for m in range(4):
        lcol = lwin[:, m + 1:m + 1 + wstep]           # [step+5, wstep]
        for n in range(4):
            tl = lcol[n + 1:n + 1 + step]
            for cx in range(n_cx):
                for k, cy in enumerate(cys):
                    cl, flm, edm = variants[cx][k]
                    ldm = jnp.abs(cl - tl)
                    edge_f = jnp.minimum(1.5, 1.0 + ldm * 0.01)
                    flat_f = jnp.maximum(0.5, 1.0 - ldm * (1.0 / 30.0))
                    text_f = 0.8 + 0.4 * _exp2_neg(ldm)
                    f = jnp.where(edm, edge_f,
                                  jnp.where(flm, flat_f, text_f))
                    fs_ref[((cx * 4 + n) * 4 + m) * n_cy + k] = f

    xwins = []
    for ch in range(c if not opaque_alpha else 3):
        xw = window(xa, xb, xc, xd, ch)
        xwins.append(xw.astype(jnp.int32).astype(jnp.float32))

    # ---- phase B: S*S phase planes at LR resolution (5 live accs each);
    # cy static per q; one sublane stack interleaves the row phases.
    # For ROW-INTERIOR tiles the Y-exemption vector wye[:, q*4+n] is
    # identically zero except at the static center tap n == cy(q)+1 (the
    # clamped tap position equals the clamped center position only there),
    # so the whole G2 term is skipped for the other 12 of 16 taps —
    # selected per tile with pl.when on the row program id (measured
    # 5.06 -> 4.88 ms at 1080p->4x planar; PERF_NOTES item 7). Column-side eq stays data-driven (wxev). --
    def phase_b(skip_eq_rows):
        for px in range(s):
            cx = 1 if (n_cx == 2 and px / s >= 0.5) else 0
            qplanes = []
            for q in range(s):
                kcy = 1 if (s > 1 and q / s >= 0.5) else 0
                wsum = None
                accs = [None] * c
                for m in range(4):
                    xcols = [xwins[ch][:, m + 1:m + 1 + wstep]
                             for ch in range(len(xwins))]
                    wxv = wx_ref[px * 4 + m:px * 4 + m + 1, :]
                    wxev = wx_ref[(s + px) * 4 + m:(s + px) * 4 + m + 1, :]
                    for n in range(4):
                        f = fs_ref[((cx * 4 + n) * 4 + m) * n_cy + kcy]
                        wyv = wy_ref[:, q * 4 + n][:, None]   # [step, 1]
                        g1 = wyv * f
                        if skip_eq_rows and n != kcy + 1:
                            wgt = g1 * wxv
                        else:
                            wyev = wye_ref[:, q * 4 + n][:, None]
                            g2 = wyev - wyev * f
                            wgt = g1 * wxv + g2 * wxev
                        wsum = wgt if wsum is None else wsum + wgt
                        for ch in range(c if not opaque_alpha else 3):
                            tap = xcols[ch][n + 1:n + 1 + step]
                            t = wgt * tap
                            accs[ch] = t if accs[ch] is None else accs[ch] + t
                rec = 1.0 / wsum
                packed = None
                for ch in range(c):
                    if opaque_alpha and ch == 3:
                        # constant-alpha frames: round(255*wsum/wsum) == 255
                        # exactly, so the 4th channel's 16-tap FMA chain is
                        # skipped (~14% of kernel time — PERF_NOTES r3)
                        v = jnp.full(accs[0].shape, 255, jnp.uint32)
                    else:
                        v = jnp.clip((accs[ch] * rec + 0.5).astype(jnp.int32),
                                     0, 255).astype(jnp.uint32)
                    word = v if ch == 0 else (v << (8 * ch))
                    packed = word if packed is None else packed | word
                qplanes.append(packed)
            # row-phase interleave on SUBLANES: [step,S,wstep] → [step*S,wstep]
            out_ref[px] = jnp.stack(qplanes, axis=1).reshape(step * s, wstep)

    if i_hi <= 1:
        phase_b(False)
    else:
        ii = pl.program_id(0)
        interior = (ii >= 1) & (ii < i_hi)

        @pl.when(interior)
        def _():
            phase_b(True)

        @pl.when(jnp.logical_not(interior))
        def _():
            phase_b(False)


def row_vectors(h: int, s: int, a: float, pad_to: int):
    """Host row-weight arrays for ABSOLUTE rows 0..h: ([h_pad, S*4] wy,
    [h_pad, S*4] wy*eqy), rows in sublanes, lane q*4+n. Exact border clamp
    semantics for image height ``h`` are baked in; trailing pad rows are
    edge copies (their outputs are discarded)."""
    wy_np, eqy_np = _axis_vectors(h, s, a)

    def rowmajor(v):
        return np.pad(v.reshape(h, s * 4), ((0, pad_to - h), (0, 0)),
                      mode="edge")
    return rowmajor(wy_np), rowmajor(wy_np * eqy_np)


def col_vectors(w: int, s: int, a: float, pad_to: int):
    """Host column-weight array [2*S*4, w_pad]: wx phase-major in lanes,
    stacked over the eq-folded wx*eqx."""
    wx_np, eqx_np = _axis_vectors(w, s, a)

    def colmajor(v):
        out = v.reshape(w, s * 4).T
        return np.pad(out, ((0, 0), (0, pad_to - w)), mode="edge")
    return np.concatenate([colmajor(wx_np), colmajor(wx_np * eqx_np)],
                          axis=0)


def _adaptive_dispatch(xp, lp, wy, wye, wx, *, s, step, wstep, c,
                       n_i, n_j, interpret, i_hi=0, opaque_alpha=False):
    """The pallas call. ``xp`` [C, rows_pad, cols_pad] u8 and ``lp``
    [1, rows_pad, cols_pad] f32 carry ``_LEFT`` leading halo rows/cols and
    enough trailing rows/cols for the (i+1, j+1) halo blocks; the weight
    arrays are DATA (may be traced/sharded), so one compiled program per
    (shape, s, step, wstep) serves any geometry — including per-band calls
    under shard_map (parallel/spatial.py)."""
    n_cx = 2 if s > 1 else 1
    n_cy = 2 if s > 1 else 1
    kernel = functools.partial(_adaptive_kernel, scale=s, step=step,
                               wstep=wstep, c=c, i_hi=i_hi,
                               opaque_alpha=opaque_alpha and c == 4)
    x_spec = lambda di, dj: pl.BlockSpec(
        (c, step, wstep), lambda i, j: (0, i + di, j + dj),
        memory_space=pltpu.VMEM)
    l_spec = lambda di, dj: pl.BlockSpec(
        (1, step, wstep), lambda i, j: (0, i + di, j + dj),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((step, s * 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((step, s * 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * s * 4, wstep), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            x_spec(0, 0), x_spec(0, 1), x_spec(1, 0), x_spec(1, 1),
            l_spec(0, 0), l_spec(0, 1), l_spec(1, 0), l_spec(1, 1),
        ],
        out_specs=pl.BlockSpec((s, step * s, wstep),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (s, n_i * step * s, n_j * wstep), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((16 * n_cx * n_cy, step, wstep), jnp.float32)],
        # the two pl.when phase-B variants (eq-skip) are allocated
        # conservatively by Mosaic; the default 16 MB scoped-vmem limit is
        # ~3% short at wstep=512 — raise it (v5e has 128 MB VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(wy, wye, wx, xp, xp, xp, xp, lp, lp, lp, lp)


@functools.partial(jax.jit, static_argnames=("scale", "a", "step", "wstep",
                                             "interpret", "layout",
                                             "opaque_alpha"))
def _adaptive_resize_pallas(img, scale: int, a: float, step: int, wstep: int,
                            interpret: bool, layout: str = "hwc",
                            opaque_alpha: bool = False):
    h, w, c = img.shape
    s = int(scale)
    n_i = _round_up(h, step) // step
    n_j = _round_up(w, wstep) // wstep

    wy_np, wye_np = row_vectors(h, s, a, n_i * step)
    wy, wye = jnp.asarray(wy_np), jnp.asarray(wye_np)
    wx = jnp.asarray(col_vectors(w, s, a, n_j * wstep))

    xf = img.astype(jnp.float32)
    luma = (xf[..., 0] * 0.2126 + xf[..., 1] * 0.7152 + xf[..., 2] * 0.0722)
    # edge-replicate pads (adaptive needs clamped VALUES, not just weights)
    xp = jnp.pad(jnp.transpose(img, (2, 0, 1)),
                 ((0, 0), (_LEFT, (n_i + 1) * step - h - _LEFT),
                  (_LEFT, (n_j + 1) * wstep - w - _LEFT)), mode="edge")
    lp = jnp.pad(luma, ((_LEFT, (n_i + 1) * step - h - _LEFT),
                        (_LEFT, (n_j + 1) * wstep - w - _LEFT)),
                 mode="edge")[None]
    # row-interior tiles (no clamped-tap collisions beyond the static
    # center): rows 1 .. h-3 inclusive → tiles 1 .. (h-2)//step - 1
    out = _adaptive_dispatch(xp, lp, wy, wye, wx, s=s, step=step,
                             wstep=wstep, c=c, n_i=n_i, n_j=n_j,
                             interpret=interpret,
                             i_hi=max(0, (h - 2) // step),
                             opaque_alpha=opaque_alpha)
    if layout == "planar":
        return out
    if layout == "hwc32":
        from .pallas_interleave import interleave_planar_u32
        inter = interleave_planar_u32(out, interpret=interpret)
        return inter[:h * s, :w * s]
    return unpack_planar(out, h, w, s, c)


def adaptive_resize_pallas_batch(imgs_u8, scale: int, a: float = -0.5, *,
                                 step: int = 16, wstep: int = 512,
                                 interpret: bool | None = None,
                                 layout: str = "hwc",
                                 opaque_alpha: bool = False):
    """[B, H, W, C] same-size frames in one launch — ``jax.vmap`` lifts the
    batch onto a leading Pallas grid dimension (the per-frame geometry is
    identical, so the host-built weight vectors are shared)."""
    opaque_alpha = bool(opaque_alpha)
    imgs = jnp.asarray(imgs_u8)
    if imgs.ndim != 4:
        raise ValueError("expected [B, H, W, C] uint8")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = imgs.shape[1:3]
    step_eff = min(step, _round_up(h, 8))
    wstep_eff = min(wstep, _round_up(w, 128))
    return jax.vmap(
        lambda im: _adaptive_resize_pallas(im, int(scale), float(a),
                                           step_eff, wstep_eff,
                                           bool(interpret), layout,
                                           opaque_alpha=opaque_alpha))(imgs)


def unpack_planar(packed_u32, h: int, w: int, scale: int, c: int):
    """[S, R_pad, X_pad] channel-packed u32 planar output → HWC uint8.

    Word (px, r, X) holds the c channels of output pixel (r, X*S + px) as
    little-endian bytes. Byte bitcast first, then the standard
    [S,*,*,C]→[*,*,S,C] transpose. This is a LAYOUT-BOUNDARY cost (~33 ms
    for a 4x-1080p frame as a default-layout program output — PERF_NOTES
    "checksum fusion"); serving paths should consume planar and interleave
    host-side (numpy view of the fetched bytes is free).
    """
    s = int(scale)
    bytes_ = jax.lax.bitcast_convert_type(packed_u32, jnp.uint8)
    o = bytes_[:, :h * s, :w].transpose(1, 2, 0, 3)         # [hS, w, S, 4]
    return o[..., :c].reshape(h * s, w * s, c)




def adaptive_resize_pallas(img_u8, scale: int, a: float = -0.5, *,
                           step: int = 16, wstep: int = 512,
                           interpret: bool | None = None,
                           layout: str = "hwc",
                           opaque_alpha: bool = False):
    """Fused adaptive-bicubic SR of an HWC uint8 image (integer scale).

    ``opaque_alpha`` is explicit opt-in (matching ``ModelUpscaler``): callers
    that know the alpha channel is constant 255 pass True to skip the alpha
    FMA lanes. No host scan / jit-key churn for alternating streams.

    Layouts:
      ``"hwc"``    uint8 [H*S, W*S, C] (XLA bitcast+transpose epilogue — a
                   genuine u32→u8 retiling boundary, expensive; use for
                   parity/convenience paths);
      ``"hwc32"``  uint32 [H*S, W*S] RGBA32 words via the Pallas interleave
                   kernel (ops/pallas_interleave) — 22x cheaper than
                   "hwc"; fetched bytes view as HWC uint8 for free;
      ``"planar"`` the kernel's native [S, R, X] u32 (rows interleaved,
                   column phase planar, extents padded to the tile grid);
                   :func:`unpack_planar` materializes HWC.
    """
    if float(scale) != int(scale) or scale < 1:
        raise ValueError("adaptive pallas path requires an integer upscale")
    opaque_alpha = bool(opaque_alpha)
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
                                   wstep_eff, bool(interpret), layout,
                                   opaque_alpha=opaque_alpha)
