"""Fused Pallas tail for the phase-packed WeightPredictor forward.

The packed learned path (models/inference._super_resolve_packed) ends with
``_packed_phase_tail``: a phase-decomposed 3x3 conv_out + tanh + the 16-tap
weight apply + round (the reference's predict→apply chain,
version3.0/utils/model_super_resolution.js:68-124). As an XLA graph that
tail re-reads the [h, w, S, S, 2F] merged map once per (phase, conv tap) —
144 HBM sweeps of ~23 MB ≈ 3.3 GB of traffic per 0020-geometry frame —
because the 16 phase accumulators cannot live on-chip across einsums.

This kernel keeps one [step+2, wstep+2, S*S*2F] tile of the merged map in
VMEM and finishes EVERYTHING on it: the 36 banded matmuls of conv_out (MXU),
tanh, the 16-tap apply (VPU), round-half-even, u8 channel packing. The
merged map is read from HBM exactly once.

Matmul shape strategy: lanes hold the packed plane axis (p2*S + q2)*2F + i,
so a conv tap's contraction over one ROW-phase block p2 is a 128-wide
LANE-ALIGNED slice (S=4, 2F=32). Each dot is [step*wstep, 128] @ [128, 64]
producing all S column phases x 16 weights at once; the q2 -> q column-phase
permutation is baked into a block-permuted kernel matrix (built in XLA from
conv_out's traced params — works for imported TFJS checkpoints too), and
the dx = ±1 column shifts are pre-applied to one 32-lane group via a lane
mask select. The 4x block-diagonal FLOP padding keeps the MXU K/N dims full
— measured faster than 144 dense-but-16-lane [.,32]@[32,16] dots.

Output is the adaptive kernel's planar format ([S, R, X] u32, channels
packed little-endian, row phases interleaved on sublanes) so the existing
unpack/interleave machinery (ops/pallas_adaptive.unpack_planar,
ops/pallas_interleave) delivers HWC.

Numerics: same ops as the XLA tail in a different association order (one
128-deep contraction instead of nine 32-deep ones); agrees with the packed
XLA tail within the envelope already documented for packed-vs-fused
(tests assert <=1 u8 LSB vs the XLA tail at f32, PSNR unchanged).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_resize import _round_up


def _tail_kernel(kb_ref, bias_ref, ma, mb, mc, md, la, lb, lc, ld_,
                 out_ref, *, s, twof, step, wstep, c, opaque_alpha=False):
    """One [step, wstep] LR tile -> S*S phase planes, packed u32.

    kb_ref:   [9 * S*2F, S*16] block-permuted conv_out kernels (dy,dx major)
    bias_ref: [1, S*16] conv_out bias tiled per column phase
    ma..md:   merged-map blocks [step, wstep, S*S*2F] (main/right/down/diag)
    la..ld_:  planar LR blocks [c, step, wstep] f32 (halo 3)
    out_ref:  [S, step*S, wstep] u32 — column-phase planar, row phases
              interleaved on sublanes (adaptive kernel's output format)
    """
    # merged-map window [step+2, wstep+2, S*S*2F] (halo 2 for the 3x3 conv)
    top = jnp.concatenate([ma[...], mb[..., :2, :]], axis=1)
    bot = jnp.concatenate([mc[:2], md[:2, :2, :]], axis=1)
    win = jnp.concatenate([top, bot], axis=0)
    _tail_body(win, kb_ref, bias_ref, la, lb, lc, ld_, out_ref, s=s,
               twof=twof, step=step, wstep=wstep, c=c,
               opaque_alpha=opaque_alpha)


def _tail_body(win, kb_ref, bias_ref, la, lb, lc, ld_, out_ref, *, s, twof,
               step, wstep, c, opaque_alpha=False):
    """conv_out + tanh + 16-tap apply + pack, on a ready merged-map window
    ``win`` [step+2, wstep+2, S*S*2F] (shared by the m-fed kernel and the
    fused-upstream kernel that computes ``win`` from conv features)."""
    kdim = s * twof                     # 128: one row-phase block of lanes
    ndim = s * 16                       # 64: column phases x 16 weights

    # dx column-shift variants: only one 32-lane q2 group moves
    # (dx=+1 -> q=S-1 reads q2=0 one column right; dx=-1 -> q=0 reads
    # q2=S-1 one column left). Lane-mask select, built once per tile.
    base = win[:, 1:1 + wstep]
    lane = jax.lax.broadcasted_iota(jnp.int32, base.shape, 2) % kdim
    win_dx = {
        0: base,
        1: jnp.where(lane < twof, win[:, 2:2 + wstep], base),
        -1: jnp.where(lane >= kdim - twof, win[:, :wstep], base),
    }

    # LR window [c, step+3, wstep+3] for the 4x4 tap apply
    ltop = jnp.concatenate([la[...], lb[..., :3]], axis=2)
    lbot = jnp.concatenate([lc[:, :3], ld_[:, :3, :3]], axis=2)
    lwin = jnp.concatenate([ltop, lbot], axis=1)
    n_ch = 3 if (opaque_alpha and c == 4) else c
    taps = [[lwin[ch, ty:ty + step, tx:tx + wstep] for ty in range(4)
             for tx in range(4)] for ch in range(n_ch)]

    bias = bias_ref[0]
    planes = []                                       # [pp][q] -> u32 plane
    for pp in range(s):
        acc = None
        for dy in (-1, 0, 1):
            p2, sy = (pp + dy) % s, (pp + dy) // s
            for dx in (-1, 0, 1):
                k = ((dy + 1) * 3 + dx + 1) * kdim
                a = win_dx[dx][1 + sy:1 + sy + step, :,
                               p2 * kdim:(p2 + 1) * kdim]
                a2 = a.reshape(step * wstep, kdim)
                t = jax.lax.dot(a2, kb_ref[k:k + kdim, :], precision=None,
                                preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
        wts = jnp.tanh((acc + bias).astype(jnp.float32))     # [M, S*16]
        # weight planes in [step, wstep] layout: one relayout per phase row
        wp = jnp.transpose(wts).reshape(ndim, step, wstep)
        row = []
        for q in range(s):
            accs = [None] * n_ch
            for i in range(16):
                wplane = wp[q * 16 + i]
                for ch in range(n_ch):
                    t = wplane * taps[ch][i]
                    accs[ch] = t if accs[ch] is None else accs[ch] + t
            packed = None
            for ch in range(c):
                if ch >= n_ch:
                    # constant-alpha input: sum(w)*255, same rounding
                    sw = None
                    for i in range(16):
                        wv = wp[q * 16 + i]
                        sw = wv if sw is None else sw + wv
                    v = jnp.clip(jnp.round(sw * 255.0).astype(jnp.int32),
                                 0, 255).astype(jnp.uint32)
                else:
                    v = jnp.clip(jnp.round(accs[ch]).astype(jnp.int32),
                                 0, 255).astype(jnp.uint32)
                word = v if ch == 0 else (v << (8 * ch))
                packed = word if packed is None else packed | word
            row.append(packed)
        planes.append(row)

    for q in range(s):
        out_ref[q] = jnp.stack([planes[pp][q] for pp in range(s)],
                               axis=1).reshape(step * s, wstep)


def _fused_kernel(kb_ref, bias_ref, kf_ref, mb_ref, am_ref, ab_ref, rm_ref,
                  cm_ref, ya, yb, yc, yd, la, lb, lc, ld_, out_ref, *, s,
                  twof, f_in, step, wstep, c, h, w, opaque_alpha=False):
    """The packed tail with the merged-map UPSTREAM fused in: instead of a
    precomputed [., S*S*2F] merged-map block, the kernel takes conv-feature
    blocks ``ya..yd`` ([step, wstep, F_in], the conv_in/conv_res output)
    and builds the window itself — upsample+offset matmul, attention,
    gate — before running the shared tail body. The merged map never
    exists in HBM: per frame the kernel reads F_in-wide features (23 MB
    bf16 at 0020 geometry) where the m-fed kernel read 182 MB.

    kf_ref: [F_in, S*S*2F] scattered upsample kernel (offset lanes zero)
    mb_ref: [1, S*S*2F]    upsample bias + per-phase offset constant
    am_ref: [S*S*2F, S*S]  block-diagonal attention contraction
    ab_ref: [1, S*S]       attention bias
    rm_ref: [S*S, S*S*2F]  0/1 gate scatter (att value -> its 16 up lanes)
    cm_ref: [1, S*S*2F]    gate complement (1.0 on offset lanes)
    """
    feat = s * s * twof
    rows, cols = step + 2, wstep + 2

    ytop = jnp.concatenate([ya[...], yb[..., :2, :]], axis=1)
    ybot = jnp.concatenate([yc[:2], yd[:2, :2, :]], axis=1)
    ywin = jnp.concatenate([ytop, ybot], axis=0)      # [rows, cols, F_in]

    y2 = ywin.reshape(rows * cols, f_in)
    m_pre = jax.lax.dot(y2, kf_ref[...], precision=None,
                        preferred_element_type=jnp.float32) + mb_ref[0]
    att = jax.nn.sigmoid(
        jax.lax.dot(m_pre.astype(y2.dtype), am_ref[...], precision=None,
                    preferred_element_type=jnp.float32) + ab_ref[0])
    # one-hot scatter: each output lane receives exactly one att value (up
    # lanes) or the 1.0 complement (offset lanes) — exact, no lane repeat
    gate = jax.lax.dot(att.astype(y2.dtype), rm_ref[...], precision=None,
                       preferred_element_type=jnp.float32) + cm_ref[0]
    m_win = (m_pre * gate).reshape(rows, cols, feat)

    # zero out rows/cols outside the true image: the m-fed path zero-pads
    # the merged map itself (conv SAME), but m(y=0) = gated bias != 0
    i = pl.program_id(0)
    j = pl.program_id(1)
    gr = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) + i * step - 1
    gc = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) + j * wstep - 1
    valid = ((gr >= 0) & (gr < h) & (gc >= 0) & (gc < w))
    m_win = m_win * valid.astype(m_win.dtype)[:, :, None]

    _tail_body(m_win.astype(y2.dtype), kb_ref, bias_ref, la, lb, lc, ld_,
               out_ref, s=s, twof=twof, step=step, wstep=wstep, c=c,
               opaque_alpha=opaque_alpha)


@functools.partial(jax.jit, static_argnames=("scale", "step", "wstep",
                                             "interpret", "layout",
                                             "opaque_alpha"))
def _fused_tail_dispatch(y, lr_f32, kout, bout, kflat, mbias, amat, abias,
                         scale, step, wstep, interpret, layout,
                         opaque_alpha):
    s = int(scale)
    c = lr_f32.shape[-1]
    h, w, f_in = y.shape
    twof = kflat.shape[-1] // (s * s)
    feat = s * s * twof
    n_i = _round_up(h, step) // step
    n_j = _round_up(w, wstep) // wstep

    yp = jnp.pad(y, ((1, (n_i + 1) * step - h - 1),
                     (1, (n_j + 1) * wstep - w - 1), (0, 0)))
    lp = jnp.pad(jnp.transpose(lr_f32, (2, 0, 1)),
                 ((0, 0), (1, (n_i + 1) * step - lr_f32.shape[0] - 1),
                  (1, (n_j + 1) * wstep - w - 1)), mode="edge")

    cdt = y.dtype
    kb = _block_kernels(kout, s, twof).astype(cdt)
    bias = jnp.tile(bout.astype(jnp.float32), (s,))[None]
    nw = twof // 2
    lane_is_up = (np.arange(feat) % twof) < nw
    rmat = jnp.asarray(
        np.equal.outer(np.arange(s * s), np.arange(feat) // twof)
        & lane_is_up[None, :], cdt)
    cmask = jnp.asarray(~lane_is_up, jnp.float32)[None]

    y_spec = lambda di, dj: pl.BlockSpec(
        (step, wstep, f_in), lambda i, j: (i + di, j + dj, 0),
        memory_space=pltpu.VMEM)
    l_spec = lambda di, dj: pl.BlockSpec(
        (c, step, wstep), lambda i, j: (0, i + di, j + dj),
        memory_space=pltpu.VMEM)
    const = lambda r, cc: pl.BlockSpec(
        (r, cc), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_fused_kernel, s=s, twof=twof, f_in=f_in,
                               step=step, wstep=wstep, c=c, h=h, w=w,
                               opaque_alpha=opaque_alpha and c == 4)
    out = pl.pallas_call(
        kernel,
        grid=(n_i, n_j),
        in_specs=[
            const(9 * s * twof, s * 16), const(1, s * 16),
            const(f_in, feat), const(1, feat), const(feat, s * s),
            const(1, s * s), const(s * s, feat), const(1, feat),
            y_spec(0, 0), y_spec(0, 1), y_spec(1, 0), y_spec(1, 1),
            l_spec(0, 0), l_spec(0, 1), l_spec(1, 0), l_spec(1, 1),
        ],
        out_specs=pl.BlockSpec((s, step * s, wstep), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (s, n_i * step * s, n_j * wstep), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(kb, bias, kflat.astype(cdt), mbias.astype(jnp.float32)[None],
      amat.astype(cdt),
      # conv_att has ONE output channel, so abias is [1] — but ab_ref's
      # block is (1, S*S): broadcast so every attention lane reads the
      # real bias (a (1,1) operand here makes lanes 1..15 an OOB block
      # read — NaN in interpret mode, a Mosaic lowering error on TPU)
      jnp.broadcast_to(abias.astype(jnp.float32).reshape(-1)[:1],
                       (1, s * s)),
      rmat, cmask, yp, yp, yp, yp, lp, lp, lp, lp)

    if layout == "planar":
        return out
    if layout == "hwc32":
        from .pallas_interleave import interleave_planar_u32
        return interleave_planar_u32(out, interpret=interpret)[:h * s,
                                                               :w * s]
    from .pallas_adaptive import unpack_planar
    return unpack_planar(out, h, w, s, c)


def packed_tail_fused(y, lr_f32, kout, bout, kflat, mbias, amat, abias, *,
                      scale: int = 4, step: int = 16, wstep: int = 128,
                      interpret: bool | None = None, layout: str = "hwc",
                      opaque_alpha: bool = False):
    """Fused-upstream packed tail: conv features in, u8 pixels out.

    y:      [h, w, F_in] conv_in/conv_res output (any float dtype — the
            matmuls run in y.dtype)
    kflat, mbias, amat, abias: the flat merged-map matrices
            (models/inference._merged_map_mats)
    Everything else as :func:`packed_tail_pallas`. Single-chip zero-halo
    semantics only (band-sharded callers build per-band merged maps and use
    the m-fed kernel).
    """
    if y.ndim == 4:
        y = y[0]
    h, w, _ = y.shape
    s = int(scale)
    twof = kflat.shape[-1] // (s * s)
    if not packed_tail_supported(s, twof, lr_f32.shape[-1]):
        raise ValueError(f"packed tail needs S*2F==128, c<=4; got "
                         f"S={s}, 2F={twof}, c={lr_f32.shape[-1]}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    step = min(step, _round_up(h, 8))
    wstep = min(wstep, _round_up(w, 128))
    return _fused_tail_dispatch(y, lr_f32, kout, bout, kflat, mbias, amat,
                                abias, s, step, wstep, bool(interpret),
                                layout, bool(opaque_alpha))


def _block_kernels(kout, s, twof):
    """conv_out [3, 3, 2F, 16] -> [9 * S*2F, S*16] block-permuted matrices.

    Row (q2*2F + i) of tap (dy, dx) feeds column (q*16 + o) iff
    q2 == (q+dx) mod S — the column-phase plane permutation of the packed
    conv_out decomposition (models/inference._packed_phase_tail).
    """
    mats = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            k = kout[dy + 1, dx + 1]                        # [2F, 16]
            z = jnp.zeros_like(k)
            rows = []
            for q2 in range(s):
                rows.append(jnp.concatenate(
                    [k if q2 == (q + dx) % s else z for q in range(s)],
                    axis=1))
            mats.append(jnp.concatenate(rows, axis=0))      # [S*2F, S*16]
    return jnp.concatenate(mats, axis=0)


@functools.partial(jax.jit, static_argnames=("scale", "step", "wstep",
                                             "interpret", "layout",
                                             "opaque_alpha", "halo"))
def _packed_tail_dispatch(m, lr_f32, kout, bout, scale, step, wstep,
                          interpret, layout, opaque_alpha, halo):
    s = int(scale)
    c = lr_f32.shape[-1]
    twof = m.shape[-1]
    if halo == "rows":
        # band-sharded callers pass REAL neighbor rows: m rows span
        # [-1, h+1), lr rows span [-1, h+2) (parallel/spatial.py builds
        # them from ppermute halos) — pad columns only
        h = m.shape[0] - 2
        lead = 0
    else:
        h = m.shape[0]
        lead = 1
    w = m.shape[1]
    mf = m.reshape(m.shape[0], w, s * s * twof)
    n_i = _round_up(h, step) // step
    n_j = _round_up(w, wstep) // wstep

    # zero pad: 1-halo for the 3x3 conv + tile remainders (conv SAME)
    mp = jnp.pad(mf, ((lead, (n_i + 1) * step - h - 1 - (1 - lead)),
                      (1, (n_j + 1) * wstep - w - 1), (0, 0)))
    # edge pad: (1 leading, 2 trailing) tap reach, like the XLA tail
    lp = jnp.pad(jnp.transpose(lr_f32, (2, 0, 1)),
                 ((0, 0), (lead, (n_i + 1) * step - lr_f32.shape[0] - lead),
                  (1, (n_j + 1) * wstep - w - 1)), mode="edge")

    kb = _block_kernels(kout, s, twof).astype(m.dtype)
    bias = jnp.tile(bout.astype(jnp.float32), (s,))[None]

    feat = s * s * twof
    m_spec = lambda di, dj: pl.BlockSpec(
        (step, wstep, feat), lambda i, j: (i + di, j + dj, 0),
        memory_space=pltpu.VMEM)
    l_spec = lambda di, dj: pl.BlockSpec(
        (c, step, wstep), lambda i, j: (0, i + di, j + dj),
        memory_space=pltpu.VMEM)
    kernel = functools.partial(_tail_kernel, s=s, twof=twof, step=step,
                               wstep=wstep, c=c,
                               opaque_alpha=opaque_alpha and c == 4)
    out = pl.pallas_call(
        kernel,
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((9 * s * twof, s * 16), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s * 16), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            m_spec(0, 0), m_spec(0, 1), m_spec(1, 0), m_spec(1, 1),
            l_spec(0, 0), l_spec(0, 1), l_spec(1, 0), l_spec(1, 1),
        ],
        out_specs=pl.BlockSpec((s, step * s, wstep), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (s, n_i * step * s, n_j * wstep), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(kb, bias, mp, mp, mp, mp, lp, lp, lp, lp)

    if layout == "planar":
        return out
    if layout == "hwc32":
        from .pallas_interleave import interleave_planar_u32
        return interleave_planar_u32(out, interpret=interpret)[:h * s,
                                                               :w * s]
    from .pallas_adaptive import unpack_planar
    return unpack_planar(out, h, w, s, c)


def packed_tail_supported(scale: int, twof: int, c: int) -> bool:
    """The lane-aligned matmul layout needs S*2F == 128 (the WeightPredictor
    family: S=4, 2F=32) and u32 packing needs c <= 4."""
    return int(scale) * twof == 128 and 1 <= c <= 4


def packed_tail_pallas(m, lr_f32, kout, bout, *, scale: int = 4,
                       step: int = 16, wstep: int = 128,
                       interpret: bool | None = None, layout: str = "hwc",
                       opaque_alpha: bool = False, halo: str = "zero"):
    """conv_out + tanh + 16-tap apply + round, one fused kernel.

    m:      [h, w, S, S, 2F] merged packed map (attended upsample features
            concat the per-phase offset constant), any float dtype — the
            matmuls run in m.dtype, tanh/apply in f32
    lr_f32: [h, w, c] LR pixels as f32 (0..255)
    kout:   [3, 3, 2F, 16] conv_out kernel;  bout: [16] bias
    halo:   "zero" — single-chip semantics: the kernel zero-pads m (conv
            SAME) and edge-pads lr itself. "rows" — band-sharded callers
            (parallel/spatial._learned_spatial) pass REAL neighbor rows:
            m is [h+2, w, ...] spanning band rows [-1, h+1) and lr_f32 is
            [h+3, w, c] spanning [-1, h+2); only columns are padded here.
    Returns u8 HWC [h*S, w*S, c] (layout="hwc"), RGBA32 ("hwc32"), or the
    raw planar u32 ("planar").
    """
    if m.ndim == 6:                     # tolerate the [1, ...] batch dim
        m = m[0]
    w = m.shape[1]
    h = m.shape[0] - 2 if halo == "rows" else m.shape[0]
    s = int(scale)
    twof = m.shape[-1]
    if not packed_tail_supported(s, twof, lr_f32.shape[-1]):
        raise ValueError(f"packed tail needs S*2F==128, c<=4; got "
                         f"S={s}, 2F={twof}, c={lr_f32.shape[-1]}")
    if halo == "rows" and lr_f32.shape[0] != h + 3:
        raise ValueError(f"halo='rows' expects lr rows == h+3 "
                         f"({h + 3}), got {lr_f32.shape[0]}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # tile dims: rows are the untiled outer dim (8-granular: they are the
    # SUBLANES of the planar-LR and output blocks); wstep is those blocks'
    # LANE dim, so it must stay 128-granular even for narrow frames —
    # Mosaic requires the last block dim divisible by 128 unless it equals
    # the (padded, hence larger) array extent
    step = min(step, _round_up(h, 8))
    wstep = min(wstep, _round_up(w, 128))
    return _packed_tail_dispatch(m.reshape(m.shape[0], w, s, s, twof),
                                 lr_f32, kout, bout, s, step, wstep,
                                 bool(interpret), layout,
                                 bool(opaque_alpha), halo)
