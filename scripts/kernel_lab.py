"""Kernel lab: competing Pallas phase-kernel variants, benched on real TPU.

Round-2 headroom hunt (VERDICT r1 item 1): the shipped kernel plateaus at
~8.3 GPix/s independent of tap count, so per-output fixed costs dominate —
the 16 live u8 planes before the final stack (register spills), the
round/clip/cast chain, and the XLA column-interleave epilogue. Each variant
attacks one of those; this script measures them head-to-head.

Usage:  python scripts/kernel_lab.py [--variants v0,vA,...] [--shapes 1080p]
        (run from /root/repo, no PYTHONPATH, real TPU)
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bicubic_interpolation_model_tpu.core.oracle import resize_oracle
from bicubic_interpolation_model_tpu.ops.pallas_phase import (
    _phase_plan_arrays, _round_up,
)

# --------------------------------------------------------------------------
# kernel bodies
# --------------------------------------------------------------------------


def _window(aa_ref, ab_ref, ba_ref, bb_ref, halo, step, c):
    hc = halo * c
    if halo:
        top = jnp.concatenate([aa_ref[0], ab_ref[0, :, :hc]], axis=1)
        bot = jnp.concatenate([ba_ref[0, :halo], bb_ref[0, :halo, :hc]],
                              axis=1)
        win = jnp.concatenate([top, bot], axis=0)
    else:
        win = aa_ref[0]
    return win.astype(jnp.int32).astype(jnp.float32) \
        if win.dtype == jnp.uint8 else win.astype(jnp.float32)


def _round_legacy(acc):
    acc = jnp.clip(jnp.floor(acc + 0.5), 0, 255)
    return acc.astype(jnp.int32).astype(jnp.uint8)


def _round_folded(acc):
    # caller already folded +0.5 into the accumulator init; trunc == floor
    # for acc >= 0 and the i32 clip fixes the (rare) negative undershoot
    return jnp.clip(acc.astype(jnp.int32), 0, 255).astype(jnp.uint8)


def kernel_v0(wrow_ref, wcol_ref, aa, ab, ba, bb, out_ref, *, scale, step,
              wstep, c, taps, out_u8):
    """Shipped round-1 kernel: per-(p,q) planes + 16-plane u8 stack."""
    halo = taps - 1
    wc = wstep * c
    winf = _window(aa, ab, ba, bb, halo, step, c)
    planes = [[None] * scale for _ in range(scale)]
    for q in range(scale):
        tmp = None
        for n in range(taps):
            w = wrow_ref[:, q * taps + n][:, None]
            term = w * winf[n:n + step, :]
            tmp = term if tmp is None else tmp + term
        for p in range(scale):
            acc = None
            for m in range(taps):
                wv = wcol_ref[p * taps + m:p * taps + m + 1, :]
                term = wv * tmp[:, m * c:m * c + wc]
                acc = term if acc is None else acc + term
            if out_u8:
                acc = _round_legacy(acc)
            planes[p][q] = acc
    for p in range(scale):
        out_ref[0, p] = jnp.stack(planes[p], axis=1).reshape(step * scale, wc)


def kernel_vC(wrow_ref, wcol_ref, aa, ab, ba, bb, out_ref, *, scale, step,
              wstep, c, taps, out_u8):
    """v0 structure + folded rounding chain (isolates the cast savings)."""
    halo = taps - 1
    wc = wstep * c
    winf = _window(aa, ab, ba, bb, halo, step, c)
    planes = [[None] * scale for _ in range(scale)]
    for q in range(scale):
        tmp = None
        for n in range(taps):
            w = wrow_ref[:, q * taps + n][:, None]
            term = w * winf[n:n + step, :]
            tmp = term if tmp is None else tmp + term
        for p in range(scale):
            acc = None
            for m in range(taps):
                wv = wcol_ref[p * taps + m:p * taps + m + 1, :]
                term = wv * tmp[:, m * c:m * c + wc]
                acc = term + 0.5 if acc is None else acc + term
            if out_u8:
                acc = _round_folded(acc)
            planes[p][q] = acc
    for p in range(scale):
        out_ref[0, p] = jnp.stack(planes[p], axis=1).reshape(step * scale, wc)


def kernel_vA(wrow_ref, wcol_ref, aa, ab, ba, bb, out_ref, *, scale, step,
              wstep, c, taps, out_u8):
    """Interleave the q row-phases ONCE on the f32 tmp (one 4-plane stack at
    LR width) instead of stacking 16 u8 output planes; folded rounding."""
    halo = taps - 1
    wc = wstep * c
    winf = _window(aa, ab, ba, bb, halo, step, c)
    tmps = []
    for q in range(scale):
        tmp = None
        for n in range(taps):
            w = wrow_ref[:, q * taps + n][:, None]
            term = w * winf[n:n + step, :]
            tmp = term if tmp is None else tmp + term
        tmps.append(tmp)
    # [step, S, (wstep+halo)*c] -> [step*S, ...]: rows now fully interleaved
    tmp_i = jnp.stack(tmps, axis=1).reshape(step * scale, winf.shape[1])
    for p in range(scale):
        acc = None
        for m in range(taps):
            wv = wcol_ref[p * taps + m:p * taps + m + 1, :]
            term = wv * tmp_i[:, m * c:m * c + wc]
            acc = term + 0.5 if acc is None else acc + term
        if out_u8:
            acc = _round_folded(acc)
        out_ref[0, p] = acc


def kernel_vR(wrowi_ref, wcol_ref, aa, ab, ba, bb, out_ref, *, scale, step,
              wstep, c, taps, out_u8):
    """Row pass directly at interleaved resolution via jnp.repeat of the
    window rows (out row r*S+q reads window rows r..r+taps): no stack at all.
    wrowi is the interleaved [step*S, taps] weight layout."""
    halo = taps - 1
    wc = wstep * c
    winf = _window(aa, ab, ba, bb, halo, step, c)
    rep = jnp.repeat(winf, scale, axis=0)          # [(step+halo)*S, ...]
    tmp_i = None
    for n in range(taps):
        w = wrowi_ref[:, n][:, None]
        term = w * rep[n * scale:(n + step) * scale, :]
        tmp_i = term if tmp_i is None else tmp_i + term
    for p in range(scale):
        acc = None
        for m in range(taps):
            wv = wcol_ref[p * taps + m:p * taps + m + 1, :]
            term = wv * tmp_i[:, m * c:m * c + wc]
            acc = term + 0.5 if acc is None else acc + term
        if out_u8:
            acc = _round_folded(acc)
        out_ref[0, p] = acc


def kernel_vS(wrow_ref, wcol_ref, aa, ab, ba, bb, out_ref, *, scale, step,
              wstep, c, taps, out_u8):
    """v0 compute but strided sublane stores out_ref[0, p, q::S] per (p, q):
    no stack, tests Mosaic strided-store lowering."""
    halo = taps - 1
    wc = wstep * c
    winf = _window(aa, ab, ba, bb, halo, step, c)
    for q in range(scale):
        tmp = None
        for n in range(taps):
            w = wrow_ref[:, q * taps + n][:, None]
            term = w * winf[n:n + step, :]
            tmp = term if tmp is None else tmp + term
        for p in range(scale):
            acc = None
            for m in range(taps):
                wv = wcol_ref[p * taps + m:p * taps + m + 1, :]
                term = wv * tmp[:, m * c:m * c + wc]
                acc = term + 0.5 if acc is None else acc + term
            if out_u8:
                acc = _round_folded(acc)
            out_ref[0, p, q::scale, :] = acc


def kernel_vR2(wrowi_ref, wcol_ref, aa, ab, ba, bb, out_ref, *, scale, step,
               wstep, c, taps, out_u8):
    """vR + rounding bias folded into the ROW pass (cost 1/S per out elem
    instead of 1): col weights sum to 1 per output, so +0.5 on tmp lands as
    +0.5 (±1e-7 from f32 weight normalization) on the accumulator."""
    halo = taps - 1
    wc = wstep * c
    winf = _window(aa, ab, ba, bb, halo, step, c)
    rep = jnp.repeat(winf, scale, axis=0)
    tmp_i = None
    for n in range(taps):
        w = wrowi_ref[:, n][:, None]
        term = w * rep[n * scale:(n + step) * scale, :]
        tmp_i = term + 0.5 if tmp_i is None else tmp_i + term
    for p in range(scale):
        acc = None
        for m in range(taps):
            wv = wcol_ref[p * taps + m:p * taps + m + 1, :]
            term = wv * tmp_i[:, m * c:m * c + wc]
            acc = term if acc is None else acc + term
        if out_u8:
            acc = _round_folded(acc)
        out_ref[0, p] = acc


def kernel_rowonly(wrowi_ref, wcol_ref, aa, ab, ba, bb, out_ref, *, scale,
                   step, wstep, c, taps, out_u8):
    """Probe: row pass + repeat + round + store, NO column FMA."""
    halo = taps - 1
    wc = wstep * c
    winf = _window(aa, ab, ba, bb, halo, step, c)
    rep = jnp.repeat(winf, scale, axis=0)
    tmp_i = None
    for n in range(taps):
        w = wrowi_ref[:, n][:, None]
        term = w * rep[n * scale:(n + step) * scale, :]
        tmp_i = term + 0.5 if tmp_i is None else tmp_i + term
    for p in range(scale):
        acc = tmp_i[:, :wc]
        if out_u8:
            acc = _round_folded(acc)
        out_ref[0, p] = acc


def kernel_null(wrow_ref, wcol_ref, aa, ab, ba, bb, out_ref, *, scale, step,
                wstep, c, taps, out_u8):
    """Floor probe: window cast + round + broadcast store (no FMA)."""
    wc = wstep * c
    winf = _window(aa, ab, ba, bb, taps - 1, step, c)
    v = winf[:step, :wc]
    if out_u8:
        v = _round_folded(v)
    big = jnp.concatenate([v] * scale, axis=0)
    for p in range(scale):
        out_ref[0, p] = big


def kernel_vT(wrowi_ref, wcol_ref, aa, ab, ba, bb, out_ref, *, scale, step,
              wstep, c, taps, out_u8):
    """Fully-fused HWC kernel: vR row/col passes + IN-KERNEL column-phase
    interleave. Lane-dim interleaves are illegal in Mosaic, so the planar
    phase accs are transposed (lanes→sublanes), interleaved as a C-grouped
    sublane reshape (legal), and transposed back — no XLA epilogue at all."""
    halo = taps - 1
    wc = wstep * c
    winf = _window(aa, ab, ba, bb, halo, step, c)
    rep = jnp.repeat(winf, scale, axis=0)
    tmp_i = None
    for n in range(taps):
        w = wrowi_ref[:, n][:, None]
        term = w * rep[n * scale:(n + step) * scale, :]
        tmp_i = term + 0.5 if tmp_i is None else tmp_i + term
    rows = step * scale
    accs = []
    for p in range(scale):
        acc = None
        for m in range(taps):
            wv = wcol_ref[p * taps + m:p * taps + m + 1, :]
            term = wv * tmp_i[:, m * c:m * c + wc]
            acc = term if acc is None else acc + term
        accs.append(acc.T.reshape(wstep, c, rows))   # [wstep, C, rows] f32
    # stack phases between the pixel and channel axes, merge on sublanes:
    # inter[(X*S+p)*C + ch] = accs[p][X, ch] — a C-grouped lane interleave,
    # done legally on sublanes
    inter = jnp.stack(accs, axis=1).reshape(wstep * scale * c, rows)
    outt = inter.T                                 # [rows, wstep*S*C]
    if out_u8:
        outt = _round_folded(outt)
    out_ref[0] = outt


_KERNELS = {"v0": kernel_v0, "vC": kernel_vC, "vA": kernel_vA,
            "vR": kernel_vR, "vR2": kernel_vR2, "vS": kernel_vS, "vT": kernel_vT,
            "rowonly": kernel_rowonly, "null": kernel_null}
_INTERLEAVED_WROW = {"vR", "vR2", "vT", "rowonly"}


# --------------------------------------------------------------------------
# dispatch wrapper (mirrors ops/pallas_phase._phase_call)
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("variant", "scale", "method", "step", "wstep",
                              "epilogue", "interpret"))
def resize_variant(img_bhwc, variant, scale, method="bicubic", *, step=16,
                   wstep=512, epilogue="xla", interpret=False):
    b, h, w, c = img_bhwc.shape
    s = int(scale)
    n_i = _round_up(h, step) // step
    n_j = _round_up(w, wstep) // wstep
    wrow_np, wcol_np, taps, left = _phase_plan_arrays(
        method, h, w, c, s, -0.5, 3, step, wstep, n_i, n_j)
    if variant in _INTERLEAVED_WROW:
        rows = wrow_np.shape[0]
        wrow_np = wrow_np.reshape(rows, s, taps).reshape(rows * s, taps)
        wrow_spec = pl.BlockSpec((step * s, taps), lambda bi, i, j: (i, 0),
                                 memory_space=pltpu.VMEM)
    else:
        wrow_spec = pl.BlockSpec((step, s * taps), lambda bi, i, j: (i, 0),
                                 memory_space=pltpu.VMEM)
    wrow = jnp.asarray(wrow_np)
    wcol = jnp.asarray(wcol_np)
    halo = taps - 1

    x = jnp.pad(img_bhwc, ((0, 0), (left, (n_i + 1) * step - h - left),
                           (left, (n_j + 1) * wstep - w - left), (0, 0)))
    x2 = x.reshape(b, x.shape[1], x.shape[2] * c)
    in_dtype = img_bhwc.dtype
    out_u8 = in_dtype == jnp.uint8
    out_rows = n_i * step * s
    kernel = functools.partial(_KERNELS[variant], scale=s, step=step,
                               wstep=wstep, c=c, taps=taps, out_u8=out_u8)
    if variant == "vT":
        out = pl.pallas_call(
            kernel,
            grid=(b, n_i, n_j),
            in_specs=[
                wrow_spec,
                pl.BlockSpec((s * taps, wstep * c), lambda bi, i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, step, wstep * c),
                             lambda bi, i, j: (bi, i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, step, wstep * c),
                             lambda bi, i, j: (bi, i, j + 1),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, step, wstep * c),
                             lambda bi, i, j: (bi, i + 1, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, step, wstep * c),
                             lambda bi, i, j: (bi, i + 1, j + 1),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, step * s, wstep * s * c),
                                   lambda bi, i, j: (bi, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (b, out_rows, n_j * wstep * s * c),
                jnp.uint8 if out_u8 else jnp.float32),
            interpret=interpret,
        )(wrow, wcol, x2, x2, x2, x2)
        out = out[:, :h * s, :w * s * c].reshape(b, h * s, w * s, c)
        if not out_u8:
            out = out.astype(in_dtype)
        return out
    out = pl.pallas_call(
        kernel,
        grid=(b, n_i, n_j),
        in_specs=[
            wrow_spec,
            pl.BlockSpec((s * taps, wstep * c), lambda bi, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step, wstep * c), lambda bi, i, j: (bi, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step, wstep * c), lambda bi, i, j: (bi, i, j + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step, wstep * c), lambda bi, i, j: (bi, i + 1, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step, wstep * c),
                         lambda bi, i, j: (bi, i + 1, j + 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, step * s, wstep * c),
                               lambda bi, i, j: (bi, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, s, out_rows, n_j * wstep * c),
            jnp.uint8 if out_u8 else jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * b * out_rows * w * s * c * (taps + taps / s)),
            bytes_accessed=int(x2.size * x2.dtype.itemsize
                               + b * out_rows * w * s * c),
            transcendentals=0,
        ),
        interpret=interpret,
    )(wrow, wcol, x2, x2, x2, x2)
    if epilogue == "none":
        return out
    if epilogue == "bitcast" and out_u8 and c == 4:
        # pack the 4 u8 channels into one i32 lane, transpose with a 4-wide
        # i32 minor dim (vs the tiny u8 minors that cripple the XLA pass),
        # unpack: same interleave, fraction of the cost.
        o = out[:, :, :h * s, :w * c].reshape(b, s, h * s, w, c)
        o32 = jax.lax.bitcast_convert_type(o, jnp.int32)   # [b,s,Ho,W]
        t = o32.transpose(0, 2, 3, 1)                      # [b,Ho,W,s]
        u8 = jax.lax.bitcast_convert_type(t, jnp.uint8)    # [b,Ho,W,s,4]
        return u8.reshape(b, h * s, w * s, c)
    out = out[:, :, :h * s, :w * c].reshape(b, s, h * s, w, c)
    out = out.transpose(0, 2, 3, 1, 4).reshape(b, h * s, w * s, c)
    if not out_u8:
        out = out.astype(in_dtype)
    return out


# --------------------------------------------------------------------------
# vP: channel-planar kernel — BOTH phase interleaves in-kernel via repeat
# (rows on sublanes, cols on lanes); output [B, C, H_out, W_out], no epilogue
# --------------------------------------------------------------------------


def kernel_vP(wrowi_ref, wcoli_ref, aa, ab, ba, bb, out_ref, *, scale, step,
              wstep, taps, out_u8):
    halo = taps - 1
    if halo:
        top = jnp.concatenate([aa[0], ab[0, :, :halo]], axis=1)
        bot = jnp.concatenate([ba[0, :halo], bb[0, :halo, :halo]], axis=1)
        win = jnp.concatenate([top, bot], axis=0)
    else:
        win = aa[0]
    winf = win.astype(jnp.int32).astype(jnp.float32) \
        if win.dtype == jnp.uint8 else win.astype(jnp.float32)
    rep = jnp.repeat(winf, scale, axis=0)
    tmp_i = None
    for n in range(taps):
        w = wrowi_ref[:, n][:, None]
        term = w * rep[n * scale:(n + step) * scale, :]
        tmp_i = term + 0.5 if tmp_i is None else tmp_i + term
    rep2 = jnp.repeat(tmp_i, scale, axis=1)       # lane-dim element repeat
    acc = None
    for m in range(taps):
        wv = wcoli_ref[m:m + 1, :]
        term = wv * rep2[:, m * scale:(m + wstep) * scale]
        acc = term if acc is None else acc + term
    if out_u8:
        acc = _round_folded(acc)
    out_ref[0] = acc


@functools.partial(
    jax.jit, static_argnames=("scale", "method", "step", "wstep", "to_hwc",
                              "interpret"))
def resize_vP(img_bhwc, scale, method="bicubic", *, step=8, wstep=512,
              to_hwc=True, interpret=False):
    b, h, w, c = img_bhwc.shape
    s = int(scale)
    n_i = _round_up(h, step) // step
    n_j = _round_up(w, wstep) // wstep
    wrow_np, _, taps, left = _phase_plan_arrays(
        method, h, w, 1, s, -0.5, 3, step, wstep, n_i, n_j)
    _, wcol_np, _, _ = _phase_plan_arrays(
        method, h, w, 1, s, -0.5, 3, step, wstep, n_i, n_j)
    rows = wrow_np.shape[0]
    wrowi = jnp.asarray(
        wrow_np.reshape(rows, s, taps).reshape(rows * s, taps))
    # wcol (c=1): [S*T, Wp] -> interleaved-output layout [T, Wp*S]
    cols = wcol_np.shape[1]
    wcoli = jnp.asarray(wcol_np.reshape(s, taps, cols)
                        .transpose(1, 2, 0).reshape(taps, cols * s))
    halo = taps - 1

    xT = jnp.transpose(img_bhwc, (0, 3, 1, 2)).reshape(b * c, h, w)
    x = jnp.pad(xT, ((0, 0), (left, (n_i + 1) * step - h - left),
                     (left, (n_j + 1) * wstep - w - left)))
    in_dtype = img_bhwc.dtype
    out_u8 = in_dtype == jnp.uint8
    kernel = functools.partial(kernel_vP, scale=s, step=step, wstep=wstep,
                               taps=taps, out_u8=out_u8)
    out = pl.pallas_call(
        kernel,
        grid=(b * c, n_i, n_j),
        in_specs=[
            pl.BlockSpec((step * s, taps), lambda bi, i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((taps, wstep * s), lambda bi, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step, wstep), lambda bi, i, j: (bi, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step, wstep), lambda bi, i, j: (bi, i, j + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step, wstep), lambda bi, i, j: (bi, i + 1, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step, wstep),
                         lambda bi, i, j: (bi, i + 1, j + 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, step * s, wstep * s),
                               lambda bi, i, j: (bi, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b * c, n_i * step * s, n_j * wstep * s),
            jnp.uint8 if out_u8 else jnp.float32),
        interpret=interpret,
    )(wrowi, wcoli, x, x, x, x)
    out = out[:, :h * s, :w * s].reshape(b, c, h * s, w * s)
    if to_hwc:
        out = jnp.transpose(out, (0, 2, 3, 1))
    if not out_u8:
        out = out.astype(in_dtype)
    return out


def check_parity_vP(step, wstep, h=96, w=64, scale=4):
    img = _make_input(h, w)
    want = resize_oracle(img, float(scale), "bicubic").astype(np.int32)
    got = np.asarray(resize_vP(
        img[None], scale, step=min(step, h), wstep=min(wstep, w),
        interpret=jax.default_backend() != "tpu"))[0].astype(np.int32)
    return int(np.abs(got - want).max())


def bench_vP(h, w, scale=4, step=8, wstep=512, to_hwc=True, k_lo=5, k_hi=50,
             reps=2):
    img = jax.device_put(_make_input(h, w))

    @jax.jit
    def chained(img, k):
        def body(i, acc):
            x = img ^ i.astype(jnp.uint8)
            y = resize_vP(x[None], scale, step=step, wstep=wstep,
                          to_hwc=to_hwc)
            return acc + jnp.sum(y[0, ::64, ::64].astype(jnp.int32)) \
                if to_hwc else acc + jnp.sum(
                    y[0, :, ::64, ::64].astype(jnp.int32))
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    int(np.asarray(chained(img, 1)))

    def timed(k):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            int(np.asarray(chained(img, k)))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(k_lo), timed(k_hi)
    per_frame = max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)
    out_pix = h * scale * w * scale
    return per_frame * 1e3, out_pix / per_frame / 1e9


# --------------------------------------------------------------------------
# parity + chained-K bench
# --------------------------------------------------------------------------


def _make_input(h, w, c=4, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    img[..., 3] = 255
    return img


def check_parity(variant, step, wstep, h=96, w=64, scale=4,
                 epilogue="xla"):
    img = _make_input(h, w)
    want = resize_oracle(img, float(scale), "bicubic").astype(np.int32)
    got = np.asarray(resize_variant(
        img[None], variant, scale, step=min(step, h), wstep=min(wstep, w),
        epilogue=epilogue,
        interpret=jax.default_backend() != "tpu"))[0].astype(np.int32)
    return int(np.abs(got - want).max())


def bench(variant, h, w, scale=4, step=16, wstep=512, epilogue="xla",
          k_lo=5, k_hi=50, reps=2):
    img = jax.device_put(_make_input(h, w))

    @jax.jit
    def chained(img, k):
        def body(i, acc):
            x = img ^ i.astype(jnp.uint8)
            y = resize_variant(x[None], variant, scale, step=step,
                               wstep=wstep, epilogue=epilogue)
            return acc + jnp.sum(y[0, ::64, ::64].astype(jnp.int32)) \
                if epilogue != "none" else acc + jnp.sum(
                    y[0, :, ::64, ::64].astype(jnp.int32))
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    int(np.asarray(chained(img, 1)))

    def timed(k):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            int(np.asarray(chained(img, k)))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(k_lo), timed(k_hi)
    per_frame = max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)
    out_pix = h * scale * w * scale
    return per_frame * 1e3, out_pix / per_frame / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="null,v0,vC,vA,vR,vS")
    ap.add_argument("--step", type=int, default=16)
    ap.add_argument("--wstep", type=int, default=512)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--epilogue", default="xla", choices=["xla", "bitcast", "none"])
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} step={args.step} "
          f"wstep={args.wstep} shape={args.h}x{args.w} "
          f"epilogue={args.epilogue}")
    for v in args.variants.split(","):
        try:
            if v in ("vP", "vP_planar"):
                if not args.skip_parity:
                    d = check_parity_vP(args.step, args.wstep)
                    if d > 1:
                        print(f"{v:6s} PARITY FAIL max_delta={d}")
                        continue
                t0 = time.perf_counter()
                ms, gpix = bench_vP(args.h, args.w, step=args.step,
                                    wstep=args.wstep, to_hwc=v == "vP")
                print(f"{v:6s} {ms:8.3f} ms/frame  {gpix:7.2f} GPix/s   "
                      f"(wall incl compile {time.perf_counter()-t0:.0f}s)")
                continue
            if not args.skip_parity and v not in ("null", "rowonly"):
                d = check_parity(v, args.step, args.wstep,
                                 epilogue=args.epilogue)
                if d > 1:
                    print(f"{v:6s} PARITY FAIL max_delta={d}")
                    continue
            t0 = time.perf_counter()
            ms, gpix = bench(v, args.h, args.w, step=args.step,
                             wstep=args.wstep, epilogue=args.epilogue)
            print(f"{v:6s} {ms:8.3f} ms/frame  {gpix:7.2f} GPix/s   "
                  f"(wall incl compile {time.perf_counter()-t0:.0f}s)")
        except Exception as e:
            msg = f"{type(e).__name__}: {e}"
            print(f"{v:6s} FAILED {msg[:300]}")


if __name__ == "__main__":
    main()
