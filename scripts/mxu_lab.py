"""Lab: "vM" banded-matmul resize kernel — direct u8 HWC delivery on the MXU.

VERDICT r2 items 1+2 share one root cause: the phase-FMA kernel (vR) cannot
interleave column phases on the lane axis (Mosaic has no lane interleave), so
HWC delivery pays an XLA transpose epilogue as large as the kernel itself,
and the kernel's period-S row indexing restricts it to integer scales.

The vM idea: make the COLUMN pass a set of small banded matmuls. For each
128-lane output block, out[:, blk] = tmp[:, window] @ Wc[window, 128] — the
weight matrix encodes ANY output ordering (the MXU does not care that
adjacent output lanes belong to different phases), so the phase interleave
is free, the output is u8 HWC directly, and nothing restricts the
out-pixel -> in-window mapping to integer periods: rational scales are just
different (static, unrolled) window offsets + weights. The ROW pass becomes
one [rows_out, kr] @ [kr, lanes] matmul per tile (banded weights fold the
reference's clamp-at-border semantics exactly as _phase_plan_arrays does).

This script prototypes the kernel, checks ±1-LSB parity vs the f64 oracle,
and measures it on the chip against the shipped vR paths.

Usage:
  JAX_PLATFORMS=cpu python scripts/mxu_lab.py --check     # parity, interpret
  python scripts/mxu_lab.py --bench                       # TPU numbers
"""

from __future__ import annotations

import argparse
import functools
import sys
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from bicubic_interpolation_model_tpu.core import plan as planlib  # noqa: E402
from bicubic_interpolation_model_tpu.core.oracle import (  # noqa: E402
    resize_oracle, resize_oracle_rows)
from bicubic_interpolation_model_tpu.ops.pallas_resize import (  # noqa: E402
    _LEFT_EXTENT, _round_up)
from bicubic_interpolation_model_tpu.ops.pallas_phase import (  # noqa: E402
    _n_slots)

HI = jax.lax.Precision.HIGHEST


def _f32dot(a, b):
    return jax.lax.dot(a, b, precision=None,
                       preferred_element_type=jnp.float32)


def _mxu_kernel(wr_ref, wc_ref, aa, ab, ba, bb, out_ref, *,
                rows_out, kc, nblk, offs, c, wstep, halo_r, halo_w, out_u8,
                prec=HI, batched=False, split=False):
    hc = halo_w * c
    if halo_r or halo_w:
        top = jnp.concatenate([aa[0], ab[0, :, :hc]], axis=1)
        bot = jnp.concatenate([ba[0, :halo_r], bb[0, :halo_r, :hc]], axis=1)
        win = jnp.concatenate([top, bot], axis=0)
    else:
        win = aa[0]
    winf = win.astype(jnp.int32).astype(jnp.float32) if win.dtype == jnp.uint8 \
        else win.astype(jnp.float32)
    if split:
        # bf16 hi/lo compensated matmuls: u8 values are EXACT in bf16
        # (integers <= 255 fit the 8-bit significand); the f32 weights are
        # pre-split host-side as w = hi + lo with hi = bf16(w). Row pass
        # needs only the weight split (2 one-pass dots); the col pass also
        # splits tmp (3 one-pass dots: hi*hi + hi*lo + lo*hi). Residual
        # error ~2^-16 * 255 — far inside the +-1 LSB gate — at ~half the
        # cost of Mosaic's fp32 contract (6 passes).
        winb = winf.astype(jnp.bfloat16)
        tmp = _f32dot(wr_ref[0, 0], winb) + _f32dot(wr_ref[0, 1], winb)
        t_hi = tmp.astype(jnp.bfloat16)
        t_lo = (tmp - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        if batched:
            s_hi = jnp.stack([t_hi[:, offs[b] * c: offs[b] * c + kc]
                              for b in range(nblk)])
            s_lo = jnp.stack([t_lo[:, offs[b] * c: offs[b] * c + kc]
                              for b in range(nblk)])
            w_hi = wc_ref[0, 0].reshape(nblk, kc, 128)
            w_lo = wc_ref[0, 1].reshape(nblk, kc, 128)
            dn = (((2,), (1,)), ((0,), (0,)))
            acc = (jax.lax.dot_general(s_hi, w_hi, dn, precision=None,
                                       preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(s_hi, w_lo, dn, precision=None,
                                         preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(s_lo, w_hi, dn, precision=None,
                                         preferred_element_type=jnp.float32))
            if out_u8:
                acc = jnp.clip((acc + 0.5).astype(jnp.int32), 0, 255
                               ).astype(jnp.uint8)
            for b in range(nblk):
                out_ref[0, :, b * 128:(b + 1) * 128] = acc[b]
        else:
            for b in range(nblk):
                sh = t_hi[:, offs[b] * c: offs[b] * c + kc]
                sl = t_lo[:, offs[b] * c: offs[b] * c + kc]
                wh = wc_ref[0, 0, b * kc:(b + 1) * kc, :]
                wl = wc_ref[0, 1, b * kc:(b + 1) * kc, :]
                acc = _f32dot(sh, wh) + _f32dot(sh, wl) + _f32dot(sl, wh)
                if out_u8:
                    acc = jnp.clip((acc + 0.5).astype(jnp.int32), 0, 255
                                   ).astype(jnp.uint8)
                out_ref[0, :, b * 128:(b + 1) * 128] = acc
        return
    tmp = jax.lax.dot(wr_ref[...], winf, precision=prec)  # [rows_out, lanes]
    if batched:
        srcs = jnp.stack([tmp[:, offs[b] * c: offs[b] * c + kc]
                          for b in range(nblk)])           # [nblk, rows, kc]
        wcb = wc_ref[0].reshape(nblk, kc, 128)
        acc = jax.lax.dot_general(
            srcs, wcb, (((2,), (1,)), ((0,), (0,))), precision=prec)
        if out_u8:
            acc = jnp.clip((acc + 0.5).astype(jnp.int32), 0, 255
                           ).astype(jnp.uint8)
        for b in range(nblk):
            out_ref[0, :, b * 128:(b + 1) * 128] = acc[b]
    else:
        for b in range(nblk):
            src = tmp[:, offs[b] * c: offs[b] * c + kc]
            wcb = wc_ref[0, b * kc:(b + 1) * kc, :]
            acc = jax.lax.dot(src, wcb, precision=prec)   # [rows_out, 128]
            if out_u8:
                acc = jnp.clip((acc + 0.5).astype(jnp.int32), 0, 255
                               ).astype(jnp.uint8)
            out_ref[0, :, b * 128:(b + 1) * 128] = acc


def mxu_plan(method, h, w, c, scale, p, q, step_in, wstep, n_i, n_j,
             a=-0.5, lanczos_a=3):
    """Host-side weight build. Returns (wr, wc, offs, geometry dict)."""
    kw = ({"a": a} if method == "bicubic"
          else {"a": lanczos_a} if method == "lanczos" else {})
    plan_y = planlib.plan_axis(method, h, float(scale), **kw)
    plan_x = planlib.plan_axis(method, w, float(scale), **kw)
    left = lanczos_a - 1 if method == "lanczos" else _LEFT_EXTENT[method]
    # slot span: the reach of window slots k = idx + left - base, which for
    # nearest exceeds plan.taps (idx = round(ox) spans 2 cells per base)
    taps = _n_slots(method, 1 if p == q else 2, lanczos_a)

    assert (step_in * p) % q == 0, (step_in, p, q)
    rows_out = step_in * p // q
    out_px_tile = wstep * p // q
    assert (out_px_tile * c) % 128 == 0, (out_px_tile, c)
    ppb = 128 // c                       # out px per 128-lane block
    nblk = out_px_tile * c // 128
    kr = step_in + taps - 1

    # --- row weights Wr [n_i*rows_out, kr] ---
    wr = np.zeros((n_i * rows_out, kr), np.float32)
    for t in range(plan_y.taps):
        r = np.arange(plan_y.n_out)
        i_tile = r // rows_out
        k = plan_y.idx[:, t].astype(np.int64) + left - i_tile * step_in
        assert k.min() >= 0 and k.max() < kr, (k.min(), k.max(), kr)
        np.add.at(wr, (r, k), plan_y.w[:, t])

    # --- per-block window offsets (exact rational, tile-independent) ---
    offs = []
    for b in range(nblk):
        offs.append(int((Fraction(b * ppb) * q / p).__floor__()))
    # window width: widest block + slack for float-vs-rational deviation,
    # then trimmed to the actual maximum the scatter uses (tight_kc)
    kc_px = int(np.ceil(ppb * q / p)) + taps + 1

    # --- col weights Wc [n_j*nblk*kc, 128] ---
    kpx_max = 0
    for t in range(plan_x.taps):
        jpx = np.arange(plan_x.n_out)
        j_tile = jpx // out_px_tile
        b = (jpx % out_px_tile) // ppb
        start = np.array(offs, np.int64)[b]
        kpx = plan_x.idx[:, t].astype(np.int64) + left - j_tile * wstep - start
        assert kpx.min() >= 0 and kpx.max() < kc_px, (kpx.min(), kpx.max())
        kpx_max = max(kpx_max, int(kpx.max()))
    kc_px = kpx_max + 1                   # tight window (saves ~15% col FLOPs)
    kc = kc_px * c
    halo_w = max(0, max(o + kc_px for o in offs) - wstep)
    assert halo_w <= wstep, (halo_w, wstep)
    wc = np.zeros((n_j, nblk, kc, 128), np.float32)
    for t in range(plan_x.taps):
        jpx = np.arange(plan_x.n_out)
        j_tile = jpx // out_px_tile
        b = (jpx % out_px_tile) // ppb
        lane = (jpx % out_px_tile) % ppb
        start = np.array(offs, np.int64)[b]
        kpx = plan_x.idx[:, t].astype(np.int64) + left \
            - j_tile * wstep - start
        assert kpx.min() >= 0 and kpx.max() < kc_px, \
            (kpx.min(), kpx.max(), kc_px)
        for ch in range(c):
            np.add.at(wc, (j_tile, b, kpx * c + ch, lane * c + ch),
                      plan_x.w[:, t])
    wc = wc.reshape(n_j, nblk * kc, 128)
    geom = dict(rows_out=rows_out, out_px_tile=out_px_tile, nblk=nblk,
                kr=kr, kc=kc, kc_px=kc_px, halo_r=taps - 1, halo_w=halo_w,
                left=left, taps=taps,
                n_out_h=plan_y.n_out, n_out_w=plan_x.n_out)
    return wr, wc, tuple(offs), geom


def _split_bf16(w):
    hi = w.astype(np.float32).astype(jnp.bfloat16)
    lo = (w - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.stack([np.asarray(hi), np.asarray(lo)])


@functools.partial(jax.jit, static_argnames=(
    "scale", "method", "a", "step_in", "wstep", "interpret", "lanczos_a",
    "precision", "batched", "split"))
def resize_mxu(img_bhwc, scale: float, method: str = "bicubic",
               a: float = -0.5, step_in: int = 8, wstep: int = 128,
               interpret: bool = False, lanczos_a: int = 3,
               precision: str = "highest", batched: bool = False,
               split: bool = False):
    b, h, w, c = img_bhwc.shape
    frac = Fraction(float(scale)).limit_denominator(64)
    p, q = frac.numerator, frac.denominator
    # tile validity: q | step_in (integer out rows per tile) and
    # 8 | rows_out (u8 second-minor constraint); same for wstep with the
    # 128-lane out-block granularity
    unit = q * 8 // np.gcd(p, 8)
    step_in = _round_up(step_in, unit)
    wunit = q * 128 // np.gcd(p * c, 128) // 1
    wunit = int(np.lcm(int(wunit), q))
    wstep = _round_up(wstep, wunit)
    n_i = _round_up(h, step_in) // step_in
    n_j = _round_up(w, wstep) // wstep
    wr_np, wc_np, offs, g = mxu_plan(method, h, w, c, scale, p, q,
                                     step_in, wstep, n_i, n_j,
                                     a=a, lanczos_a=lanczos_a)
    wr, wc = jnp.asarray(wr_np), jnp.asarray(wc_np)
    left, halo_r, halo_w = g["left"], g["halo_r"], g["halo_w"]
    rows_out, nblk, kc = g["rows_out"], g["nblk"], g["kc"]

    x = jnp.pad(img_bhwc, ((0, 0), (left, (n_i + 1) * step_in - h - left),
                           (left, (n_j + 1) * wstep - w - left), (0, 0)))
    x2 = x.reshape(b, x.shape[1], x.shape[2] * c)
    out_u8 = img_bhwc.dtype == jnp.uint8

    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision("default"),
            "default": jax.lax.Precision.DEFAULT}[precision]
    kernel = functools.partial(
        _mxu_kernel, rows_out=rows_out, kc=kc, nblk=nblk, offs=offs, c=c,
        wstep=wstep, halo_r=halo_r, halo_w=halo_w, out_u8=out_u8,
        prec=prec, batched=batched, split=split)
    if split:
        wr = jnp.asarray(_split_bf16(wr_np))[None]       # [1,2,rows,kr]
        wc = jnp.asarray(np.stack([_split_bf16(wc_np[j])
                                   for j in range(n_j)]))  # [nj,2,nbk*kc,128]
    out = pl.pallas_call(
        kernel,
        grid=(b, n_j, n_i),
        in_specs=[
            (pl.BlockSpec((1, 2, rows_out, g["kr"]),
                          lambda bi, j, i: (0, 0, i, 0),
                          memory_space=pltpu.VMEM) if split else
             pl.BlockSpec((rows_out, g["kr"]), lambda bi, j, i: (i, 0),
                          memory_space=pltpu.VMEM)),
            (pl.BlockSpec((1, 2, nblk * kc, 128),
                          lambda bi, j, i: (j, 0, 0, 0),
                          memory_space=pltpu.VMEM) if split else
             pl.BlockSpec((1, nblk * kc, 128), lambda bi, j, i: (j, 0, 0),
                          memory_space=pltpu.VMEM)),
            pl.BlockSpec((1, step_in, wstep * c),
                         lambda bi, j, i: (bi, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step_in, wstep * c),
                         lambda bi, j, i: (bi, i, j + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step_in, wstep * c),
                         lambda bi, j, i: (bi, i + 1, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step_in, wstep * c),
                         lambda bi, j, i: (bi, i + 1, j + 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_out, nblk * 128),
                               lambda bi, j, i: (bi, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_i * rows_out, n_j * nblk * 128),
            jnp.uint8 if out_u8 else jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * b * n_i * rows_out
                      * (n_j * wstep * c * g["kr"] / q * p
                         + n_j * nblk * 128 * kc)),
            bytes_accessed=int(x2.size + b * n_i * rows_out * n_j * nblk * 128),
            transcendentals=0,
        ),
        interpret=interpret,
    )(wr, wc, x2, x2, x2, x2)
    return out                       # [B, rows_pad, out_px_pad*c] u8 HWC


def hwc(out, h_out, w_out, c):
    return np.asarray(out)[:, :h_out, :w_out * c].reshape(
        -1, h_out, w_out, c)


def _img(h, w, c=4, seed=0):
    rng = np.random.default_rng(seed)
    im = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    if c == 4:
        im[..., 3] = 255
    return im


def check(interpret=True):
    cases = [
        ("bicubic", 4.0, 23, 37, 4, 8, 32),
        ("bicubic", 4.0, 64, 64, 4, 8, 32),
        ("bicubic", 2.0, 40, 48, 4, 8, 64),
        ("bilinear", 4.0, 23, 37, 4, 8, 32),
        ("nearest", 4.0, 23, 37, 4, 8, 32),
        ("lanczos", 4.0, 23, 37, 4, 8, 32),
        ("bicubic", 1.5, 40, 64, 4, 8, 64),
        ("bicubic", 2.5, 40, 64, 4, 8, 64),
        ("bicubic", 3.0, 23, 37, 4, 8, 32),
        ("bicubic", 4.0, 23, 37, 1, 8, 128),
        ("lanczos", 1.5, 40, 64, 4, 8, 64),
    ]
    ok = True
    for method, s, h, w, c, step, wstep in cases:
        for split, batched in [(False, False), (True, True)]:
            img = _img(h, w, c)
            out = resize_mxu(jnp.asarray(img[None]), s, method,
                             step_in=step, wstep=wstep, interpret=interpret,
                             split=split, batched=batched)
            want = resize_oracle(img, s, method)
            got = hwc(out, want.shape[0], want.shape[1], c)[0]
            d = np.abs(got.astype(np.int64) - want.astype(np.int64)).max()
            print(f"{method:9s} s={s:<4} {h}x{w}x{c} step={step} "
                  f"wstep={wstep} split={int(split)}  max_delta={d}")
            ok &= d <= 1
    print("CHECK", "OK" if ok else "FAIL")
    return ok


def bench():
    import time
    from bicubic_interpolation_model_tpu.bench.suite import (
        bench_program_output)

    h, w, c = 1080, 1920, 4
    cases = [
        # (scale, step, wstep, precision, batched, split)
        (4.0, 48, 128, "x", False, True),
        (4.0, 64, 128, "x", False, True),
        (4.0, 80, 128, "x", False, True),
        (1.5, 16, 128, "x", False, True),
        (1.5, 48, 128, "x", False, True),
        (2.5, 8, 128, "x", False, True),
        (2.5, 16, 128, "x", False, True),
        (2.0, 32, 128, "x", False, True),
        (2.0, 64, 128, "x", False, True),
        (3.0, 8, 128, "x", False, True),
        (3.0, 16, 128, "x", False, True),
    ]
    for (s, step, wstep, precision, batched, split) in cases:
        img = jax.device_put(_img(h, w, c))
        prec = "highest" if precision == "x" else precision

        def fn(x, s=s, step=step, wstep=wstep, precision=prec,
               batched=batched, split=split):
            return resize_mxu(x[None], s, "bicubic", step_in=step,
                              wstep=wstep, interpret=False,
                              precision=precision, batched=batched,
                              split=split)[0]

        # parity at full geometry via sampled rows
        out = fn(jnp.asarray(img))
        n_rows = planlib.out_size(h, s)
        n_cols = planlib.out_size(w, s)
        rows = np.arange(0, n_rows, 67)
        want = resize_oracle_rows(np.asarray(img), s, rows, "bicubic")
        got = np.asarray(jnp.take(out, jnp.asarray(rows), axis=0)
                         )[:, :n_cols * c].reshape(len(rows), n_cols, c)
        d = np.abs(got.astype(np.int64) - want.astype(np.int64)).max()

        t0 = time.perf_counter()
        per = bench_program_output(fn, jnp.asarray(img))
        dt = time.perf_counter() - t0
        gpix = n_rows * n_cols / per / 1e9
        print(f"vM s={s} step={step} wstep={wstep} prec={precision} "
              f"batched={int(batched)} split={int(split)}: "
              f"{per*1e3:.2f} ms/frame "
              f"= {gpix:.1f} GPix/s delivered-HWC  max_delta={d} "
              f"(bench {dt:.0f}s)", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()
    if args.check:
        ok = check(interpret=jax.default_backend() != "tpu")
        sys.exit(0 if ok else 1)
    if args.bench:
        bench()
