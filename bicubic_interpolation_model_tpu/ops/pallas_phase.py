"""Fused phase-FMA Pallas kernel — the speed-of-light resize path.

Where :mod:`.pallas_resize` spends MXU flops on banded dense matmuls (~33x
more multiplies than the 4 taps need), this kernel exploits the phase
structure of integer upscales directly on the VPU:

* the image stays HWC, viewed as [H, W*C] so channels ride the lane axis —
  no CHW transposes anywhere;
* row pass at interleaved output-row resolution: the window rows are
  sublane-repeated by S so output row r*S+q reads rows r..r+taps as plain
  shifted slices — no per-(p,q) planes, no stack, minimal live registers
  (round 2 "vR" redesign, +19%..2.4x over the round-1 kernel);
* col pass: out_p[:, X*C+c] = Σ_m wcol[p, m, X*C+c] * tmp[:, (X+m)*C+c]
  — the tap shift is m*C lanes, weights pre-repeated C times per pixel;
* column phases stay planar in the kernel output (lane-dim interleaves
  don't lower in Mosaic: no strided stores, no lane repeats) and one XLA
  u8 transpose interleaves them outside — or is skipped entirely with
  layout="planar";
* exact reference semantics including borders: plan weights are scattered
  into window *slots* t = idx - (base - left), which folds all clamp
  handling (duplicate clamped taps accumulate) and phase-dependent tap
  offsets (nearest) into the weights — the input needs only zero padding.
  uint8 in → JS-rounded uint8 out, fused.

The overlapping input windows are expressed as FOUR BlockSpec fetches (the
tile and its row/col/corner halo neighbors) instead of manual DMA, so Mosaic
double-buffers them across grid steps automatically. Grid: (row tiles,
col tiles); both axes tiled because Mosaic rejects multi-thousand-lane
blocks.

Works for every separable kernel (nearest/bilinear/bicubic/lanczos) at any
integer scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import plan as planlib
from .pallas_resize import _LEFT_EXTENT, _round_up


def _phase_kernel(wrowi_ref, wcol_ref, aa_ref, ab_ref, ba_ref, bb_ref,
                  out_ref, *, scale, step, wstep, c, taps, out_u8):
    """Row-interleaved phase-FMA body ("vR", round 2 — scripts/kernel_lab.py).

    The round-1 kernel computed a [step, wc] plane per (p, q) phase pair and
    stacked 16 u8 planes at the end; those 16 live arrays spilled vregs and
    capped throughput at ~8.3 GPix/s regardless of tap count. Here the row
    pass runs directly at interleaved output-row resolution: jnp.repeat of
    the window rows by S makes output row r*S+q read window rows r..r+taps
    as plain shifted slices (wrowi is the interleaved [step*S, taps] weight
    layout), so only ONE tmp and one acc are ever live and nothing is
    stacked. The rounding bias is folded into the accumulator init and the
    round chain is trunc-cast + i32 clip (floor == trunc for v >= -0.5, and
    the i32 clip catches undershoot). Measured 1.65 ms/frame planar /
    3.35 ms interleaved at 1080p->4x vs 3.99 ms for the round-1 kernel."""
    halo = taps - 1
    wc = wstep * c
    hc = halo * c
    if halo:
        top = jnp.concatenate([aa_ref[0], ab_ref[0, :, :hc]], axis=1)
        bot = jnp.concatenate([ba_ref[0, :halo], bb_ref[0, :halo, :hc]], axis=1)
        win = jnp.concatenate([top, bot], axis=0)   # [step+halo, (wstep+halo)*c]
    else:
        win = aa_ref[0]
    winf = win.astype(jnp.int32).astype(jnp.float32) if win.dtype == jnp.uint8 \
        else win.astype(jnp.float32)

    rep = jnp.repeat(winf, scale, axis=0)           # [(step+halo)*S, ...]
    tmp_i = None
    for n in range(taps):
        w = wrowi_ref[:, n][:, None]                # [step*S, 1]
        term = w * rep[n * scale:(n + step) * scale, :]
        tmp_i = term if tmp_i is None else tmp_i + term
    for p in range(scale):
        acc = None
        for m in range(taps):
            wv = wcol_ref[p * taps + m:p * taps + m + 1, :]  # [1, wstep*c]
            term = wv * tmp_i[:, m * c:m * c + wc]
            if acc is None:
                acc = term + 0.5 if out_u8 else term
            else:
                acc = acc + term
        if out_u8:
            acc = jnp.clip(acc.astype(jnp.int32), 0, 255).astype(jnp.uint8)
        out_ref[0, p] = acc


# static tap-slot count per (method, scale): the slot range t = idx -
# (base - left) is set by the kernel's support, never by the image size
# (clamping only shrinks it), so one compiled program serves every size.
def _n_slots(method: str, s: int, lanczos_a: int) -> int:
    if method == "nearest":
        return 1 if s == 1 else 2
    if method == "bilinear":
        return 2
    if method == "bicubic":
        return 4
    if method == "lanczos":
        return 2 * lanczos_a
    raise ValueError(f"unknown method {method!r}")


def _phase_plan_arrays(method: str, h: int, w: int, c: int, s: int,
                       a: float, lanczos_a: int, step: int, wstep: int,
                       n_i: int, n_j: int):
    """Host-side plan → (wrow [n_i*step, S*T], wcol [S*T, n_j*wstep*C], taps).

    Exact clamp semantics for the ACTUAL (h, w) are folded into the weights
    via window slots t = idx - (base - left); rows/cols beyond the image get
    zero weight, so the same arrays are valid for any padded/bucketed extent.
    """
    kw = ({"a": a} if method == "bicubic"
          else {"a": lanczos_a} if method == "lanczos" else {})
    plan_y = planlib.plan_axis(method, h, float(s), **kw)
    plan_x = planlib.plan_axis(method, w, float(s), **kw)
    # lanczos left extent depends on its window parameter (floor(ox)-a+1)
    left = lanczos_a - 1 if method == "lanczos" else _LEFT_EXTENT[method]
    taps = _n_slots(method, s, lanczos_a)

    base_y = np.arange(plan_y.n_out) // s
    slots_y = plan_y.idx.astype(np.int64) - (base_y[:, None] - left)
    base_x = np.arange(plan_x.n_out) // s
    slots_x = plan_x.idx.astype(np.int64) - (base_x[:, None] - left)
    assert min(slots_y.min(), slots_x.min()) >= 0
    assert max(slots_y.max(), slots_x.max()) < taps

    def build(plan, slots, n_pad):
        out = np.zeros((plan.n_in, s, taps), np.float32)
        o = np.arange(plan.n_out)
        for k in range(plan.idx.shape[1]):
            np.add.at(out, (o // s, o % s, slots[:, k]), plan.w[:, k])
        if n_pad > plan.n_in:
            out = np.pad(out, ((0, n_pad - plan.n_in), (0, 0), (0, 0)))
        return out

    wrow = build(plan_y, slots_y, n_i * step).reshape(n_i * step, s * taps)
    wcol_px = build(plan_x, slots_x, n_j * wstep)             # [Wp_t, S, T]
    wcol = np.repeat(
        wcol_px.transpose(1, 2, 0).reshape(s * taps, n_j * wstep),
        c, axis=1)                                            # [S*T, Wp_t*C]
    return wrow, wcol, taps, left


def _interleave_wrow(wrow_np, s, taps):
    """[rows, S*T] per-input-row weights → [rows*S, T] interleaved layout
    (row r*S+q of the output reads window slots with wrow[r, q*T+t])."""
    rows = wrow_np.shape[0]
    return wrow_np.reshape(rows, s, taps).reshape(rows * s, taps)


@functools.partial(jax.jit, static_argnames=("scale", "method", "a", "step",
                                             "wstep", "interpret", "lanczos_a",
                                             "layout"))
def _resize_phase_pallas(img_bhwc, scale: int, method: str, a: float,
                         step: int, wstep: int, interpret: bool,
                         lanczos_a: int = 3, layout: str = "hwc"):
    b, h, w, c = img_bhwc.shape
    s = int(scale)
    n_i = _round_up(h, step) // step
    n_j = _round_up(w, wstep) // wstep
    wrow_np, wcol_np, taps, left = _phase_plan_arrays(
        method, h, w, c, s, a, lanczos_a, step, wstep, n_i, n_j)
    wrow = jnp.asarray(_interleave_wrow(wrow_np, s, taps))
    wcol = jnp.asarray(wcol_np)
    return _phase_call(img_bhwc, wrow, wcol, s=s, step=step, wstep=wstep,
                       taps=taps, left=left, interpret=interpret,
                       layout=layout)


def _phase_call(img_bhwc, wrow, wcol, *, s, step, wstep, taps, left,
                interpret, layout="hwc"):
    """The pallas dispatch. ``wrow``/``wcol`` are DATA (may be traced): one
    compiled program per (shape, s, step, wstep, taps) serves every actual
    image size whose plan arrays are scattered into those extents.

    ``layout="hwc"`` delivers the standard interleaved image (one XLA
    u8 transpose after the kernel — it costs as much as the kernel itself
    at 1080p, ~1.7 ms; every cheaper formulation was measured slower, see
    docs/PERF_NOTES.md). ``layout="planar"`` skips it and returns the raw
    kernel output [B, S, n_i*step*S, n_j*wstep*C] (column phase p planar,
    rows fully interleaved, spatial extents PADDED to the tile grid) — 2.4x
    faster end-to-end for consumers that accept it; use
    :func:`interleave_planar` (or slice host-side) to materialize HWC."""
    b, h, w, c = img_bhwc.shape
    n_i = _round_up(h, step) // step
    n_j = _round_up(w, wstep) // wstep
    halo = taps - 1

    # zero-pad: `left` leading per axis; trailing so that the (i+1)/(j+1)
    # halo blocks are always in-bounds. Padded pixels carry zero weight.
    # Batch is a leading grid dimension — per-image padding keeps halo
    # windows from crossing image boundaries.
    x = jnp.pad(img_bhwc, ((0, 0), (left, (n_i + 1) * step - h - left),
                           (left, (n_j + 1) * wstep - w - left), (0, 0)))
    x2 = x.reshape(b, x.shape[1], x.shape[2] * c)

    in_dtype = img_bhwc.dtype
    out_u8 = in_dtype == jnp.uint8
    out_rows = n_i * step * s

    kernel = functools.partial(
        _phase_kernel, scale=s, step=step, wstep=wstep, c=c, taps=taps,
        out_u8=out_u8)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_i, n_j),
        in_specs=[
            pl.BlockSpec((step * s, taps), lambda bi, i, j: (i, 0),
                         memory_space=pltpu.VMEM),
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
    if layout == "planar":
        return out if out_u8 else out.astype(in_dtype)
    # XLA-side column-phase interleave: [B, S_p, H_out, W_lr, C] →
    # [B, H_out, W_lr, S_p, C] → [B, H_out, W_out, C]
    out = out[:, :, :h * s, :w * c].reshape(b, s, h * s, w, c)
    out = out.transpose(0, 2, 3, 1, 4).reshape(b, h * s, w * s, c)
    if not out_u8:
        out = out.astype(in_dtype)
    return out


def interleave_planar(planar, h: int, w: int, scale: int, c: int):
    """[B, S, rows_pad, cols_pad*C] planar kernel output → [B, H*S, W*S, C].

    Works on device arrays (jnp) or host arrays (numpy) — for fetched
    results prefer numpy (free of the device transpose cost)."""
    xp = np if isinstance(planar, np.ndarray) else jnp
    s = int(scale)
    o = planar[:, :, :h * s, :w * c].reshape(-1, s, h * s, w, c)
    return xp.transpose(o, (0, 2, 3, 1, 4)).reshape(-1, h * s, w * s, c)


_phase_call_jit = jax.jit(
    _phase_call,
    static_argnames=("s", "step", "wstep", "taps", "left", "interpret",
                     "layout"))


def resize_phase_pallas_bucketed(img, scale, method: str = "bicubic", *,
                                 bucket: int = 64, a: float = -0.5,
                                 lanczos_a: int = 3, step: int = 16,
                                 wstep: int = 512,
                                 interpret: bool | None = None,
                                 weight_cache: dict | None = None):
    """Bit-exact bucketed resize: ONE compiled program per bucket size
    serves every actual frame size within it.

    The trick: clamp-at-border semantics live entirely in the plan weights
    (window slots), so the weights become *traced arguments* built for the
    ACTUAL (h, w) and scattered into the bucket's static extents — padding
    rows/cols simply carry zero weight. No replicated-pad approximation
    (serving.py's former LSB caveat), no recompile per frame size.

    ``weight_cache`` (a plain dict the caller owns, e.g. the Upscaler
    instance) keeps per-size device-resident weight arrays so steady-state
    streams upload nothing per frame.

    Returns the FULL bucket-extent output [hb*s, wb*s(, c)]; callers slice
    to [:h*s, :w*s] host-side (slicing on device would recompile per size).
    """
    if not (float(scale) == int(scale) and scale >= 1):
        raise ValueError("phase pallas path requires an integer upscale")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s = int(scale)
    img = np.asarray(img)   # host-side zero-pad to the bucket below
    squeeze_hw = img.ndim == 2
    if squeeze_hw:
        img = img[..., None]
    squeeze_b = img.ndim == 3
    if squeeze_b:
        img = img[None]
    b, h, w, c = img.shape
    hb = -(-h // bucket) * bucket
    wb = -(-w // bucket) * bucket
    step_eff = min(step, _round_up(hb, 8))
    wstep_eff = min(wstep, _round_up(wb, 128 // max(1, c)))
    n_i = _round_up(hb, step_eff) // step_eff
    n_j = _round_up(wb, wstep_eff) // wstep_eff

    key = (h, w, c, s, method, float(a), int(lanczos_a), hb, wb)
    cached = weight_cache.get(key) if weight_cache is not None else None
    if cached is None:
        wrow_np, wcol_np, taps, left = _phase_plan_arrays(
            method, h, w, c, s, float(a), int(lanczos_a),
            step_eff, wstep_eff, n_i, n_j)
        cached = (jax.device_put(_interleave_wrow(wrow_np, s, taps)),
                  jax.device_put(wcol_np), taps, left)
        if weight_cache is not None:
            weight_cache[key] = cached
    wrow, wcol, taps, left = cached

    x = img
    if (hb, wb) != (h, w):
        x = np.pad(x, ((0, 0), (0, hb - h), (0, wb - w), (0, 0)))
    out = _phase_call_jit(jnp.asarray(x), wrow, wcol, s=s, step=step_eff,
                          wstep=wstep_eff, taps=taps, left=left,
                          interpret=bool(interpret))
    if squeeze_b:
        out = out[0]
    return out[..., 0] if squeeze_hw else out


def resize_phase_pallas(img, scale, method: str = "bicubic", *,
                        a: float = -0.5, lanczos_a: int = 3,
                        step: int = 16, wstep: int = 512,
                        interpret: bool | None = None,
                        layout: str = "hwc"):
    """Fused phase-FMA resize. HW / HWC / BHWC uint8 or float input, integer
    scale. A batch becomes a leading grid dimension — one kernel launch for
    the whole batch (the sr.sh-style batch flow without vmap overhead).

    ``layout="planar"`` (BHWC input only) returns the kernel's native
    [B, S, rows_pad, cols_pad*C] planar-phase output — ~2.4x faster at
    1080p->4x because the column-interleave pass is skipped; see
    :func:`interleave_planar`."""
    if not (float(scale) == int(scale) and scale >= 1):
        raise ValueError("phase pallas path requires an integer upscale")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    img = jnp.asarray(img)
    squeeze_hw = img.ndim == 2
    if squeeze_hw:
        img = img[..., None]
    squeeze_b = img.ndim == 3
    if squeeze_b:
        img = img[None]
    if layout == "planar" and (squeeze_b or squeeze_hw):
        raise ValueError("layout='planar' requires BHWC input")
    h, w = img.shape[1:3]
    step_eff = min(step, _round_up(h, 8))
    wstep_eff = min(wstep, _round_up(w, 128 // max(1, img.shape[3])))
    out = _resize_phase_pallas(img, int(scale), method, float(a),
                               step_eff, wstep_eff, bool(interpret),
                               lanczos_a=int(lanczos_a), layout=layout)
    if squeeze_b:
        out = out[0]
    return out[..., 0] if squeeze_hw else out
