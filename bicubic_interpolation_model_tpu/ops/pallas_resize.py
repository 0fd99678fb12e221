"""Fused Pallas TPU kernel for separable resampling.

One kernel does what the reference's JS double loop
(version3.0/utils/bicubic_super_resolution.js:35-80) does per pixel, but as
two banded sampling-matrix matmuls on the MXU with explicit HBM→VMEM DMA:

    out[c, i·TH:(i+1)·TH, j·TW:(j+1)·TW] =
        round_u8( B_row[i] @ window(img[c]) @ B_colT[j] )

Key ideas
---------
* The exact per-axis plans (core.plan) have 4-tap support, so the dense
  sampling matrix is *banded*: an output row tile [TH] only touches
  TH/scale + 4 input rows. We pre-slice the matrices into per-tile bands
  ``B_row [nI, TH, KH]`` / ``B_colT [nJ, KW, TW]`` on host, so each grid step
  is a small dense matmul with K = TH/scale+4 (padded for tiling).
* Input stays in HBM (`memory_space=ANY`); each grid step DMAs only its
  (KH, KW) window into VMEM — overlapping windows that BlockSpec cannot
  express. The window is double-buffer-ready (single-shot copy per step here;
  the DMA overlaps the previous step's compute because Mosaic pipelines
  grid steps).
* Edge handling costs nothing: the reference's clamp-and-renormalize
  semantics are already folded into the band weights (duplicate clamped taps
  accumulate onto the same input column), and the zero-padding added for
  uniform window sizes carries zero weight.
* uint8 in / uint8 out: 4× less HBM traffic than f32, with the JS rounding
  (clip(floor(v+0.5))) fused into the kernel epilogue.

Integer upscales only (TH, TW are multiples of the scale); other scales fall
back to the XLA matmul path in ops.resize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import plan as planlib


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Left extent of each kernel's tap window relative to floor(ox):
# bicubic taps start at floor(ox)-1, lanczos-3 at floor(ox)-2, the rest at 0.
_LEFT_EXTENT = {"nearest": 0, "bilinear": 0, "bicubic": 1, "lanczos": 2}


def _banded(plan: planlib.AxisPlan, tile_out: int, k_pad: int,
            left: int) -> np.ndarray:
    """Slice the dense sampling matrix into per-tile bands.

    Band i covers output rows [i·tile_out, (i+1)·tile_out) and input rows
    [i·tile_out/scale - left, ...+k_pad) in *original* coordinates; the caller
    pads the input by ``left`` on the leading edge so the window start in
    padded coordinates is i·tile_out/scale >= 0. Output rows beyond n_out get
    zero weight (they land in the sliced-off padding of the output).
    """
    scale = int(plan.scale)
    step = tile_out // scale
    n_tiles = _round_up(plan.n_out, tile_out) // tile_out
    bands = np.zeros((n_tiles, tile_out, k_pad), dtype=np.float32)
    for i in range(n_tiles):
        start = i * step - left  # original coords of window begin
        for r in range(tile_out):
            o = i * tile_out + r
            if o >= plan.n_out:
                break
            k = plan.idx[o].astype(np.int64) - start
            assert k.min() >= 0 and k.max() < k_pad, "band window too small"
            np.add.at(bands[i, r], k, plan.w[o])
    return bands


def _resize_kernel(mrow_ref, mcolt_ref, img_hbm, out_ref, win, sem,
                   *, kh, kw, step_h, step_w, out_u8):
    c = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    cp = pltpu.make_async_copy(
        img_hbm.at[c, pl.ds(i * step_h, kh), pl.ds(j * step_w, kw)],
        win,
        sem,
    )
    cp.start()
    cp.wait()
    w = win[:]
    if w.dtype == jnp.uint8:
        w = w.astype(jnp.int32)  # direct u8->f32 cast unsupported in Pallas
    tmp = jnp.dot(mrow_ref[0], w.astype(jnp.float32),
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    acc = jnp.dot(tmp, mcolt_ref[0], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    if out_u8:
        # f32->u8 must route via i32 (direct cast unsupported in Pallas/Mosaic)
        acc = jnp.clip(jnp.floor(acc + 0.5), 0, 255).astype(jnp.int32).astype(jnp.uint8)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("scale", "method", "a",
                                             "tile_h", "tile_w", "interpret",
                                             "lanczos_a"))
def _resize_pallas_chw(img_chw, scale: int, method: str, a: float,
                       tile_h: int, tile_w: int, interpret: bool,
                       lanczos_a: int = 3):
    c, h, w = img_chw.shape
    pkw = ({"a": a} if method == "bicubic"
           else {"a": lanczos_a} if method == "lanczos" else {})
    plan_y = planlib.plan_axis(method, h, float(scale), **pkw)
    plan_x = planlib.plan_axis(method, w, float(scale), **pkw)
    ho, wo = plan_y.n_out, plan_x.n_out
    left = lanczos_a - 1 if method == "lanczos" else _LEFT_EXTENT[method]
    taps = plan_y.taps
    # Tiles must be scale-multiples (integer window step) and lane/sublane
    # aligned; shrink toward the image for small inputs.
    tile_h = min(_round_up(tile_h, scale * 8), _round_up(ho, scale * 8))
    tile_w = min(_round_up(tile_w, scale * 128), _round_up(wo, scale * 128))

    step_h, step_w = tile_h // scale, tile_w // scale
    kh = _round_up(step_h + taps, 8)
    kw = _round_up(step_w + taps, 128)

    b_row = jnp.asarray(_banded(plan_y, tile_h, kh, left))    # [nI, TH, KH]
    b_colt = jnp.asarray(
        _banded(plan_x, tile_w, kw, left).transpose(0, 2, 1)  # [nJ, KW, TW]
    )
    n_i, n_j = b_row.shape[0], b_colt.shape[0]

    # Pad: `left` leading (window start offset), trailing to fit last window.
    pad_h = (left, max(0, (n_i - 1) * step_h + kh - left - h))
    pad_w = (left, max(0, (n_j - 1) * step_w + kw - left - w))
    img_p = jnp.pad(img_chw, ((0, 0), pad_h, pad_w))

    in_dtype = img_chw.dtype
    out_u8 = in_dtype == jnp.uint8

    kernel = functools.partial(_resize_kernel, kh=kh, kw=kw,
                               step_h=step_h, step_w=step_w, out_u8=out_u8)
    out = pl.pallas_call(
        kernel,
        grid=(c, n_i, n_j),
        in_specs=[
            pl.BlockSpec((1, tile_h, kh), lambda c, i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kw, tile_w), lambda c, i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, tile_h, tile_w),
                               lambda c, i, j: (c, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (c, n_i * tile_h, n_j * tile_w),
            jnp.uint8 if out_u8 else jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kh, kw), img_p.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * c * (ho * kh * kw + ho * kw * wo),
            bytes_accessed=img_p.size * img_p.dtype.itemsize + c * ho * wo,
            transcendentals=0,
        ),
        interpret=interpret,
    )(b_row, b_colt, img_p)
    out = out[:, :ho, :wo]
    if not out_u8:
        out = out.astype(in_dtype)
    return out


def resize_pallas(img, scale, method: str = "bicubic", *, a: float = -0.5,
                  lanczos_a: int = 3, tile_h: int = 512, tile_w: int = 512,
                  interpret: bool | None = None):
    """Fused-TPU-kernel resize. HW/HWC uint8 or float input, integer scale."""
    if not (float(scale) == int(scale) and scale >= 1):
        raise ValueError("pallas path requires an integer upscale factor")
    if method not in ("bicubic", "bilinear", "nearest", "lanczos"):
        raise ValueError(f"unknown method {method!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    img = jnp.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    chw = jnp.transpose(img, (2, 0, 1))
    out = _resize_pallas_chw(chw, int(scale), method, float(a),
                             tile_h, tile_w, bool(interpret),
                             lanczos_a=int(lanczos_a))
    out = jnp.transpose(out, (1, 2, 0))
    return out[..., 0] if squeeze else out
