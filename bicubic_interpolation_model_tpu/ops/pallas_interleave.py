"""Pallas column-phase interleave for packed-u32 planar outputs.

The adaptive kernel (ops/pallas_adaptive) emits [S, R, X] uint32 with the
four channel bytes packed per word. Delivering HWC means interleaving the S
column-phase planes at word granularity — a lane-granularity shuffle that
XLA's transpose emitter runs at ~60 GB/s (2.1 ms for a 4x-1080p frame as an
output copy, 33 ms through the u32→u8 bitcast path; PERF_NOTES "checksum
fusion").

This kernel does the shuffle with Mosaic's transpose unit using the vT
sublane-merge trick (scripts/kernel_lab.py): lane-dim merges are illegal,
but SUBLANE-dim merges are not — so transpose each plane (lanes→sublanes),
stack the planes on a new sublane axis, merge, and transpose back:

    planes[px] [rt, xt]  --T-->  [xt, rt]
    stack+reshape        -->     [xt*S, rt]   (sublane merge: legal)
    transpose            -->     [rt, xt*S]   word (r, X*S+px) ✓

Measured 1.47 ms for a [4, 4320, 1920] u32 frame (132 MB) at rt=32/xt=128 —
1.4x XLA's best output-copy transpose and 22x the bitcast path.

The result is "RGBA32 HWC": u32 [R, W_out] whose little-endian bytes ARE the
HWC uint8 image. Fetched to host, ``np.asarray(out).view(np.uint8)
.reshape(H, W, 4)`` is free; converting on device to a u8 array costs the
u32→u8 HBM retiling (avoid it — PERF_NOTES).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interleave_kernel(in_ref, out_ref, *, s, rt, xt):
    planes_t = [in_ref[px].T for px in range(s)]          # [xt, rt] each
    stacked = jnp.stack(planes_t, axis=1).reshape(xt * s, rt)
    out_ref[...] = stacked.T                              # [rt, xt*s]


def _tile_div(n: int, cap: int) -> int:
    """Largest divisor of ``n`` that is <= ``cap`` (>=1 always exists)."""
    for t in range(min(cap, n), 0, -1):
        if n % t == 0:
            return t
    return 1


@functools.partial(jax.jit, static_argnames=("rt", "xt", "interpret"))
def interleave_planar_u32(planar_u32, *, rt: int = 32, xt: int = 128,
                          interpret: bool | None = None):
    """[S, R, X] u32 planar → [R, X*S] u32 with word (r, X*S+px) =
    planar[px, r, X]. ``rt``/``xt`` are tile-size *caps*: the actual tiles
    are the largest divisors of R and X under them, so any padded extents
    work (odd scales produce R not divisible by 32 — ADVICE r2 item 1)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s, r, x = planar_u32.shape
    rt = _tile_div(r, rt)
    xt = _tile_div(x, xt)
    return pl.pallas_call(
        functools.partial(_interleave_kernel, s=s, rt=rt, xt=xt),
        grid=(r // rt, x // xt),
        in_specs=[pl.BlockSpec((s, rt, xt), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rt, xt * s), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, x * s), jnp.uint32),
        interpret=bool(interpret),
    )(planar_u32)


def rgba32_to_hwc_np(out_u32_np, h_out: int, w_out: int, c: int = 4):
    """Host-side free view of a fetched RGBA32 frame as HWC uint8."""
    import numpy as np
    a = np.ascontiguousarray(out_u32_np[:h_out, :w_out])
    return a.view(np.uint8).reshape(h_out, w_out, 4)[..., :c]
