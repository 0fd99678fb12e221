"""Spatially-sharded resize: band-partition a single large frame across
devices — the image analog of sequence/context parallelism (SURVEY.md §5).

Each device holds a horizontal band of the LR image. A bicubic output row
needs up to 2 LR rows above/below its band, so shards exchange a 2-row halo
with their neighbors via ``jax.lax.ppermute`` (pure ICI traffic), then run the
same exact banded-sampling-matrix matmuls as the single-chip path. Clamp
semantics at the true image borders are already folded into each band's
weights (built from the *global* exact plan), and the zero halos that edge
shards receive carry zero weight — so the sharded result is bit-identical to
single-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core import plan as planlib


def _plan_halo(plan: planlib.AxisPlan, n_shards: int) -> int:
    """LR rows a band can reach outside its own slab, derived from the plan's
    actual tap indices (2 for 4-tap kernels, 3 for lanczos-3, 0 for nearest)."""
    step = plan.n_in // n_shards
    out_step = plan.n_out // n_shards
    band = np.arange(plan.n_out) // out_step
    lo = int((band * step - plan.idx.min(axis=1)).max())
    hi = int((plan.idx.max(axis=1) - ((band + 1) * step - 1)).max())
    return max(lo, hi, 0)


def _row_bands(plan: planlib.AxisPlan, n_shards: int, halo: int) -> np.ndarray:
    """Per-shard row sampling matrices [n, out_step, step + 2*halo] against the
    local window [i*step - halo, (i+1)*step + halo)."""
    h_in, h_out = plan.n_in, plan.n_out
    if h_in % n_shards or h_out % n_shards:
        raise ValueError(
            f"H_in={h_in}/H_out={h_out} not divisible by {n_shards} shards")
    step = h_in // n_shards
    out_step = h_out // n_shards
    bands = np.zeros((n_shards, out_step, step + 2 * halo), dtype=np.float32)
    for i in range(n_shards):
        start = i * step - halo
        for r in range(out_step):
            o = i * out_step + r
            k = plan.idx[o].astype(np.int64) - start
            if k.min() < 0 or k.max() >= bands.shape[2]:
                raise ValueError("halo too small for plan taps")  # unreachable
            np.add.at(bands[i, r], k, plan.w[o])
    return bands


@functools.partial(jax.jit, static_argnames=("scale", "method", "a", "mesh",
                                             "axis", "lanczos_a"))
def _resize_spatial(img_hwc, scale, method, a, mesh, axis, lanczos_a=3):
    h, w = img_hwc.shape[:2]
    n = mesh.shape[axis]
    kw = ({"a": a} if method == "bicubic"
          else {"a": lanczos_a} if method == "lanczos" else {})
    plan_y = planlib.plan_axis(method, h, float(scale), **kw)
    plan_x = planlib.plan_axis(method, w, float(scale), **kw)
    halo = _plan_halo(plan_y, n)
    bands = jnp.asarray(_row_bands(plan_y, n, halo))
    m_col_t = jnp.asarray(planlib.plan_to_matrix(plan_x).T)

    in_dtype = img_hwc.dtype
    x = img_hwc.astype(jnp.float32)

    def body(x_local, band):
        # x_local [step, W, C], band [1, out_step, step+2*halo]
        if halo:
            perm_down = [(j, j + 1) for j in range(n - 1)]   # to next shard
            perm_up = [(j + 1, j) for j in range(n - 1)]     # to previous shard
            top = jax.lax.ppermute(x_local[-halo:], axis, perm_down)
            bot = jax.lax.ppermute(x_local[:halo], axis, perm_up)
            window = jnp.concatenate([top, x_local, bot], axis=0)
        else:
            window = x_local
        tmp = jnp.einsum("oh,hwc->owc", band[0], window,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("owc,wx->oxc", tmp, m_col_t,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    out = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None)),
        out_specs=P(axis, None, None),
    )(x, bands)

    if in_dtype == jnp.uint8:
        return jnp.clip(jnp.floor(out + 0.5), 0, 255).astype(jnp.uint8)
    return out.astype(in_dtype)


def resize_spatial_sharded(img, scale, method: str = "bicubic", *,
                           mesh: Mesh, axis: str = "spatial",
                           a: float = -0.5, lanczos_a: int = 3):
    """Resize one HWC image with its rows sharded over ``mesh[axis]``.

    Requires integer scale and H divisible by the axis size. The halo each
    band exchanges is derived from the method's actual tap reach (0 for
    nearest, 1 for bilinear, 2 for bicubic, ``lanczos_a`` for lanczos).
    """
    if float(scale) != int(scale) or scale < 1:
        raise ValueError("spatial sharding requires an integer upscale")
    img = jnp.asarray(img)
    n = mesh.shape[axis]
    if img.shape[0] % n:
        raise ValueError(f"H={img.shape[0]} not divisible by {n} shards")
    return _resize_spatial(img, int(scale), method, float(a), mesh, axis,
                           lanczos_a=int(lanczos_a))
