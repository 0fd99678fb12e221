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


@functools.partial(jax.jit, static_argnames=("scale", "method", "a", "mesh",
                                              "axis", "lanczos_a",
                                              "interpret"))
def _resize_spatial_mxu(img_hwc, scale, method, a, mesh, axis, lanczos_a,
                        interpret):
    """Band-sharded separable resize through the vM banded-matmul kernel
    (ops/pallas_mxu) — each band runs the SAME MXU kernel as the single-chip
    path on its haloed window (VERDICT r3 weak #5: the einsum fallback left
    3-30x on the table per band on TPU meshes).

    Construction: the GLOBAL row plan (true-border clamp folded into the
    weights) is sliced per band with idx made local to the band's window
    rows [i*hb - left, i*hb + hb + dn): `left` real rows arrive from the
    previous shard and `dn = taps - 1 - left` from the next via ppermute.
    Zero rows received at the true image borders are never referenced with
    nonzero weight, so the result is bit-identical to single-chip resize_mxu
    (same banded values, same dot shapes — zeros add exactly)."""
    from ..ops import pallas_mxu as pm
    from ..ops.pallas_phase import _n_slots
    from ..ops.pallas_resize import _LEFT_EXTENT, _round_up

    h, w, c0 = img_hwc.shape
    s = int(scale)
    n = mesh.shape[axis]
    hb = h // n
    pad_c = c0 == 3
    c = 4 if pad_c else c0
    kw = ({"a": a} if method == "bicubic"
          else {"a": lanczos_a} if method == "lanczos" else {})
    plan_y = planlib.plan_axis(method, h, float(s), **kw)
    plan_x = planlib.plan_axis(method, w, float(s), **kw)
    left = lanczos_a - 1 if method == "lanczos" else _LEFT_EXTENT[method]
    taps = _n_slots(method, 1 if s == 1 else 2, lanczos_a)
    up, dn = left, taps - 1 - left
    if hb < max(up, dn, 1):
        raise ValueError(f"bands of {hb} rows are too short for "
                         f"{method}'s {up}/{dn}-row halo")

    row_unit, col_unit = pm._tile_units(s, 1, c)
    step_eff = min(_round_up(64, row_unit), _round_up(hb, row_unit))
    wstep_eff = min(_round_up(128, col_unit), _round_up(w, col_unit))
    n_i = -(-hb // step_eff)
    n_j = max(_round_up(w, wstep_eff) // wstep_eff,
              -(-plan_x.n_out // (wstep_eff * s)))
    out_step = plan_y.n_out // n

    wr_bands = []
    wc = offs = g = None
    for i in range(n):
        sl = slice(i * out_step, (i + 1) * out_step)
        band_plan = planlib.AxisPlan(
            idx=plan_y.idx[sl] - np.int32(i * hb), w=plan_y.w[sl],
            n_in=hb + taps - 1, n_out=out_step, scale=plan_y.scale)
        wr_i, wc_i, offs_i, g_i = pm._mxu_plan(
            method, hb, w, c, float(s), s, 1, step_eff, wstep_eff, n_i, n_j,
            a=a, lanczos_a=lanczos_a, plans=(band_plan, plan_x))
        wr_bands.append(wr_i[0])
        if wc is None:
            wc, offs, g = jnp.asarray(wc_i), offs_i, g_i
    wr_all = jnp.asarray(np.stack(wr_bands))      # [n, 2, rows, kr]

    x = img_hwc
    if pad_c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))
    w_out = g["n_out_w"]

    def body(x_local, wr_l):
        parts = []
        if up:
            perm_down = [(j, j + 1) for j in range(n - 1)]
            parts.append(jax.lax.ppermute(x_local[-up:], axis, perm_down))
        parts.append(x_local)
        if dn:
            perm_up = [(j + 1, j) for j in range(n - 1)]
            parts.append(jax.lax.ppermute(x_local[:dn], axis, perm_up))
        window = jnp.concatenate(parts, axis=0) if len(parts) > 1 \
            else x_local
        xp = jnp.pad(window,
                     ((0, (n_i + 1) * step_eff - window.shape[0]),
                      (left, (n_j + 1) * wstep_eff - w - left), (0, 0)))
        x2 = xp.reshape(1, xp.shape[0], xp.shape[1] * c)
        out = pm._mxu_call(x2, wr_l, wc, step_in=step_eff, wstep=wstep_eff,
                           rows_out=g["rows_out"], nblk=g["nblk"],
                           kc=g["kc"], offs=offs, c=c, halo_r=g["halo_r"],
                           halo_w=g["halo_w"], left=left,
                           interpret=interpret)
        return out[0, :out_step, :w_out * c].reshape(out_step, w_out, c)

    out = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None, None)),
        out_specs=P(axis, None, None),
        # pallas_call's out_shape carries no varying-mesh-axes annotation
        check_vma=False,
    )(x, wr_all)
    return out[..., :3] if pad_c else out


_ADAPTIVE_HALO_UP = 2     # tap/variance reach above the base row
_ADAPTIVE_HALO_DOWN = 3   # center row can be b+1; variance reaches b+3


@functools.partial(jax.jit, static_argnames=("scale", "a", "mesh", "axis",
                                             "step", "wstep", "interpret"))
def _adaptive_spatial(img_hwc, scale, a, mesh, axis, step, wstep, interpret):
    from ..ops import pallas_adaptive as pa

    h, w, c = img_hwc.shape
    s = int(scale)
    n = mesh.shape[axis]
    hb = h // n                       # band height (LR rows per shard)
    step_eff = min(step, _round_up_8(hb))
    wstep_eff = min(wstep, -(-w // 128) * 128)
    n_i = -(-hb // step_eff)
    n_j = -(-w // wstep_eff)

    # ABSOLUTE per-row geometry for the full image, sharded with the rows:
    # border clamp semantics only at the true image borders
    wy_np, wye_np = pa.row_vectors(h, s, a, n * (n_i * step_eff))
    # row_vectors pads at the END; per-band padding must pad each band, so
    # rebuild band-major: [n, n_i*step_eff, S*4]
    wy_b = np.stack([np.pad(wy_np[i * hb:(i + 1) * hb],
                            ((0, n_i * step_eff - hb), (0, 0)), mode="edge")
                     for i in range(n)])
    wye_b = np.stack([np.pad(wye_np[i * hb:(i + 1) * hb],
                             ((0, n_i * step_eff - hb), (0, 0)), mode="edge")
                      for i in range(n)])
    wy_all = jnp.asarray(wy_b.reshape(n * n_i * step_eff, s * 4))
    wye_all = jnp.asarray(wye_b.reshape(n * n_i * step_eff, s * 4))
    wx = jnp.asarray(pa.col_vectors(w, s, a, n_j * wstep_eff))

    up, down = _ADAPTIVE_HALO_UP, _ADAPTIVE_HALO_DOWN
    trail = (n_i + 1) * step_eff - hb - up   # window rows below band start

    def body(x_local, wy_l, wye_l):
        ix = jax.lax.axis_index(axis)
        perm_down = [(j, j + 1) for j in range(n - 1)]
        perm_up = [(j + 1, j) for j in range(n - 1)]
        top = jax.lax.ppermute(x_local[-up:], axis, perm_down)
        bot = jax.lax.ppermute(x_local[:down], axis, perm_up)
        # true image borders: adaptive needs REPLICATED values, and the
        # edge shards' ppermute results are zero-filled — overwrite them
        top = jnp.where(ix == 0,
                        jnp.broadcast_to(x_local[:1], top.shape), top)
        bot = jnp.where(ix == n - 1,
                        jnp.broadcast_to(x_local[-1:], bot.shape), bot)
        xb = jnp.concatenate([top, x_local, bot], axis=0)  # [hb+5, W, C]
        xf = xb.astype(jnp.float32)
        luma = (xf[..., 0] * 0.2126 + xf[..., 1] * 0.7152
                + xf[..., 2] * 0.0722)
        # columns: replicate-pad as in the single-chip path; rows: the real
        # halos are in place, pad the remaining trailing window rows
        xp = jnp.pad(jnp.transpose(xb, (2, 0, 1)),
                     ((0, 0), (0, trail - down),
                      (_ADAPTIVE_HALO_UP, (n_j + 1) * wstep_eff - w
                       - _ADAPTIVE_HALO_UP)), mode="edge")
        lp = jnp.pad(luma, ((0, trail - down),
                            (_ADAPTIVE_HALO_UP, (n_j + 1) * wstep_eff - w
                             - _ADAPTIVE_HALO_UP)), mode="edge")[None]
        out = pa._adaptive_dispatch(
            xp, lp, wy_l, wye_l, wx, s=s, step=step_eff, wstep=wstep_eff,
            c=c, n_i=n_i, n_j=n_j, interpret=interpret)
        return out[:, :hb * s, :]      # drop pad rows inside the shard

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None), P(axis, None)),
        out_specs=P(None, axis, None),
        # pallas_call's out_shape carries no varying-mesh-axes annotation
        check_vma=False,
    )(img_hwc, wy_all, wye_all)


def _round_up_8(v):
    return -(-v // 8) * 8


def adaptive_resize_spatial_sharded(img, scale, *, mesh: Mesh,
                                    axis: str = "spatial", a: float = -0.5,
                                    step: int = 16, wstep: int = 512,
                                    interpret: bool | None = None,
                                    layout: str = "hwc"):
    """Adaptive-bicubic SR of one HWC uint8 frame with its LR rows band-
    sharded over ``mesh[axis]`` — the fused Pallas kernel runs per band.

    Bands exchange a 2-up/3-down row halo of PIXEL VALUES via
    ``jax.lax.ppermute`` (the adaptive interpolator needs its neighbors'
    luma for the contrast modulation and the 5x5 variance window — weights
    alone can't carry the halo as in the separable kernels), while the
    per-row weight/exemption vectors are built for ABSOLUTE row positions
    and sharded alongside, so true-border clamp semantics survive the
    split. Bit-identical to the single-chip kernel (tested on the 8-device
    CPU mesh).

    Returns the planar packed-u32 layout [S, H*S, W_pad] (``layout=
    "planar"``) or HWC uint8.
    """
    if float(scale) != int(scale) or scale < 1:
        raise ValueError("adaptive spatial sharding requires an integer "
                         "upscale")
    img = jnp.asarray(img)
    if img.dtype != jnp.uint8 or img.ndim != 3 or img.shape[-1] > 4:
        raise ValueError("expected HWC uint8 with c <= 4")
    n = mesh.shape[axis]
    h, w = img.shape[:2]
    if h % n:
        raise ValueError(f"H={h} not divisible by {n} shards")
    if h // n < _ADAPTIVE_HALO_DOWN:
        raise ValueError("bands must be at least 3 rows tall")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _adaptive_spatial(img, int(scale), float(a), mesh, axis,
                            int(step), int(wstep), bool(interpret))
    if layout == "planar":
        return out
    from ..ops.pallas_adaptive import unpack_planar
    return unpack_planar(out, h, w, int(scale), img.shape[-1])


_LEARNED_HALO = 3   # conv_in(1) + conv_res(1) + conv_out(±1 LR row)


@functools.partial(jax.jit, static_argnames=("scale", "convention", "mesh",
                                             "axis", "tail"))
def _learned_spatial(params, img_hwc, scale, convention, mesh, axis,
                     tail="auto"):
    from ..models import inference as inf
    from ..ops.learned import _apply_round
    from ..ops.pallas_packed_tail import (packed_tail_pallas,
                                          packed_tail_supported)

    h, w, c = img_hwc.shape
    s = int(scale)
    n = mesh.shape[axis]
    hb = h // n
    hh = _LEARNED_HALO
    p = params["params"] if "params" in params else params
    def conv(x, kp):
        return jax.lax.conv_general_dilated(
            x, kp["kernel"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + kp["bias"]

    def body(x_local):
        ix = jax.lax.axis_index(axis)
        perm_down = [(j, j + 1) for j in range(n - 1)]
        perm_up = [(j + 1, j) for j in range(n - 1)]
        # halo of REAL pixel rows; edge shards receive zeros from ppermute,
        # which is exactly the convs' SAME padding at the true borders
        top = jax.lax.ppermute(x_local[-hh:], axis, perm_down)
        bot = jax.lax.ppermute(x_local[:hh], axis, perm_up)
        xe = jnp.concatenate([top, x_local, bot], axis=0)  # [hb+6, W, C]

        def outside_zeroed(t):
            """Zero rows outside the true image on the edge shards — the
            next conv's SAME padding must see zeros there, not values
            computed from the zero-halo."""
            rows = t.shape[1]
            r = jnp.arange(rows)
            keep_top = jnp.where(ix == 0, r >= hh, jnp.ones_like(r, bool))
            keep_bot = jnp.where(ix == n - 1, r < rows - hh,
                                 jnp.ones_like(r, bool))
            keep = (keep_top & keep_bot).astype(t.dtype)
            return t * keep.reshape((1, rows) + (1,) * (t.ndim - 2))

        xf = (xe.astype(jnp.float32) / 255.0)[None]
        y = jax.nn.relu(conv(xf, p["conv_in"]))
        y = outside_zeroed(y)
        y = y + conv(y, p["conv_res"])                     # [1, hb+6, W, F]

        m = inf._packed_merged_map(p, y, s, convention)
        m = outside_zeroed(m)

        # apply taps: LR rows [-1, hb+2) with REPLICATE values at the true
        # borders (the apply clamps tap positions to the image)
        xa = xe[hh - 1:hh + hb + 2].astype(jnp.float32)    # [hb+3, W, C]
        first = jnp.where(ix == 0, xa[1:2], xa[0:1])
        last2 = jnp.where(ix == n - 1,
                          jnp.broadcast_to(xa[-3:-2], xa[-2:].shape),
                          xa[-2:])
        xa = jnp.concatenate([first, xa[1:-2], last2], axis=0)

        use_pallas = tail == "pallas" or (
            tail == "auto" and jax.default_backend() == "tpu")
        if use_pallas and packed_tail_supported(s, m.shape[-1], c):
            # fused Pallas tail per band: pre-haloed rows [-1, hb+1)
            return packed_tail_pallas(
                m[0, hh - 1:hh + hb + 1], xa,
                p["conv_out"]["kernel"], p["conv_out"]["bias"],
                scale=s, halo="rows",
                interpret=jax.default_backend() != "tpu")

        # mp rows r in [-1, hb+1): ext rows [hh-1, hh+hb+1); cols 1 zero pad
        mp = jnp.pad(m[:, hh - 1:hh + hb + 1],
                     ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        chw = jnp.transpose(jnp.pad(xa, ((0, 0), (1, 2), (0, 0)),
                                    mode="edge"), (2, 0, 1))  # [C,hb+3,W+3]

        out = inf._packed_phase_tail(mp, chw, p["conv_out"]["kernel"],
                                     p["conv_out"]["bias"], s, c, hb, w)
        return _apply_round(out).astype(jnp.uint8)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None, None),),
        out_specs=P(axis, None, None),
        check_vma=False,
    )(img_hwc)


def learned_resize_spatial_sharded(model, params, img, scale=4, *,
                                   mesh: Mesh, axis: str = "spatial",
                                   convention: str = "train",
                                   tail: str = "auto"):
    """Learned weight-predictor SR of one HWC uint8 frame with its LR rows
    band-sharded over ``mesh[axis]`` — the packed-phase forward
    (models/inference._super_resolve_packed) runs per band.

    Bands exchange a 3-row halo of pixel values via ``jax.lax.ppermute``
    (receptive field: conv_in + conv_res + the phase-decomposed conv_out
    reach ±3 LR rows); on the edge shards the zero-filled ppermute results
    double as the convs' SAME padding, while the 16-tap apply overrides
    them with the replicate values its clamp semantics need. Matches the
    single-chip packed path to fp-association noise (≤1 u8 LSB, tested on
    the 8-device CPU mesh).
    """
    if type(model).__name__ != "WeightPredictor":
        raise ValueError("spatial sharding implemented for WeightPredictor "
                         "checkpoints")
    img = jnp.asarray(img)
    n = mesh.shape[axis]
    if img.shape[0] % n:
        raise ValueError(f"H={img.shape[0]} not divisible by {n} shards")
    if img.shape[0] // n < _LEARNED_HALO:
        raise ValueError("bands must be at least 3 rows tall")
    return _learned_spatial(params, img, int(scale), convention, mesh, axis,
                            tail=tail)


def resize_spatial_sharded(img, scale, method: str = "bicubic", *,
                           mesh: Mesh, axis: str = "spatial",
                           a: float = -0.5, lanczos_a: int = 3,
                           impl: str = "auto",
                           interpret: bool | None = None):
    """Resize one HWC image with its rows sharded over ``mesh[axis]``.

    Requires integer scale and H divisible by the axis size. The halo each
    band exchanges is derived from the method's actual tap reach (0 for
    nearest, 1 for bilinear, 2 for bicubic, ``lanczos_a`` for lanczos).

    ``impl``: "mxu" runs the vM banded-matmul Pallas kernel per band (what
    TPU meshes auto-route — the same kernel serving uses single-chip);
    "einsum" the XLA gather/FMA path (the CPU-mesh / odd-geometry
    fallback); "auto" picks per backend and support.
    """
    if float(scale) != int(scale) or scale < 1:
        raise ValueError("spatial sharding requires an integer upscale")
    img = jnp.asarray(img)
    n = mesh.shape[axis]
    if img.shape[0] % n:
        raise ValueError(f"H={img.shape[0]} not divisible by {n} shards")
    if impl == "auto":
        from ..ops.pallas_mxu import mxu_supported
        impl = ("mxu" if jax.default_backend() == "tpu"
                and img.dtype == jnp.uint8
                and mxu_supported(scale, img.shape[-1], method) else "einsum")
    if impl == "mxu":
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        return _resize_spatial_mxu(img, int(scale), method, float(a), mesh,
                                   axis, int(lanczos_a), bool(interpret))
    return _resize_spatial(img, int(scale), method, float(a), mesh, axis,
                           lanczos_a=int(lanczos_a))
