"""Device-side resize ops (JAX) — the TPU-native replacement for the
reference's scalar per-pixel loops (version3.0/utils/*_super_resolution.js).

Three interchangeable implementations of the same separable semantics
(defined by :mod:`..core.plan`; parity vs the float64 oracle is ±1 u8 LSB):

``gather``  jnp.take + FMA per axis. Works for any scale/backend; the
            correctness reference on device.
``matmul``  out = M_row @ img @ M_col^T per channel — dense sampling-matrix
            matmuls that map straight onto the MXU systolic array. Any scale.
``phase``   integer upscales only: interior weights are periodic with period
            ``scale`` (a 4xS LUT), so the row/col passes become 4 shifted-slice
            FMAs (pure VPU, no gather) + phase interleave; the border band
            (first S / last 2S outputs per axis, where the reference's clamp
            semantics kick in) is patched with the exact gather path.

A fused Pallas kernel lives in :mod:`.pallas_resize`; :func:`resize` with
``impl="auto"`` picks the best available path.

Layout: public API is HWC (like the reference's ImageData); internally CHW so
the large W dimension rides the TPU lane axis.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from ..core import plan as planlib
from ..core.plan import AxisPlan

Method = Literal["nearest", "bilinear", "bicubic", "lanczos"]


def round_u8(x: jnp.ndarray) -> jnp.ndarray:
    """JS Math.round + Uint8ClampedArray store: clip(floor(v+0.5), 0, 255)."""
    return jnp.clip(jnp.floor(x + 0.5), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# gather implementation
# ---------------------------------------------------------------------------

def _axis_pass_gather(x: jnp.ndarray, plan: AxisPlan, axis: int) -> jnp.ndarray:
    idx = jnp.asarray(plan.idx.reshape(-1))
    g = jnp.take(x, idx, axis=axis)
    shape = list(g.shape)
    shape[axis:axis + 1] = [plan.n_out, plan.taps]
    g = g.reshape(shape)
    w = jnp.asarray(plan.w)
    wshape = [1] * g.ndim
    wshape[axis] = plan.n_out
    wshape[axis + 1] = plan.taps
    return (g * w.reshape(wshape)).sum(axis=axis + 1)


def _resize_gather(chw: jnp.ndarray, plan_y: AxisPlan, plan_x: AxisPlan) -> jnp.ndarray:
    t = _axis_pass_gather(chw, plan_y, axis=1)
    return _axis_pass_gather(t, plan_x, axis=2)


# ---------------------------------------------------------------------------
# matmul (MXU) implementation
# ---------------------------------------------------------------------------

def _resize_matmul(chw: jnp.ndarray, plan_y: AxisPlan, plan_x: AxisPlan) -> jnp.ndarray:
    m_row = jnp.asarray(planlib.plan_to_matrix(plan_y))            # [Ho, Hi]
    m_col_t = jnp.asarray(planlib.plan_to_matrix(plan_x).T)        # [Wi, Wo]
    t = jnp.einsum("oh,chw->cow", m_row, chw,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("cow,wx->cox", t, m_col_t,
                      preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# phase-decomposed implementation (integer scales)
# ---------------------------------------------------------------------------

def _axis_pass_phase(x: jnp.ndarray, plan: AxisPlan, axis: int, scale: int) -> jnp.ndarray:
    """Interior via periodic phase weights (shifted-slice FMA), borders via the
    exact gather pass. Requires n_out == scale * n_in."""
    n_in = plan.n_in
    lo, hi = planlib.interior_band(n_in, scale)
    if hi <= lo:  # image too small for an interior band
        return _axis_pass_gather(x, plan, axis)

    x = jnp.moveaxis(x, axis, 0)
    pad_cfg = [(1, 2)] + [(0, 0)] * (x.ndim - 1)
    padded = jnp.pad(x, pad_cfg, mode="edge")
    # interior weights = exact plan rows for one full period
    lut = jnp.asarray(plan.w[lo:lo + scale])                      # [S, 4]
    slices = jnp.stack([padded[k:k + n_in] for k in range(4)])    # [4, n_in, ...]
    tmp = jnp.einsum("pm,mh...->hp...", lut, slices,
                     preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)          # [n_in, S, ...]
    interior = tmp.reshape((n_in * scale,) + x.shape[1:])

    def exact(sub_plan):
        g = x[jnp.asarray(sub_plan.idx)]                          # [n, 4, ...]
        w = jnp.asarray(sub_plan.w).reshape(
            sub_plan.w.shape + (1,) * (x.ndim - 1))
        return (g * w).sum(axis=1)

    top = exact(dataclasses.replace(plan, idx=plan.idx[:lo], w=plan.w[:lo]))
    bot = exact(dataclasses.replace(plan, idx=plan.idx[hi:], w=plan.w[hi:]))
    out = jnp.concatenate([top, interior[lo:hi], bot], axis=0)
    return jnp.moveaxis(out, 0, axis)


def _axis_pass_phase_rational(x: jnp.ndarray, plan: AxisPlan, axis: int,
                              p: int, q: int) -> jnp.ndarray:
    """Rational-scale (p/q) phase pass: interior weights are periodic with
    period ``p`` in the output index (the JS kernel is scale-agnostic —
    reference bicubic_super_resolution.js:38-39 — so ours is too).

    For output o = k*p + r the 4 taps sit at k*q + t(r) + m with
    t(r) = floor(r*q/p) - 1, so each phase r is a 4-tap FMA over stride-q
    slices of the input, interleaved by a [n_k, p] reshape. Borders (clamp
    semantics) come from the exact gather rows, as in the integer path.
    """
    n_in, n_out = plan.n_in, plan.n_out
    # interior periods k: all taps in-bounds for every phase
    k0 = max(1, -(-1 * 1 // q))                       # k*q + t(r) >= 0 → k>=1
    k1 = (n_in - 2 - q) // q                          # k*q+q-1+2 <= n_in-1
    lo, hi = k0 * p, (k1 + 1) * p
    if hi > n_out:                                    # rounding of n_out
        hi -= p
        k1 -= 1
    if k1 < k0:
        return _axis_pass_gather(x, plan, axis)
    n_k = k1 - k0 + 1

    x = jnp.moveaxis(x, axis, 0)
    tr = [int(np.floor(r * q / p)) - 1 for r in range(p)]
    # phase weights: the plan rows of the first interior period (k-invariant)
    lut = plan.w[lo:lo + p]                           # [p, 4]
    phases = []
    for r in range(p):
        acc = None
        for m in range(4):
            start = k0 * q + tr[r] + m
            sl = x[start:start + n_k * q:q]
            term = lut[r, m] * sl
            acc = term if acc is None else acc + term
        phases.append(acc)
    tmp = jnp.stack(phases, axis=1)                   # [n_k, p, ...]
    interior = tmp.reshape((n_k * p,) + x.shape[1:])

    def exact(sub_plan):
        g = x[jnp.asarray(sub_plan.idx)]
        w = jnp.asarray(sub_plan.w).reshape(
            sub_plan.w.shape + (1,) * (x.ndim - 1))
        return (g * w).sum(axis=1)

    top = exact(dataclasses.replace(plan, idx=plan.idx[:lo], w=plan.w[:lo]))
    bot = exact(dataclasses.replace(plan, idx=plan.idx[hi:], w=plan.w[hi:]))
    out = jnp.concatenate([top, interior, bot], axis=0)
    return jnp.moveaxis(out, 0, axis)


def _as_fraction(scale: float, max_den: int = 64) -> tuple[int, int] | None:
    """scale as p/q with small q (exactly — floats like 1.5, 2.5 are exact)."""
    from fractions import Fraction
    f = Fraction(scale).limit_denominator(max_den)
    if float(f) != float(scale) or f < 1:
        return None
    return f.numerator, f.denominator


def _resize_phase(chw: jnp.ndarray, plan_y: AxisPlan, plan_x: AxisPlan, scale: float) -> jnp.ndarray:
    if _is_integer_upscale(scale):
        t = _axis_pass_phase(chw, plan_y, axis=1, scale=int(scale))
        return _axis_pass_phase(t, plan_x, axis=2, scale=int(scale))
    p, q = _as_fraction(scale)
    t = _axis_pass_phase_rational(chw, plan_y, axis=1, p=p, q=q)
    return _axis_pass_phase_rational(t, plan_x, axis=2, p=p, q=q)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _is_integer_upscale(scale: float) -> bool:
    return scale >= 1 and float(scale) == int(scale)


def build_plans(h: int, w: int, scale: float, method: Method, **kw) -> tuple[AxisPlan, AxisPlan]:
    return planlib.plan_axis(method, h, scale, **kw), planlib.plan_axis(method, w, scale, **kw)


@functools.partial(jax.jit, static_argnames=("scale", "method", "impl", "a", "lanczos_a"))
def _resize_jit(img_hwc, scale, method, impl, a, lanczos_a):
    kw = {}
    if method == "bicubic":
        kw["a"] = a
    elif method == "lanczos":
        kw["a"] = lanczos_a
    h, w = img_hwc.shape[:2]
    plan_y, plan_x = build_plans(h, w, scale, method, **kw)

    squeeze = img_hwc.ndim == 2
    if squeeze:
        img_hwc = img_hwc[..., None]
    in_dtype = img_hwc.dtype
    chw = jnp.transpose(img_hwc, (2, 0, 1)).astype(jnp.float32)

    if impl == "auto":
        impl = "phase" if _is_integer_upscale(scale) and method == "bicubic" else "matmul"
        # phase path only covers 4-tap kernels; others use the MXU matmul.
        # (The fused pallas kernel is faster still on real TPUs but routes
        # through resize(impl="pallas") at the caller level — see resize().)
    if impl == "gather":
        out = _resize_gather(chw, plan_y, plan_x)
    elif impl == "matmul":
        out = _resize_matmul(chw, plan_y, plan_x)
    elif impl == "phase":
        if plan_y.taps != 4 or (not _is_integer_upscale(scale)
                                and _as_fraction(scale) is None):
            raise ValueError(
                "phase impl requires a 4-tap kernel and an integer or "
                "small-rational (p/q, q<=64) upscale")
        out = _resize_phase(chw, plan_y, plan_x, scale)
    else:
        raise ValueError(f"unknown impl {impl!r}")

    out = jnp.transpose(out, (1, 2, 0))
    if squeeze:
        out = out[..., 0]
    if in_dtype == jnp.uint8:
        return round_u8(out)
    return out.astype(in_dtype)


def resize(img, scale: float, method: Method = "bicubic", *,
           impl: str = "auto", a: float = -0.5, lanczos_a: int = 3):
    """Resize an HW or HWC image by ``scale`` with the reference's semantics.

    uint8 input → uint8 output (JS rounding); float input → float output.
    ``impl``: auto | gather | matmul | phase | pallas.
    """
    if impl == "auto" and jax.default_backend() == "tpu":
        from .pallas_mxu import mxu_supported
        img_np = np.asarray(img) if not hasattr(img, "shape") else img
        c = img_np.shape[2] if img_np.ndim == 3 else 1
        if img_np.ndim in (2, 3) and mxu_supported(scale, c, method):
            # banded-matmul kernel: fastest delivered-HWC path, and the
            # only Pallas path covering rational scales
            impl = "pallas_mxu"
        elif _is_integer_upscale(scale):
            impl = "pallas_phase"
    if impl == "pallas_mxu":
        from .pallas_mxu import resize_mxu
        return resize_mxu(img, scale, method, a=a, lanczos_a=lanczos_a)
    if impl == "pallas":
        from .pallas_resize import resize_pallas
        return resize_pallas(img, scale, method=method, a=a,
                             lanczos_a=lanczos_a)
    if impl == "pallas_phase":
        from .pallas_phase import resize_phase_pallas
        return resize_phase_pallas(img, scale, method=method, a=a,
                                   lanczos_a=lanczos_a)
    return _resize_jit(jnp.asarray(img), float(scale), method, impl, float(a), int(lanczos_a))


def resize_batch(imgs, scale: float, method: Method = "bicubic", *,
                 impl: str = "auto", **kw):
    """vmap of :func:`resize` over a leading batch axis (same-size images)."""
    fn = functools.partial(resize, scale=scale, method=method, impl=impl, **kw)
    return jax.vmap(fn)(jnp.asarray(imgs))
