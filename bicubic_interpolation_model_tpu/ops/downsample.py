"""Antialiased image downsampling on device (MXU sampling-matrix matmuls).

Replaces sharp's HR→LR reduction (reference data_generator.js:62-88 uses
``kernel: cubic``; model_super_resolution.js:20-32 uses ``lanczos3`` — an
inconsistency in the reference that we expose as the ``method`` argument).
Runs on-TPU so LR generation lives in the same jit program as everything else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import plan as planlib


@functools.partial(jax.jit, static_argnames=("factor", "method", "h_out", "w_out"))
def _downsample_jit(img_hwc, factor, method, h_out, w_out):
    h, w = img_hwc.shape[:2]
    plan_y = planlib.plan_downsample(h, factor, method, n_out=h_out)
    plan_x = planlib.plan_downsample(w, factor, method, n_out=w_out)
    m_row = jnp.asarray(planlib.plan_to_matrix(plan_y))
    m_col_t = jnp.asarray(planlib.plan_to_matrix(plan_x).T)
    squeeze = img_hwc.ndim == 2
    if squeeze:
        img_hwc = img_hwc[..., None]
    in_dtype = img_hwc.dtype
    chw = jnp.transpose(img_hwc, (2, 0, 1)).astype(jnp.float32)
    t = jnp.einsum("oh,chw->cow", m_row, chw,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("cow,wx->cox", t, m_col_t,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.transpose(out, (1, 2, 0))
    if squeeze:
        out = out[..., 0]
    if in_dtype == jnp.uint8:
        return jnp.clip(jnp.floor(out + 0.5), 0, 255).astype(jnp.uint8)
    return out.astype(in_dtype)


def downsample(img, factor: float, method: str = "cubic",
               out_shape: tuple[int, int] | None = None):
    """Downsample an HW/HWC image by ``factor`` (>=1) with antialiasing.

    uint8 → uint8 (round half-up), float → float.
    """
    img = jnp.asarray(img)
    if out_shape is None:
        h_out = int(img.shape[0] // factor)
        w_out = int(img.shape[1] // factor)
    else:
        h_out, w_out = out_shape
    return _downsample_jit(img, float(factor), method, h_out, w_out)


def downsample_np(img: np.ndarray, factor: float, method: str = "cubic",
                  out_shape: tuple[int, int] | None = None) -> np.ndarray:
    """Host-side NumPy variant (float64) — same plans/semantics as
    :func:`downsample`. Data pipelines use this so that per-image-shape jit
    compiles don't serialize against device training jobs."""
    img = np.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w = img.shape[:2]
    h_out = int(h // factor) if out_shape is None else out_shape[0]
    w_out = int(w // factor) if out_shape is None else out_shape[1]
    m_row = planlib.plan_to_matrix(
        planlib.plan_downsample(h, factor, method, n_out=h_out), np.float64)
    m_col = planlib.plan_to_matrix(
        planlib.plan_downsample(w, factor, method, n_out=w_out), np.float64)
    x = img.astype(np.float64)
    t = np.einsum("oh,hwc->owc", m_row, x)
    out = np.einsum("owc,xw->oxc", t, m_col)
    if img.dtype == np.uint8:
        out = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    else:
        out = out.astype(img.dtype)
    return out[..., 0] if squeeze else out
