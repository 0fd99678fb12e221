"""Tests for the learned-pipeline ops: offsets, GT weights, apply-weights."""

import numpy as np
import pytest

from bicubic_interpolation_model_tpu.core.oracle import resize_oracle
from bicubic_interpolation_model_tpu.ops.learned import (
    apply_weights,
    gt_weight_map,
    gt_weights_from_offsets,
    offset_map,
)

from conftest import random_image


def _np_train_offsets(n, scale):
    x = (np.arange(n) + 0.5) / scale
    return x - np.floor(x) - 0.5


def test_offset_map_train_convention():
    off = np.asarray(offset_map(8, 12, 4.0, "train"))
    assert off.shape == (8, 12, 2)
    np.testing.assert_allclose(off[0, :, 0], _np_train_offsets(12, 4), atol=1e-6)
    np.testing.assert_allclose(off[:, 0, 1], _np_train_offsets(8, 4), atol=1e-6)
    assert off.min() >= -0.5 and off.max() < 0.5


def test_offset_map_inference_convention():
    off = np.asarray(offset_map(8, 8, 4.0, "inference"))
    # x=0: 0/4 - (0+0.5) = -0.5 ; x=1: 0.25-0.5 = -0.25
    np.testing.assert_allclose(off[0, :4, 0], [-0.5, -0.25, 0.0, 0.25], atol=1e-6)


def test_gt_weights_sum_to_one():
    w = np.asarray(gt_weight_map(16, 16, 4.0))
    assert w.shape == (16, 16, 16)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    assert w.min() >= -0.75 and w.max() <= 2.0  # validate_data.js:95-98 range


def test_gt_weights_zero_offset_is_identity():
    w = np.asarray(gt_weights_from_offsets(np.float32(0), np.float32(0)))
    # dx=dy=0 → weight 1 on tap (ytap=1, xtap=1) = index 5
    expect = np.zeros(16)
    expect[5] = 1.0
    np.testing.assert_allclose(w, expect, atol=1e-6)


def test_gt_weights_match_js_formula():
    """Cross-check against a direct float64 transcription of
    calculateBicubicWeights (data_generator.js:136-179)."""
    rng = np.random.default_rng(3)
    for _ in range(10):
        dx, dy = rng.uniform(-0.5, 0.5, 2)

        def cubic(t, a=-0.5):
            t = abs(t)
            return (0.0 if t >= 2 else
                    a * (t**3 - 5 * t**2 + 8 * t - 4) if t >= 1 else
                    (a + 2) * t**3 - (a + 3) * t**2 + 1)

        grid = [cubic(ty) * cubic(tx)
                for ty in (1 + dy, dy, 1 - dy, 2 - dy)
                for tx in (1 + dx, dx, 1 - dx, 2 - dx)]
        s = sum(grid)
        want = np.array([g / s for g in grid]) if s > 1e-6 else np.zeros(16)
        got = np.asarray(gt_weights_from_offsets(
            np.float32(dx), np.float32(dy)))
        np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("convention,shift", [("inference", 0.0), ("train", 0.5)])
def test_apply_weights_gt_interpolates_linear_ramps(convention, shift):
    """applyWeights ∘ GT weights samples the LR image at position
    base + dx per axis, where dx = x/s - floor(x/s) - 0.5 (inference) or
    (x+0.5)/s - floor(..) - 0.5 (train). The Keys kernel reproduces linear
    functions exactly, so on a linear ramp the output must equal the ramp
    evaluated at that sample position (interior; clamped borders excluded).

    This pins down the reference's *center-based* learned-pipeline convention
    — deliberately a half-pixel different from the classical corner-aligned
    bicubic kernels (SURVEY.md §2.3)."""
    s = 4
    h_lr, w_lr = 8, 9
    img = (np.arange(w_lr, dtype=np.float32)[None, :, None]
           * np.ones((h_lr, 1, 1), np.float32) * 3.0)  # ramp in x
    h_sr, w_sr = h_lr * s, w_lr * s
    w = gt_weight_map(h_sr, w_sr, float(s), convention)
    got = np.asarray(apply_weights(img, w, rounded=False))
    x = np.arange(w_sr, dtype=np.float64)
    pos = (x + shift) / s - 0.5
    want = 3.0 * pos
    # Linear reproduction only holds where the 4 GT taps sum to 1, i.e.
    # dx >= 0; for dx < 0 the tap 2-dx falls outside the kernel support and
    # the reference's renormalization (data_generator.js:176-178) makes the
    # weights non-interpolating — a quirk we reproduce faithfully.
    dx = pos - np.floor(x / s)
    sel = (dx >= 0) & (x >= 2 * s) & (x < w_sr - 2 * s)
    np.testing.assert_allclose(got[4, sel, 0], want[sel], atol=1e-3)


def test_apply_weights_phase_equals_gather(rng):
    img = random_image(rng, 7, 9)
    wts = np.asarray(gt_weight_map(28, 36, 4.0, "inference"))
    from bicubic_interpolation_model_tpu.ops.learned import (
        _apply_weights_gather,
        _apply_weights_phase,
    )
    import jax.numpy as jnp
    lr = jnp.asarray(img).astype(jnp.float32)
    a = np.asarray(_apply_weights_phase(lr, jnp.asarray(wts), 4))
    b = np.asarray(_apply_weights_gather(lr, jnp.asarray(wts)))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_apply_weights_constant_image():
    img = np.full((6, 6, 4), 200, np.uint8)
    w = gt_weight_map(24, 24, 4.0)
    out = np.asarray(apply_weights(img, w))
    np.testing.assert_array_equal(out, 200)
