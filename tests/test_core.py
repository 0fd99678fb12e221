"""Golden-value and oracle self-consistency tests for the core math."""

import numpy as np
import pytest

from bicubic_interpolation_model_tpu.core import (
    cubic_keys,
    lanczos_kernel,
    plan_axis,
    plan_bicubic,
    plan_to_matrix,
    phase_lut_bicubic,
    interior_band,
)
from bicubic_interpolation_model_tpu.core.oracle import (
    adaptive_bicubic_oracle,
    js_round_u8,
    resize_oracle,
    resize_oracle_loops,
)


def test_keys_cubic_golden_values():
    # Analytic values for a = -0.5 (Catmull-Rom)
    assert cubic_keys(np.float64(0.0)) == 1.0
    assert cubic_keys(np.float64(1.0)) == pytest.approx(0.0, abs=1e-15)
    assert cubic_keys(np.float64(0.5)) == pytest.approx(0.5625)
    assert cubic_keys(np.float64(1.5)) == pytest.approx(-0.0625)
    assert cubic_keys(np.float64(2.0)) == pytest.approx(0.0, abs=1e-15)
    assert cubic_keys(np.float64(2.5)) == 0.0
    # Partition of unity on interior taps for any phase
    for d in np.linspace(0, 0.999, 17):
        taps = cubic_keys(np.array([1 + d, d, 1 - d, 2 - d]))
        assert taps.sum() == pytest.approx(1.0, abs=1e-12)


def test_lanczos_golden_values():
    assert lanczos_kernel(np.float64(0.0)) == 1.0
    assert lanczos_kernel(np.float64(1.0)) == pytest.approx(0.0, abs=1e-15)
    assert lanczos_kernel(np.float64(3.0)) == pytest.approx(0.0, abs=1e-15)
    assert lanczos_kernel(np.float64(3.5)) == 0.0
    assert lanczos_kernel(np.float64(0.5)) == pytest.approx(
        3 * np.sin(np.pi * 0.5) * np.sin(np.pi * 0.5 / 3) / (np.pi * 0.5) ** 2
    )


def test_js_round_half_up():
    v = np.array([-0.6, -0.5, 0.4, 0.5, 1.5, 2.5, 254.5, 255.7])
    # JS Math.round rounds .5 toward +inf; Uint8ClampedArray clips.
    assert js_round_u8(v).tolist() == [0, 0, 0, 1, 2, 3, 255, 255]


@pytest.mark.parametrize("method,taps", [
    ("nearest", 1), ("bilinear", 2), ("bicubic", 4), ("lanczos", 6),
])
def test_plan_shapes_and_bounds(method, taps):
    plan = plan_axis(method, 37, 4.0)
    assert plan.n_out == 148
    assert plan.taps == taps
    assert plan.idx.min() >= 0 and plan.idx.max() <= 36


@pytest.mark.parametrize("method", ["bicubic", "lanczos"])
def test_plan_weights_normalized(method):
    plan = plan_axis(method, 23, 4.0)
    np.testing.assert_allclose(plan.w.sum(axis=1), 1.0, atol=1e-6)


def test_phase_lut_scale4():
    lut = phase_lut_bicubic(4)
    assert lut.shape == (4, 4)
    # phase 0 lands exactly on an input sample: weight 1 on tap m=1
    np.testing.assert_allclose(lut[0], [0, 1, 0, 0], atol=1e-7)
    np.testing.assert_allclose(lut.sum(axis=1), 1.0, atol=1e-6)
    # Matches the exact plan's interior rows
    plan = plan_bicubic(32, 4.0)
    lo, hi = interior_band(32, 4)
    np.testing.assert_allclose(
        plan.w[lo:lo + 4], lut, atol=1e-7
    )


def test_plan_matrix_matches_gather(small_image):
    plan = plan_bicubic(small_image.shape[0], 4.0)
    mat = plan_to_matrix(plan).astype(np.float64)
    x = small_image.astype(np.float64)
    via_mat = np.einsum("oh,hwc->owc", mat, x)
    g = x[plan.idx]  # [n_out, 4, W, C]
    via_gather = (g * plan.w.astype(np.float64)[:, :, None, None]).sum(axis=1)
    np.testing.assert_allclose(via_mat, via_gather, atol=1e-9)


@pytest.mark.parametrize("scale", [2.0, 4.0, 2.5])
def test_separable_oracle_matches_literal_js_loop(small_image, scale):
    """The separable two-pass oracle vs the literal transcription of the JS
    double loop (incl. edge clamping and 2-D normalization): algebraically
    identical, so only float64 summation-order noise may flip pixels sitting
    exactly on a rounding boundary — bounded by ±1 LSB and rare."""
    fast = resize_oracle(small_image, scale, "bicubic").astype(np.int32)
    slow = resize_oracle_loops(small_image, scale).astype(np.int32)
    diff = np.abs(fast - slow)
    assert diff.max() <= 1
    assert (diff != 0).mean() < 1e-3


@pytest.mark.parametrize("method", ["nearest", "bilinear", "bicubic", "lanczos"])
def test_oracle_preserves_constant_images(method):
    img = np.full((9, 7, 4), 113, dtype=np.uint8)
    out = resize_oracle(img, 4.0, method)
    assert out.shape == (36, 28, 4)
    np.testing.assert_array_equal(out, 113)


def test_oracle_alpha_stays_opaque(small_image):
    out = resize_oracle(small_image, 4.0, "bicubic")
    np.testing.assert_array_equal(out[..., 3], 255)


def test_adaptive_oracle_matches_literal_js_loop(rng):
    """Vectorized adaptive oracle vs a literal transcription of
    ultimateBicubicInterpolation on a tiny image."""
    img = rng.integers(0, 256, size=(7, 6, 4), dtype=np.uint8)
    img[..., 3] = 255
    got = adaptive_bicubic_oracle(img, 2.0)
    expect = _adaptive_literal(img, 2.0)
    np.testing.assert_array_equal(got, expect)


def test_adaptive_oracle_constant_image():
    img = np.full((8, 8, 4), 42, dtype=np.uint8)
    out = adaptive_bicubic_oracle(img, 4.0)
    np.testing.assert_array_equal(out, 42)


def _adaptive_literal(img, scale, a=-0.5):
    """Line-by-line float64 port of the JS adaptive loop, for tiny inputs only."""
    h, w, c = img.shape
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    data = img.astype(np.float64)
    luma = data[..., 0] * 0.2126 + data[..., 1] * 0.7152 + data[..., 2] * 0.0722

    def cubic(t):
        t = abs(t)
        t = np.floor(t * 100 + 0.5) / 100  # toFixed(2) memo key
        return float(cubic_keys(np.float64(t), a=a))

    def region(x, y):
        s = sq = 0.0
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                px = min(w - 1, max(0, x + dx))
                py = min(h - 1, max(0, y + dy))
                v = luma[py, px]
                s += v
                sq += v * v
        var = (sq - s * s / 25) / 25
        return var < 10, var > 50

    out = np.zeros((nh, nw, c), dtype=np.uint8)
    for y in range(nh):
        for x in range(nw):
            ox, oy = x / scale, y / scale
            cx = min(w - 1, max(0, int(np.floor(ox + 0.5))))
            cy = min(h - 1, max(0, int(np.floor(oy + 0.5))))
            is_flat, is_edge = region(cx, cy)
            x0, y0 = int(np.floor(ox)) - 1, int(np.floor(oy)) - 1
            acc = np.zeros(c)
            wsum = 0.0
            for m in range(4):
                for n in range(4):
                    px = min(w - 1, max(0, x0 + m))
                    py = min(h - 1, max(0, y0 + n))
                    weight = cubic(ox - px) * cubic(oy - py)
                    if px != cx or py != cy:
                        ld = abs(luma[cy, cx] - luma[py, px])
                        if is_edge:
                            weight *= 1.0 + 0.5 * min(1.0, ld / 50)
                        elif is_flat:
                            weight *= max(0.5, 1 - ld / 30)
                        else:
                            weight *= 0.8 + 0.4 * np.exp(-ld / 20)
                    acc += data[py, px] * weight
                    wsum += weight
            out[y, x] = js_round_u8(acc / wsum)
    return out
