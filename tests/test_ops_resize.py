"""Parity tests: device resize ops vs the float64 JS-semantics oracle.

Gate: max |diff| <= 1 u8 LSB (f32 device math vs f64 oracle), mismatch rate
well under 1%. This is the north-star bit-fidelity contract (BASELINE.md).
"""

import numpy as np
import pytest

from bicubic_interpolation_model_tpu.core.oracle import resize_oracle
from bicubic_interpolation_model_tpu.ops.resize import resize, resize_batch

from conftest import random_image


def assert_u8_parity(got, want, max_mismatch=5e-3):
    got = np.asarray(got).astype(np.int32)
    want = want.astype(np.int32)
    diff = np.abs(got - want)
    assert diff.max() <= 1, f"max u8 delta {diff.max()} > 1"
    rate = (diff != 0).mean()
    assert rate < max_mismatch, f"mismatch rate {rate:.4%}"


METHODS = ["nearest", "bilinear", "bicubic", "lanczos"]


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("impl", ["gather", "matmul"])
@pytest.mark.parametrize("scale", [2.0, 4.0, 2.5])
def test_resize_parity(rng, method, impl, scale):
    img = random_image(rng, 17, 13)
    want = resize_oracle(img, scale, method)
    got = resize(img, scale, method, impl=impl)
    assert got.shape == want.shape
    assert_u8_parity(got, want)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_resize_phase_parity(rng, scale):
    img = random_image(rng, 19, 16)
    want = resize_oracle(img, float(scale), "bicubic")
    got = resize(img, scale, "bicubic", impl="phase")
    assert_u8_parity(got, want)


def test_resize_auto_picks_valid_impl(rng):
    img = random_image(rng, 9, 9)
    for scale, method in [(4, "bicubic"), (2.5, "bicubic"), (4, "lanczos")]:
        want = resize_oracle(img, float(scale), method)
        got = resize(img, scale, method)
        assert_u8_parity(got, want)


def test_resize_float_roundtrip(rng):
    img = random_image(rng, 8, 8).astype(np.float32) / 255.0
    out = resize(img, 2.0, "bicubic")
    assert np.asarray(out).dtype == np.float32
    assert out.shape == (16, 16, 4)


def test_resize_2d_grayscale(rng):
    img = rng.integers(0, 256, (11, 7), dtype=np.uint8)
    out = resize(img, 2.0, "bicubic")
    assert out.shape == (22, 14)
    want = resize_oracle(img[..., None], 2.0, "bicubic")[..., 0]
    assert_u8_parity(out, want)


def test_resize_batch(rng):
    imgs = np.stack([random_image(rng, 8, 8) for _ in range(3)])
    out = resize_batch(imgs, 4.0, "bicubic")
    assert out.shape == (3, 32, 32, 4)
    for i in range(3):
        assert_u8_parity(out[i], resize_oracle(imgs[i], 4.0, "bicubic"))


def test_resize_tiny_image_phase_fallback(rng):
    # n_in=2 → no interior band; phase path must fall back to exact gather
    img = random_image(rng, 2, 2)
    got = resize(img, 4, "bicubic", impl="phase")
    assert_u8_parity(got, resize_oracle(img, 4.0, "bicubic"))


def test_resize_rejects_bad_args(rng):
    img = random_image(rng, 8, 8)
    # rational scales are now a phase fast path (r2); an irrational scale
    # (no exact small p/q) still has no phase decomposition
    with pytest.raises(ValueError):
        resize(img, 2.7182818, "bicubic", impl="phase")
    with pytest.raises(ValueError):
        resize(img, 2, "nope")


@pytest.mark.parametrize("scale", [1.5, 2.5, 1.25])
def test_resize_phase_rational_parity(rng, scale):
    """Rational-scale phase path (VERDICT r1 item 4): period-p LUT over
    stride-q slices, exact border rows — ±1 LSB vs the float64 oracle."""
    for h, w in [(24, 20), (17, 13)]:
        img = random_image(rng, h, w)
        want = resize_oracle(img, scale, "bicubic").astype(np.int32)
        got = np.asarray(
            resize(img, scale, "bicubic", impl="phase")).astype(np.int32)
        assert got.shape == want.shape
        assert np.abs(got - want).max() <= 1
