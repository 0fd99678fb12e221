"""Parity + contract tests for the vM banded-matmul resize kernel
(ops/pallas_mxu) — the delivered-HWC fast path for integer AND rational
scales (VERDICT r2 items 1+2)."""

import numpy as np
import pytest

from bicubic_interpolation_model_tpu.core.oracle import resize_oracle
from bicubic_interpolation_model_tpu.ops.pallas_mxu import (
    flat_to_hwc_np, mxu_supported, resize_mxu, scale_fraction)

from conftest import random_image


def _delta(got, want):
    assert got.shape == want.shape, (got.shape, want.shape)
    return int(np.abs(np.asarray(got).astype(np.int64)
                      - want.astype(np.int64)).max())


@pytest.mark.parametrize("method,scale", [
    ("bicubic", 4.0), ("bicubic", 2.0), ("bicubic", 3.0),
    ("bilinear", 4.0), ("nearest", 4.0), ("lanczos", 4.0),
])
def test_mxu_integer_scales_parity(rng, method, scale):
    img = random_image(rng, 23, 37)
    got = resize_mxu(img, scale, method, step_in=8, wstep=32)
    assert _delta(got, resize_oracle(img, scale, method)) <= 1


@pytest.mark.parametrize("method,scale", [
    ("bicubic", 1.5), ("bicubic", 2.5), ("bicubic", 1.25),
    ("lanczos", 1.5), ("bilinear", 2.5), ("nearest", 1.5),
])
def test_mxu_rational_scales_parity(rng, method, scale):
    """The reference kernel is scale-agnostic (float division,
    bicubic_super_resolution.js:38-39); the banded-matmul kernel covers
    rational scales with the same ±1-LSB parity as integer ones."""
    img = random_image(rng, 40, 64)
    got = resize_mxu(img, scale, method, step_in=8, wstep=64)
    assert _delta(got, resize_oracle(img, scale, method)) <= 1


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_mxu_channel_counts(rng, c):
    img = random_image(rng, 16, 24)[..., :c].copy()
    got = resize_mxu(img, 4.0, "bicubic", step_in=8, wstep=32)
    assert _delta(got, resize_oracle(img, 4.0, "bicubic")) <= 1


def test_mxu_gray_2d_roundtrip(rng):
    img = random_image(rng, 16, 24)[..., 0].copy()
    got = np.asarray(resize_mxu(img, 2.0, "bicubic", step_in=8, wstep=64))
    assert got.shape == (32, 48)
    want = np.asarray(resize_oracle(img[..., None], 2.0, "bicubic"))[..., 0]
    assert _delta(got, want) <= 1


def test_mxu_flat_layout_views_as_hwc(rng):
    img = random_image(rng, 23, 37)
    flat = np.asarray(resize_mxu(img[None], 4.0, "bicubic", step_in=8,
                                 wstep=32, layout="flat"))
    assert flat.ndim == 3 and flat.dtype == np.uint8
    view = flat_to_hwc_np(flat[0], 92, 148, 4)
    assert view.base is not None           # zero-copy view
    assert _delta(view, resize_oracle(img, 4.0, "bicubic")) <= 1


def test_mxu_bucketed_shares_one_program(rng):
    """Weight arrays are traced data: two frame sizes in one bucket reuse
    the cached device weights' geometry and stay bit-exact."""
    cache = {}
    for (h, w) in [(23, 37), (29, 31), (17, 20)]:
        img = random_image(rng, h, w)
        got = resize_mxu(img, 4.0, "bicubic", step_in=8, wstep=32,
                         bucket=32, weight_cache=cache)
        assert _delta(got, resize_oracle(img, 4.0, "bicubic")) <= 1
    assert len(cache) == 3                 # per-size weights, shared program


def test_mxu_batch_matches_singles(rng):
    imgs = np.stack([random_image(rng, 16, 20) for _ in range(3)])
    outs = np.asarray(resize_mxu(imgs, 4.0, "bicubic", step_in=8, wstep=32))
    for i in range(3):
        assert _delta(outs[i], resize_oracle(imgs[i], 4.0, "bicubic")) <= 1


def test_mxu_float_passthrough(rng):
    from bicubic_interpolation_model_tpu.ops.resize import resize
    img = (rng.random((16, 20, 4)) * 255).astype(np.float32)
    out = np.asarray(resize_mxu(img, 2.0, "bicubic", step_in=8, wstep=64))
    assert out.dtype == np.float32 and out.shape == (32, 40, 4)
    want = np.asarray(resize(img, 2.0, "bicubic", impl="gather"))
    # same plan weights, un-rounded float accumulation (bf16 hi/lo splits)
    assert np.abs(out - want).max() <= 0.05


def test_mxu_supported_predicate():
    assert mxu_supported(4, 4)
    assert mxu_supported(1.5, 3)
    assert mxu_supported(2.5, 1, "lanczos")
    assert not mxu_supported(0.5, 4)            # downscale
    assert not mxu_supported(4, 5)              # too many channels
    assert not mxu_supported(4, 4, "adaptive")  # non-separable
    assert not mxu_supported(1.0001234, 4)      # irrational-ish scale
    assert scale_fraction(1.5) == scale_fraction(3 / 2)


def test_mxu_rejects_downscale(rng):
    with pytest.raises(ValueError, match="scale"):
        resize_mxu(random_image(rng, 8, 8), 0.5)


def test_resize_auto_routes_and_explicit_impl(rng):
    from bicubic_interpolation_model_tpu.ops.resize import resize
    img = random_image(rng, 16, 20)
    got = resize(img, 4.0, "bicubic", impl="pallas_mxu")
    assert _delta(got, resize_oracle(img, 4.0, "bicubic")) <= 1
    got = resize(img, 2.5, "bicubic", impl="pallas_mxu")
    assert _delta(got, resize_oracle(img, 2.5, "bicubic")) <= 1
