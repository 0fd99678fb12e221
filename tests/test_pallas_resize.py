"""Pallas fused resample kernel vs the float64 oracle (interpret mode on CPU;
the same kernel compiles via Mosaic on real TPU)."""

import numpy as np
import pytest

from bicubic_interpolation_model_tpu.core.oracle import resize_oracle
from bicubic_interpolation_model_tpu.ops.pallas_resize import resize_pallas

from conftest import random_image
from test_ops_resize import assert_u8_parity


@pytest.mark.parametrize("method", ["nearest", "bilinear", "bicubic", "lanczos"])
def test_pallas_parity_small(rng, method):
    img = random_image(rng, 24, 18)
    want = resize_oracle(img, 4.0, method)
    got = resize_pallas(img, 4, method, tile_h=32, tile_w=256)
    assert got.shape == want.shape
    assert_u8_parity(got, want)


@pytest.mark.parametrize("scale", [2, 3])
def test_pallas_parity_scales(rng, scale):
    img = random_image(rng, 33, 20)
    want = resize_oracle(img, float(scale), "bicubic")
    got = resize_pallas(img, scale, "bicubic", tile_h=24, tile_w=384)
    assert_u8_parity(got, want)


def test_pallas_multi_tile(rng):
    # force several tiles in each grid dimension
    img = random_image(rng, 40, 70, c=3)
    want = resize_oracle(img, 4.0, "bicubic")
    got = resize_pallas(img, 4, "bicubic", tile_h=64, tile_w=128)
    assert_u8_parity(got, want)


def test_pallas_float_input(rng):
    img = random_image(rng, 16, 16).astype(np.float32)
    out = resize_pallas(img, 2, "bicubic", tile_h=16, tile_w=256)
    assert np.asarray(out).dtype == np.float32
    want = resize_oracle(img.astype(np.uint8), 2.0, "bicubic")
    assert_u8_parity(np.clip(np.floor(np.asarray(out) + 0.5), 0, 255), want)


def test_pallas_rejects_noninteger_scale(rng):
    with pytest.raises(ValueError):
        resize_pallas(random_image(rng, 8, 8), 2.5)
