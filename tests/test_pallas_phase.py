"""Fused phase-FMA Pallas kernel vs the float64 oracle (interpret mode)."""

import numpy as np
import pytest

from bicubic_interpolation_model_tpu.core.oracle import resize_oracle
from bicubic_interpolation_model_tpu.ops.pallas_phase import resize_phase_pallas

from conftest import random_image
from test_ops_resize import assert_u8_parity


@pytest.mark.parametrize("method", ["nearest", "bilinear", "bicubic", "lanczos"])
def test_phase_pallas_parity(rng, method):
    img = random_image(rng, 24, 18)
    want = resize_oracle(img, 4.0, method)
    got = resize_phase_pallas(img, 4, method, step=8)
    assert got.shape == want.shape
    assert_u8_parity(got, want)


@pytest.mark.parametrize("scale", [2, 3])
def test_phase_pallas_scales(rng, scale):
    img = random_image(rng, 22, 20)
    assert_u8_parity(resize_phase_pallas(img, scale, "bicubic", step=8),
                     resize_oracle(img, float(scale), "bicubic"))


def test_phase_pallas_rgb_and_small(rng):
    img = random_image(rng, 7, 5, c=3)
    assert_u8_parity(resize_phase_pallas(img, 4, "bicubic", step=8),
                     resize_oracle(img, 4.0, "bicubic"))


def test_phase_pallas_float(rng):
    img = random_image(rng, 12, 10).astype(np.float32)
    out = np.asarray(resize_phase_pallas(img, 2, "bicubic", step=8))
    assert out.dtype == np.float32
    want = resize_oracle(img.astype(np.uint8), 2.0, "bicubic")
    assert_u8_parity(np.clip(np.floor(out + 0.5), 0, 255), want)


def test_phase_pallas_lanczos_window_param(rng):
    """lanczos_a must thread through to the plan (window extent changes)."""
    from bicubic_interpolation_model_tpu.core.oracle import resize_oracle
    img = random_image(rng, 20, 16)
    got = resize_phase_pallas(img, 4, "lanczos", lanczos_a=2, step=8)
    want = resize_oracle(img, 4.0, "lanczos", a=2)
    assert_u8_parity(got, want)
    # and a=3 (default) differs from a=2 somewhere
    got3 = np.asarray(resize_phase_pallas(img, 4, "lanczos", step=8))
    assert (np.asarray(got) != got3).any()


def test_planar_layout_matches_hwc(rng):
    """layout='planar' + interleave_planar == the default HWC output
    byte-for-byte (it is the same kernel, minus the device-side interleave)."""
    from bicubic_interpolation_model_tpu.ops.pallas_phase import (
        interleave_planar, resize_phase_pallas,
    )
    imgs = np.stack([random_image(rng, 19, 21) for _ in range(2)])
    hwc = np.asarray(resize_phase_pallas(imgs, 4, "bicubic",
                                         step=8, wstep=16))
    planar = np.asarray(resize_phase_pallas(imgs, 4, "bicubic", step=8,
                                            wstep=16, layout="planar"))
    assert planar.shape[1] == 4              # column-phase planes
    back = interleave_planar(planar, 19, 21, 4, 4)
    np.testing.assert_array_equal(back, hwc)


def test_planar_layout_rejects_unbatched(rng):
    from bicubic_interpolation_model_tpu.ops.pallas_phase import (
        resize_phase_pallas,
    )
    with pytest.raises(ValueError):
        resize_phase_pallas(random_image(rng, 8, 8), 2, layout="planar")
