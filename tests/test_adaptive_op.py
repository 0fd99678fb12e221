"""Device adaptive-bicubic op vs the float64 oracle."""

import numpy as np
import pytest

from bicubic_interpolation_model_tpu.core.oracle import adaptive_bicubic_oracle
from bicubic_interpolation_model_tpu.ops.adaptive import adaptive_resize

from conftest import random_image


@pytest.mark.parametrize("scale", [2, 4])
def test_adaptive_parity(rng, scale):
    img = random_image(rng, 14, 11)
    want = adaptive_bicubic_oracle(img, float(scale)).astype(np.int32)
    got = np.asarray(adaptive_resize(img, scale)).astype(np.int32)
    assert got.shape == want.shape
    diff = np.abs(got - want)
    assert diff.max() <= 1, f"max delta {diff.max()}"
    assert (diff != 0).mean() < 0.01


def test_adaptive_constant(rng):
    img = np.full((8, 8, 4), 42, np.uint8)
    out = np.asarray(adaptive_resize(img, 4))
    np.testing.assert_array_equal(out, 42)


def test_adaptive_rejects_bad_input(rng):
    with pytest.raises(ValueError):
        adaptive_resize(random_image(rng, 8, 8).astype(np.float32), 4)
