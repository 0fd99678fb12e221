"""Profiling/debug utility tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from bicubic_interpolation_model_tpu.utils import profiling


def test_device_memory_stats():
    stats = profiling.device_memory_stats()
    assert len(stats) >= 1
    assert "device" in stats[0]


def test_debug_mode_restores_flags():
    import jax
    before = jax.config.jax_debug_nans
    with profiling.debug_mode(nans=True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_checked_raises_on_nan():
    def bad(x):
        return jnp.log(x)  # NaN for negative input
    f = profiling.checked(bad)
    assert np.isfinite(float(f(jnp.float32(1.0))))
    with pytest.raises(Exception):
        f(jnp.float32(-1.0))
