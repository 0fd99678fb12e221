"""Test configuration: force CPU backend with 8 virtual devices so
multi-device (mesh/shard_map) tests run without TPU hardware — the TPU-native
answer to 'test multi-chip without a cluster'."""

import os

# NOTE: this environment exports JAX_PLATFORMS=axon (the TPU tunnel), and a
# pytest plugin imports jax before this conftest runs, so env vars alone are
# too late. jax.config.update still works as long as no backend has been
# initialized — force the CPU backend with 8 virtual devices here.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on the CPU backend; the TPU tunnel was initialized too early"
)
assert jax.device_count() >= 8, "expected 8 virtual CPU devices"

import pathlib

import numpy as np
import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference/version3.0")


@pytest.fixture(scope="session")
def reference_root():
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE_ROOT


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def random_image(rng, h, w, c=4):
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    if c == 4:
        img[..., 3] = 255
    return img


@pytest.fixture()
def small_image(rng):
    return random_image(rng, 12, 10)
