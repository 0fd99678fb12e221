"""Parity tests for the fused Pallas packed tail (ops/pallas_packed_tail).

The kernel replaces models/inference._packed_phase_tail + _apply_round on
TPU; these tests run it in interpret mode on the CPU mesh and assert parity
against the XLA tail — the tail's own oracle chain back to the reference
(model_super_resolution.js:68-124) is covered by tests/test_models.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bicubic_interpolation_model_tpu.models.inference import (
    _packed_phase_tail, _super_resolve_packed)
from bicubic_interpolation_model_tpu.ops.learned import _apply_round
from bicubic_interpolation_model_tpu.ops.pallas_packed_tail import (
    packed_tail_pallas, packed_tail_supported)


def _xla_tail(m, lr, kout, bout, s, c, h, w):
    mp = jnp.pad(jnp.asarray(m)[None],
                 ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
    lr_pad = jnp.pad(jnp.asarray(lr), ((1, 2), (1, 2), (0, 0)), mode="edge")
    chw = jnp.transpose(lr_pad, (2, 0, 1))
    out = _packed_phase_tail(mp, chw, jnp.asarray(kout), jnp.asarray(bout),
                             s, c, h, w)
    return np.asarray(_apply_round(out)).astype(np.int64)


def _case(rng, h, w, c):
    m = rng.normal(0, 0.5, (h, w, 4, 4, 32)).astype(np.float32)
    lr = rng.integers(0, 256, (h, w, c)).astype(np.float32)
    kout = rng.normal(0, 0.1, (3, 3, 32, 16)).astype(np.float32)
    bout = rng.normal(0, 0.1, (16,)).astype(np.float32)
    return m, lr, kout, bout


@pytest.mark.parametrize("h,w,c", [(24, 40, 4), (19, 37, 4), (13, 9, 3),
                                   (8, 128, 1), (40, 300, 4)])
def test_packed_tail_kernel_parity(h, w, c):
    """Bit-exact vs the XLA tail at f32 across tile-ragged geometries
    (the 128-deep contraction reassociates the nine 32-deep einsums, but
    f32 matmul + f32 tanh + round land on the same u8 everywhere tested;
    the e2e envelope below allows 1 LSB)."""
    rng = np.random.default_rng(h * 1000 + w)
    m, lr, kout, bout = _case(rng, h, w, c)
    ref = _xla_tail(m, lr, kout, bout, 4, c, h, w)
    got = np.asarray(packed_tail_pallas(
        jnp.asarray(m), jnp.asarray(lr), jnp.asarray(kout),
        jnp.asarray(bout), scale=4)).astype(np.int64)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() <= 1
    assert (got != ref).mean() < 1e-3


def test_packed_tail_opaque_alpha():
    """Constant-alpha skip: alpha = round(255 * sum(w)) instead of the
    16-tap FMA — identical up to 1 LSB of f32 reassociation."""
    rng = np.random.default_rng(7)
    m, lr, kout, bout = _case(rng, 32, 48, 4)
    lr[..., 3] = 255.0
    ref = _xla_tail(m, lr, kout, bout, 4, 4, 32, 48)
    got = np.asarray(packed_tail_pallas(
        jnp.asarray(m), jnp.asarray(lr), jnp.asarray(kout),
        jnp.asarray(bout), scale=4, opaque_alpha=True)).astype(np.int64)
    assert np.abs(got - ref).max() <= 1
    assert np.abs(got[..., :3] - ref[..., :3]).max() <= 1


def test_packed_tail_layouts():
    rng = np.random.default_rng(9)
    m, lr, kout, bout = _case(rng, 16, 24, 4)
    hwc = np.asarray(packed_tail_pallas(
        jnp.asarray(m), jnp.asarray(lr), jnp.asarray(kout),
        jnp.asarray(bout), scale=4))
    h32 = np.asarray(packed_tail_pallas(
        jnp.asarray(m), jnp.asarray(lr), jnp.asarray(kout),
        jnp.asarray(bout), scale=4, layout="hwc32"))
    assert hwc.shape == (64, 96, 4)
    assert h32.shape == (64, 96)
    assert (h32.view(np.uint8).reshape(64, 96, 4) == hwc).all()


def test_packed_tail_supported():
    assert packed_tail_supported(4, 32, 4)
    assert packed_tail_supported(4, 32, 1)
    assert not packed_tail_supported(3, 32, 4)   # S*2F != 128
    assert not packed_tail_supported(4, 48, 4)
    assert not packed_tail_supported(4, 32, 5)


def _wp_params(rng, f_in=32, nw=16):
    """Random params with the WeightPredictor tail shapes (upsample /
    conv_att / conv_off / conv_out), enough to drive _merged_map_mats and
    _packed_merged_map without a checkpoint."""
    n = lambda *s: rng.normal(0, 0.25, s).astype(np.float32)
    return {
        "upsample": {"kernel": n(4, 4, nw, f_in), "bias": n(nw)},
        "conv_att": {"kernel": n(1, 1, nw, 1), "bias": n(1)},
        "conv_off": {"kernel": n(1, 1, 2, nw), "bias": n(nw)},
        "conv_out": {"kernel": n(3, 3, 2 * nw, 16) * 0.4, "bias": n(16)},
    }


@pytest.mark.parametrize("h,w,c", [(24, 40, 4), (19, 37, 4), (13, 9, 3),
                                   (8, 128, 1), (40, 300, 4)])
def test_packed_tail_fused_parity(h, w, c):
    """The fused-upstream kernel (conv features in) vs the XLA chain
    _packed_merged_map + _packed_phase_tail, geometry-swept like the m-fed
    kernel's test above. Guards the abias/BlockSpec class of breakage
    (round-4 all-zero regression)."""
    from bicubic_interpolation_model_tpu.models.inference import (
        _merged_map_mats, _packed_merged_map)
    from bicubic_interpolation_model_tpu.ops.pallas_packed_tail import (
        packed_tail_fused)

    rng = np.random.default_rng(h * 7919 + w)
    p = _wp_params(rng)
    y = rng.normal(0, 0.5, (h, w, 32)).astype(np.float32)
    lr = rng.integers(0, 256, (h, w, c)).astype(np.float32)

    m = np.asarray(_packed_merged_map(p, jnp.asarray(y)[None], 4, "train"))[0]
    ref = _xla_tail(m, lr, p["conv_out"]["kernel"], p["conv_out"]["bias"],
                    4, c, h, w)
    mats = _merged_map_mats(p, 4, "train")
    got = np.asarray(packed_tail_fused(
        jnp.asarray(y), jnp.asarray(lr), jnp.asarray(p["conv_out"]["kernel"]),
        jnp.asarray(p["conv_out"]["bias"]), *mats, scale=4)).astype(np.int64)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() <= 1
    assert (got != ref).mean() < 1e-3
    assert got.std() > 0, "all-constant output — kernel is broken"


def test_packed_tail_fused_opaque_alpha():
    """The fused kernel's opaque-alpha skip stays inside the documented
    envelope (alpha = round(255*sum(w)), ±1 LSB of f32 reassociation)."""
    from bicubic_interpolation_model_tpu.models.inference import (
        _merged_map_mats, _packed_merged_map)
    from bicubic_interpolation_model_tpu.ops.pallas_packed_tail import (
        packed_tail_fused)

    rng = np.random.default_rng(11)
    p = _wp_params(rng)
    h, w = 21, 45
    y = rng.normal(0, 0.5, (h, w, 32)).astype(np.float32)
    lr = rng.integers(0, 256, (h, w, 4)).astype(np.float32)
    lr[..., 3] = 255.0

    m = np.asarray(_packed_merged_map(p, jnp.asarray(y)[None], 4, "train"))[0]
    ref = _xla_tail(m, lr, p["conv_out"]["kernel"], p["conv_out"]["bias"],
                    4, 4, h, w)
    mats = _merged_map_mats(p, 4, "train")
    kb = jnp.asarray(p["conv_out"]["kernel"])
    bb = jnp.asarray(p["conv_out"]["bias"])
    got = np.asarray(packed_tail_fused(
        jnp.asarray(y), jnp.asarray(lr), kb, bb, *mats, scale=4,
        opaque_alpha=True)).astype(np.int64)
    assert np.abs(got - ref).max() <= 1


def test_super_resolve_packed_fused_bf16_envelope(wp_checkpoint):
    """The TPU-default serving configuration — bf16 model stages + the
    fused-upstream Pallas tail — on a real checkpoint, vs the bf16 XLA
    tail: association order is the only difference, so the fused route
    must stay within the packed path's documented ≤2-LSB envelope. (Random
    params overdrive tanh and inflate bf16 reassociation error, so the
    bf16 gate runs on the trained checkpoint only.)"""
    params = wp_checkpoint
    rng = np.random.default_rng(13)
    lr = rng.integers(0, 256, (33, 49, 4), np.uint8)
    a = np.asarray(_super_resolve_packed(
        params, jnp.asarray(lr), 4, "train", dtype=jnp.bfloat16,
        tail="xla")).astype(np.int64)
    b = np.asarray(_super_resolve_packed(
        params, jnp.asarray(lr), 4, "train", dtype=jnp.bfloat16,
        tail="pallas")).astype(np.int64)
    d = np.abs(a - b)
    assert d.max() <= 2
    # 1-LSB flips are routine in bf16 (weights quantized to ~3 decimal
    # digits); only >1-LSB deviations must be vanishing
    assert (d > 1).mean() < 5e-3
    assert b.std() > 0


def test_super_resolve_packed_pallas_tail_matches_xla(wp_checkpoint):
    """E2E: the packed forward with tail='pallas' vs tail='xla' on a real
    checkpoint — ≤1 u8 LSB, vanishing fraction."""
    params = wp_checkpoint
    rng = np.random.default_rng(3)
    lr = rng.integers(0, 256, (40, 56, 4), np.uint8)
    lr[..., 3] = 255
    a = np.asarray(_super_resolve_packed(
        params, jnp.asarray(lr), 4, "train", tail="xla")).astype(np.int64)
    b = np.asarray(_super_resolve_packed(
        params, jnp.asarray(lr), 4, "train", tail="pallas")).astype(np.int64)
    assert np.abs(a - b).max() <= 1
    assert (a != b).mean() < 1e-3


@pytest.fixture(scope="module")
def wp_checkpoint():
    import pathlib

    from bicubic_interpolation_model_tpu.evaluation.model_analysis import (
        _load_model_any)
    d = pathlib.Path(__file__).resolve().parents[1] / "model" / "wp-1e-3-120"
    if not d.exists():
        pytest.skip("wp-1e-3-120 checkpoint not present")
    _, params = _load_model_any(str(d))
    return params
