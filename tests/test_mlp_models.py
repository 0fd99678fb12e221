"""v1/v2 MLP weight-predictor family tests."""

import jax
import jax.numpy as jnp
import numpy as np

from bicubic_interpolation_model_tpu.models.mlp_predictor import (
    PatchMLP,
    PixelMLP,
    apply_max_norm,
    extract_pixel_features,
    super_resolve_mlp,
)

from conftest import random_image


def test_pixel_mlp_topology():
    m = PixelMLP()
    p = m.init(jax.random.key(0), jnp.zeros((1, 66)))
    out = m.apply(p, jnp.zeros((3, 66)))
    assert out.shape == (3, 16)
    # output layer has no bias (v2 train.js:84-88)
    assert "bias" not in p["params"]["dense_out"]


def test_max_norm_constraint():
    m = PixelMLP()
    p = m.init(jax.random.key(0), jnp.zeros((1, 66)))
    big = jax.tree.map(lambda x: x * 100.0, p)
    clipped = apply_max_norm(big, 3.0)
    for layer in ("dense1", "dense2", "dense_out"):
        k = np.asarray(clipped["params"][layer]["kernel"])
        norms = np.linalg.norm(k, axis=0)
        assert norms.max() <= 3.0 + 1e-4
    # biases untouched
    np.testing.assert_array_equal(
        np.asarray(clipped["params"]["dense1"]["bias"]),
        np.asarray(big["params"]["dense1"]["bias"]))


def test_extract_pixel_features_shapes_and_offsets(rng):
    lr = rng.random((6, 5, 4)).astype(np.float32)
    feats = np.asarray(extract_pixel_features(jnp.asarray(lr), 24, 20, 4))
    assert feats.shape == (24 * 20, 66)
    assert feats[:, -2:].min() >= -0.5 and feats[:, -2:].max() < 0.5
    # center tap of the patch at HR pixel (0,0) is LR pixel (0,0):
    # patch plane (dy=1, dx=1) is flattened at index (1*4+1)*4 channels
    np.testing.assert_allclose(feats[0, (1 * 4 + 1) * 4:(1 * 4 + 1) * 4 + 4],
                               lr[0, 0], atol=1e-6)


def test_patch_mlp_shapes():
    m = PatchMLP()
    p = m.init(jax.random.key(0), jnp.zeros((1, 64)))
    assert m.apply(p, jnp.zeros((5, 64))).shape == (5, 16)


def test_super_resolve_mlp_runs(rng):
    img = random_image(rng, 8, 8)
    m = PixelMLP()
    p = m.init(jax.random.key(0), jnp.zeros((1, 66)))
    sr = np.asarray(super_resolve_mlp(m, p, img, scale=4))
    assert sr.shape == (32, 32, 4)
    assert sr.dtype == np.uint8


def test_mlp_trainer_learns_gt_weights(rng):
    """Train the v2 MLP to predict GT weights from features on one tiny
    image; loss must drop and early stopping must engage eventually."""
    from bicubic_interpolation_model_tpu.ops.learned import gt_weight_map
    from bicubic_interpolation_model_tpu.train.mlp_trainer import (
        MLPTrainConfig,
        train_pixel_mlp,
    )
    lr = rng.random((8, 8, 4)).astype(np.float32)
    feats = np.asarray(extract_pixel_features(jnp.asarray(lr), 32, 32, 4))
    targets = np.asarray(gt_weight_map(32, 32, 4.0)).reshape(-1, 16)
    cfg = MLPTrainConfig(epochs=30, batch_size=256, learning_rate=0.05)
    params, history = train_pixel_mlp(PixelMLP(), feats, targets, cfg,
                                      log=lambda *_: None)
    assert history[-1] < history[0]
