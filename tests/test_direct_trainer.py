"""DirectSRTrainer (the espcn/esrgan/srresnet family trainer) unit tests:
patch sampling, the 8-fold dihedral augmentation added in round 4, and a
one-epoch fit smoke on a tiny model."""

import numpy as np
import pytest

from bicubic_interpolation_model_tpu.models.espcn import ESPCN
from bicubic_interpolation_model_tpu.train.direct_trainer import (
    DirectSRConfig,
    DirectSRTrainer,
)


def _tiny_data(rng, n=2, h=24, w=20, scale=4):
    data = {}
    for i in range(n):
        hr = rng.integers(0, 256, (h * scale, w * scale, 4), np.uint8)
        lr = rng.random((h, w, 4)).astype(np.float32)
        data[f"im{i}"] = {"X": lr, "HR": hr}
    return data


@pytest.mark.parametrize("augment", [False, True])
def test_batch_shapes_and_range(augment):
    rng = np.random.default_rng(0)
    cfg = DirectSRConfig(patch_lr=8, batch_size=4, scale=4, channels=3,
                         augment=augment)
    tr = DirectSRTrainer(ESPCN(scale=4, channels=3), cfg)
    data = _tiny_data(rng)
    lr_b, hr_b = tr._batch(data, list(data), np.random.default_rng(1))
    assert lr_b.shape == (4, 8, 8, 3)
    assert hr_b.shape == (4, 32, 32, 3)
    assert hr_b.dtype == np.float32 and 0.0 <= hr_b.min() <= hr_b.max() <= 1.0


def test_augmented_pairs_stay_aligned():
    """Rot/flip must be applied to LR and HR with the same orientation:
    upsampling the LR patch by nearest must stay pixel-aligned with HR."""
    rng = np.random.default_rng(2)
    s, p = 4, 8
    # HR = nearest-upsampled LR so alignment is checkable exactly
    lr = rng.random((16, 16, 3)).astype(np.float32)
    hr = np.repeat(np.repeat(lr, s, 0), s, 1)
    data = {"im0": {"X": lr, "HR": (hr * 255).astype(np.uint8)}}
    cfg = DirectSRConfig(patch_lr=p, batch_size=8, scale=s, channels=3,
                         augment=True)
    tr = DirectSRTrainer(ESPCN(scale=s, channels=3), cfg)
    lr_b, hr_b = tr._batch(data, ["im0"], np.random.default_rng(3))
    up = np.repeat(np.repeat(lr_b, s, 1), s, 2)
    np.testing.assert_allclose(up, hr_b, atol=2 / 255)


def test_augment_changes_sampling_not_determinism():
    data = _tiny_data(np.random.default_rng(4))
    cfg = dict(patch_lr=8, batch_size=4, scale=4, channels=3)
    tr_a = DirectSRTrainer(ESPCN(scale=4, channels=3),
                           DirectSRConfig(**cfg, augment=True))
    a1 = tr_a._batch(data, list(data), np.random.default_rng(7))
    a2 = tr_a._batch(data, list(data), np.random.default_rng(7))
    np.testing.assert_array_equal(a1[0], a2[0])  # same rng → same batch
    tr_p = DirectSRTrainer(ESPCN(scale=4, channels=3),
                           DirectSRConfig(**cfg, augment=False))
    p1 = tr_p._batch(data, list(data), np.random.default_rng(7))
    assert not np.array_equal(a1[0], p1[0])  # augment consumed rng draws


def test_fit_smoke_augmented():
    data = _tiny_data(np.random.default_rng(5))
    cfg = DirectSRConfig(patch_lr=8, batch_size=2, scale=4, channels=3,
                         epochs=1, steps_per_epoch=2, augment=True)
    tr = DirectSRTrainer(ESPCN(scale=4, channels=3, features=8), cfg)
    params = tr.fit(data, log=lambda *_: None)
    assert params is not None and len(tr.history) == 1
    assert np.isfinite(tr.history[0]["loss"])
