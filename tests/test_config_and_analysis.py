"""Workspace config + model-analysis tooling tests."""

import numpy as np
import jax

from bicubic_interpolation_model_tpu.utils.config import WorkspaceConfig


def test_workspace_config_roundtrip(tmp_path):
    cfg = WorkspaceConfig(hrid="0833", scale=2)
    cfg.save(tmp_path)
    loaded = WorkspaceConfig.load(tmp_path)
    assert loaded.hrid == "0833" and loaded.scale == 2
    # unknown keys in the file are ignored
    p = tmp_path / "bim_tpu.json"
    p.write_text(p.read_text().replace("{", '{"future_knob": 1,', 1))
    assert WorkspaceConfig.load(tmp_path).hrid == "0833"


def test_workspace_config_defaults(tmp_path):
    cfg = WorkspaceConfig.load(tmp_path)  # no file
    assert cfg.hrid == "0020" and cfg.a == -0.5


def test_compare_model_and_validate_model(tmp_path, rng):
    """End-to-end cpm/vm on a tiny generated dataset with a fresh model."""
    from bicubic_interpolation_model_tpu.data import div2k
    from bicubic_interpolation_model_tpu.evaluation.model_analysis import (
        compare_model,
        validate_model,
    )
    from bicubic_interpolation_model_tpu.models.weight_predictor import init_params
    from bicubic_interpolation_model_tpu.train import checkpoint
    from bicubic_interpolation_model_tpu.utils import imageio

    from conftest import random_image

    hr_dir = tmp_path / "hr"
    hr_dir.mkdir()
    img = random_image(rng, 24, 24)
    imageio.save_png(hr_dir / "0001.png", img)
    div2k.process_images(hr_dir, tmp_path / "data", scale=4, split="test",
                         log=lambda *_: None)

    model, params = init_params(jax.random.key(0))
    ck = checkpoint.save(tmp_path / "model" / "t", params, meta={})

    logs = []
    validate_model(ck, tmp_path / "data" / "test", hr_dir=hr_dir,
                   log=logs.append)
    assert any("rebuild vs HR" in l for l in logs)

    stats = compare_model(ck, tmp_path / "data" / "test",
                          tmp_path / "cp_model" / "t", log=lambda *_: None)
    assert "global_mse" in stats and len(stats["per_channel_mse"]) == 16
    assert (tmp_path / "cp_model" / "t" / "comparison.txt").exists()
    assert (tmp_path / "cp_model" / "t" / "weight_histograms.png").exists()
