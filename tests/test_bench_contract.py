"""Driver-contract tests: the bench suite and harness must stay runnable on
any backend and keep their output shape (the driver parses bench.py's single
JSON line)."""

import json

import numpy as np

from bicubic_interpolation_model_tpu.bench import harness, suite


def test_headline_cpu_smoke(tmp_path):
    best, results = suite.headline(impls=("matmul",), runs=1, h=24, w=16,
                                   scale=2)
    assert best is not None
    assert best["max_u8_delta"] <= 1
    assert best["gpix_per_s"] > 0
    # the fields bench.py serializes must be JSON-clean
    json.dumps({"value": best["gpix_per_s"], "impl": best["impl"]})


def test_check_parity_gate():
    assert suite.check_parity(scale=2, impl="gather", h=24, w=16) <= 1


def test_harness_csv_schema(tmp_path):
    calls = []
    res = harness.performance_test(lambda: calls.append(1),
                                   test_item="unit", runs=2, warmup=1,
                                   out_dir=tmp_path)
    assert len(calls) == 3  # 1 warmup + 2 timed
    csv = (tmp_path / "unit" / "unit_performance.csv").read_text()
    assert csv.startswith("Run,Timestamp,Execution Time (ms),CPU Time (ms),"
                          "Memory (MB)")
    assert len(res.wall_ms) == 2
