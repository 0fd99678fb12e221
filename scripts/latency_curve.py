#!/usr/bin/env python3
"""Latency-vs-frame-size curve for the serving fast path (VERDICT r2
weak #5): where does per-launch overhead start to dominate, and how much
does micro-batching recover? Writes results/latency_curve.json and prints
the table.

Method: every point is measured at the program-output boundary
(bench.suite.bench_program_output — the cost a serving boundary actually
pays). Single-frame rows use one frame per program; batched rows use the
same microbatch size serving's stream() auto-picks (~1 MPix per launch)
and report per-frame time.
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax

    from bicubic_interpolation_model_tpu.bench.suite import (
        bench_program_output)
    from bicubic_interpolation_model_tpu.ops.pallas_mxu import resize_mxu
    from bicubic_interpolation_model_tpu.serving import Upscaler

    scale, method = 4, "bicubic"
    rng = np.random.default_rng(0)
    rows = {}
    cache: dict = {}
    for n in (128, 256, 384, 512, 768, 1024):
        img = jax.device_put(
            rng.integers(0, 256, (n, n, 4), np.uint8))
        out_px = (n * scale) * (n * scale)
        per1 = bench_program_output(
            lambda x: resize_mxu(x, scale, method, weight_cache=cache), img)
        b = max(1, int(round(
            Upscaler.MICROBATCH_THRESHOLD_PX * 4 / (n * n))))
        b = min(b, 64)
        batch = jax.device_put(
            rng.integers(0, 256, (b, n, n, 4), np.uint8))
        perb = bench_program_output(
            lambda x: resize_mxu(x, scale, method, weight_cache=cache),
            batch) / b
        rows[f"{n}x{n}"] = {
            "single_ms": per1 * 1e3,
            "single_gpix_s": out_px / per1 / 1e9,
            "microbatch": b,
            "batched_ms_per_frame": perb * 1e3,
            "batched_gpix_s": out_px / perb / 1e9,
        }
        print(f"{n}x{n}: single {per1*1e3:7.3f} ms "
              f"({out_px/per1/1e9:5.1f} GPix/s)  "
              f"batch[{b}] {perb*1e3:7.3f} ms/frame "
              f"({out_px/perb/1e9:5.1f} GPix/s)", flush=True)

    res = pathlib.Path(__file__).resolve().parents[1] / "results"
    res.mkdir(exist_ok=True)
    (res / "latency_curve.json").write_text(json.dumps(
        {"geometry": f"NxN RGBA u8 -> {scale}x {method}, banded-matmul "
                     "kernel, program-output boundary", "rows": rows},
        indent=2))
    print(f"→ {res / 'latency_curve.json'}")


if __name__ == "__main__":
    main()
