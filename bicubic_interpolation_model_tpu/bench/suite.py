"""Benchmark suite over the BASELINE.json configs.

Headline metric: bicubic 4x upscale throughput in GPix/s (output pixels) on
one chip, with ±1-u8-LSB parity vs the float64 oracle. Reference baseline:
0.39 MPix/s for the JS kernel (BASELINE.md, cp_performance/bsr csv).
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from ..core.oracle import resize_oracle
from ..ops.resize import resize
from .harness import performance_test

REFERENCE_BICUBIC_GPIX_S = 0.39e-3  # 2.84 MPix in ~7.3 s (BASELINE.md)


def _make_input(h, w, c=4, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    if c == 4:
        img[..., 3] = 255
    return img


def check_parity(scale=4, method="bicubic", impl="auto", h=96, w=64):
    """Max u8 delta between the device path and the float64 oracle."""
    img = _make_input(h, w)
    want = resize_oracle(img, float(scale), method).astype(np.int32)
    got = np.asarray(resize(img, scale, method, impl=impl)).astype(np.int32)
    return int(np.abs(got - want).max())


def bench_resize(h, w, scale, method="bicubic", impl="auto", c=4,
                 runs=5, test_item=None, out_dir=None):
    img = jax.device_put(_make_input(h, w, c))
    fn = functools.partial(resize, img, scale, method, impl=impl)
    name = test_item or f"{method}_{impl}_{h}x{w}x{scale}"
    res = performance_test(fn, test_item=name, runs=runs, out_dir=out_dir)
    out_pix = int(h * scale) * int(w * scale)
    gpix_s = out_pix / (res.best_ms * 1e-3) / 1e9
    return {"item": name, "best_ms": res.best_ms, "mean_ms": res.mean_ms,
            "out_mpix": out_pix / 1e6, "gpix_per_s": gpix_s}


def headline(impls=("phase", "matmul", "pallas"), runs=5):
    """Best bicubic 4x GPix/s on a 1080p frame, with parity check."""
    results = []
    for impl in impls:
        try:
            r = bench_resize(1080, 1920, 4, "bicubic", impl=impl, runs=runs)
            r["impl"] = impl
            r["max_u8_delta"] = check_parity(4, "bicubic", impl=impl)
            results.append(r)
        except Exception as e:  # an impl may be unsupported on this backend
            results.append({"impl": impl, "error": f"{type(e).__name__}: {e}"})
    ok = [r for r in results if "gpix_per_s" in r and r["max_u8_delta"] <= 1]
    best = max(ok, key=lambda r: r["gpix_per_s"]) if ok else None
    return best, results
