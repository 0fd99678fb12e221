"""Performance harness — the TPU-native counterpart of the reference's
``accuratePerformanceTest`` (version3.0/utils/compare_performance.js:5-49).

Same shape: warmup runs (here they double as jit compiles), timed runs, CSV
rows ``Run,Timestamp,Execution Time (ms),CPU Time (ms),Memory (MB)`` written to
``cp_performance/<item>/<item>_performance.csv``. Device-side work is fenced
with ``block_until_ready`` so wall time measures the kernel, not dispatch.
"""

from __future__ import annotations

import dataclasses
import datetime
import os
import pathlib
import time
from typing import Callable

import jax


@dataclasses.dataclass
class BenchResult:
    test_item: str
    wall_ms: list[float]
    cpu_ms: list[float]
    rss_mb: list[float]

    @property
    def best_ms(self) -> float:
        return min(self.wall_ms)

    @property
    def mean_ms(self) -> float:
        return sum(self.wall_ms) / len(self.wall_ms)


def _rss_mb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def _block(out):
    return jax.block_until_ready(out)


def performance_test(func: Callable[[], object], *, test_item: str,
                     runs: int = 2, warmup: int = 2,
                     out_dir: str | os.PathLike | None = "cp_performance",
                     ) -> BenchResult:
    """Run ``func`` with ``warmup`` untimed runs (jit compile) then ``runs``
    timed runs; optionally write the reference-schema CSV."""
    for _ in range(warmup):
        _block(func())

    rows = ["Run,Timestamp,Execution Time (ms),CPU Time (ms),Memory (MB)"]
    res = BenchResult(test_item, [], [], [])
    for i in range(runs):
        cpu0 = time.process_time()
        t0 = time.perf_counter()
        _block(func())
        wall = (time.perf_counter() - t0) * 1e3
        cpu = (time.process_time() - cpu0) * 1e3
        rss = _rss_mb()
        res.wall_ms.append(wall)
        res.cpu_ms.append(cpu)
        res.rss_mb.append(rss)
        rows.append(
            f"{i + 1},{datetime.datetime.now(datetime.UTC).isoformat()},"
            f"{wall:.2f},{cpu:.2f},{rss:.2f}"
        )

    if out_dir is not None:
        d = pathlib.Path(out_dir) / test_item
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{test_item}_performance.csv").write_text("\n".join(rows) + "\n")
    return res
