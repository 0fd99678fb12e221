#!/usr/bin/env python3
"""Regenerate EVERY results/* measurement artifact in one run and stamp
each JSON with provenance {backend, jax, commit, date} (VERDICT r3 item 7:
an outage must never again leave docs asserting numbers the committed
artifacts don't carry — every README number must trace to a stamped,
committed JSON).

Each producer runs as its own subprocess so a crash (or a dying TPU
tunnel) in one cannot take down the rest, and each gets a fresh JAX
runtime. Sections:

  method_throughput   scripts/method_throughput.py  → method_throughput.json
  bench_configs       scripts/bench_configs.py      → bench_configs.json
  latency_curve       scripts/latency_curve.py      → latency_curve.json
  packed_tail         scripts/packed_tail_lab.py    → packed_tail_lab.json
  train_modes         scripts/train_modes_lab.py    → train_modes.json

Usage:  python scripts/refresh_results.py [--only a,b] [--skip a,b]
"""

import argparse
import datetime
import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]

SECTIONS = {
    "method_throughput": ("scripts/method_throughput.py",
                          "results/method_throughput.json"),
    "bench_configs": ("scripts/bench_configs.py",
                      "results/bench_configs.json"),
    "latency_curve": ("scripts/latency_curve.py",
                      "results/latency_curve.json"),
    "packed_tail": ("scripts/packed_tail_lab.py",
                    "results/packed_tail_lab.json"),
    "train_modes": ("scripts/train_modes_lab.py",
                    "results/train_modes.json"),
    "adaptive_probe": ("scripts/adaptive_probe_lab.py",
                       "results/adaptive_probe.json"),
}


def provenance():
    import jax
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=ROOT,
        capture_output=True, text=True).stdout.strip()
    return {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "jax": jax.__version__,
        "commit": commit,
        "date": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
    }


def stamp(artifact: pathlib.Path, prov: dict):
    data = json.loads(artifact.read_text())
    data["_provenance"] = prov
    artifact.write_text(json.dumps(data, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="", help="comma list of sections")
    ap.add_argument("--skip", default="", help="comma list of sections")
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-section wall-clock bound (s)")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))
    skip = set(filter(None, args.skip.split(",")))
    bad = (only | skip) - set(SECTIONS)
    if bad:
        ap.error(f"unknown sections: {sorted(bad)}")

    prov = provenance()
    print(f"provenance: {prov}", flush=True)
    status = {}
    for name, (script, artifact) in SECTIONS.items():
        if (only and name not in only) or name in skip:
            continue
        print(f"\n=== {name}: python {script} ===", flush=True)
        try:
            rc = subprocess.run(
                [sys.executable, str(ROOT / script)], cwd=ROOT,
                timeout=args.timeout).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        path = ROOT / artifact
        if rc == 0 and path.exists():
            stamp(path, prov)
            status[name] = "ok"
        else:
            status[name] = f"FAILED rc={rc}"
        print(f"=== {name}: {status[name]} ===", flush=True)

    print("\nsummary:")
    for k, v in status.items():
        print(f"  {k:>18}: {v}")
    return 1 if any(v != "ok" for v in status.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
