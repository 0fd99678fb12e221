"""Docs-vs-artifacts consistency (VERDICT r3 item 7 / weak #1).

Round 3's worst defect was README asserting numbers the committed
measurement artifacts didn't carry.  These tests make that desync a test
failure:

  * every results/*.json must carry a provenance stamp
    {backend, device, jax, commit, date};
  * README's "Measured results" section must be byte-identical to what
    scripts/render_readme_results.py renders from the committed artifacts
    (the section is generated, never hand-edited).
"""

import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]

STAMPED = (
    "method_throughput.json",
    "bench_configs.json",
    "latency_curve.json",
    "packed_tail_lab.json",
    "adaptive_probe.json",
)


def test_artifacts_carry_provenance():
    for name in STAMPED:
        data = json.loads((ROOT / "results" / name).read_text())
        prov = data.get("_provenance") or data.get("provenance")
        assert prov, f"results/{name} has no provenance stamp"
        for key in ("backend", "jax", "commit", "date"):
            assert key in prov, f"results/{name} provenance misses {key!r}"


def test_readme_results_section_matches_artifacts():
    res = subprocess.run(
        [sys.executable, "scripts/render_readme_results.py", "--check"],
        cwd=ROOT, capture_output=True, text=True)
    assert res.returncode == 0, res.stdout + res.stderr
