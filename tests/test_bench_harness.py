"""The benchmark harnesses stay runnable (CPU, tiny budgets).

bench.py and bench_ladder.py are the driver-facing measurement
surfaces; these smoke tests keep them from rotting between TPU runs.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_ladder_smoke(tmp_path):
    out = tmp_path / "ladder.json"
    cp = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench_ladder.py"),
         "--platform", "cpu", "--max-iter", "5", "--repeats", "1",
         "--skip-device-scaling", "--out", str(out)],
        capture_output=True, text=True, timeout=900, cwd=ROOT)
    assert cp.returncode == 0, cp.stderr[-2000:]
    data = json.loads(out.read_text())
    names = [r["config"] for r in data["rows"]]
    assert any("1_toy" in n for n in names)
    assert any("5_1024scenario" in n for n in names)
    # rows either measured or carry an explicit reason (e.g. the
    # opt-in fused config-5 row, or streaming rows on platforms
    # without the kernels)
    for r in data["rows"]:
        assert r.get("solves_per_s", 0) > 0 or "error" in r, r
    measured = [r for r in data["rows"] if "solves_per_s" in r]
    assert len(measured) >= 6


def test_bench_measure_smoke(monkeypatch):
    """bench.measure() runs on CPU with a reduced budget and returns
    the full metric dict (single + batched)."""
    import bench as B
    monkeypatch.setattr(B, "MAX_ITER", 5)
    monkeypatch.setattr(B, "BATCH", 2)
    res = B.measure(repeats=1)
    assert res["solves_per_s"] > 0
    assert res["batch_solves_per_s"] > 0
    assert res["tree_nodes"] == 556
    assert "xla" in res["paths_ms"]
    # one bench line per algorithm (reference dispatch parity,
    # src/SmpcController.cu:63-71)
    assert set(res["algo_solves_per_s"]) == {"apg", "fbe", "nama"}
    assert all(v > 0 for v in res["algo_solves_per_s"].values())
    # time-to-solution diagnostics: per-algorithm budget wall ms always
    # present; stabilisation fields may be null (documented negative
    # result, docs/performance.md)
    tts = res["time_to_solution"]
    for algo in ("apg", "fbe", "nama"):
        assert tts[algo]["cold_budget_ms"] > 0
        assert "cold_iters" in tts[algo] and "warm_iters" in tts[algo]
