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


def test_ladder_only_merge_mode(tmp_path):
    """--only measures a row subset and merges into the existing out
    file: other rows/fields preserved, measured rows never clobbered
    by error rows, merged rows stamped with their session transport."""
    out = tmp_path / "ladder.json"
    prev = {
        "backend": "tpu", "transport_ms": 25.0, "device": "fake",
        "rows": [
            {"config": "5_1024scenario_H24_stream", "p50_ms": 274.9,
             "solves_per_s": 3.64, "batch": 1},
            {"config": "2_binary_tree_H12", "p50_ms": 28.6,
             "solves_per_s": 34.9, "batch": 1},
        ],
        "device_scaling": {"rows": []},
    }
    out.write_text(json.dumps(prev))
    cp = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench_ladder.py"),
         "--platform", "cpu", "--max-iter", "5", "--repeats", "1",
         "--only", "2_binary", "--out", str(out)],
        capture_output=True, text=True, timeout=900, cwd=ROOT)
    assert cp.returncode == 0, cp.stderr[-2000:]
    data = json.loads(out.read_text())
    by_cfg = {r["config"]: r for r in data["rows"]}
    # untouched row + file-level fields preserved
    assert by_cfg["5_1024scenario_H24_stream"]["p50_ms"] == 274.9
    assert data["transport_ms"] == 25.0
    assert "device_scaling" in data
    # merged row re-measured (tiny CPU budget -> much faster than the
    # fake 28.6 ms) and stamped with its own transport
    row = by_cfg["2_binary_tree_H12"]
    assert row["p50_ms"] != 28.6 and "transport_ms" in row


def test_merge_qn_ladder_tool(tmp_path):
    """tools/merge_qn_ladder.py converts bench_r4_qn summary rows into
    ladder rows and merges them without touching existing rows."""
    ladder = tmp_path / "LADDER.json"
    ladder.write_text(json.dumps({
        "rows": [{"config": "5_1024scenario_H24_stream",
                  "p50_ms": 274.9, "solves_per_s": 3.64}]}))
    log = tmp_path / "qn.log"
    log.write_text("\n".join([
        json.dumps({"algo": "fbe", "path": "stream", "p50_ms": 400.0,
                    "ctrl_rel_dev_vs_xla": 0.001}),
        json.dumps({"summary": True, "nodes": 20809,
                    "scenarios": 1024, "iters": 500, "rows": [
                        {"algo": "fbe", "path": "stream",
                         "p50_ms": 400.0, "ctrl_rel_dev_vs_xla": 0.001},
                        {"algo": "fbe", "path": "xla",
                         "p50_ms": 900.0, "ctrl_rel_dev_vs_xla": 0.0},
                    ]}),
    ]))
    cp = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "merge_qn_ladder.py"),
         "--log", str(log), "--ladder", str(ladder)],
        capture_output=True, text=True, timeout=120, cwd=ROOT)
    assert cp.returncode == 0, cp.stderr[-2000:]
    data = json.loads(ladder.read_text())
    by_cfg = {r["config"]: r for r in data["rows"]}
    assert by_cfg["5_1024scenario_H24_stream"]["p50_ms"] == 274.9
    assert by_cfg["5_1024scenario_H24_fbe_stream"]["p50_ms"] == 400.0
    assert by_cfg["5_1024scenario_H24_fbe_stream"][
        "path"] == "pallas-stream-qn"
    assert by_cfg["5_1024scenario_H24_fbe_xla"]["solves_per_s"] == \
        round(1e3 / 900.0, 3)
