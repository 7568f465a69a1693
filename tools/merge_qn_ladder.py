"""Merge tools/bench_r4_qn.py results into LADDER.json as config-5
quasi-Newton rows (VERDICT r3 task 3 acceptance: LADDER rows for the
streaming FBE/NAMA path beating its XLA path), then regenerate the
doc table.

Usage: python tools/merge_qn_ladder.py [--log results_r4/qn_config5.log]
                                       [--ladder LADDER.json]
"""

from __future__ import annotations

import argparse
import json
import os

PATHS = {"xla": "xla", "stream": "pallas-stream-qn",
         "stream_bf16": "pallas-stream-qn-bf16",
         "stream_fast": "pallas-stream-qn-fast"}


def main():
    ap = argparse.ArgumentParser()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap.add_argument("--log", default=os.path.join(
        here, "results_r4", "qn_config5.log"))
    ap.add_argument("--ladder", default=os.path.join(here, "LADDER.json"))
    args = ap.parse_args()

    summary = None
    with open(args.log) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            rec = json.loads(line)
            if rec.get("summary"):
                summary = rec
    if summary is None:
        raise SystemExit("no summary line in " + args.log)

    with open(args.ladder) as f:
        ladder = json.load(f)
    by_cfg = {r.get("config"): i for i, r in enumerate(ladder["rows"])}
    for r in summary["rows"]:
        cfg = f"5_1024scenario_H24_{r['algo']}_{r['path']}"
        row = {"config": cfg, "nodes": summary["nodes"],
               "scenarios": summary["scenarios"], "N": 24,
               "iters": summary["iters"],
               "path": PATHS.get(r["path"], r["path"]), "batch": 1,
               "p50_ms": r["p50_ms"],
               "solves_per_s": round(1e3 / r["p50_ms"], 3),
               "ctrl_rel_dev_vs_xla": r.get("ctrl_rel_dev_vs_xla")}
        if cfg in by_cfg:
            ladder["rows"][by_cfg[cfg]] = row
        else:
            ladder["rows"].append(row)
        print(json.dumps(row))
    with open(args.ladder, "w") as f:
        json.dump(ladder, f, indent=1)
    print(f"[merge_qn_ladder] wrote {args.ladder}")
    # keep docs/performance.md's generated table in sync with the rows
    # just merged (the docstring's "regenerate the doc table" step)
    import subprocess
    import sys
    subprocess.run([sys.executable,
                    os.path.join(here, "tools", "gen_perf_table.py")],
                   check=True)


if __name__ == "__main__":
    main()
