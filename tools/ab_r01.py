"""Controlled A/B: round-1 checkout vs HEAD on the bench problem
(VERDICT r3 task 1 — root-cause the r01->r03 single-chip slide).

Same session, same harness (tools/ab_probe.py), alternating variants
so tunnel/environment drift hits both equally; each probe also
measures the transport latency so marginal (transport-subtracted)
compute can be compared against r01's published numbers.

Usage: python tools/ab_r01.py [--rounds 3] [--r01 <rev>]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_probe(pythonpath, repeats, cpu=False):
    # PREPEND the variant's repo to PYTHONPATH — replacing it drops
    # /root/.axon_site, whose sitecustomize registers the axon backend
    # (without it every on-chip probe dies with "Backend 'axon' is not
    # in the list of known backends"; measured 02:10 this session)
    inherited = os.environ.get("PYTHONPATH", "")
    pp = pythonpath + (os.pathsep + inherited if inherited else "")
    env = dict(os.environ, PYTHONPATH=pp)
    if cpu:
        env["RAPIDNET_AB_CPU"] = "1"
    cp = subprocess.run(
        [sys.executable, os.path.join(HERE, "ab_probe.py"),
         str(repeats)],
        capture_output=True, text=True, timeout=3600, env=env,
        cwd="/tmp")
    line = [ln for ln in cp.stdout.strip().splitlines()
            if ln.startswith("{")]
    if not line:
        return {"error": (cp.stderr or "no output")[-400:]}
    return json.loads(line[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=7)
    ap.add_argument("--r01", default="9b6fba9")
    ap.add_argument("--cpu", action="store_true",
                    help="transport-free CPU A/B (code-delta only)")
    args = ap.parse_args()

    wt = "/tmp/r01ab"
    if not os.path.isdir(wt):
        subprocess.run(["git", "worktree", "add", "--detach", wt,
                        args.r01], cwd=REPO, check=True,
                       capture_output=True)

    results = {"r01": [], "head": []}
    for r in range(args.rounds):
        for name, path in (("r01", wt), ("head", REPO)):
            res = run_probe(path, args.repeats, cpu=args.cpu)
            res["round"] = r
            results[name].append(res)
            print(json.dumps({"variant": name, **res}), flush=True)

    def med(rows, key):
        import statistics
        vals = [r[key] for r in rows if key in r]
        return round(statistics.median(vals), 3) if vals else None

    summary = {"summary": True}
    for name in ("r01", "head"):
        for key in ("transport_ms", "xla_ms", "pallas_ms",
                    "xla_batch32_ms", "pallas_batch32_ms", "batch"):
            summary[f"{name}_{key}"] = med(results[name], key)
        t = summary[f"{name}_transport_ms"] or 0.0
        for key in ("xla_ms", "pallas_ms"):
            v = summary[f"{name}_{key}"]
            if v is not None:
                summary[f"{name}_{key}_marginal"] = round(v - t, 3)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
