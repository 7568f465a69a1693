"""Config-5 stage-blocked streaming APG k-sweep (round-5 task 2).

Round 4 attributed the remaining streaming-APG gap (513-540 us/iter vs
the ~213 us analytic floor) to per-invocation setup and the
stage-sequential carry chain of the grid-over-stages execution model
(docs/roofline.md).  ``stage_block=k`` amortises exactly that setup:
k stages per grid invocation, 1/k as many DMA descriptor sets, k x
bigger double-buffered blocks.  This sweep measures k at full config-5
scale for the production two-kernel APG path (HIGHEST precision) and
the streaming QN paths.

Usage: python tools/bench_r5_stage_block.py [--repeats 3] [--iters 500]
         [--ks 1,2,3,4,6,8] [--qn]
One JSON line per k + a summary.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench_ladder import CONFIG5, _build, _solver_kw  # noqa: E402


def time_run(run, arg, repeats):
    import jax
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(arg))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(arg))
        ts.append(time.perf_counter() - t0)
    return out, float(np.median(ts)) * 1e3, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--ks", default="1,2,3,4,6,8")
    ap.add_argument("--qn", action="store_true",
                    help="also sweep the streaming QN paths")
    args = ap.parse_args()

    import jax

    from rapidnet_tpu.ops.pallas_stream import make_apg_stream
    from rapidnet_tpu.solver.qn_stream import make_qn_stream

    problem = _build(*CONFIG5["dims"], CONFIG5["N"],
                     CONFIG5["branching"], max_iter=args.iters)
    cfg, eng, fa, make_step, tree = problem
    kw = _solver_kw(cfg)
    kw["max_iterations"] = args.iters
    rng = np.random.default_rng(7)
    x0 = (cfg.current_x * (0.9 + 0.2 * rng.random(
        cfg.current_x.shape))).astype(np.float32)
    step = make_step(x0)
    arg = jax.device_put(step)
    jax.block_until_ready(arg)

    rows = []
    ref_u = {}
    jobs = [("apg", lambda k: make_apg_stream(fa, stage_block=k, **kw))]
    if args.qn:
        jobs += [(a, (lambda k, al=al: make_qn_stream(
            fa, algorithm=al, lbfgs_buffer_size=5, stage_block=k,
            **kw))) for a, al in (("fbe", "globalFbeAlgorithm"),
                                  ("nama", "namaAlgorithm"))]
    for name, factory in jobs:
        for k in [int(x) for x in args.ks.split(",")]:
            try:
                out, ms, compile_s = time_run(factory(k), arg,
                                              args.repeats)
            except Exception as e:  # noqa: BLE001 — isolate variants
                print(json.dumps({"algo": name, "k": k,
                                  "error": repr(e)[:200]}), flush=True)
                continue
            u = np.asarray(out["control"])
            if name not in ref_u:
                ref_u[name] = u
            dev = float(np.abs(u - ref_u[name]).max() /
                        max(np.abs(ref_u[name]).max(), 1e-9))
            row = {"algo": name, "k": k, "p50_ms": round(ms, 2),
                   "us_per_iter": round(ms * 1e3 / args.iters, 1),
                   "compile_s": round(compile_s, 1),
                   "ctrl_rel_dev_vs_k1": round(dev, 7)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    best = {}
    for r in rows:
        a = r["algo"]
        if a not in best or r["p50_ms"] < best[a]["p50_ms"]:
            best[a] = r
    print(json.dumps({"summary": True, "nodes": int(tree.n_nodes),
                      "scenarios": int(tree.ns), "iters": args.iters,
                      "best": {a: {"k": b["k"], "p50_ms": b["p50_ms"]}
                               for a, b in best.items()}}), flush=True)


if __name__ == "__main__":
    main()
