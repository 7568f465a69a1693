"""Config-5 streaming-QN per-iteration cost attribution (round 5).

The round-4 verdict pinned the biggest perf hole as the streaming
FBE/NAMA iteration running ~9x above its own HBM-traffic floor
(docs/roofline.md).  Before attacking it, measure WHERE the
5.55 ms/iter goes: run the timing-only ablation variants of
``make_qn_stream(ablate=...)`` at two iteration budgets and report the
marginal per-iteration cost of each piece (two budgets subtract away
the fixed setup/transport cost).

Variants (cumulative subtraction gives the attribution):
  full         the production iteration
  no_ls        single tau=1 application instead of the trial loop
  no_lbfgs     direction = -yvec (buffer + two-loop skipped)
  no_qn        solve + prox + yvec oracle + dual update only
  sweeps_only  3 Pallas sweep pairs + dual carry (the oracle floor)

Usage: python tools/bench_r5_qn_ablate.py [--repeats 3]
         [--iters1 100 --iters2 200] [--algos fbe,nama]
One JSON line per measurement + a summary with the per-piece
attribution in us/iter.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench_ladder import CONFIG5, _build, _solver_kw  # noqa: E402

VARIANTS = ["full", "no_ls", "no_lbfgs", "no_qn", "sweeps_only"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--iters1", type=int, default=100)
    ap.add_argument("--iters2", type=int, default=200)
    ap.add_argument("--algos", default="fbe,nama")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    import jax

    from rapidnet_tpu.solver.qn_stream import make_qn_stream

    problem = _build(*CONFIG5["dims"], CONFIG5["N"],
                     CONFIG5["branching"], max_iter=args.iters1)
    cfg, eng, fa, make_step, tree = problem
    rng = np.random.default_rng(7)
    x0 = (cfg.current_x * (0.9 + 0.2 * rng.random(
        cfg.current_x.shape))).astype(np.float32)
    step = make_step(x0)
    names = {"fbe": "globalFbeAlgorithm", "nama": "namaAlgorithm"}

    per_iter = {}
    for short in args.algos.split(","):
        algo = names[short]
        for vname in args.variants.split(","):
            abl = frozenset() if vname == "full" else frozenset([vname])
            ms = {}
            try:
                for iters in (args.iters1, args.iters2):
                    kw = _solver_kw(cfg)
                    kw["max_iterations"] = iters
                    run = make_qn_stream(fa, algorithm=algo,
                                         lbfgs_buffer_size=5,
                                         ablate=abl, **kw)
                    arg = jax.device_put(step)
                    jax.block_until_ready(arg)
                    t0 = time.perf_counter()
                    jax.block_until_ready(run(arg))
                    compile_s = time.perf_counter() - t0
                    ts = []
                    for _ in range(args.repeats):
                        t0 = time.perf_counter()
                        jax.block_until_ready(run(arg))
                        ts.append(time.perf_counter() - t0)
                    ms[iters] = float(np.median(ts)) * 1e3
                    print(json.dumps(
                        {"algo": short, "variant": vname,
                         "iters": iters, "p50_ms": round(ms[iters], 2),
                         "compile_s": round(compile_s, 1)}), flush=True)
            except Exception as e:  # noqa: BLE001 — isolate variants
                print(json.dumps({"algo": short, "variant": vname,
                                  "error": repr(e)[:200]}), flush=True)
                continue
            marg = ((ms[args.iters2] - ms[args.iters1]) * 1e3 /
                    (args.iters2 - args.iters1))
            per_iter[(short, vname)] = marg

    summary = {"summary": True, "nodes": int(tree.n_nodes),
               "scenarios": int(tree.ns),
               "marginal_us_per_iter": {
                   f"{a}:{v}": round(m, 1)
                   for (a, v), m in per_iter.items()},
               "attribution_us_per_iter": {}}
    for a in args.algos.split(","):
        g = {v: per_iter.get((a, v)) for v in VARIANTS}
        if all(x is not None for x in g.values()):
            summary["attribution_us_per_iter"][a] = {
                "oracle_sweeps": round(g["sweeps_only"], 1),
                "prox_dual_yvec": round(g["no_qn"] - g["sweeps_only"], 1),
                "value_lbfgs_ls": round(g["full"] - g["no_qn"], 1),
                "lbfgs": round(g["full"] - g["no_lbfgs"], 1),
                "ls_extra_trials": round(g["full"] - g["no_ls"], 1),
                "total": round(g["full"], 1)}
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
