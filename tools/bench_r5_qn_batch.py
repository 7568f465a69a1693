"""Batched quasi-Newton throughput ablation (round-5 task 8).

The bench headline shows batch-32 APG at ~195 solves/s vs FBE/NAMA at
~36-38 — a 5.1-5.5x gap.  Two candidate explanations: the QN
iteration simply does 3-5x the work (3 oracle sweeps + line-search
trials vs APG's 1), or the batching MODE serialises: APG vmaps the
whole-solve kernel onto the Pallas grid (parallel pipeline), while
the QN kernel's L-BFGS history makes vmap->grid exceed VMEM, so its
batch runs as lax.map — sequential whole-solve invocations.  This
tool separates the two: per-algorithm single-solve p50 vs batched
per-solve time gives each path's batching efficiency; the work ratio
is the single-solve ratio.  It also retries the vmap->grid QN batch
under the raised VMEM ceiling to record whether the serialisation is
fundamental at this scale.

Usage: python tools/bench_r5_qn_batch.py [--repeats 5] [--batch 32]
One JSON line per measurement + a summary decomposition.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def p50(fn, arg, repeats):
    import jax
    jax.block_until_ready(fn(arg))          # compile + warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    B = args.batch

    import jax

    from bench import build_problem  # bench-scale Barcelona problem
    from rapidnet_tpu.ops import pallas_apg, pallas_qn

    cfg, eng, fa, make_step, tree = build_problem()
    from bench_ladder import _solver_kw
    kw = _solver_kw(cfg)
    rng = np.random.default_rng(7)
    x0 = cfg.current_x.astype(np.float32)
    steps = {}
    one_step = make_step(x0)
    for k, v in one_step.items():
        v = np.asarray(v)
        pert = 1.0 + 0.02 * rng.standard_normal((B,) + (1,) * v.ndim)
        steps[k] = (v[None] * pert).astype(np.float32)
    arg1 = jax.device_put(one_step)
    argB = jax.device_put(steps)
    jax.block_until_ready(arg1)
    jax.block_until_ready(argB)

    rows = {}

    def rec(name, ms, per_solve):
        row = {"name": name, "p50_ms": round(ms, 2),
               "per_solve_ms": round(per_solve, 3)}
        rows[name] = row
        print(json.dumps(row), flush=True)

    run_a1 = pallas_apg.make_apg_pallas(fa, **kw)
    rec("apg_single", p50(run_a1, arg1, args.repeats), 0.0)
    run_aB = pallas_apg.make_apg_pallas_batch(fa, **kw)
    ms = p50(run_aB, argB, args.repeats)
    rec("apg_grid_batch", ms, ms / B)

    for short, algo in (("fbe", "globalFbeAlgorithm"),
                        ("nama", "namaAlgorithm")):
        qkw = dict(kw, algorithm=algo, lbfgs_buffer_size=5)
        run_q1 = pallas_qn.make_qn_pallas(fa, **qkw)
        rec(f"{short}_single", p50(run_q1, arg1, args.repeats), 0.0)
        run_qB = pallas_qn.make_qn_pallas_batch(fa, **qkw)
        ms = p50(run_qB, argB, args.repeats)
        rec(f"{short}_map_batch", ms, ms / B)
        # does vmap->grid compile at this scale under the raised VMEM
        # ceiling?  (records the error if the serialisation is forced)
        try:
            run_qG = jax.jit(jax.vmap(run_q1))
            ms = p50(run_qG, argB, args.repeats)
            rec(f"{short}_grid_batch", ms, ms / B)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": f"{short}_grid_batch",
                              "error": repr(e)[:300]}), flush=True)

    def g(name, field="per_solve_ms"):
        return rows[name][field] if name in rows else None

    summary = {"summary": True, "batch": B,
               "nodes": int(tree.n_nodes),
               "work_ratio_single": {
                   s: round(g(f"{s}_single", "p50_ms")
                            / g("apg_single", "p50_ms"), 2)
                   for s in ("fbe", "nama") if f"{s}_single" in rows},
               "batch_speedup": {
                   "apg": round(g("apg_single", "p50_ms")
                                / g("apg_grid_batch"), 2)}}
    for s in ("fbe", "nama"):
        if f"{s}_map_batch" in rows:
            summary["batch_speedup"][s + "_map"] = round(
                g(f"{s}_single", "p50_ms") / g(f"{s}_map_batch"), 2)
        if f"{s}_grid_batch" in rows:
            summary["batch_speedup"][s + "_grid"] = round(
                g(f"{s}_single", "p50_ms") / g(f"{s}_grid_batch"), 2)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
