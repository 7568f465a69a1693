"""Config-5 FBE/NAMA: streaming quasi-Newton vs the XLA path
(VERDICT r3 task 3 acceptance: LADDER-style rows beating XLA).

Usage: python tools/bench_r4_qn.py [--repeats 3] [--iters 500]
One JSON line per row + a summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench_ladder import CONFIG5, _build, _solver_kw  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--algos", default="fbe,nama")
    ap.add_argument("--bf16", action="store_true",
                    help="also measure the lbfgs_dtype=bfloat16 "
                         "buffer variant (round-5 speed knob)")
    ap.add_argument("--fast", action="store_true",
                    help="also measure the combined serving-speed "
                         "config: bf16 history + DEFAULT dot "
                         "precision")
    args = ap.parse_args()

    import jax

    from rapidnet_tpu.solver import quasi_newton
    from rapidnet_tpu.solver.qn_stream import make_qn_stream

    problem = _build(*CONFIG5["dims"], CONFIG5["N"],
                     CONFIG5["branching"], max_iter=args.iters)
    cfg, eng, fa, make_step, tree = problem
    kw = _solver_kw(cfg)
    kw["max_iterations"] = args.iters
    prefix = eng.factor_step().prefix_stages
    rng = np.random.default_rng(7)
    x0 = (cfg.current_x * (0.9 + 0.2 * rng.random(
        cfg.current_x.shape))).astype(np.float32)
    step = make_step(x0)
    names = {"fbe": "globalFbeAlgorithm", "nama": "namaAlgorithm"}

    rows = []
    for short in args.algos.split(","):
        algo = names[short]
        variants = {
            "xla": (lambda a=algo: (lambda fn: lambda s: fn(fa, s))(
                jax.jit(quasi_newton.make_solver(
                    algorithm=a, lbfgs_buffer_size=5,
                    prefix_stages=prefix, **kw))))(),
            "stream": make_qn_stream(fa, algorithm=algo,
                                     lbfgs_buffer_size=5, **kw),
        }
        if args.bf16:
            import jax.numpy as jnp
            variants["stream_bf16"] = make_qn_stream(
                fa, algorithm=algo, lbfgs_buffer_size=5,
                lbfgs_dtype=jnp.bfloat16, **kw)
        if args.fast:
            import jax.numpy as jnp
            variants["stream_fast"] = make_qn_stream(
                fa, algorithm=algo, lbfgs_buffer_size=5,
                lbfgs_dtype=jnp.bfloat16, precision="default", **kw)
        ref_u = None
        for vname, run in variants.items():
            arg = jax.device_put(step)
            jax.block_until_ready(arg)
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(arg))
            compile_s = time.perf_counter() - t0
            u = np.asarray(out["control"])
            if ref_u is None:
                ref_u = u
            dev = float(np.abs(u - ref_u).max() /
                        max(np.abs(ref_u).max(), 1e-9))
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                jax.block_until_ready(run(arg))
                ts.append(time.perf_counter() - t0)
            row = {"algo": short, "path": vname,
                   "p50_ms": round(float(np.median(ts)) * 1e3, 3),
                   "min_ms": round(min(ts) * 1e3, 3),
                   "compile_s": round(compile_s, 1),
                   "ctrl_rel_dev_vs_xla": round(dev, 5),
                   "tau_nonzero_frac": round(float(
                       (np.asarray(out["tau"]) > 0).mean()), 3)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    print(json.dumps({"summary": True, "nodes": int(tree.n_nodes),
                      "scenarios": int(tree.ns), "iters": args.iters,
                      "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
