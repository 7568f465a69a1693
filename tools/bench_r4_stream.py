"""Round-4 streaming-kernel study at BASELINE config 5 (1024 scenarios).

Races the two-kernel streaming APG (ops/pallas_stream.make_apg_stream)
against the fused single-call variant (make_apg_stream_fused), each at
matmul precision HIGHEST (bf16x6 — golden-parity default) and HIGH
(bf16x3 — the roofline's selective-relaxation candidate), on the real
chip.  Also reports the control-vector deviation of every variant from
the HIGHEST two-kernel reference so any precision relaxation is
parity-evidenced, plus per-iteration ms against the ~300 us traffic
floor (docs/roofline.md).

Usage: python tools/bench_r4_stream.py [--repeats 5] [--iters 500]
Prints one JSON line per variant + a summary line.
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
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--skip-fused", action="store_true",
                    help="skip the fused 1-call variant (its remote "
                         "Mosaic compile at config-5 scale is the "
                         "prime suspect for the round-4 tunnel wedge; "
                         "run it LAST and only when everything else "
                         "is already recorded)")
    args = ap.parse_args()

    import jax

    from rapidnet_tpu.ops import pallas_stream

    problem = _build(*CONFIG5["dims"], CONFIG5["N"],
                     CONFIG5["branching"], max_iter=args.iters)
    cfg, eng, fa, make_step, tree = problem
    kw = _solver_kw(cfg)
    kw["max_iterations"] = args.iters
    rng = np.random.default_rng(7)
    x0 = (cfg.current_x * (0.9 + 0.2 * rng.random(
        cfg.current_x.shape))).astype(np.float32)
    step = make_step(x0)

    # Precision relaxation trial: Mosaic's dot lowering supports only
    # DEFAULT (bf16x1) and HIGHEST (bf16x6) — Precision.HIGH (bf16x3)
    # raises NotImplementedError (measured this session), so the
    # roofline's "selective relaxation" candidate is DEFAULT, gated on
    # the ctrl_rel_dev_vs_ref parity column.
    variants = [
        ("stream2_highest", pallas_stream.make_apg_stream, "highest"),
        ("stream2_default", pallas_stream.make_apg_stream, "default"),
    ]
    if not args.skip_fused:
        # fused LAST: its config-5 remote compile is the wedge suspect
        variants += [
            ("fused_highest", pallas_stream.make_apg_stream_fused,
             "highest"),
            ("fused_default", pallas_stream.make_apg_stream_fused,
             "default"),
        ]

    ref_u = None
    rows = []
    for name, factory, prec in variants:
        try:
            run = factory(fa, precision=prec, **kw)
            arg = jax.device_put(step)
            jax.block_until_ready(arg)
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(arg))
            compile_s = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001 — record, keep going
            row = {"variant": name, "error": repr(exc)[:300]}
            rows.append(row)
            print(json.dumps(row), flush=True)
            continue
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
        ms = float(np.median(ts) * 1e3)
        row = {"variant": name, "p50_ms": round(ms, 3),
               "us_per_iter": round(ms * 1e3 / args.iters, 1),
               "min_ms": round(min(ts) * 1e3, 3),
               "compile_s": round(compile_s, 1),
               "ctrl_rel_dev_vs_ref": dev,
               "final_inf": float(np.abs(np.asarray(
                   out["primal_infeasibility"])[-10:]).mean())}
        rows.append(row)
        print(json.dumps(row), flush=True)

    ok = [r for r in rows if "p50_ms" in r]
    best = min(ok, key=lambda r: r["p50_ms"]) if ok else None
    print(json.dumps({"summary": True, "nodes": int(tree.n_nodes),
                      "scenarios": int(tree.ns), "iters": args.iters,
                      "best": best["variant"] if best else None,
                      "best_p50_ms": best["p50_ms"] if best else None,
                      "errors": len(rows) - len(ok)}), flush=True)
    if not ok:
        raise SystemExit("every variant errored — no timing rows")


if __name__ == "__main__":
    main()
