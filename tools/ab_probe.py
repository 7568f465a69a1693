"""Single-variant probe for the r01-vs-HEAD A/B (VERDICT r3 task 1).

Run with PYTHONPATH pointing at ONE checkout of rapidnet_tpu; measures
with an IDENTICAL harness regardless of checkout:

* transport latency (tiny staged dispatch round-trip),
* single-solve p50 for the XLA path and the fused Pallas whole-solve
  kernel (bench problem: 556-node tree, 500 iterations),
* batch-32 p50 for both paths.

Prints one JSON line.  tools/ab_r01.py interleaves this subprocess
across checkouts so tunnel drift affects both variants equally.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def build_problem():
    from rapidnet_tpu.model.config import synthetic_config
    from rapidnet_tpu.model.forecaster import synthetic_forecaster
    from rapidnet_tpu.model.network import synthetic_network
    from rapidnet_tpu.model.scenario_tree import generate_tree
    from rapidnet_tpu.solver.controller import _factor_arrays, _step_arrays
    from rapidnet_tpu.solver.tuning import auto_tune

    nx, nu, nd, ne = 63, 114, 88, 17
    net = synthetic_network(nx=nx, nu=nu, nd=nd, ne=ne, seed=42)
    tree = generate_tree(N=24, branching=[5, 5], nd=nd, nu=nu, seed=42)
    fc = synthetic_forecaster(N=24, nd=nd, nu=nu, sim_horizon=4, seed=42)
    cfg0 = synthetic_config(net, tree, max_iterations=500)
    cfg, eng = auto_tune(net, tree, cfg0)
    fc.predict_demand(0)
    fc.predict_prices(0)
    fa = _factor_arrays(eng)

    def make_step(x0):
        return _step_arrays(eng.prepare_step(
            fc.nominal_demand, fc.nominal_prices, x0, cfg.prev_u,
            cfg.prev_demand))

    return cfg, eng, fa, make_step


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    import os

    import jax
    if os.environ.get("RAPIDNET_AB_CPU") == "1":
        # CPU A/B: transport-free timings isolate CODE deltas from
        # tunnel drift (sitecustomize pins the TPU platform, so the
        # config update — not the env var — is what wins)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import rapidnet_tpu
    from rapidnet_tpu.engine.engine import XS_UPPER
    from rapidnet_tpu.ops import pallas_apg
    from rapidnet_tpu.solver import apg as apg_mod

    # transport probe
    a = jax.device_put(np.ones((8, 8), np.float32))
    tiny = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(tiny(a))
    ts = []
    for _ in range(15):
        t0 = time.perf_counter()
        jax.block_until_ready(tiny(a))
        ts.append(time.perf_counter() - t0)
    transport_ms = float(np.median(ts) * 1e3)

    cfg, eng, fa, make_step = build_problem()
    kw = dict(inv_step=1.0 / cfg.step_size, step_size=cfg.step_size,
              penalty_state=cfg.penalty_state,
              penalty_safety=cfg.penalty_safety,
              xs_upper=float(XS_UPPER), max_iterations=500)
    prefix = eng.factor_step().prefix_stages
    rng = np.random.default_rng(7)
    x0 = cfg.current_x

    def rand_step():
        xr = x0 * (1.0 + 0.02 * rng.standard_normal(x0.shape)
                   ).astype(np.float32)
        return make_step(xr)

    def time_single(run):
        jax.block_until_ready(run(rand_step()))
        ts = []
        for _ in range(repeats):
            s = jax.device_put(rand_step())
            jax.block_until_ready(s)
            t0 = time.perf_counter()
            jax.block_until_ready(run(s))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts) * 1e3)

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    run_xla = jax.jit(apg_mod.make_apg(prefix_stages=prefix, **kw))
    res = {"transport_ms": round(transport_ms, 3),
           "xla_ms": round(time_single(lambda s: run_xla(fa, s)), 3)}
    if on_tpu:
        run_pl = pallas_apg.make_apg_pallas(fa, **kw)
        res["pallas_ms"] = round(time_single(run_pl), 3)

    # batch 32 (both paths); batch 8 on CPU (a 32-batch CPU solve is
    # ~40 s per repeat — the CPU A/B only needs a relative number)
    B = 32 if on_tpu else 8
    res["batch"] = B
    run_xb = jax.jit(apg_mod.make_apg_batch(prefix_stages=prefix, **kw))
    run_pb = (pallas_apg.make_apg_pallas_batch(fa, **kw)
              if on_tpu else None)

    def batch_arg():
        steps = [rand_step() for _ in range(B)]
        return {k: jnp.stack([s[k] for s in steps]) for k in steps[0]}

    def time_batch(run):
        jax.block_until_ready(run(batch_arg()))
        ts = []
        for _ in range(max(3, repeats // 2)):
            arg = jax.device_put(batch_arg())
            jax.block_until_ready(arg)
            t0 = time.perf_counter()
            jax.block_until_ready(run(arg))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts) * 1e3)

    res["xla_batch32_ms"] = round(time_batch(lambda s: run_xb(fa, s)), 3)
    if run_pb is not None:
        res["pallas_batch32_ms"] = round(time_batch(run_pb), 3)
    res["checkout"] = rapidnet_tpu.__file__
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
