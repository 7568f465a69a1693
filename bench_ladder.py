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
     rate, a bf16-momentum variant, and a sharded-mesh execution check:
     the same solve through shard_map on a 1-device mesh, quantifying
     the shard_map overhead on the real chip)

Multi-host / multi-chip hardware is not available in this environment;
config 5's cross-host path is validated functionally by
tests/test_distributed.py (2 OS processes, gloo) and the virtual-mesh
tests.  The ladder supplements the single-chip numbers with the
evidence this environment CAN produce:

  * ``device_scaling``: the 1024-scenario solve sharded over 1/2/4/8
    virtual CPU devices (subprocess with
    --xla_force_host_platform_device_count).  Virtual devices share
    the host's physical cores, so ideal scaling is flat ms (the work
    is constant and the cores are shared); what the table shows is
    the *overhead* the mesh partitioning + collectives add.
  * ``collectives``: per-iteration collective ops/bytes of the
    compiled 8-device program, read from the optimized HLO.

Usage: python bench_ladder.py [--repeats 5] [--out LADDER.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

MAX_ITER = 500
CONFIG5 = dict(dims=(63, 114, 88, 17), N=24, branching=[8, 8, 4, 4])


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


def _build_real(max_iter=None):
    """REAL Barcelona-scale problem from the reference's dataSource
    (io/datasource.py): real matL/matLhat/costW/preconditioner/
    penalties/step/initial state + the real 136-node scenario tree
    with real uncertainty vectors; topology/bounds synthetic
    (provenance: datasource.BARCELONA_PROVENANCE — the reference does
    not ship its Barcelona network.json)."""
    from rapidnet_tpu.engine.engine import Engine
    from rapidnet_tpu.io.datasource import load_barcelona_problem
    from rapidnet_tpu.solver.controller import _factor_arrays, _step_arrays

    cfg, net, tree, fc = load_barcelona_problem(
        max_iterations=max_iter or MAX_ITER)
    eng = Engine(net, tree, cfg)
    fc.predict_demand(0)
    fc.predict_prices(0)
    fa = _factor_arrays(eng)

    def make_step(x0):
        return _step_arrays(eng.prepare_step(
            fc.nominal_demand, fc.nominal_prices, x0, cfg.prev_u,
            cfg.prev_demand))

    return cfg, eng, fa, make_step, tree


def _solver_kw(cfg):
    from rapidnet_tpu.engine.engine import XS_UPPER
    return dict(inv_step=1.0 / cfg.step_size, step_size=cfg.step_size,
                penalty_state=cfg.penalty_state,
                penalty_safety=cfg.penalty_safety,
                xs_upper=float(XS_UPPER),
                max_iterations=cfg.max_iterations)


def _solver(cfg, eng, fa, *, batch=None, dual_dtype=None,
            backend=None):
    import jax

    from rapidnet_tpu.solver import apg as apg_mod

    kw = _solver_kw(cfg)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if backend in ("fbe_stream", "nama_stream", "fbe_xla", "nama_xla"):
        # config-5 quasi-Newton rows (VERDICT r3 task 3 acceptance:
        # LADDER rows for streaming FBE/NAMA beating their XLA path)
        algo = ("globalFbeAlgorithm" if backend.startswith("fbe")
                else "namaAlgorithm")
        if backend.endswith("_stream"):
            from rapidnet_tpu.solver.qn_stream import make_qn_stream
            run = make_qn_stream(fa, algorithm=algo,
                                 lbfgs_buffer_size=5, **kw)
            return (lambda steps: run(steps)), "pallas-stream-qn"
        from rapidnet_tpu.solver import quasi_newton
        jr = jax.jit(quasi_newton.make_solver(
            algorithm=algo, lbfgs_buffer_size=5,
            prefix_stages=eng.factor_step().prefix_stages, **kw))
        return (lambda steps: jr(fa, steps)), "xla"
    if backend in ("stream", "stream_fused"):
        # streaming grid-over-stages kernels (large trees whose working
        # set exceeds VMEM — config 5's regime; ops/pallas_stream.py):
        # two-kernel pipeline or the fused single-call (2N-grid) variant
        from rapidnet_tpu.ops import pallas_stream
        if backend == "stream_fused":
            run = pallas_stream.make_apg_stream_fused(fa, **kw)
            return (lambda steps: run(steps)), "pallas-stream-fused"
        run = pallas_stream.make_apg_stream(fa, **kw)
        return (lambda steps: run(steps)), "pallas-stream"
    if on_tpu and dual_dtype is None:
        from rapidnet_tpu.ops import pallas_apg
        if pallas_apg.fits_vmem(pallas_apg.pad_constants(fa)):
            if batch:
                run = pallas_apg.make_apg_pallas_batch(fa, **kw)
            else:
                run = pallas_apg.make_apg_pallas(fa, **kw)
            return (lambda steps: run(steps)), "pallas"
    if dual_dtype is not None:
        kw["dual_dtype"] = dual_dtype
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
               tune=True, dual_dtype=None, problem=None, backend=None,
               data="synthetic"):
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    if problem is None:
        problem = _build(*dims, N, branching, tune=tune,
                         max_iter=MAX_ITER)
    cfg, eng, fa, make_step, tree = problem
    fn, path = _solver(cfg, eng, fa, batch=batch, dual_dtype=dual_dtype,
                       backend=backend)
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
           "iters": MAX_ITER, "path": path, "data": data,
           "batch": batch or 1, "p50_ms": round(ms, 3),
           "solves_per_s": round(solves_s, 3)}
    print(json.dumps(rec))
    return rec, problem


def sharded_overhead_row(problem, repeats):
    """Config-5 solve through shard_map on a 1-device mesh: isolates
    the shard_map partitioning/dispatch overhead vs the plain jit path
    on the same chip (the multi-chip evidence this environment allows;
    VERDICT round-1 item 4a)."""
    import jax

    from rapidnet_tpu.parallel import (make_mesh, make_sharded_apg,
                                       shard_factor_arrays,
                                       shard_step_arrays)
    cfg, eng, fa, make_step, tree = problem
    rng = np.random.default_rng(7)
    step = make_step(_rand_x0(cfg, rng))
    mesh = make_mesh(1)
    fa_sh = shard_factor_arrays(fa, mesh)
    step_sh = shard_step_arrays(step, mesh)
    fn = make_sharded_apg(mesh, fa, step,
                          prefix_stages=eng.factor_step().prefix_stages,
                          **_solver_kw(cfg))
    jax.block_until_ready(fn(fa_sh, step_sh))      # compile + warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(fa_sh, step_sh))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts) * 1e3)
    rec = {"config": "5_1024scenario_H24_shardmap_1dev",
           "nodes": int(tree.n_nodes), "scenarios": int(tree.ns),
           "iters": MAX_ITER, "path": "xla+shard_map", "batch": 1,
           "p50_ms": round(ms, 3), "solves_per_s": round(1e3 / ms, 3)}
    print(json.dumps(rec))
    return rec


def sharded_stream_row(problem, repeats):
    """Config-5 per-shard STREAMING kernels inside shard_map on a
    1-device mesh (ops/pallas_stream_sharded.py): the multi-chip fast
    path's on-chip cost vs both the plain streaming kernel (its
    overhead) and the sharded XLA row (the round-3 57% tax it
    removes).  VERDICT r3 task 2 on-chip evidence — with one real
    chip, the 1-device-mesh row plus the half-width stream row (5h,
    each shard's workload) bound the 2-device solve time."""
    import jax

    from rapidnet_tpu.ops.pallas_stream_sharded import \
        make_apg_stream_sharded
    from rapidnet_tpu.parallel import make_mesh
    cfg, eng, fa, make_step, tree = problem
    rng = np.random.default_rng(7)
    step = make_step(_rand_x0(cfg, rng))
    mesh = make_mesh(1)
    # emulate_shards=2: the 1-device mesh executes the EXACT 2-device
    # program structure (K1a split at s_hi, psum, XLA tail)
    run = make_apg_stream_sharded(mesh, fa, emulate_shards=2,
                                  **_solver_kw(cfg))
    arg = jax.device_put(step)
    jax.block_until_ready(arg)
    jax.block_until_ready(run(arg))                # compile + warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(arg))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts) * 1e3)
    rec = {"config": "5_1024scenario_H24_shardmap_stream_1dev",
           "nodes": int(tree.n_nodes), "scenarios": int(tree.ns),
           "iters": MAX_ITER, "path": "pallas-stream+shard_map",
           "batch": 1,
           "p50_ms": round(ms, 3), "solves_per_s": round(1e3 / ms, 3)}
    print(json.dumps(rec))
    return rec


def sharded_stream_qn_row(problem, repeats, algo_short):
    """Config-5 sharded streaming QUASI-NEWTON on a 1-device mesh
    executing the exact 2-device program (emulate_shards=2): the
    on-chip shard-overhead evidence for FBE/NAMA that round 4 only
    had for APG (VERDICT r4 task 5)."""
    import jax

    from rapidnet_tpu.parallel import make_mesh
    from rapidnet_tpu.solver.qn_stream import make_qn_stream
    cfg, eng, fa, make_step, tree = problem
    names = {"fbe": "globalFbeAlgorithm", "nama": "namaAlgorithm"}
    rng = np.random.default_rng(7)
    step = make_step(_rand_x0(cfg, rng))
    mesh = make_mesh(1)
    run = make_qn_stream(fa, algorithm=names[algo_short],
                         lbfgs_buffer_size=5, mesh=mesh,
                         emulate_shards=2, **_solver_kw(cfg))
    arg = jax.device_put(step)
    jax.block_until_ready(arg)
    jax.block_until_ready(run(arg))                # compile + warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(arg))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts) * 1e3)
    rec = {"config": f"5_1024scenario_H24_shardmap_stream_"
                     f"{algo_short}_1dev",
           "nodes": int(tree.n_nodes), "scenarios": int(tree.ns),
           "iters": MAX_ITER, "path": "pallas-stream-qn+shard_map",
           "batch": 1,
           "p50_ms": round(ms, 3), "solves_per_s": round(1e3 / ms, 3)}
    print(json.dumps(rec))
    return rec


# ----------------------------------------------------------------------
# virtual-mesh scaling + collective-bytes evidence (subprocess: the
# host-platform device count must be fixed before the backend starts)

def _device_scaling_child(n_dev: int, iters: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= n_dev, (len(jax.devices()), n_dev)
    import re

    from rapidnet_tpu.parallel import (make_mesh, make_sharded_apg,
                                       shard_factor_arrays,
                                       shard_step_arrays)
    cfg, eng, fa, make_step, tree = _build(
        *CONFIG5["dims"], CONFIG5["N"], CONFIG5["branching"],
        max_iter=iters)
    rng = np.random.default_rng(7)
    step = make_step(_rand_x0(cfg, rng))
    mesh = make_mesh(n_dev)
    fa_sh = shard_factor_arrays(fa, mesh)
    step_sh = shard_step_arrays(step, mesh)
    fn = make_sharded_apg(mesh, fa, step,
                          prefix_stages=eng.factor_step().prefix_stages,
                          **_solver_kw(cfg))
    jax.block_until_ready(fn(fa_sh, step_sh))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(fa_sh, step_sh))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts) * 1e3)
    out = {"n_devices": n_dev, "p50_ms": round(ms, 3),
           "min_ms": round(float(np.min(ts) * 1e3), 3),
           "ms_per_iter": round(ms / iters, 4),
           "oversubscribed": n_dev > (os.cpu_count() or 1)}

    # per-iteration collective census: compile a ONE-iteration sharded
    # solve and count every collective in its optimized HLO — each
    # per-iteration collective appears exactly once (docs/multihost.md
    # evidence vs the "few kB per iteration" claim)
    if n_dev > 1:
        try:
            kw1 = dict(_solver_kw(cfg), max_iterations=1)
            fn1 = make_sharded_apg(
                mesh, fa, step,
                prefix_stages=eng.factor_step().prefix_stages, **kw1)
            import jax as _jax
            hlo = _jax.jit(lambda a, b: fn1(a, b)).lower(
                fa_sh, step_sh).compile().as_text()
            ops = {}
            bytes_total = 0
            # lines like: %all-gather.3 = f32[24,1024,63] all-gather(...)
            pat = re.compile(
                r"(f32|bf16)\[([\d,]*)\][^\n=]*?\b(all-gather|"
                r"all-reduce|collective-permute|reduce-scatter)\(")
            for m in pat.finditer(hlo):
                dt, shape, op = m.groups()
                n = int(np.prod([int(x) for x in shape.split(",")
                                 if x])) if shape else 1
                ops[op] = ops.get(op, 0) + 1
                bytes_total += (2 if dt == "bf16" else 4) * n
            out["collectives_per_iteration"] = ops
            out["collective_bytes_per_iteration"] = int(bytes_total)
        except Exception as exc:  # noqa: BLE001
            out["collectives_error"] = str(exc)[:200]
    print("CHILD:" + json.dumps(out))


def device_scaling_table(iters: int = 50) -> dict:
    """Run the 1024-scenario sharded solve on 1..8 virtual CPU devices
    in fresh subprocesses (XLA_FLAGS must precede backend start).

    Methodology (VERDICT round-2 item 6): an n-device child is pinned
    to min(n, host_cores) physical cores with ``taskset`` (XLA's CPU
    thread-count flags are ignored by the current thunk runtime —
    verified: a large matmul times identically with and without them).
    CPU resources therefore scale WITH the device count up to the core
    count: those points measure STRONG scaling (ideal ms = t1/n);
    device counts above the core count are oversubscribed — they
    validate functionality and count collectives but their timings
    support no scaling conclusion (labelled `oversubscribed`, excluded
    from the efficiency metric).  5 repeats per point, median + min.
    """
    cores = os.cpu_count() or 1
    table = []
    for n in (1, 2, 4, 8):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") +
                       f" --xla_force_host_platform_device_count={n}"))
        pin = ",".join(str(c) for c in range(min(n, cores)))
        cp = subprocess.run(
            ["taskset", "-c", pin,
             sys.executable, os.path.abspath(__file__),
             "--device-scaling-child", str(n),
             "--max-iter", str(iters)],
            capture_output=True, text=True, timeout=1800, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        line = [ln for ln in cp.stdout.splitlines()
                if ln.startswith("CHILD:")]
        if cp.returncode != 0 or not line:
            table.append({"n_devices": n,
                          "error": (cp.stderr or cp.stdout)[-300:]})
            continue
        table.append(json.loads(line[-1][len("CHILD:"):]))
        print(json.dumps(table[-1]))
    out = {"host_cores": cores,
           "methodology": "strong scaling; an n-device child is "
                          "taskset-pinned to min(n, host_cores) cores, "
                          "so CPU resources scale with device count up "
                          "to the core count; rows with n_devices > "
                          "host_cores are oversubscribed (functional "
                          "evidence only)",
           "rows": table}
    timed = {r["n_devices"]: r for r in table
             if "p50_ms" in r and not r.get("oversubscribed")}
    if 1 in timed and cores in timed and cores > 1:
        out["strong_scaling_efficiency"] = round(
            timed[1]["p50_ms"] / (cores * timed[cores]["p50_ms"]), 3)
    return out


def main(argv=None):
    global MAX_ITER
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default="LADDER.json")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--max-iter", type=int, default=MAX_ITER,
                    help="iteration budget (500 = reference parity)")
    ap.add_argument("--device-scaling-child", type=int, default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--skip-device-scaling", action="store_true",
                    help="skip the 1/2/4/8 virtual-CPU-mesh subprocess "
                         "sweep (slow; evidence-only)")
    ap.add_argument("--only", default=None,
                    help="run only rows whose config name contains this "
                         "substring and MERGE them into --out (other "
                         "rows/fields preserved); implies "
                         "--skip-device-scaling")
    args = ap.parse_args(argv)
    MAX_ITER = args.max_iter
    if args.device_scaling_child is not None:
        _device_scaling_child(args.device_scaling_child, MAX_ITER)
        return 0
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    rep = args.repeats
    transport_ms = (measure_transport_ms()
                    if jax.default_backend() != "cpu" else 0.0)
    results = {"backend": jax.default_backend(),
               "transport_ms": round(transport_ms, 3),
               "device": str(jax.devices()[0].device_kind
                             if hasattr(jax.devices()[0], "device_kind")
                             else jax.devices()[0])}
    rows = []
    only = args.only

    def want(name):
        return only is None or only in name

    # 1: deterministic toy, CPU path mandated by BASELINE
    name1 = ("1_toy_deterministic_H8_cpu"
             if jax.default_backend() == "cpu"
             else "1_toy_deterministic_H8")
    if want(name1):
        rows.append(run_config(name1, (3, 6, 4, 2), 8, [1], rep,
                               tune=False)[0])
    # 2: small binary tree, H=12
    if want("2_binary_tree_H12"):
        rows.append(run_config("2_binary_tree_H12", (3, 6, 4, 2), 12,
                               [2], rep, tune=False)[0])
    # 3: Barcelona-subset, ~100-node tree, H=24
    if want("3_barcelona_subset_100node_H24"):
        rows.append(run_config("3_barcelona_subset_100node_H24",
                               (20, 35, 25, 5), 24, [4], rep)[0])
    # 3R: REAL Barcelona-scale data (controllerConfig32.json +
    # scenarioTree32.json; real cost/preconditioner/penalties/tree,
    # synthetic topology — see _build_real)
    if want("3R_barcelona_REAL_136node_H24"):
        try:
            from rapidnet_tpu.io import datasource
            if datasource.available():
                rows.append(run_config(
                    "3R_barcelona_REAL_136node_H24", None, 24, None,
                    rep, problem=_build_real(),
                    data="real tree/costs/precnd/state; "
                         "synthetic topology")[0])
        except Exception as exc:  # noqa: BLE001
            rows.append({"config": "3R_barcelona_REAL_136node_H24",
                         "error": str(exc)[:300]})
    # 4: Barcelona-scale, 556-node tree — single and batched
    r4 = prob4 = None
    if want("4_barcelona_556node_H24"):
        r4, prob4 = run_config("4_barcelona_556node_H24",
                               (63, 114, 88, 17), 24, [5, 5], rep)
        rows.append(r4)
    if want("4_barcelona_556node_H24_batch16"):
        rows.append(run_config("4_barcelona_556node_H24_batch16",
                               (63, 114, 88, 17), 24, [5, 5], rep,
                               batch=16, problem=prob4)[0])
    # 5: 1024-scenario tree (one build reused across the variants)
    rep5 = max(2, rep // 2)
    r5 = prob5 = None

    def get_prob5():
        nonlocal prob5
        if prob5 is None:
            prob5 = _build(*CONFIG5["dims"], CONFIG5["N"],
                           CONFIG5["branching"], max_iter=MAX_ITER)
        return prob5

    if want("5_1024scenario_H24"):
        r5, prob5 = run_config("5_1024scenario_H24", *_cfg5_args(),
                               rep5)
        rows.append(r5)
    # 5b: bf16 Nesterov-momentum storage (HBM-traffic variant,
    # docs/roofline.md — the config-5 regime is bandwidth-bound)
    if want("5_1024scenario_H24_bf16z"):
        rows.append(run_config("5_1024scenario_H24_bf16z",
                               *_cfg5_args(), rep5,
                               dual_dtype="bfloat16",
                               problem=get_prob5())[0])
    # 5s: streaming grid-over-stages Pallas kernel (the working set
    # exceeds VMEM at this scale; ops/pallas_stream.py)
    if want("5_1024scenario_H24_stream"):
        try:
            rows.append(run_config("5_1024scenario_H24_stream",
                                   *_cfg5_args(), rep5,
                                   backend="stream",
                                   problem=get_prob5())[0])
        except Exception as exc:  # noqa: BLE001
            rows.append({"config": "5_1024scenario_H24_stream",
                         "error": str(exc)[:300]})
    # 5f: fused single-pallas_call streaming variant (opt-in:
    # RAPIDNET_LADDER_FUSED=1 — its config-5 remote Mosaic compile is
    # the round-4 tunnel-wedge suspect; see tools/bench_r4_stream.py)
    if want("5_1024scenario_H24_stream_fused"):
        try:
            if os.environ.get("RAPIDNET_LADDER_FUSED") != "1":
                raise RuntimeError("skipped (RAPIDNET_LADDER_FUSED != 1)")
            rows.append(run_config("5_1024scenario_H24_stream_fused",
                                   *_cfg5_args(), rep5,
                                   backend="stream_fused",
                                   problem=get_prob5())[0])
        except Exception as exc:  # noqa: BLE001
            rows.append({"config": "5_1024scenario_H24_stream_fused",
                         "error": str(exc)[:300]})
    # 5h: HALF-width tree (512 scenarios) on the streaming kernel —
    # the per-shard workload of a 2-device sharded-stream config-5
    # solve (one real chip only; the virtual-mesh tier validates the
    # sharded program, this row measures its per-shard compute)
    if want("5h_512scenario_H24_stream_halfwidth"):
        try:
            half = dict(CONFIG5)
            half["branching"] = [8, 8, 4, 2]
            rows.append(run_config(
                "5h_512scenario_H24_stream_halfwidth",
                half["dims"], half["N"], half["branching"], rep5,
                backend="stream")[0])
        except Exception as exc:  # noqa: BLE001
            rows.append({"config": "5h_512scenario_H24_stream_halfwidth",
                         "error": str(exc)[:300]})
    # 5hq: the same half-width bound for the streaming quasi-Newton
    # path — with the ~0% emulated shard overhead rows this bounds a
    # 2-device config-5 FBE solve (the APG 5h argument, r5)
    if want("5h_512scenario_H24_fbe_stream_halfwidth"):
        try:
            half = dict(CONFIG5)
            half["branching"] = [8, 8, 4, 2]
            rows.append(run_config(
                "5h_512scenario_H24_fbe_stream_halfwidth",
                half["dims"], half["N"], half["branching"], rep5,
                backend="fbe_stream")[0])
        except Exception as exc:  # noqa: BLE001
            rows.append(
                {"config": "5h_512scenario_H24_fbe_stream_halfwidth",
                 "error": str(exc)[:300]})
    # 5c: same solve through shard_map on a 1-device mesh
    # (quantifies shard_map overhead on the real chip)
    if want("5_1024scenario_H24_shardmap_1dev"):
        try:
            rows.append(sharded_overhead_row(get_prob5(), rep5))
        except Exception as exc:  # noqa: BLE001
            rows.append({"config": "5_1024scenario_H24_shardmap_1dev",
                         "error": str(exc)[:300]})
    # 5cs: per-shard streaming kernels inside shard_map, 1-device mesh
    # (the multi-chip fast path of VERDICT r3 task 2, on-chip)
    if want("5_1024scenario_H24_shardmap_stream_1dev"):
        try:
            rows.append(sharded_stream_row(get_prob5(), rep5))
        except Exception as exc:  # noqa: BLE001
            rows.append(
                {"config": "5_1024scenario_H24_shardmap_stream_1dev",
                 "error": str(exc)[:300]})
    # 5q: config-5 quasi-Newton rows (streaming vs XLA) are measured
    # by tools/bench_r4_qn.py (slow compiles, so they don't gate this
    # artifact) and merged into LADDER.json by
    # tools/merge_qn_ladder.py; the fbe_stream/nama_stream backends in
    # _solver support ad-hoc runs.
    # 5qs: sharded streaming QN on a 1-device mesh executing the exact
    # 2-device program (VERDICT r4 task 5 on-chip evidence)
    for short in ("fbe", "nama"):
        name = f"5_1024scenario_H24_shardmap_stream_{short}_1dev"
        if want(name):
            try:
                rows.append(sharded_stream_qn_row(
                    get_prob5(), rep5, short))
            except Exception as exc:  # noqa: BLE001
                rows.append({"config": name, "error": str(exc)[:300]})
    # scenario-weak-scaling efficiency: per-scenario solve rate at
    # ns=1024 vs ns=25 (config 4) on the same chip
    if r4 is not None and r5 is not None:
        eff = ((r5["scenarios"] / r5["p50_ms"]) /
               (r4["scenarios"] / r4["p50_ms"]))
        results["weak_scaling_1024_vs_25_scenarios"] = round(float(eff), 3)
    for r in rows:
        if r.get("batch") == 1 and "p50_ms" in r:
            r["marginal_ms"] = round(max(r["p50_ms"] - transport_ms,
                                         0.0), 3)
    ladder_regression_check(rows, args.out)
    if only is not None:
        # merge mode: update/append only the measured rows, preserve
        # everything else (incl. device_scaling) from the existing file
        try:
            with open(args.out) as f:
                prev = json.load(f)
        except Exception:  # noqa: BLE001
            prev = {"rows": []}
        by_cfg = {r.get("config"): i
                  for i, r in enumerate(prev.get("rows", []))}
        merged = 0
        for r in rows:
            i = by_cfg.get(r.get("config"))
            if "error" in r and i is not None and \
                    "p50_ms" in prev["rows"][i]:
                # never clobber a measured row with an error/skip row
                print(f"[ladder] keeping measured {r['config']} over "
                      f"error row: {r['error'][:80]}", file=sys.stderr)
                continue
            # merged rows were measured under THIS session's transport
            # latency/backend/device; the file-level metadata stays the
            # original session's, so stamp each row with its own
            if "p50_ms" in r:
                r["transport_ms"] = round(transport_ms, 3)
                r["backend"] = results["backend"]
                r["device"] = results["device"]
            if i is not None:
                prev["rows"][i] = r
            else:
                prev["rows"].append(r)
            merged += 1
        # preserve ALL original file-level metadata (backend, device,
        # transport_ms, device_scaling): most rows still come from the
        # original session — per-row stamps above carry this session's
        with open(args.out, "w") as f:
            json.dump(prev, f, indent=1)
        print(json.dumps({"ladder": "merged", "rows": merged}))
        return 0
    results["rows"] = rows
    if not args.skip_device_scaling:
        results["device_scaling"] = device_scaling_table()
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"ladder": "done",
                      "weak_scaling_eff": results.get(
                          "weak_scaling_1024_vs_25_scenarios")}))
    return 0


def _cfg5_args():
    return (CONFIG5["dims"], CONFIG5["N"], CONFIG5["branching"])


def measure_transport_ms(repeats=15):
    """Fixed per-dispatch transport latency of the device link.

    Times a trivial staged computation (an (8,8) add) round-trip: on
    the axon tunnel this is ~25 ms and dominates the small-config
    single-solve rows, so the ladder also reports marginal
    (transport-subtracted) compute per row (VERDICT r3 weak #7)."""
    import jax
    import jax.numpy as jnp

    a = jax.device_put(np.ones((8, 8), np.float32))
    f = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(f(a))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(f(a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def ladder_regression_check(new_rows, out_path):
    """Tripwire (VERDICT r3 task 8): flag >5% p50 slowdowns per config
    row vs the previous LADDER.json (covers the config-5 stream row).
    Informational, stderr only."""
    try:
        with open(out_path) as f:
            prev = {r.get("config"): r for r in json.load(f)["rows"]}
    except Exception:  # noqa: BLE001
        return
    for r in new_rows:
        old = prev.get(r.get("config"))
        if not old or "p50_ms" not in r or "p50_ms" not in old:
            continue
        delta = (r["p50_ms"] - old["p50_ms"]) / old["p50_ms"]
        flag = "  ** REGRESSION >5% **" if delta > 0.05 else ""
        print(f"[ladder] {r['config']}: p50 {old['p50_ms']:.1f} -> "
              f"{r['p50_ms']:.1f} ms ({delta * 100:+.1f}%){flag}",
              file=sys.stderr)


if __name__ == "__main__":
    raise SystemExit(main())
