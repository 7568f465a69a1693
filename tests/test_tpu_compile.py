"""Real-TPU Pallas compile tier (opt-in: RAPIDNET_TPU_TESTS=1 -m tpu).

Every Pallas kernel family is COMPILED on the real chip (no interpret
mode) and checked for short-horizon parity against the XLA path — the
coverage gap VERDICT r3 flagged: a Mosaic regression (layout rules,
VMEM limits) would pass the interpret-mode CI and surface only as a
bench failure.  The reference runs its test suites on the real device
the same way (src/main.cu:13-24).

Kept small (few iterations, one compile per kernel family) so the tier
finishes in minutes over the axon tunnel.
"""

import os

import numpy as np
import pytest

import jax

ON_TPU = (os.environ.get("RAPIDNET_TPU_TESTS") == "1" and
          jax.devices()[0].platform not in ("cpu", "gpu"))

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(not ON_TPU, reason="real-TPU tier is opt-in "
                       "(RAPIDNET_TPU_TESTS=1, TPU visible)"),
]

ITERS = 8


def _problem(branching=(4, 2), N=8, nx=8, nu=13, nd=5, ne=3, seed=11):
    from rapidnet_tpu.engine.engine import Engine
    from rapidnet_tpu.model.config import synthetic_config
    from rapidnet_tpu.model.forecaster import synthetic_forecaster
    from rapidnet_tpu.model.network import synthetic_network
    from rapidnet_tpu.model.scenario_tree import generate_tree
    from rapidnet_tpu.solver.controller import (_factor_arrays,
                                                _step_arrays)

    net = synthetic_network(nx=nx, nu=nu, nd=nd, ne=ne, seed=seed)
    tree = generate_tree(N=N, branching=list(branching), nd=nd, nu=nu,
                         seed=seed)
    fc = synthetic_forecaster(N=N, nd=nd, nu=nu, sim_horizon=4,
                              seed=seed)
    cfg = synthetic_config(net, tree, max_iterations=ITERS,
                           step_size=1e-3)
    cfg.current_x = (0.95 * net.xmax).astype(np.float32)
    eng = Engine(net, tree, cfg)
    fc.predict_demand(0)
    fc.predict_prices(0)
    fa = _factor_arrays(eng)
    step = _step_arrays(eng.prepare_step(
        fc.nominal_demand, fc.nominal_prices, cfg.current_x,
        cfg.prev_u, cfg.prev_demand))
    return cfg, eng, fa, step


def _kw(cfg):
    from rapidnet_tpu.engine.engine import XS_UPPER
    return dict(inv_step=1.0 / cfg.step_size, step_size=cfg.step_size,
                penalty_state=cfg.penalty_state,
                penalty_safety=cfg.penalty_safety,
                xs_upper=float(XS_UPPER), max_iterations=ITERS)


def _xla_ref(cfg, eng, fa, step):
    from rapidnet_tpu.solver import apg as apg_mod
    return jax.jit(apg_mod.make_apg(
        prefix_stages=eng.factor_step().prefix_stages,
        **_kw(cfg)))(fa, step)


def _close(ref, out, keys=("control", "u", "x"), tol=1e-4):
    for k in keys:
        a, b = np.asarray(ref[k]), np.asarray(out[k])
        assert np.isfinite(b).all(), k
        assert np.abs(a - b).max() < tol * max(np.abs(a).max(), 1.0), k


def test_compile_whole_solve_apg():
    from rapidnet_tpu.ops import pallas_apg

    cfg, eng, fa, step = _problem()
    out = pallas_apg.make_apg_pallas(fa, **_kw(cfg))(step)
    _close(_xla_ref(cfg, eng, fa, step),
           jax.tree.map(np.asarray, out))


@pytest.mark.parametrize("algorithm", ["globalFbeAlgorithm",
                                       "namaAlgorithm"])
def test_compile_whole_solve_qn(algorithm):
    from rapidnet_tpu.ops import pallas_qn
    from rapidnet_tpu.solver import quasi_newton

    cfg, eng, fa, step = _problem()
    ref = jax.jit(quasi_newton.make_solver(
        algorithm=algorithm, lbfgs_buffer_size=5,
        prefix_stages=eng.factor_step().prefix_stages,
        **_kw(cfg)))(fa, step)
    out = pallas_qn.make_qn_pallas(fa, algorithm=algorithm,
                                   lbfgs_buffer_size=5, **_kw(cfg))(step)
    _close(ref, jax.tree.map(np.asarray, out), keys=("control", "u"),
           tol=1e-3)


def test_compile_stream_apg_two_kernel_and_fused():
    from rapidnet_tpu.ops import pallas_stream

    cfg, eng, fa, step = _problem()
    ref = _xla_ref(cfg, eng, fa, step)
    out2 = pallas_stream.make_apg_stream(fa, **_kw(cfg))(step)
    _close(ref, jax.tree.map(np.asarray, out2))
    outf = pallas_stream.make_apg_stream_fused(fa, **_kw(cfg))(step)
    _close(ref, jax.tree.map(np.asarray, outf))


def test_compile_stream_qn():
    from rapidnet_tpu.solver import quasi_newton
    from rapidnet_tpu.solver.qn_stream import make_qn_stream

    cfg, eng, fa, step = _problem()
    ref = jax.jit(quasi_newton.make_solver(
        algorithm="globalFbeAlgorithm", lbfgs_buffer_size=5,
        prefix_stages=eng.factor_step().prefix_stages,
        **_kw(cfg)))(fa, step)
    out = make_qn_stream(fa, algorithm="globalFbeAlgorithm",
                         lbfgs_buffer_size=5, **_kw(cfg))(step)
    _close(ref, jax.tree.map(np.asarray, out), keys=("control", "u"),
           tol=1e-3)


def test_compile_stream_sharded_1chip_requires_2():
    """The sharded streaming kernel needs >= 2 chips; on one real chip
    it must reject cleanly (the virtual-mesh tier covers its numerics
    in tests/test_stream_sharded.py)."""
    from rapidnet_tpu.ops.pallas_stream_sharded import \
        make_apg_stream_sharded
    from rapidnet_tpu.parallel import make_mesh

    if len(jax.devices()) >= 2:
        pytest.skip("multi-chip TPU available — run the real thing")
    cfg, eng, fa, step = _problem()
    with pytest.raises(ValueError):
        make_apg_stream_sharded(make_mesh(1), fa, **_kw(cfg))


def test_compile_stream_sharded_emulated_on_chip():
    """The sharded streaming program (K1a kernel + psum + XLA tail +
    K2 kernel inside shard_map) COMPILES and matches the plain
    streaming kernel on one real chip via emulate_shards=2 — the
    exact program a 2-chip mesh would run, minus the ICI hop."""
    from rapidnet_tpu.ops import pallas_stream
    from rapidnet_tpu.ops.pallas_stream_sharded import \
        make_apg_stream_sharded
    from rapidnet_tpu.parallel import make_mesh

    cfg, eng, fa, step = _problem()
    kw = _kw(cfg)
    ref = pallas_stream.make_apg_stream(fa, **kw)(step)
    out = make_apg_stream_sharded(make_mesh(1), fa, emulate_shards=2,
                                  **kw)(step)
    _close(jax.tree.map(np.asarray, ref),
           jax.tree.map(np.asarray, out), keys=("control", "u", "x"),
           tol=1e-4)


def test_compile_stream_qn_r5_variants():
    """Round-5 streaming-QN machinery on the real chip: Pallas L-BFGS
    buffer passes (in the production path already), stage-blocked
    sweeps, bf16 history storage, NAMA."""
    import jax.numpy as jnp

    from rapidnet_tpu.solver.qn_stream import make_qn_stream

    cfg, eng, fa, step = _problem()
    kw = _kw(cfg)
    ref = make_qn_stream(fa, algorithm="namaAlgorithm",
                         lbfgs_buffer_size=5, **kw)(step)
    blk = make_qn_stream(fa, algorithm="namaAlgorithm",
                         lbfgs_buffer_size=5, stage_block=4,
                         **kw)(step)
    # identical in-kernel math — stage blocking is bit-exact
    np.testing.assert_array_equal(np.asarray(ref["control"]),
                                  np.asarray(blk["control"]))
    b16 = make_qn_stream(fa, algorithm="namaAlgorithm",
                         lbfgs_buffer_size=5,
                         lbfgs_dtype=jnp.bfloat16, **kw)(step)
    a, b = np.asarray(ref["control"]), np.asarray(b16["control"])
    assert np.abs(a - b).max() < 0.1 * max(np.abs(a).max(), 1.0)


def test_compile_stream_qn_sharded_emulated_on_chip():
    """The sharded streaming QN program (per-shard sweeps + psum +
    root tail + Pallas L-BFGS passes inside shard_map) compiles and
    matches the plain streaming QN on one real chip via
    emulate_shards=2 (VERDICT r4 task 5)."""
    from rapidnet_tpu.parallel import make_mesh
    from rapidnet_tpu.solver.qn_stream import make_qn_stream

    cfg, eng, fa, step = _problem()
    kw = _kw(cfg)
    ref = make_qn_stream(fa, algorithm="globalFbeAlgorithm",
                         lbfgs_buffer_size=5, **kw)(step)
    out = make_qn_stream(fa, algorithm="globalFbeAlgorithm",
                         lbfgs_buffer_size=5, mesh=make_mesh(1),
                         emulate_shards=2, **kw)(step)
    a, b = np.asarray(ref["control"]), np.asarray(out["control"])
    assert np.abs(a - b).max() < 1e-3 * max(np.abs(a).max(), 1.0)


def test_compile_whole_solve_tolerance_early_exit():
    """The in-kernel while_loop early exit (round-5 task 4) compiles
    under Mosaic and stops before the budget on the real chip."""
    from rapidnet_tpu.ops import pallas_apg, pallas_qn

    cfg, eng, fa, step = _problem()
    kw = _kw(cfg)
    out = pallas_apg.make_apg_pallas(fa, tolerance=1e6, **kw)(step)
    assert int(out["iterations"]) < ITERS
    outq = pallas_qn.make_qn_pallas(
        fa, algorithm="globalFbeAlgorithm", lbfgs_buffer_size=5,
        tolerance=1e6, **kw)(step)
    assert int(outq["iterations"]) < ITERS
