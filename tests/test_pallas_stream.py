"""Streaming-kernel APG (ops/pallas_stream.py) parity vs the XLA path.

Runs in Pallas interpret mode on CPU.  The streaming path targets
large trees (BASELINE config 5); parity here is checked on the
reference fixture problem (active state/control constraints, nonzero
residuals) and on a branchy synthetic tree that exercises the factored
prefix aggregation inside the kernel.
"""

import numpy as np
import pytest

from tests.conftest import REFERENCE_FIXTURES, fixture_path, \
    requires_reference

MAX_ITER = 60


def _build_reference_problem():
    from rapidnet_tpu.engine.engine import Engine
    from rapidnet_tpu.model.config import SmpcConfig
    from rapidnet_tpu.model.forecaster import JsonForecaster
    from rapidnet_tpu.model.network import DwnNetwork
    from rapidnet_tpu.model.scenario_tree import ScenarioTree
    from rapidnet_tpu.solver.controller import (_factor_arrays,
                                                _step_arrays)

    cfg = SmpcConfig.from_json(fixture_path("controllerConfig.json"))
    net = DwnNetwork.from_json(fixture_path("network.json"))
    tree = ScenarioTree.from_json(fixture_path("scenarioTree.json"))
    fc = JsonForecaster(fixture_path("forecastor.json"))
    fc.predict_demand(0)
    fc.predict_prices(0)
    eng = Engine(net, tree, cfg)
    fa = _factor_arrays(eng)
    step = _step_arrays(eng.prepare_step(
        fc.nominal_demand, fc.nominal_prices, cfg.current_x,
        cfg.prev_u, cfg.prev_demand))
    return cfg, eng, fa, step


def _kw(cfg, iters=MAX_ITER):
    from rapidnet_tpu.engine.engine import XS_UPPER
    return dict(inv_step=1.0 / cfg.step_size, step_size=cfg.step_size,
                penalty_state=cfg.penalty_state,
                penalty_safety=cfg.penalty_safety,
                xs_upper=float(XS_UPPER), max_iterations=iters)


@requires_reference
def test_stream_matches_xla_on_reference_problem():
    import jax

    from rapidnet_tpu.ops import pallas_stream
    from rapidnet_tpu.solver import apg as apg_mod

    cfg, eng, fa, step = _build_reference_problem()
    kw = _kw(cfg)
    ref = jax.jit(apg_mod.make_apg(
        prefix_stages=eng.factor_step().prefix_stages, **kw))(fa, step)
    out = pallas_stream.make_apg_stream(fa, **kw)(step)

    for k in ("control", "u", "v"):
        a, b = np.asarray(ref[k]), np.asarray(out[k])
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() < 1e-5 * scale, k
    a = np.asarray(ref["x"])
    b = np.asarray(out["x"])
    assert np.abs(a - b).max() < 1e-5 * max(np.abs(a).max(), 1.0)
    for blk in ("xi", "psi"):
        a = np.asarray(ref["y"][blk])
        b = np.asarray(out["y"][blk])
        assert np.abs(a - b).max() < 1e-4 * max(np.abs(a).max(), 1.0)
    a = np.asarray(ref["primal_infeasibility"])
    b = np.asarray(out["primal_infeasibility"])
    # nonzero residuals actually exercised
    assert np.abs(a).max() > 1.0
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-3)


@requires_reference
def test_stream_warm_start_matches_xla():
    import jax

    from rapidnet_tpu.ops import pallas_stream
    from rapidnet_tpu.solver import apg as apg_mod

    cfg, eng, fa, step = _build_reference_problem()
    kw = _kw(cfg, iters=25)
    xla = jax.jit(apg_mod.make_apg(
        prefix_stages=eng.factor_step().prefix_stages, **kw))
    stream = pallas_stream.make_apg_stream(fa, **kw)
    y0 = xla(fa, step)["y"]
    ref = xla(fa, step, y0)
    out = stream(step, jax.tree.map(np.asarray, y0))
    a, b = np.asarray(ref["control"]), np.asarray(out["control"])
    assert np.abs(a - b).max() < 1e-4 * max(np.abs(a).max(), 1.0)


def test_stream_prefix_aggregation_branchy_tree():
    """Deep branching prefix (3 aggregation stages) through the
    in-kernel factored Cp/Bp matmuls."""
    import jax

    from rapidnet_tpu.engine.engine import Engine
    from rapidnet_tpu.model.config import synthetic_config
    from rapidnet_tpu.model.forecaster import synthetic_forecaster
    from rapidnet_tpu.model.network import synthetic_network
    from rapidnet_tpu.model.scenario_tree import generate_tree
    from rapidnet_tpu.ops import pallas_stream
    from rapidnet_tpu.solver import apg as apg_mod
    from rapidnet_tpu.solver.controller import (_factor_arrays,
                                                _step_arrays)

    net = synthetic_network(nx=4, nu=7, nd=3, ne=2, seed=11)
    tree = generate_tree(N=8, branching=[3, 2, 2], nd=3, nu=7, seed=11)
    fc = synthetic_forecaster(N=8, nd=3, nu=7, sim_horizon=4, seed=11)
    cfg = synthetic_config(net, tree, max_iterations=40, step_size=1e-3)
    # start near the upper bounds so the state constraints activate
    cfg.current_x = (0.98 * net.xmax).astype(np.float32)
    eng = Engine(net, tree, cfg)
    fc.predict_demand(0)
    fc.predict_prices(0)
    fa = _factor_arrays(eng)
    step = _step_arrays(eng.prepare_step(
        fc.nominal_demand, fc.nominal_prices, cfg.current_x,
        cfg.prev_u, cfg.prev_demand))
    kw = _kw(cfg, iters=40)
    ref = jax.jit(apg_mod.make_apg(
        prefix_stages=eng.factor_step().prefix_stages, **kw))(fa, step)
    out = pallas_stream.make_apg_stream(fa, **kw)(step)
    for k in ("control", "u", "x"):
        a, b = np.asarray(ref[k]), np.asarray(out[k])
        assert np.abs(a - b).max() < 1e-5 * max(np.abs(a).max(), 1.0), k


def test_stream_rejects_non_rank1_preconditioner():
    """The streaming pack validates the sqrt(prob) x stage-row
    structure it reconstructs from."""
    from rapidnet_tpu.engine.engine import Engine
    from rapidnet_tpu.model.config import synthetic_config
    from rapidnet_tpu.model.forecaster import synthetic_forecaster
    from rapidnet_tpu.model.network import synthetic_network
    from rapidnet_tpu.model.scenario_tree import generate_tree
    from rapidnet_tpu.ops import pallas_stream
    from rapidnet_tpu.solver.controller import _factor_arrays

    net = synthetic_network(nx=4, nu=7, nd=3, ne=2, seed=1)
    tree = generate_tree(N=6, branching=[2], nd=3, nu=7, seed=1)
    cfg = synthetic_config(net, tree, max_iterations=5)
    eng = Engine(net, tree, cfg)
    fa = dict(_factor_arrays(eng))
    d1 = np.asarray(fa["d1"]).copy()
    d1[2, 1, 0] *= 3.0                      # break the rank-1 structure
    fa["d1"] = d1
    with pytest.raises(ValueError, match="rank|structure|sqrt"):
        pallas_stream.pack_stream_constants(fa)


@requires_reference
def test_controller_stream_backend_closed_loop():
    """SmpcController(backend='stream') runs the closed loop and
    matches the XLA controller's controls."""
    from rapidnet_tpu.model.config import SmpcConfig
    from rapidnet_tpu.solver.controller import SmpcController

    def build(backend):
        cfg = SmpcConfig.from_json(fixture_path("controllerConfig.json"))
        cfg.max_iterations = 80
        return SmpcController(cfg, backend=backend)

    ref = build("xla")
    got = build("stream")
    for t in range(2):
        a = ref.control_action(t)
        b = got.control_action(t)
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-3)
        ref.move_forward_in_time()
        got.move_forward_in_time()


@requires_reference
def test_stream_fused_matches_xla_on_reference_problem():
    """The single-pallas_call (2N-grid) fused variant: same numerics
    and output contract (incl. 'v') as make_apg_stream / the XLA path."""
    import jax

    from rapidnet_tpu.ops import pallas_stream
    from rapidnet_tpu.solver import apg as apg_mod

    cfg, eng, fa, step = _build_reference_problem()
    kw = _kw(cfg)
    ref = jax.jit(apg_mod.make_apg(
        prefix_stages=eng.factor_step().prefix_stages, **kw))(fa, step)
    out = pallas_stream.make_apg_stream_fused(fa, **kw)(step)

    for k in ("control", "u", "v", "x"):
        a, b = np.asarray(ref[k]), np.asarray(out[k])
        assert np.abs(a - b).max() < 1e-5 * max(np.abs(a).max(), 1.0), k
    for blk in ("xi", "psi"):
        a = np.asarray(ref["y"][blk])
        b = np.asarray(out["y"][blk])
        assert np.abs(a - b).max() < 1e-4 * max(np.abs(a).max(), 1.0)
    a = np.asarray(ref["primal_infeasibility"])
    b = np.asarray(out["primal_infeasibility"])
    assert np.abs(a).max() > 1.0
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-3)


def test_stream_fused_prefix_aggregation_branchy_tree():
    """Fused variant through a 3-stage branching prefix (the in-kernel
    factored Cp/Bp handoffs run inside the backward phase)."""
    import jax

    from rapidnet_tpu.engine.engine import Engine
    from rapidnet_tpu.model.config import synthetic_config
    from rapidnet_tpu.model.forecaster import synthetic_forecaster
    from rapidnet_tpu.model.network import synthetic_network
    from rapidnet_tpu.model.scenario_tree import generate_tree
    from rapidnet_tpu.ops import pallas_stream
    from rapidnet_tpu.solver import apg as apg_mod
    from rapidnet_tpu.solver.controller import (_factor_arrays,
                                                _step_arrays)

    net = synthetic_network(nx=4, nu=7, nd=3, ne=2, seed=11)
    tree = generate_tree(N=8, branching=[3, 2, 2], nd=3, nu=7, seed=11)
    fc = synthetic_forecaster(N=8, nd=3, nu=7, sim_horizon=4, seed=11)
    cfg = synthetic_config(net, tree, max_iterations=40, step_size=1e-3)
    cfg.current_x = (0.98 * net.xmax).astype(np.float32)
    eng = Engine(net, tree, cfg)
    fc.predict_demand(0)
    fc.predict_prices(0)
    fa = _factor_arrays(eng)
    step = _step_arrays(eng.prepare_step(
        fc.nominal_demand, fc.nominal_prices, cfg.current_x,
        cfg.prev_u, cfg.prev_demand))
    kw = _kw(cfg, iters=40)
    ref = jax.jit(apg_mod.make_apg(
        prefix_stages=eng.factor_step().prefix_stages, **kw))(fa, step)
    out = pallas_stream.make_apg_stream_fused(fa, **kw)(step)
    for k in ("control", "u", "x", "v"):
        a, b = np.asarray(ref[k]), np.asarray(out[k])
        assert np.abs(a - b).max() < 1e-5 * max(np.abs(a).max(), 1.0), k


def test_stream_vmem_estimate_scales_and_gates():
    """fits_vmem_stream: the bench-scale tree fits; an 8x-wider
    scenario axis does not (the controller must keep the XLA path)."""
    from rapidnet_tpu.engine.engine import Engine
    from rapidnet_tpu.model.config import synthetic_config
    from rapidnet_tpu.model.forecaster import synthetic_forecaster
    from rapidnet_tpu.model.network import synthetic_network
    from rapidnet_tpu.model.scenario_tree import generate_tree
    from rapidnet_tpu.ops import pallas_stream
    from rapidnet_tpu.solver.controller import _factor_arrays

    net = synthetic_network(nx=4, nu=7, nd=3, ne=2, seed=3)
    tree = generate_tree(N=6, branching=[2, 2], nd=3, nu=7, seed=3)
    cfg = synthetic_config(net, tree, max_iterations=5)
    eng = Engine(net, tree, cfg)
    consts = pallas_stream.pack_stream_constants(_factor_arrays(eng))
    assert pallas_stream.fits_vmem_stream(consts)
    bytes_small = pallas_stream.vmem_bytes_stream(consts)
    # widen the scenario axis 64x by hand: the estimate must scale
    # ~linearly in NSP and cross the budget for a small enough budget
    N, ns, nx, nu, nv, NSP, PX, PU, PV = consts["dims"]
    wide = dict(consts, dims=(N, ns * 64, nx, nu, nv, NSP * 64,
                              PX, PU, PV))
    assert pallas_stream.vmem_bytes_stream(wide) > 32 * bytes_small
    assert not pallas_stream.fits_vmem_stream(
        wide, budget=40 * bytes_small)


@pytest.mark.parametrize("k", [2, 4])
def test_stage_blocked_stream_bit_exact(k):
    """stage_block=k batches k stages per grid invocation with
    IDENTICAL in-kernel math — outputs must match k=1 bit-for-bit
    (APG two-kernel path and the QN sweeps)."""
    import jax

    from rapidnet_tpu.engine.engine import Engine
    from rapidnet_tpu.model.config import synthetic_config
    from rapidnet_tpu.model.forecaster import synthetic_forecaster
    from rapidnet_tpu.model.network import synthetic_network
    from rapidnet_tpu.model.scenario_tree import generate_tree
    from rapidnet_tpu.ops import pallas_stream
    from rapidnet_tpu.solver.controller import (_factor_arrays,
                                                _step_arrays)
    from rapidnet_tpu.solver.qn_stream import make_qn_stream

    net = synthetic_network(nx=4, nu=7, nd=3, ne=2, seed=11)
    tree = generate_tree(N=8, branching=[3, 2, 2], nd=3, nu=7, seed=11)
    fc = synthetic_forecaster(N=8, nd=3, nu=7, sim_horizon=4, seed=11)
    cfg = synthetic_config(net, tree, max_iterations=10, step_size=1e-3)
    cfg.current_x = (0.98 * net.xmax).astype(np.float32)
    eng = Engine(net, tree, cfg)
    fc.predict_demand(0)
    fc.predict_prices(0)
    fa = _factor_arrays(eng)
    step = _step_arrays(eng.prepare_step(
        fc.nominal_demand, fc.nominal_prices, cfg.current_x,
        cfg.prev_u, cfg.prev_demand))
    kw = _kw(cfg, iters=10)
    ref = pallas_stream.make_apg_stream(fa, **kw)(step)
    out = pallas_stream.make_apg_stream(fa, stage_block=k, **kw)(step)
    for key in ("control", "u", "x", "primal_infeasibility"):
        np.testing.assert_array_equal(np.asarray(ref[key]),
                                      np.asarray(out[key]), err_msg=key)
    qref = make_qn_stream(fa, algorithm="namaAlgorithm",
                          lbfgs_buffer_size=5, **kw)(step)
    qout = make_qn_stream(fa, algorithm="namaAlgorithm",
                          lbfgs_buffer_size=5, stage_block=k,
                          **kw)(step)
    for key in ("control", "u", "tau"):
        np.testing.assert_array_equal(np.asarray(qref[key]),
                                      np.asarray(qout[key]),
                                      err_msg=key)
    with pytest.raises(ValueError):
        pallas_stream.make_apg_stream(fa, stage_block=3, **kw)  # 3∤8


def test_stream_shape_only_estimator_matches_pack_and_shards():
    """estimate_stream_dims (the no-pack gate) agrees with the real
    pack single-device, and shrinks with the per-shard lane width —
    the sharded auto gate must size the PER-SHARD block, not the full
    tree (ADVICE r4: an n-chip mesh gated on the full tree is ~n× too
    conservative)."""
    from rapidnet_tpu.engine.engine import Engine
    from rapidnet_tpu.model.config import synthetic_config
    from rapidnet_tpu.model.network import synthetic_network
    from rapidnet_tpu.model.scenario_tree import generate_tree
    from rapidnet_tpu.ops import pallas_stream
    from rapidnet_tpu.solver.controller import _factor_arrays

    net = synthetic_network(nx=4, nu=7, nd=3, ne=2, seed=3)
    tree = generate_tree(N=6, branching=[2, 2], nd=3, nu=7, seed=3)
    cfg = synthetic_config(net, tree, max_iterations=5)
    fa = _factor_arrays(Engine(net, tree, cfg))
    packed = pallas_stream.pack_stream_constants(fa)
    est = pallas_stream.estimate_stream_dims(fa, 1)
    assert est["dims"] == packed["dims"]
    assert est["Rmax"] == packed["Rmax"]
    assert est["prefix_stages"] == packed["prefix_stages"]
    assert (pallas_stream.vmem_bytes_stream(est) ==
            pallas_stream.vmem_bytes_stream(packed))
    # per-shard gating (shape-only, so a fake wide fa suffices):
    # 1024 scenarios over 8 shards -> 128-lane blocks, and the
    # NSP-dependent terms must shrink accordingly
    fa_big = {"d1": np.zeros((6, 1024, 4)), "g": np.zeros((6, 1024, 7)),
              "invWbar": np.zeros((5, 5)),
              "prefix_Cp": {1: np.zeros((8, 1024))}}
    b1 = pallas_stream.vmem_bytes_stream(
        pallas_stream.estimate_stream_dims(fa_big, 1))
    b8 = pallas_stream.vmem_bytes_stream(
        pallas_stream.estimate_stream_dims(fa_big, 8))
    assert b8 < b1 / 4


@requires_reference
def test_controller_stream_precision_knob():
    """stream_precision='default' plumbs through to the streaming
    kernel (on CPU interpret mode DEFAULT and HIGHEST are numerically
    identical, so the closed loop must match exactly); invalid values
    reject at construction (Mosaic lowers no middle tier)."""
    import pytest

    from rapidnet_tpu.model.config import SmpcConfig
    from rapidnet_tpu.solver.controller import SmpcController

    def build(**kw):
        cfg = SmpcConfig.from_json(fixture_path("controllerConfig.json"))
        cfg.max_iterations = 40
        return SmpcController(cfg, backend="stream", **kw)

    with pytest.raises(ValueError, match="stream_precision"):
        build(stream_precision="high")
    a = build(stream_precision="highest").control_action(0)
    b = build(stream_precision="default").control_action(0)
    np.testing.assert_allclose(b, a, rtol=0, atol=0)
