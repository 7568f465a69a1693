"""Sharded streaming APG (ops/pallas_stream_sharded.py) parity.

Virtual 2/4-device CPU mesh, Pallas interpret mode: the per-shard
streaming kernels + distinct-parent psum must reproduce the
single-device streaming kernel (and hence the XLA path) on trees whose
branching prefix splits into shard-local and cross-shard stages.
"""

import numpy as np
import pytest

MAX_ITER = 40


def _problem(branching, ns_expected, N=8, seed=11):
    from rapidnet_tpu.engine.engine import Engine
    from rapidnet_tpu.model.config import synthetic_config
    from rapidnet_tpu.model.forecaster import synthetic_forecaster
    from rapidnet_tpu.model.network import synthetic_network
    from rapidnet_tpu.model.scenario_tree import generate_tree
    from rapidnet_tpu.solver.controller import (_factor_arrays,
                                                _step_arrays)

    net = synthetic_network(nx=4, nu=7, nd=3, ne=2, seed=seed)
    tree = generate_tree(N=N, branching=list(branching), nd=3, nu=7,
                         seed=seed)
    assert tree.ns == ns_expected
    fc = synthetic_forecaster(N=N, nd=3, nu=7, sim_horizon=4, seed=seed)
    cfg = synthetic_config(net, tree, max_iterations=MAX_ITER,
                           step_size=1e-3)
    cfg.current_x = (0.98 * net.xmax).astype(np.float32)
    eng = Engine(net, tree, cfg)
    fc.predict_demand(0)
    fc.predict_prices(0)
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


def test_locality_analysis():
    """branching [4, 2, 2] -> ns=16; with 4 shards (nsl=4): stage-3
    agg (parents = stage-2 nodes, 2 slots each) and stage-2 agg
    (parents = stage-1 nodes, 4 slots each) are local, stage-1 agg
    (parent = root, 16 slots) is cross-shard."""
    from rapidnet_tpu.ops.pallas_stream_sharded import \
        analyze_prefix_locality

    cfg, eng, fa, step = _problem([4, 2, 2], 16)
    info = analyze_prefix_locality(fa, 4)
    assert info["s_hi"] == 1
    assert sorted(info["cross"]) == [1]
    assert sorted(info["local"]) == [2, 3]
    # 8 shards (nsl=2): stage-2 parents span 4 slots -> cross
    info8 = analyze_prefix_locality(fa, 8)
    assert info8["s_hi"] == 2
    assert sorted(info8["cross"]) == [1, 2]
    assert sorted(info8["local"]) == [3]


@pytest.mark.parametrize("n_dev,branching,ns", [
    (2, [4, 2, 2], 16),      # s_hi=1: one cross stage, two local
    (4, [4, 2, 2], 16),      # s_hi=1, deeper split
    (8, [4, 2, 2], 16),      # s_hi=2: cross stage BELOW s_hi in XLA
    (2, [2], 2),             # no local prefix stages at all
])
def test_sharded_stream_matches_single_stream(n_dev, branching, ns):
    import jax

    from rapidnet_tpu.ops import pallas_stream
    from rapidnet_tpu.ops.pallas_stream_sharded import \
        make_apg_stream_sharded
    from rapidnet_tpu.parallel import make_mesh

    cfg, eng, fa, step = _problem(branching, ns)
    kw = _kw(cfg)
    ref = pallas_stream.make_apg_stream(fa, **kw)(step)
    mesh = make_mesh(n_dev)
    out = make_apg_stream_sharded(mesh, fa, **kw)(step)

    for k in ("control", "u", "x", "v"):
        a, b = np.asarray(ref[k]), np.asarray(out[k])
        assert np.abs(a - b).max() < 1e-5 * max(np.abs(a).max(), 1.0), k
    for blk in ("xi", "psi"):
        a = np.asarray(ref["y"][blk])
        b = np.asarray(out["y"][blk])
        assert np.abs(a - b).max() < 1e-4 * max(np.abs(a).max(), 1.0)
    a = np.asarray(ref["primal_infeasibility"])
    b = np.asarray(out["primal_infeasibility"])
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-3)


def test_sharded_stream_warm_start_and_xla_parity():
    """Cold + warm solves against the XLA reference solver."""
    import jax

    from rapidnet_tpu.ops.pallas_stream_sharded import \
        make_apg_stream_sharded
    from rapidnet_tpu.parallel import make_mesh
    from rapidnet_tpu.solver import apg as apg_mod

    cfg, eng, fa, step = _problem([4, 2, 2], 16)
    kw = _kw(cfg, iters=25)
    xla = jax.jit(apg_mod.make_apg(
        prefix_stages=eng.factor_step().prefix_stages, **kw))
    mesh = make_mesh(2)
    sol = make_apg_stream_sharded(mesh, fa, **kw)
    ref0 = xla(fa, step)
    out0 = sol(step)
    a, b = np.asarray(ref0["control"]), np.asarray(out0["control"])
    assert np.abs(a - b).max() < 1e-4 * max(np.abs(a).max(), 1.0)
    y0 = jax.tree.map(np.asarray, ref0["y"])
    ref1 = xla(fa, step, y0)
    out1 = sol(step, y0)
    a, b = np.asarray(ref1["control"]), np.asarray(out1["control"])
    assert np.abs(a - b).max() < 1e-4 * max(np.abs(a).max(), 1.0)


def test_controller_mesh_stream_backend():
    """SmpcController(mesh=..., backend='stream') runs the sharded
    streaming solve and matches the single-device XLA controller."""
    from rapidnet_tpu.model.config import synthetic_config
    from rapidnet_tpu.model.forecaster import synthetic_forecaster
    from rapidnet_tpu.model.network import synthetic_network
    from rapidnet_tpu.model.scenario_tree import generate_tree
    from rapidnet_tpu.parallel import make_mesh
    from rapidnet_tpu.solver.controller import SmpcController

    net = synthetic_network(nx=4, nu=7, nd=3, ne=2, seed=7)
    tree = generate_tree(N=6, branching=[4, 2], nd=3, nu=7, seed=7)

    def build(backend, mesh=None):
        fc = synthetic_forecaster(N=6, nd=3, nu=7, sim_horizon=4, seed=7)
        cfg = synthetic_config(net, tree, max_iterations=30,
                               step_size=1e-3)
        return SmpcController(cfg, network=net, tree=tree, forecaster=fc,
                              backend=backend, mesh=mesh)

    ref = build("xla")
    got = build("stream", mesh=make_mesh(4))
    got.initialise()
    assert got._use_stream
    for t in range(2):
        a = ref.control_action(t)
        b = got.control_action(t)
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)
        ref.move_forward_in_time()
        got.move_forward_in_time()


def test_emulate_shards_on_1device_mesh():
    """emulate_shards=N on a 1-device mesh executes the N-way program
    structure (K1a split + psum + XLA tail) and is bit-identical to
    the plain streaming kernel — the on-chip overhead row of the
    ladder (bench_ladder.sharded_stream_row) relies on this."""
    from rapidnet_tpu.ops import pallas_stream
    from rapidnet_tpu.ops.pallas_stream_sharded import \
        make_apg_stream_sharded
    from rapidnet_tpu.parallel import make_mesh

    cfg, eng, fa, step = _problem([2, 2], 4)
    kw = _kw(cfg)
    ref = pallas_stream.make_apg_stream(fa, **kw)(step)
    out = make_apg_stream_sharded(make_mesh(1), fa, emulate_shards=2,
                                  **kw)(step)
    for k in ("control", "u", "x", "v"):
        a, b = np.asarray(ref[k]), np.asarray(out[k])
        assert np.abs(a - b).max() == 0.0, k
