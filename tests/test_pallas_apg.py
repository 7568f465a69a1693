"""Fused Pallas APG kernel vs the XLA path (interpret mode on CPU)."""

import jax
import numpy as np
import pytest

from rapidnet_tpu.engine.engine import XS_UPPER, Engine
from rapidnet_tpu.ops import pallas_apg
from rapidnet_tpu.solver import apg as apg_mod
from rapidnet_tpu.solver.controller import _factor_arrays, _step_arrays
from tests.conftest import requires_reference


def _problem():
    from rapidnet_tpu.model.network import synthetic_network
    from rapidnet_tpu.model.scenario_tree import generate_tree
    from rapidnet_tpu.model.forecaster import synthetic_forecaster
    from rapidnet_tpu.model.config import synthetic_config

    net = synthetic_network(nx=4, nu=7, nd=3, ne=2, seed=11)
    tree = generate_tree(N=6, branching=[2, 2], nd=3, nu=7, seed=11)
    fc = synthetic_forecaster(N=6, nd=3, nu=7, sim_horizon=4, seed=11)
    cfg = synthetic_config(net, tree, max_iterations=25, step_size=1e-4)
    eng = Engine(net, tree, cfg)
    fc.predict_demand(0)
    fc.predict_prices(0)
    fa = _factor_arrays(eng)
    step = _step_arrays(eng.prepare_step(
        fc.nominal_demand, fc.nominal_prices, cfg.current_x, cfg.prev_u,
        cfg.prev_demand))
    kw = dict(inv_step=1.0 / cfg.step_size, step_size=cfg.step_size,
              penalty_state=cfg.penalty_state,
              penalty_safety=cfg.penalty_safety,
              xs_upper=float(XS_UPPER), max_iterations=25)
    return eng, fa, step, kw


def test_pallas_matches_xla_synthetic():
    eng, fa, step, kw = _problem()
    ref = jax.jit(apg_mod.make_apg(
        prefix_stages=eng.factor_step().prefix_stages, **kw))(fa, step,
                                                              None)
    run = pallas_apg.make_apg_pallas(fa, interpret=True, **kw)
    out = run(step)
    np.testing.assert_allclose(np.asarray(out["control"]),
                               np.asarray(ref["control"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["u"]), np.asarray(ref["u"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(ref["x"]),
                               rtol=1e-4, atol=1e-3)


@requires_reference
def test_pallas_matches_xla_reference_problem(ref_problem, ref_engine):
    """With active penalty shrinks and a 3-way branching prefix."""
    fc = ref_problem["forecaster"]
    cfg = ref_problem["config"]
    fc.predict_demand(1)
    fc.predict_prices(1)
    fa = _factor_arrays(ref_engine)
    step = _step_arrays(ref_engine.prepare_step(
        fc.nominal_demand, fc.nominal_prices, cfg.current_x, cfg.prev_u,
        cfg.prev_demand))
    kw = dict(inv_step=1.0 / cfg.step_size, step_size=cfg.step_size,
              penalty_state=cfg.penalty_state,
              penalty_safety=cfg.penalty_safety,
              xs_upper=float(XS_UPPER), max_iterations=40)
    ref = jax.jit(apg_mod.make_apg(
        prefix_stages=ref_engine.factor_step().prefix_stages, **kw))(
            fa, step, None)
    run = pallas_apg.make_apg_pallas(fa, interpret=True, **kw)
    out = run(step)
    scale = np.abs(np.asarray(ref["u"])).max()
    np.testing.assert_allclose(np.asarray(out["u"]), np.asarray(ref["u"]),
                               atol=2e-3 * scale)
    infs_p = np.asarray(out["primal_infeasibility"])
    infs_x = np.asarray(ref["primal_infeasibility"])
    np.testing.assert_allclose(infs_p, infs_x, rtol=5e-4, atol=1e-3)


def test_vmem_estimate():
    _, fa, _, _ = _problem()
    consts = pallas_apg.pad_constants(fa)
    assert pallas_apg.vmem_bytes(consts) > 0
    assert pallas_apg.fits_vmem(consts)


def test_pallas_tolerance_early_exit_matches_xla():
    """tolerance= on the whole-solve kernel: in-kernel while_loop must
    stop at the SAME iteration as the XLA tolerance path, match its
    control, zero-pad the trace past the exit, and report the actual
    iteration count (round-5 early exit, VERDICT r4 task 4)."""
    eng, fa, step, kw = _problem()
    prefix = eng.factor_step().prefix_stages
    # pick a tolerance the solve crosses mid-budget: probe candidate
    # quantiles of the |signed-champion| trace against the XLA
    # tolerance path (the stopping rule uses the true max-abs
    # magnitude, which the signed trace only bounds from below)
    # the stopping rule uses the true max-abs magnitude, which the
    # signed-champion trace can cancel to ~0 — walk a wide absolute
    # geometric ladder and prefer a mid-trajectory exit (any
    # mid-budget exit, incl. after one iteration, exercises the
    # mechanism)
    best = None
    for t in (1e6, 1e4, 1e2, 10.0, 1.0, 0.9, 0.8, 0.7, 0.6):
        r = jax.jit(apg_mod.make_apg(
            prefix_stages=prefix, tolerance=t, **kw))(fa, step, None)
        it = int(r["iterations"])
        if 0 < it < kw["max_iterations"]:
            best = (t, r)
            if it > 1:
                break
    assert best is not None, "no tolerance produced a mid-budget exit"
    tol, ref = best
    out = pallas_apg.make_apg_pallas(fa, interpret=True,
                                     tolerance=tol, **kw)(step)
    it_ref, it_out = int(ref["iterations"]), int(out["iterations"])
    assert it_out == it_ref
    assert 0 < it_out < kw["max_iterations"]
    np.testing.assert_allclose(np.asarray(out["control"]),
                               np.asarray(ref["control"]),
                               rtol=1e-5, atol=1e-5)
    t = np.asarray(out["primal_infeasibility"])
    assert (t[it_out:] == 0).all()
    np.testing.assert_allclose(t[:it_out],
                               np.asarray(ref["primal_infeasibility"])
                               [:it_out], rtol=5e-4, atol=1e-3)
