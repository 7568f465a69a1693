"""Streaming-kernel global-FBE / NAMA for LARGE scenario trees.

Reference: ``algorithmGlobalFbe`` / ``algorithmNama``
(src/SmpcController.cu:1529-1586) — the same algorithms as
solver/quasi_newton.py, re-laid-out for the >VMEM tree regime
(BASELINE config 5):

* every dual/primal slab lives stage-major TRANSPOSED (N, d, NSP) with
  the scenario axis on the 128-wide lanes (the streaming APG layout,
  ops/pallas_stream.py);
* the three oracle sweeps per iteration (solve step + Hessian
  oracle(s), src/SmpcController.cu:563-755 and :884-1055) run as
  streaming Pallas kernel pairs (ops/pallas_stream_qn.py) that keep
  each stage's working set in VMEM;
* prox, FBE value, L-BFGS two-loop and the backtracking line searches
  stay in XLA directly on the transposed slabs (elementwise/reduction
  work — the preconditioner diagonals and bounds are reconstructed by
  rank-1 broadcast instead of materialised, exactly like the kernels).

With ``mesh=`` the same solve runs scenario-sharded: each shard
streams its own block (ops/pallas_stream_sharded.make_sharded_sweeps —
shard-local prefix aggregations in-kernel, one distinct-parent psum
per sweep) and every reduction scalar (prox norms, L-BFGS dots,
line-search values) is a psum, so the data-dependent control flow
takes identical branches on every shard.

Same iteration semantics as solver/quasi_newton.make_solver (the
golden-tested implementation); fixed iteration budget only — use the
XLA path for tolerance-based early exit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

try:  # JAX >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from rapidnet_tpu.model.config import ALGORITHM_FBE, ALGORITHM_NAMA
from rapidnet_tpu.ops import pallas_stream as stream
from rapidnet_tpu.ops.pallas_stream_qn import make_stream_sweeps
from rapidnet_tpu.solver.quasi_newton import LS_MAX_STEPS, LS_TOLERANCE

KEYS = ("y1", "y2", "yp")      # transposed dual triple


def _axpy(a, x, y):
    return {k: y[k] + a * x[k] for k in KEYS}


def make_qn_stream(fa: dict, *, algorithm: str, inv_step: float,
                   step_size: float, penalty_state: float,
                   penalty_safety: float, xs_upper: float,
                   max_iterations: int, lbfgs_buffer_size: int,
                   project_control: bool = True,
                   interpret: bool | str = "auto",
                   mesh=None,
                   precision: str | lax.Precision =
                       lax.Precision.HIGHEST,
                   consts: dict | None = None,
                   ablate: frozenset = frozenset()):
    """Build the streaming FBE/NAMA solve: run(step, y0=None) -> outputs.

    Output contract matches quasi_newton.make_solver (control, x, u, v,
    y{xi,psi}, primal_infeasibility, value_fbe, tau, iterations).
    ``mesh``: optional 1-D scenario mesh — per-shard streaming kernels
    with psum'd scalars (see module docstring).
    ``consts``: precomputed ``pack_stream_constants(fa)`` (single-device
    path only) — avoids repacking when the caller already packed for
    the VMEM gate.
    ``ablate``: TIMING-ONLY cost-attribution switches (the outputs are
    NOT valid solves) used by tools/bench_r5_qn_ablate.py to locate the
    per-iteration HBM budget: 'sweeps_only' (3 oracle sweep pairs +
    dual carry, nothing else), 'no_qn' (skip value/L-BFGS/line search),
    'no_lbfgs' (direction = -yvec, buffer and two-loop skipped),
    'no_ls' (single tau=1 application instead of the trial loop).
    """
    ablate = frozenset(ablate)
    bad = ablate - {"sweeps_only", "no_qn", "no_lbfgs", "no_ls"}
    if bad:
        raise ValueError(f"unknown ablate flags {sorted(bad)}")
    is_fbe = algorithm == ALGORITHM_FBE
    if not is_fbe and algorithm != ALGORITHM_NAMA:
        raise ValueError(f"unknown quasi-Newton algorithm {algorithm}")
    n_cols = lbfgs_buffer_size + 1
    c = float(inv_step)
    step_c = float(step_size)
    t1c = float(inv_step * penalty_state)
    t2c = float(inv_step * penalty_safety)
    xs_up = float(xs_upper)
    f32 = jnp.float32
    MM = jax.lax.Precision.HIGHEST

    # ---------------- layout + sweeps (single-dev or sharded) --------
    if mesh is None:
        if consts is None:
            consts = stream.pack_stream_constants(fa)
        N, ns, nx, nu, nv, NSP, PX, PU, PV = consts["dims"]
        NG = NSP                           # global padded lane width
        axis = None
        bwd_a, fwd_a = make_stream_sweeps(consts, affine=True,
                                          interpret=interpret,
                                          precision=precision)
        bwd_l, fwd_l = make_stream_sweeps(consts, affine=False,
                                          interpret=interpret,
                                          precision=precision)
        cd_host = {k: consts[k] for k in
                   ("sq", "nhp", "rep", "cx1", "cx2", "cu", "bx_min",
                    "bx_max", "bx_s", "bu_min", "bu_max", "Bb", "LT",
                    "iW", "L", "B", "CpT", "BpT")}
        n_shards, nsl, NSLP = 1, ns, NSP
    else:
        from rapidnet_tpu.ops.pallas_stream_sharded import (
            make_sharded_sweeps, pack_stream_sharded)
        axis = mesh.axis_names[0]
        if interpret == "auto":
            # resolve from the MESH devices, not the default platform
            # (a CPU mesh under a TPU-default session must interpret)
            interpret = mesh.devices.flat[0].platform == "cpu"
        n_shards = int(np.prod(mesh.devices.shape))
        consts = pack_stream_sharded(fa, n_shards)
        N, ns, nx, nu, nv, NSLP, PX, PU, PV = consts["dims"]
        nsl = consts["nsl"]
        NG = n_shards * NSLP
        bwd_a, fwd_a = make_sharded_sweeps(consts, axis, affine=True,
                                           interpret=interpret,
                                           precision=precision)
        bwd_l, fwd_l = make_sharded_sweeps(consts, axis, affine=False,
                                           interpret=interpret,
                                           precision=precision)
        cd_host = {k: consts[k] for k in
                   ("sq", "nhp", "rep", "cx1", "cx2", "cu", "bx_min",
                    "bx_max", "bx_s", "bu_min", "bu_max", "Bb", "LT",
                    "iW", "L", "B", "LCpT", "LBpT", "XCpT", "XBpT")}
        for s, (CpT, BpT) in consts["xops_low"].items():
            cd_host[f"xlo_c{s}"] = CpT
            cd_host[f"xlo_b{s}"] = BpT

    W_pad = np.zeros((PU, PU), np.float32)
    W_pad[:nu, :nu] = np.asarray(fa["W"], np.float32)
    cd_host["W"] = W_pad
    if "umin_phys" in fa:
        umin00 = jnp.asarray(np.asarray(fa["umin_phys"]))
        umax00 = jnp.asarray(np.asarray(fa["umax_phys"]))
    else:
        umin00 = jnp.asarray(np.asarray(fa["umin"])[0, 0])
        umax00 = jnp.asarray(np.asarray(fa["umax"])[0, 0])

    # ---------------- global<->transposed layout converters ----------
    def to_t(a, Pd):
        """(N, ns, d) -> (N, Pd, NG) with per-shard lane padding."""
        a = jnp.asarray(a, f32)
        N_, ns_, d = a.shape
        a = a.reshape(N_, n_shards, nsl, d).transpose(0, 1, 3, 2)
        a = jnp.pad(a, ((0, 0), (0, 0), (0, Pd - d), (0, NSLP - nsl)))
        return a.transpose(0, 2, 1, 3).reshape(N_, Pd, NG)

    def from_t(a, d):
        N_ = a.shape[0]
        a = a.reshape(N_, a.shape[1], n_shards, NSLP)
        a = a[:, :d, :, :nsl].transpose(0, 2, 3, 1)
        return a.reshape(N_, ns, d)

    # ---------------- reductions (psum'd on a mesh) ----------------
    def _psum(x):
        return x if axis is None else lax.psum(x, axis)

    def mdot(a, b, rep):
        return _psum(jnp.sum(rep * a * b))

    def ddot(a, b, rep):
        return _psum(sum(jnp.sum(rep * a[k] * b[k]) for k in KEYS))

    def bounds(cd):
        sq = cd["sq"]                      # (N, 1, lanes)
        return {"lo1": cd["bx_min"] * sq, "hi1": cd["bx_max"] * sq,
                "lo2": cd["bx_s"] * sq,
                "lop": cd["bu_min"] * sq, "hip": cd["bu_max"] * sq}

    # ---------------- prox of g on transposed slabs ----------------
    def prox_t(cd, bd, prim, w):
        """proximalFunG (src/SmpcController.cu:759-835) in the
        transposed layout; identical op set/order to solve_step.prox_g."""
        rep = cd["rep"]
        pre1 = prim["y1"] + c * w["y1"]
        pre2 = prim["y2"] + c * w["y2"]
        prep = prim["yp"] + c * w["yp"]
        box1 = jnp.clip(pre1, bd["lo1"], bd["hi1"])
        box2 = jnp.clip(pre2, bd["lo2"], xs_up)
        diff1 = pre1 - box1
        diff2 = pre2 - box2
        dist1 = jnp.sqrt(mdot(diff1, diff1, rep))
        shrink1 = jnp.where(dist1 > t1c,
                            1.0 - t1c / jnp.maximum(dist1, 1e-30), 0.0)
        out1 = box1 + shrink1 * diff1
        dist2 = jnp.sqrt(mdot(diff2, diff2, rep))
        shrink2 = jnp.where(dist2 > t2c,
                            1.0 - t2c / jnp.maximum(dist2, 1e-30), 0.0)
        out2 = box2 + shrink2 * diff2
        outp = jnp.clip(prep, bd["lop"], bd["hip"])
        g1 = out1 - jnp.clip(out1, bd["lo1"], bd["hi1"])
        g2 = out2 - jnp.clip(out2, bd["lo2"], xs_up)
        gd1 = jnp.sqrt(mdot(g1, g1, rep))
        gd2 = jnp.sqrt(mdot(g2, g2, rep))
        value_g = (jnp.where(shrink1 > 0, penalty_state * gd1, 0.0) +
                   jnp.where(shrink2 > 0, penalty_safety * gd2, 0.0))
        return {"y1": out1, "y2": out2, "yp": outp}, value_g

    # ---------------- FBE value ----------------
    def value_fbe_t(cd, sp, w, u, res, value_g):
        """computeValueFbe (src/SmpcController.cu:1417-1476)."""
        rep = cd["rep"]
        val = ddot(w, res, rep) + 0.5 * step_c * ddot(res, res, rep)
        val = val + value_g
        du0 = u[0] - sp["prev_u_col"]           # (PU, lanes)
        du = jnp.concatenate([du0[None], u[1:] - u[:-1]], axis=0)
        Wdu = jnp.einsum("ij,njs->nis", cd["W"], du, precision=MM)
        p = cd["sq"] * cd["sq"]                 # node probability
        smooth = _psum(jnp.sum(rep * (p * du) * Wdu))
        econ = _psum(jnp.sum(rep * (p * u) * sp["alpha_t"]))
        return val + smooth + econ

    # ---------------- oracles ----------------
    def solve(cd, sp, w):
        v = bwd_a(cd, w["y1"], w["y2"], w["yp"], sp["beta"])
        x, u, p1, p2, pp = fwd_a(cd, v, sp["uhat"], sp["e"],
                                 sp["x0"], sp["pdu"])
        return {"v": v, "x": x, "u": u,
                "prim": {"y1": p1, "y2": p2, "yp": pp}}

    def linmap(cd, d):
        """Hessian oracle (src/SmpcController.cu:884-1055): the same
        recursion with the affine terms removed."""
        v = bwd_l(cd, d["y1"], d["y2"], d["yp"])
        x, u, p1, p2, pp = fwd_l(cd, v)
        return {"v": v, "x": x, "u": u,
                "prim": {"y1": p1, "y2": p2, "yp": pp}}

    # ---------------- L-BFGS (generalised keys) ----------------
    def lbfgs_update_and_direction(cd, lb, y, y_prev, yvec, yvec_prev):
        """updateLbfgsBuffer + twoLoopRecursionLbfgs
        (src/SmpcController.cu:1103-1232) — same scheme as
        quasi_newton.lbfgs_update_and_direction, transposed triple."""
        rep = cd["rep"]
        s = {k: y[k] - y_prev[k] for k in KEYS}
        yv = {k: yvec[k] - yvec_prev[k] for k in KEYS}
        norm_grad = jnp.sqrt(ddot(yvec, yvec, rep))
        inv_rho = ddot(s, yv, rep)
        norm_y2 = ddot(yv, yv, rep)
        norm_s2 = ddot(s, s, rep)

        norm_grad = jnp.where(norm_grad < 1.0, norm_grad ** 3, norm_grad)
        accept = inv_rho / jnp.maximum(norm_s2, 1e-30) > 1e-6 * norm_grad

        col_new = 1 + (lb["col"] % lbfgs_buffer_size)
        col = jnp.where(accept, col_new, lb["col"])
        mem = jnp.where(accept,
                        jnp.minimum(lb["mem"] + 1, lbfgs_buffer_size),
                        lb["mem"])
        mat_s = {k: jnp.where(accept,
                              lb["mat_s"][k].at[col_new].set(s[k]),
                              lb["mat_s"][k]) for k in KEYS}
        mat_y = {k: jnp.where(accept,
                              lb["mat_y"][k].at[col_new].set(yv[k]),
                              lb["mat_y"][k]) for k in KEYS}
        rho = jnp.where(accept,
                        lb["rho"].at[col_new].set(1.0 / inv_rho),
                        lb["rho"])
        skips = lb["skips"] + jnp.where(accept, 0, 1)
        gamma = inv_rho / jnp.maximum(norm_y2, 1e-30)
        hessian = jnp.where(
            (gamma < 0) | (jnp.abs(gamma - lb["hessian"]) == 0),
            1.0, gamma)

        d = {k: -yvec[k] for k in KEYS}

        def loop1(i, carry):
            d, alphas = carry
            icol = col - i
            icol = jnp.where(icol < 0, mem + icol, icol)
            sk = {k: mat_s[k][icol] for k in KEYS}
            yk = {k: mat_y[k][icol] for k in KEYS}
            a = rho[icol] * ddot(sk, d, rep)
            d = {k: d[k] - a * yk[k] for k in KEYS}
            return d, alphas.at[icol].set(a)

        d, alphas = lax.fori_loop(
            0, mem, loop1, (d, jnp.zeros((n_cols,), f32)))
        d = {k: hessian * d[k] for k in KEYS}

        def loop2(j, d):
            i = mem - j
            icol = col - i + 1
            icol = jnp.where(icol < 0, mem + icol, icol)
            sk = {k: mat_s[k][icol] for k in KEYS}
            yk = {k: mat_y[k][icol] for k in KEYS}
            b = rho[icol] * ddot(yk, d, rep)
            scale = alphas[icol] - b
            return {k: d[k] + scale * sk[k] for k in KEYS}

        d = lax.fori_loop(0, mem, loop2, d)
        lb_new = {"mat_s": mat_s, "mat_y": mat_y, "rho": rho,
                  "col": col, "mem": mem, "skips": skips,
                  "hessian": hessian}
        return lb_new, d

    # ---------------- line search ----------------
    def ls_apply(cd, bd, sp, state, w_dir, dirs, tau):
        x = state["x"] + tau * dirs["x"]
        u = state["u"] + tau * dirs["u"]
        w = _axpy(tau, w_dir, state["w"])
        prim = _axpy(tau, dirs["prim"], state["prim"])
        dual, value_g = prox_t(cd, bd, prim, w)
        res = {k: prim[k] - dual[k] for k in KEYS}
        val = value_fbe_t(cd, sp, w, u, res, value_g)
        return {"x": x, "u": u, "w": w, "prim": prim, "dual": dual,
                "res": res, "value_g": value_g}, val

    def tau_line_search(cd, bd, sp, state, w_dir, dirs, value_ref,
                        direction_value):
        """Cumulative backtracking tau loop
        (src/SmpcController.cu:1280-1315) — quasi_newton.tau_line_search
        verbatim on the transposed state.  On a mesh every compared
        scalar is a psum, so all shards branch identically."""

        def cond(carry):
            istep, tau, st, val = carry
            return istep < LS_MAX_STEPS + 1

        def body(carry):
            istep, tau, st, _ = carry
            st_new, val = ls_apply(cd, bd, sp, st, w_dir, dirs, tau)
            improved = val <= value_ref
            istep_new = jnp.where(improved, istep + 1,
                                  jnp.int32(LS_MAX_STEPS + 1))
            tau_base = jnp.where(istep_new == 1, jnp.float32(-1.0), tau)
            tau_new = jnp.where(
                improved & (istep_new < LS_MAX_STEPS),
                tau_base + 0.5 ** istep_new.astype(f32), tau)
            return istep_new, tau_new, st_new, val

        def run_ls(state):
            init = (jnp.int32(0), jnp.float32(1.0), state,
                    jnp.float32(0.0))
            _, tau, st, _ = lax.while_loop(cond, body, init)
            return st, jnp.abs(tau)

        positive = direction_value > 0
        tiny = jnp.abs(direction_value) < LS_TOLERANCE

        def no_ls(state):
            return state, jnp.where(positive, jnp.float32(1.0),
                                    jnp.float32(0.0))

        return lax.cond(positive | tiny, no_ls, run_ls, state)

    def fbe_line_search(cd, bd, sp, state, grad, lbfgs_dir, value_ref):
        """computeLineSearchLbfgsUpdate (src/SmpcController.cu:
        1250-1320)."""
        h = linmap(cd, lbfgs_dir)
        dirs = {"x": h["x"], "u": h["u"], "prim": h["prim"]}
        dval = ddot(grad, lbfgs_dir, cd["rep"])
        return tau_line_search(cd, bd, sp, state, lbfgs_dir, dirs,
                               value_ref, dval)

    def ame_line_search(cd, bd, sp, state, lbfgs_dir, value_ref):
        """computeLineSearchAmeLbfgsUpdate (src/SmpcController.cu:
        1326-1414): gradient step applied unconditionally, tau loop
        along d = lbfgsDir - step * res."""
        res = state["res"]
        dval = -ddot(res, lbfgs_dir, cd["rep"])
        hres = linmap(cd, res)
        st = dict(state)
        st["w"] = _axpy(step_c, res, state["w"])
        st["x"] = state["x"] + step_c * hres["x"]
        st["u"] = state["u"] + step_c * hres["u"]
        st["prim"] = _axpy(step_c, hres["prim"], state["prim"])
        comb = {k: lbfgs_dir[k] - step_c * res[k] for k in KEYS}
        hcomb = linmap(cd, comb)
        dirs = {"x": hcomb["x"], "u": hcomb["u"], "prim": hcomb["prim"]}
        return tau_line_search(cd, bd, sp, st, comb, dirs, value_ref,
                               dval)

    # ---------------- iteration ----------------
    def signed_champion(res):
        """signed_max_abs semantics (padded lanes are exactly zero);
        global on a mesh via pmax/pmin of the block extrema."""
        hi_x = jnp.maximum(jnp.max(res["y1"]), jnp.max(res["y2"]))
        lo_x = jnp.minimum(jnp.min(res["y1"]), jnp.min(res["y2"]))
        hi_p = jnp.max(res["yp"])
        lo_p = jnp.min(res["yp"])
        if axis is not None:
            hi_x = lax.pmax(hi_x, axis)
            lo_x = lax.pmin(lo_x, axis)
            hi_p = lax.pmax(hi_p, axis)
            lo_p = lax.pmin(lo_p, axis)
        vx = jnp.where(hi_x > -lo_x, hi_x, lo_x)
        vp = jnp.where(hi_p > -lo_p, hi_p, lo_p)
        return jnp.maximum(vx, vp)

    def one_iteration(cd, bd, sp, carry, it):
        w = carry["w"]
        sol = solve(cd, sp, w)
        prim = sol["prim"]
        if "sweeps_only" in ablate:   # timing floor: 3 sweep pairs
            h1 = linmap(cd, prim)
            h2 = linmap(cd, h1["prim"])
            y_new = _axpy(step_c, h2["prim"], w)
            new_carry = dict(carry)
            new_carry.update(y=y_new, y_prev=carry["y"], w=y_new,
                             x=sol["x"], u=sol["u"], v=sol["v"])
            return new_carry, (jnp.float32(0.0), jnp.float32(0.0),
                               jnp.float32(0.0))
        dual, value_g = prox_t(cd, bd, prim, w)
        res = {k: prim[k] - dual[k] for k in KEYS}

        if is_fbe:
            hdir = linmap(cd, {k: -res[k] for k in KEYS})
            yvec = _axpy(step_c, hdir["prim"],
                         {k: -res[k] for k in KEYS})
        else:
            yvec = {k: -res[k] for k in KEYS}

        state = {"x": sol["x"], "u": sol["u"], "w": w, "prim": prim,
                 "dual": dual, "res": res, "value_g": value_g}

        def with_qn(args):
            state, lb = args
            value = value_fbe_t(cd, sp, state["w"], state["u"],
                                state["res"], state["value_g"])
            if "no_lbfgs" in ablate:
                lb_new, lbfgs_dir = lb, {k: -yvec[k] for k in KEYS}
            else:
                lb_new, lbfgs_dir = lbfgs_update_and_direction(
                    cd, lb, carry["y"], carry["y_prev"], yvec,
                    carry["yvec_prev"])
            if "no_ls" in ablate:
                h = linmap(cd, lbfgs_dir)
                dirs = {"x": h["x"], "u": h["u"], "prim": h["prim"]}
                st, _ = ls_apply(cd, bd, sp, state, lbfgs_dir, dirs,
                                 jnp.float32(1.0))
                tau = jnp.float32(1.0)
            elif is_fbe:
                st, tau = fbe_line_search(cd, bd, sp, state, yvec,
                                          lbfgs_dir, value)
            else:
                st, tau = ame_line_search(cd, bd, sp, state, lbfgs_dir,
                                          value)
            return st, lb_new, tau, value

        def without_qn(args):
            state, lb = args
            return state, lb, jnp.float32(0.0), jnp.float32(0.0)

        if "no_qn" in ablate:
            state, lb, tau, value = without_qn((state, carry["lbfgs"]))
        else:
            state, lb, tau, value = lax.cond(
                it > 0, with_qn, without_qn, (state, carry["lbfgs"]))

        y_new = _axpy(step_c, state["res"], state["w"])
        infeas = signed_champion(state["res"])
        new_carry = {
            "y": y_new, "y_prev": carry["y"], "yvec_prev": yvec,
            "w": y_new, "lbfgs": lb,
            "x": state["x"], "u": state["u"], "v": sol["v"],
        }
        return new_carry, (infeas, value, tau)

    def zero_triple(lanes):
        return {"y1": jnp.zeros((N, PX, lanes), f32),
                "y2": jnp.zeros((N, PX, lanes), f32),
                "yp": jnp.zeros((N, PU, lanes), f32)}

    def init_carry(y0, lanes):
        zero = zero_triple(lanes)
        if y0 is None:
            y0 = zero
        lb0 = {
            "mat_s": {k: jnp.zeros((n_cols,) + zero[k].shape, f32)
                      for k in KEYS},
            "mat_y": {k: jnp.zeros((n_cols,) + zero[k].shape, f32)
                      for k in KEYS},
            "rho": jnp.zeros((n_cols,), f32),
            "col": jnp.int32(0), "mem": jnp.int32(0),
            "skips": jnp.int32(0), "hessian": jnp.float32(1.0),
        }
        return {"y": y0, "y_prev": y0, "yvec_prev": zero,
                "w": y0, "lbfgs": lb0,
                "x": jnp.zeros((N, PX, lanes), f32),
                "u": jnp.zeros((N, PU, lanes), f32),
                "v": jnp.zeros((N, PV, lanes), f32)}

    def solve_body(cd, sp, y0):
        """The full iteration loop on (per-shard, if meshed) slabs."""
        bd = bounds(cd)
        lanes = cd["sq"].shape[-1]
        carry = init_carry(y0, lanes)

        def body(carry, it):
            return one_iteration(cd, bd, sp, carry, it)

        carry, (infeas, values, taus) = lax.scan(
            body, carry, jnp.arange(max_iterations))
        u0 = carry["u"][0, :, 0]
        if axis is not None:
            u0 = jnp.where(lax.axis_index(axis) == 0, u0,
                           jnp.zeros_like(u0))
            u0 = lax.psum(u0, axis)
        return {"x": carry["x"], "u": carry["u"], "v": carry["v"],
                "y1": carry["y"]["y1"], "y2": carry["y"]["y2"],
                "yp": carry["y"]["yp"], "control": u0,
                "infeas": infeas, "values": values, "taus": taus}

    if mesh is not None:
        def cd_spec(k, v):
            if k in ("sq", "nhp", "rep"):
                return P(None, None, axis)
            if k in ("LCpT", "LBpT", "XCpT", "XBpT") or \
                    k.startswith("xlo_"):
                return P(axis, *([None] * (np.asarray(v).ndim - 1)))
            return P()

        cd_specs = {k: cd_spec(k, v) for k, v in cd_host.items()}
        slab = P(None, None, axis)
        sp_specs = {"beta": slab, "uhat": slab, "e": slab,
                    "alpha_t": slab, "x0": P(), "pdu": P(),
                    "prev_u_col": P()}
        y_specs = {k: slab for k in KEYS}
        out_specs = {"x": slab, "u": slab, "v": slab,
                     "y1": slab, "y2": slab, "yp": slab,
                     "control": P(), "infeas": P(), "values": P(),
                     "taus": P()}

        def body_shard(cd, sp, y0):
            cd = dict(cd)
            for k in list(cd):
                if k in ("LCpT", "LBpT", "XCpT", "XBpT") or \
                        k.startswith("xlo_"):
                    cd[k] = cd[k][0]
            return solve_body(cd, sp, y0)

        fn = shard_map(body_shard, mesh=mesh,
                       in_specs=(cd_specs, sp_specs, y_specs),
                       out_specs=out_specs, check_vma=False)
    else:
        fn = solve_body

    cd_dev = {k: jnp.asarray(v) for k, v in cd_host.items()}

    @jax.jit
    def run_impl(cd, step_in, y0):
        sp = {"beta": to_t(step_in["beta"], PV),
              "uhat": to_t(step_in["uhat"], PU),
              "e": to_t(step_in["e"], PX),
              "alpha_t": to_t(step_in["alpha_price"], PU),
              "x0": jnp.pad(jnp.asarray(step_in["x0"], f32),
                            (0, PX - nx))[:, None],
              "pdu": jnp.pad(jnp.asarray(step_in["prev_u"], f32) -
                             jnp.asarray(step_in["prev_uhat"], f32),
                             (0, PU - nu))[:, None],
              "prev_u_col": jnp.pad(
                  jnp.asarray(step_in["prev_u"], f32),
                  (0, PU - nu))[:, None]}
        out = fn(cd, sp, y0)
        u0 = out["control"][:nu]
        if project_control:
            u0 = jnp.clip(u0, umin00, umax00)
        xi = jnp.concatenate([from_t(out["y1"], nx),
                              from_t(out["y2"], nx)], axis=-1)
        return {
            "control": u0,
            "x": from_t(out["x"], nx),
            "u": from_t(out["u"], nu),
            "v": from_t(out["v"], nv),
            "y": {"xi": xi, "psi": from_t(out["yp"], nu)},
            "primal_infeasibility": out["infeas"],
            "value_fbe": out["values"], "tau": out["taus"],
            "iterations": jnp.int32(max_iterations),
        }

    def run(step_in, y0=None):
        if y0 is not None:
            xi = jnp.asarray(y0["xi"], f32)
            y0 = {"y1": to_t(xi[..., :nx], PX),
                  "y2": to_t(xi[..., nx:], PX),
                  "yp": to_t(jnp.asarray(y0["psi"], f32), PU)}
        else:
            y0 = {"y1": jnp.zeros((N, PX, NG), f32),
                  "y2": jnp.zeros((N, PX, NG), f32),
                  "yp": jnp.zeros((N, PU, NG), f32)}
        return run_impl(cd_dev, step_in, y0)

    return run
