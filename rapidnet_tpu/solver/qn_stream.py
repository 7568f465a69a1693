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

Same iteration semantics as solver/quasi_newton.make_solver (the
golden-tested implementation); fixed iteration budget only — use the
XLA path for tolerance-based early exit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rapidnet_tpu.model.config import ALGORITHM_FBE, ALGORITHM_NAMA
from rapidnet_tpu.ops import pallas_stream as stream
from rapidnet_tpu.ops.pallas_stream_qn import make_stream_sweeps
from rapidnet_tpu.solver.quasi_newton import LS_MAX_STEPS, LS_TOLERANCE

KEYS = ("y1", "y2", "yp")      # transposed dual triple


def _mdot(a, b, rep):
    """Masked slab dot: rep is (N, 1, NSP), each node counted once."""
    return jnp.sum(rep * a * b)


def _ddot(a, b, rep):
    return sum(_mdot(a[k], b[k], rep) for k in KEYS)


def _axpy(a, x, y):
    return {k: y[k] + a * x[k] for k in KEYS}


def make_qn_stream(fa: dict, *, algorithm: str, inv_step: float,
                   step_size: float, penalty_state: float,
                   penalty_safety: float, xs_upper: float,
                   max_iterations: int, lbfgs_buffer_size: int,
                   project_control: bool = True,
                   interpret: bool | str = "auto",
                   precision: str | lax.Precision =
                       lax.Precision.HIGHEST):
    """Build the streaming FBE/NAMA solve: run(step, y0=None) -> outputs.

    Output contract matches quasi_newton.make_solver (control, x, u, v,
    y{xi,psi}, primal_infeasibility, value_fbe, tau, iterations).
    """
    is_fbe = algorithm == ALGORITHM_FBE
    if not is_fbe and algorithm != ALGORITHM_NAMA:
        raise ValueError(f"unknown quasi-Newton algorithm {algorithm}")
    consts = stream.pack_stream_constants(fa)
    N, ns, nx, nu, nv, NSP, PX, PU, PV = consts["dims"]
    n_cols = lbfgs_buffer_size + 1
    c = float(inv_step)
    step_c = float(step_size)
    t1c = float(inv_step * penalty_state)
    t2c = float(inv_step * penalty_safety)
    xs_up = float(xs_upper)
    f32 = jnp.float32
    MM = jax.lax.Precision.HIGHEST

    bwd_a, fwd_a = make_stream_sweeps(consts, affine=True,
                                      interpret=interpret,
                                      precision=precision)
    bwd_l, fwd_l = make_stream_sweeps(consts, affine=False,
                                      interpret=interpret,
                                      precision=precision)

    cd = {k: jnp.asarray(consts[k]) for k in
          ("sq", "nhp", "rep", "cx1", "cx2", "cu", "bx_min", "bx_max",
           "bx_s", "bu_min", "bu_max", "Bb", "LT", "iW", "L", "B",
           "CpT", "BpT")}
    W_pad = np.zeros((PU, PU), np.float32)
    W_np = np.asarray(fa["W"], np.float32)
    W_pad[:nu, :nu] = W_np
    cd["W"] = jnp.asarray(W_pad)
    if "umin_phys" in fa:
        umin00 = jnp.asarray(np.asarray(fa["umin_phys"]))
        umax00 = jnp.asarray(np.asarray(fa["umax_phys"]))
    else:
        umin00 = jnp.asarray(np.asarray(fa["umin"])[0, 0])
        umax00 = jnp.asarray(np.asarray(fa["umax"])[0, 0])

    def bounds(cd):
        sq = cd["sq"]                      # (N, 1, NSP)
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
        dist1 = jnp.sqrt(_mdot(diff1, diff1, rep))
        shrink1 = jnp.where(dist1 > t1c,
                            1.0 - t1c / jnp.maximum(dist1, 1e-30), 0.0)
        out1 = box1 + shrink1 * diff1
        dist2 = jnp.sqrt(_mdot(diff2, diff2, rep))
        shrink2 = jnp.where(dist2 > t2c,
                            1.0 - t2c / jnp.maximum(dist2, 1e-30), 0.0)
        out2 = box2 + shrink2 * diff2
        outp = jnp.clip(prep, bd["lop"], bd["hip"])
        g1 = out1 - jnp.clip(out1, bd["lo1"], bd["hi1"])
        g2 = out2 - jnp.clip(out2, bd["lo2"], xs_up)
        gd1 = jnp.sqrt(_mdot(g1, g1, rep))
        gd2 = jnp.sqrt(_mdot(g2, g2, rep))
        value_g = (jnp.where(shrink1 > 0, penalty_state * gd1, 0.0) +
                   jnp.where(shrink2 > 0, penalty_safety * gd2, 0.0))
        return {"y1": out1, "y2": out2, "yp": outp}, value_g

    # ---------------- FBE value ----------------
    def value_fbe_t(cd, sp, w, u, res, value_g):
        """computeValueFbe (src/SmpcController.cu:1417-1476)."""
        rep = cd["rep"]
        val = _ddot(w, res, rep) + 0.5 * step_c * _ddot(res, res, rep)
        val = val + value_g
        du0 = u[0] - sp["prev_u_col"]           # (PU, NSP)
        du = jnp.concatenate([du0[None], u[1:] - u[:-1]], axis=0)
        Wdu = jnp.einsum("ij,njs->nis", cd["W"], du, precision=MM)
        p = cd["sq"] * cd["sq"]                 # node probability
        smooth = jnp.sum(rep * (p * du) * Wdu)
        econ = jnp.sum(rep * (p * u) * sp["alpha_t"])
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
        norm_grad = jnp.sqrt(_ddot(yvec, yvec, rep))
        inv_rho = _ddot(s, yv, rep)
        norm_y2 = _ddot(yv, yv, rep)
        norm_s2 = _ddot(s, s, rep)

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
            a = rho[icol] * _ddot(sk, d, rep)
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
            b = rho[icol] * _ddot(yk, d, rep)
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
        verbatim on the transposed state."""

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
        dval = _ddot(grad, lbfgs_dir, cd["rep"])
        return tau_line_search(cd, bd, sp, state, lbfgs_dir, dirs,
                               value_ref, dval)

    def ame_line_search(cd, bd, sp, state, lbfgs_dir, value_ref):
        """computeLineSearchAmeLbfgsUpdate (src/SmpcController.cu:
        1326-1414): gradient step applied unconditionally, tau loop
        along d = lbfgsDir - step * res."""
        res = state["res"]
        dval = -_ddot(res, lbfgs_dir, cd["rep"])
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
    def one_iteration(cd, bd, sp, carry, it):
        w = carry["w"]
        sol = solve(cd, sp, w)
        prim = sol["prim"]
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
            lb_new, lbfgs_dir = lbfgs_update_and_direction(
                cd, lb, carry["y"], carry["y_prev"], yvec,
                carry["yvec_prev"])
            if is_fbe:
                st, tau = fbe_line_search(cd, bd, sp, state, yvec,
                                          lbfgs_dir, value)
            else:
                st, tau = ame_line_search(cd, bd, sp, state, lbfgs_dir,
                                          value)
            return st, lb_new, tau, value

        def without_qn(args):
            state, lb = args
            return state, lb, jnp.float32(0.0), jnp.float32(0.0)

        state, lb, tau, value = lax.cond(
            it > 0, with_qn, without_qn, (state, carry["lbfgs"]))

        y_new = _axpy(step_c, state["res"], state["w"])
        # signed infeasibility champion (signed_max_abs semantics —
        # padded lanes are exactly zero, so they never win the argmax)
        fx = jnp.concatenate([state["res"]["y1"].reshape(-1),
                              state["res"]["y2"].reshape(-1)])
        fp = state["res"]["yp"].reshape(-1)
        vx = fx[jnp.argmax(jnp.abs(fx))]
        vp = fp[jnp.argmax(jnp.abs(fp))]
        infeas = jnp.maximum(vx, vp)
        new_carry = {
            "y": y_new, "y_prev": carry["y"], "yvec_prev": yvec,
            "w": y_new, "lbfgs": lb,
            "x": state["x"], "u": state["u"], "v": sol["v"],
        }
        return new_carry, (infeas, value, tau)

    def zero_triple():
        return {"y1": jnp.zeros((N, PX, NSP), f32),
                "y2": jnp.zeros((N, PX, NSP), f32),
                "yp": jnp.zeros((N, PU, NSP), f32)}

    def init_carry(y0):
        zero = zero_triple()
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
                "x": jnp.zeros((N, PX, NSP), f32),
                "u": jnp.zeros((N, PU, NSP), f32),
                "v": jnp.zeros((N, PV, NSP), f32)}

    @jax.jit
    def run_impl(cd, step_in, y0):
        sp = stream.pack_stream_step(step_in, consts["dims"])
        sp["alpha_t"] = stream._to_t(step_in["alpha_price"], NSP, PU)
        sp["prev_u_col"] = jnp.pad(
            jnp.asarray(step_in["prev_u"], f32), (0, PU - nu))[:, None]
        bd = bounds(cd)
        carry = init_carry(y0)

        def body(carry, it):
            return one_iteration(cd, bd, sp, carry, it)

        carry, (infeas, values, taus) = lax.scan(
            body, carry, jnp.arange(max_iterations))

        u0 = carry["u"][0, :nu, 0]
        if project_control:
            u0 = jnp.clip(u0, umin00, umax00)
        xi = jnp.concatenate(
            [stream._from_t(carry["y"]["y1"], ns, nx),
             stream._from_t(carry["y"]["y2"], ns, nx)], axis=-1)
        return {
            "control": u0,
            "x": stream._from_t(carry["x"], ns, nx),
            "u": stream._from_t(carry["u"], ns, nu),
            "v": stream._from_t(carry["v"], ns, nv),
            "y": {"xi": xi,
                  "psi": stream._from_t(carry["y"]["yp"], ns, nu)},
            "primal_infeasibility": infeas,
            "value_fbe": values, "tau": taus,
            "iterations": jnp.int32(max_iterations),
        }

    def run(step_in, y0=None):
        if y0 is not None:
            xi = jnp.asarray(y0["xi"], f32)
            y0 = {"y1": stream._to_t(xi[..., :nx], NSP, PX),
                  "y2": stream._to_t(xi[..., nx:], NSP, PX),
                  "yp": stream._to_t(jnp.asarray(y0["psi"], f32),
                                     NSP, PU)}
        return run_impl(cd, step_in, y0)

    return run
