"""Fused Pallas kernel: the ENTIRE global-FBE / NAMA solve in one kernel.

Reference counterpart: ``algorithmGlobalFbe`` / ``algorithmNama``
(src/SmpcController.cu:1529-1586) — per iteration the reference issues
three full tree recursions (solve step + two Hessian-oracle sweeps,
src/SmpcController.cu:884-1055), an L-BFGS buffer update + two-loop
recursion (:1103-1232), and a host-driven backtracking line search
whose every trial syncs norms to the CPU (:1250-1414).

Here the complete quasi-Newton iteration loop runs as ONE
``pallas_call``: duals, L-BFGS curvature buffers and all sweep scratch
are VMEM-resident for the whole solve; the line search runs as a
masked, fully on-chip trial loop (same replace-style semantics as the
XLA ``lax.while_loop`` path in solver/quasi_newton.py — converged
solves simply apply zero increments).

Layout and padding follow ops/pallas_apg.py (fan layout flattened to
(N*NSP, P) slabs, 128-lane padding, zero pads preserved by every
recursion; all reductions are rep-masked so padding never leaks into
the dots/norms).  Three extra constants feed the FBE value function:
``rep_u`` (node-dedup mask at control width), ``rpp_u``
(rep * node probability) and the padded smoothing cost ``WT``.

Use for single-device FBE/NAMA solves whose padded working set —
including the (buffer_size+1)-column L-BFGS curvature pairs — fits
VMEM (``fits_vmem_qn``); the XLA path remains the general / sharded /
early-termination fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rapidnet_tpu.model.config import ALGORITHM_FBE, ALGORITHM_NAMA
from rapidnet_tpu.ops.pallas_apg import (CONST_NAMES, LANE, STEP_NAMES,
                                         _fan, _pad_to, pad_axis,
                                         pad_constants, pad_step,
                                         vmem_bytes)
from rapidnet_tpu.solver.quasi_newton import LS_MAX_STEPS, LS_TOLERANCE

QN_CONST_NAMES = CONST_NAMES + ("rep_u", "rpp_u", "WT")
QN_STEP_NAMES = STEP_NAMES + ("alpha", "pu")


def pad_qn_constants(fa: dict) -> dict:
    """APG constants + the FBE-value extras (host side, once)."""
    out = pad_constants(fa)
    N, ns, nx, nu, nv, NSP, PX, PU, PV = out["dims"]
    rep = np.asarray(fa["rep"], np.float32)[..., None]
    prob = np.asarray(fa["prob"], np.float32)
    out["rep_u"] = _fan(np.broadcast_to(rep, (N, ns, nu)), NSP, PU)
    out["rpp_u"] = _fan(np.broadcast_to(rep * prob, (N, ns, nu)), NSP, PU)
    W = np.asarray(fa["W"], np.float32)
    out["WT"] = pad_axis(pad_axis(W.T, PU, 0), PU, 1)
    return out


def pad_qn_step(step: dict, dims) -> dict:
    """APG step slabs + alpha price + previous control (jit-traceable)."""
    N, ns, nx, nu, nv, NSP, PX, PU, PV = dims
    out = pad_step(step, dims)
    a = jnp.asarray(step["alpha_price"], jnp.float32)
    a = jnp.pad(a, ((0, 0), (0, NSP - a.shape[1]), (0, PU - a.shape[2])))
    out["alpha"] = a.reshape(-1, PU)
    pu = jnp.asarray(step["prev_u"], jnp.float32)[None]
    out["pu"] = jnp.pad(pu, ((0, 0), (0, PU - pu.shape[1])))
    return out


def vmem_bytes_qn(consts: dict, lbfgs_buffer_size: int) -> int:
    """Padded working-set estimate for the fused QN kernel."""
    total = vmem_bytes(consts)
    N, ns, nx, nu, nv, NSP, PX, PU, PV = consts["dims"]
    nr = N * NSP
    triple = nr * (2 * PX + PU) * 4
    total += 6 * triple                         # yp/yvp/lsw/rs/yv/dd/wd…
    total += nr * (2 * PX + PU) * 4             # wd
    total += nr * (PX + PU) * 4                 # hx, hu
    total += 2 * (lbfgs_buffer_size + 1) * triple   # mat_s + mat_y
    total += nr * 2 * PU * 4                    # rep_u, rpp_u, alpha
    return total


def fits_vmem_qn(consts: dict, lbfgs_buffer_size: int,
                 budget: int = 100 * 1024 * 1024) -> bool:
    return vmem_bytes_qn(consts, lbfgs_buffer_size) <= budget


def make_pallas_qn_solve(consts: dict, *, algorithm, inv_step, step_size,
                         penalty_state, penalty_safety, xs_upper,
                         max_iterations, lbfgs_buffer_size,
                         interpret: bool = False,
                         tolerance: float | None = None,
                         lbfgs_dtype=None):
    """Build the fused whole-solve FBE/NAMA kernel.

    Returns solve(const_arrays, step_padded, y0_tuple) ->
    (y_xi1, y_xi2, y_psi, x, u, infeas, value_fbe, tau, iterations).
    ``tolerance``: in-kernel early termination on the true residual
    magnitude (max_abs_residual semantics) with zero-padded traces and
    the actual iteration count returned — the XLA path's tolerance
    contract, no host sync (cf. pallas_apg.make_pallas_solve).
    """
    is_fbe = algorithm == ALGORITHM_FBE
    if not is_fbe and algorithm != ALGORITHM_NAMA:
        raise ValueError(f"unknown quasi-Newton algorithm {algorithm}")
    dims = consts["dims"]
    N, ns, nx, nu, nv, NSP, PX, PU, PV = dims
    NR = N * NSP
    prefix_stages = consts["prefix_stages"]
    fp = prefix_stages[0] + 1 if prefix_stages else 0
    tail = N - fp
    bs = int(lbfgs_buffer_size)
    n_cols = bs + 1
    c = float(inv_step)
    step_size = float(step_size)
    t1c = float(inv_step * penalty_state)
    t2c = float(inv_step * penalty_safety)
    pstate = float(penalty_state)
    psafety = float(penalty_safety)
    xs_upper = float(xs_upper)
    f32 = jnp.float32
    nb = lbfgs_dtype or jnp.float32   # L-BFGS history storage dtype

    def row(s):
        return pl.ds(s * NSP, NSP)

    def kernel(d1, d2, g, nhp, rep_x, xmin, xmax, xs, umin, umax,
               BbT, Lm, iWT, LT, BT, Cs, rep_u, rpp_u, WT,
               beta, uhat, e, x0, pdu, alpha, pu,
               y0x1, y0x2, y0ps,
               o_yx1, o_yx2, o_yps, o_x, o_u, o_inf, o_val, o_tau,
               o_it,
               ypx1, ypx2, ypps, yvp1, yvp2, yvpp,
               lsw1, lsw2, lswp, rs1, rs2, rsp, yv1, yv2, yvq,
               dd1, dd2, ddp, wd1, wd2, wdp, hx, hu,
               t_s, a_s, v_s, du_s, xa_s,
               ms1, ms2, msp, my1, my2, myp,
               rho_r, alpha_r, val_r):

        def dot(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=lax.Precision.HIGHEST)

        def dot3(a1, a2, ap, b1, b2, bp):
            """Dual-space inner product, rep-masked (each node once)."""
            return (jnp.sum(rep_x[...] * a1 * b1) +
                    jnp.sum(rep_x[...] * a2 * b2) +
                    jnp.sum(rep_u[...] * ap * bp))

        def sweep(in1, in2, inp, out_x, out_u, affine):
            """The solve-step recursion (affine=True) or the Hessian
            oracle (affine=False: all affine terms zero) — identical
            structure to the APG kernel's backward/forward sweeps."""
            t_s[...] = d1[...] * in1[...] + d2[...] * in2[...]
            gw = dot(g[...] * inp[...], Lm[...])
            a_s[...] = beta[...] + gw if affine else gw

            def cums_t(i, _):
                s = N - 2 - i
                t_s[row(s)] = t_s[row(s)] + t_s[row(s + 1)]
                return 0

            lax.fori_loop(0, max(tail - 1, 0), cums_t, 0)
            a_s[...] = a_s[...] + dot(t_s[...], BbT[...])

            def cums_a(i, _):
                s = N - 2 - i
                a_s[row(s)] = a_s[row(s)] + a_s[row(s + 1)]
                return 0

            lax.fori_loop(0, max(tail - 1, 0), cums_a, 0)
            v_s[...] = nhp[...] * dot(a_s[...], iWT[...])

            if fp > 0:
                if tail > 0:
                    q = t_s[row(fp)]
                    r = a_s[row(fp)]
                else:
                    q = jnp.zeros((NSP, PX), f32)
                    r = jnp.zeros((NSP, PV), f32)
                for s in range(fp - 1, -1, -1):
                    t = (d1[row(s)] * in1[row(s)] +
                         d2[row(s)] * in2[row(s)] + q)
                    inner = (r + dot(t, BbT[...]) +
                             dot(g[row(s)] * inp[row(s)], Lm[...]))
                    if affine:
                        inner = beta[row(s)] + inner
                    v_s[row(s)] = nhp[row(s)] * dot(inner, iWT[...])
                    q, r = t, inner
                    if s > 0 and s in prefix_stages:
                        C = Cs[prefix_stages.index(s)]
                        q = dot(C, q)
                        r = dot(C, r)

            du_s[...] = dot(v_s[...], LT[...])

            def cums_du(s, _):
                du_s[row(s)] = du_s[row(s)] + du_s[row(s - 1)]
                return 0

            lax.fori_loop(1, N, cums_du, 0)
            if affine:
                out_u[...] = uhat[...] + du_s[...] + pdu[...]
                xa_s[...] = e[...] + dot(out_u[...], BT[...])
            else:
                out_u[...] = du_s[...]
                xa_s[...] = dot(out_u[...], BT[...])

            def cums_x(s, _):
                xa_s[row(s)] = xa_s[row(s)] + xa_s[row(s - 1)]
                return 0

            lax.fori_loop(1, N, cums_x, 0)
            out_x[...] = xa_s[...] + x0[...] if affine else xa_s[...]

        def prox_pieces(x, u, w1, w2, wp):
            """Re-associated prox of g: residuals + value-g pieces.

            With pre = prim + c*w and diff = pre - box, the prox output
            is box + k*diff, so res = (1-k)*diff - c*w and the g-value
            distance of the post-prox point is k*||diff|| (see
            solver/solve_step.py prox_g, src/SmpcController.cu:759-835).
            """
            pre1 = d1[...] * x + c * w1
            df1 = pre1 - jnp.clip(pre1, xmin[...], xmax[...])
            pre2 = d2[...] * x + c * w2
            df2 = pre2 - jnp.clip(pre2, xs[...], xs_upper)
            prep = g[...] * u + c * wp
            dfp = prep - jnp.clip(prep, umin[...], umax[...])
            dist1 = jnp.sqrt(jnp.sum(rep_x[...] * df1 * df1))
            dist2 = jnp.sqrt(jnp.sum(rep_x[...] * df2 * df2))
            k1 = jnp.where(dist1 > t1c,
                           1.0 - t1c / jnp.maximum(dist1, 1e-30), 0.0)
            k2 = jnp.where(dist2 > t2c,
                           1.0 - t2c / jnp.maximum(dist2, 1e-30), 0.0)
            r1 = (1.0 - k1) * df1 - c * w1
            r2 = (1.0 - k2) * df2 - c * w2
            rp = dfp - c * wp
            vg = (jnp.where(k1 > 0, pstate * k1 * dist1, 0.0) +
                  jnp.where(k2 > 0, psafety * k2 * dist2, 0.0))
            return r1, r2, rp, vg

        def fbe_value(w1, w2, wp, r1, r2, rp, u, vg):
            """computeValueFbe (src/SmpcController.cu:1417-1476)."""
            val = dot3(w1, w2, wp, r1, r2, rp)
            val = val + 0.5 * step_size * dot3(r1, r2, rp, r1, r2, rp)
            ushift = jnp.concatenate(
                [jnp.broadcast_to(pu[...], (NSP, PU)), u[:NR - NSP]],
                axis=0)
            du = u - ushift
            wdu = dot(du, WT[...])
            val = val + jnp.sum(rpp_u[...] * du * wdu)
            val = val + jnp.sum(rpp_u[...] * u * alpha[...])
            return val + vg

        def signed_maxabs(a):
            hi = jnp.max(a)
            lo = jnp.min(a)
            return jnp.where(hi > -lo, hi, lo)

        def upd(best, cand):
            babs, bval = best
            cval = signed_maxabs(cand)
            cabs = jnp.abs(cval)
            return (jnp.maximum(babs, cabs),
                    jnp.where(cabs > babs, cval, bval))

        # ---- init: y = y_prev = y0; yvec_prev = 0; L-BFGS empty ----
        o_yx1[...] = y0x1[...]
        o_yx2[...] = y0x2[...]
        o_yps[...] = y0ps[...]
        ypx1[...] = y0x1[...]
        ypx2[...] = y0x2[...]
        ypps[...] = y0ps[...]
        yvp1[...] = jnp.zeros((NR, PX), f32)
        yvp2[...] = jnp.zeros((NR, PX), f32)
        yvpp[...] = jnp.zeros((NR, PU), f32)
        # column 0 of the curvature buffers stays zero (the reference's
        # zero-initialised memory quirk, solver/quasi_newton.py doc);
        # scratch is uninitialised, so zero it explicitly
        ms1[pl.ds(0, NR)] = jnp.zeros((NR, PX), nb)
        ms2[pl.ds(0, NR)] = jnp.zeros((NR, PX), nb)
        msp[pl.ds(0, NR)] = jnp.zeros((NR, PU), nb)
        my1[pl.ds(0, NR)] = jnp.zeros((NR, PX), nb)
        my2[pl.ds(0, NR)] = jnp.zeros((NR, PX), nb)
        myp[pl.ds(0, NR)] = jnp.zeros((NR, PU), nb)
        for i in range(n_cols):
            rho_r[i] = f32(0.0)
            alpha_r[i] = f32(0.0)
        val_r[0] = f32(0.0)

        def iteration(it, carry):
            col, mem, skips, hess = carry
            qn_on = it > 0

            # ---- solve step at w (== carry y) ----
            lsw1[...] = o_yx1[...]
            lsw2[...] = o_yx2[...]
            lswp[...] = o_yps[...]
            sweep(o_yx1, o_yx2, o_yps, o_x, o_u, affine=True)
            r1, r2, rp, vg = prox_pieces(o_x[...], o_u[...],
                                         lsw1[...], lsw2[...], lswp[...])
            rs1[...] = r1
            rs2[...] = r2
            rsp[...] = rp

            # ---- yvec ----
            if is_fbe:
                # oracle is linear: oracle(-res) = -oracle(res), so
                # yvec = -res + step*oracle(-res) = -(res + step*H(res))
                sweep(rs1, rs2, rsp, hx, hu, affine=False)
                yv1[...] = -(rs1[...] + step_size * d1[...] * hx[...])
                yv2[...] = -(rs2[...] + step_size * d2[...] * hx[...])
                yvq[...] = -(rsp[...] + step_size * g[...] * hu[...])
            else:
                yv1[...] = -rs1[...]
                yv2[...] = -rs2[...]
                yvq[...] = -rsp[...]

            # ---- FBE value at the pre-line-search state ----
            value_ref = fbe_value(lsw1[...], lsw2[...], lswp[...],
                                  rs1[...], rs2[...], rsp[...],
                                  o_u[...], vg)

            # ---- L-BFGS buffer update (updateLbfgsBuffer,
            # src/SmpcController.cu:1103-1177) ----
            s1 = (o_yx1[...] - ypx1[...]).astype(nb).astype(f32)
            s2 = (o_yx2[...] - ypx2[...]).astype(nb).astype(f32)
            sp = (o_yps[...] - ypps[...]).astype(nb).astype(f32)
            yd1 = (yv1[...] - yvp1[...]).astype(nb).astype(f32)
            yd2 = (yv2[...] - yvp2[...]).astype(nb).astype(f32)
            ydp = (yvq[...] - yvpp[...]).astype(nb).astype(f32)
            norm_grad = jnp.sqrt(dot3(yv1[...], yv2[...], yvq[...],
                                      yv1[...], yv2[...], yvq[...]))
            inv_rho = dot3(s1, s2, sp, yd1, yd2, ydp)
            norm_y2 = dot3(yd1, yd2, ydp, yd1, yd2, ydp)
            norm_s2 = dot3(s1, s2, sp, s1, s2, sp)
            norm_grad = jnp.where(norm_grad < 1.0, norm_grad ** 3,
                                  norm_grad)
            accept = qn_on & (inv_rho / jnp.maximum(norm_s2, 1e-30) >
                              1e-6 * norm_grad)
            col_new = 1 + (col % bs)

            @pl.when(accept)
            def _():
                ms1[pl.ds(col_new * NR, NR)] = s1.astype(nb)
                ms2[pl.ds(col_new * NR, NR)] = s2.astype(nb)
                msp[pl.ds(col_new * NR, NR)] = sp.astype(nb)
                my1[pl.ds(col_new * NR, NR)] = yd1.astype(nb)
                my2[pl.ds(col_new * NR, NR)] = yd2.astype(nb)
                myp[pl.ds(col_new * NR, NR)] = ydp.astype(nb)
                rho_r[col_new] = 1.0 / inv_rho

            col = jnp.where(accept, col_new, col)
            mem = jnp.where(accept, jnp.minimum(mem + 1, bs), mem)
            skips = skips + jnp.where(qn_on & ~accept, 1, 0)
            gamma = inv_rho / jnp.maximum(norm_y2, 1e-30)
            hess = jnp.where(
                qn_on,
                jnp.where((gamma < 0) | (jnp.abs(gamma - hess) == 0),
                          1.0, gamma),
                hess)

            # ---- two-loop recursion (src/SmpcController.cu:1182-1232),
            # statically unrolled with i < mem masking; inactive slots
            # read the zeroed column 0 ----
            dd1[...] = -yv1[...]
            dd2[...] = -yv2[...]
            ddp[...] = -yvq[...]
            for i in range(bs):
                active = i < mem
                icol = col - i
                icol = jnp.where(icol < 0, mem + icol, icol)
                icol = jnp.where(active, icol, 0)
                sk1 = ms1[pl.ds(icol * NR, NR)].astype(f32)
                sk2 = ms2[pl.ds(icol * NR, NR)].astype(f32)
                skp = msp[pl.ds(icol * NR, NR)].astype(f32)
                yk1 = my1[pl.ds(icol * NR, NR)].astype(f32)
                yk2 = my2[pl.ds(icol * NR, NR)].astype(f32)
                ykp = myp[pl.ds(icol * NR, NR)].astype(f32)
                a = rho_r[icol] * dot3(sk1, sk2, skp,
                                       dd1[...], dd2[...], ddp[...])
                a = jnp.where(active, a, 0.0)
                dd1[...] = dd1[...] - a * yk1
                dd2[...] = dd2[...] - a * yk2
                ddp[...] = ddp[...] - a * ykp

                @pl.when(active)
                def _():
                    alpha_r[icol] = a

            dd1[...] = hess * dd1[...]
            dd2[...] = hess * dd2[...]
            ddp[...] = hess * ddp[...]
            for j in range(bs):
                active = j < mem
                icol = col - (mem - j) + 1
                icol = jnp.where(icol < 0, mem + icol, icol)
                icol = jnp.where(active, icol, 0)
                sk1 = ms1[pl.ds(icol * NR, NR)].astype(f32)
                sk2 = ms2[pl.ds(icol * NR, NR)].astype(f32)
                skp = msp[pl.ds(icol * NR, NR)].astype(f32)
                yk1 = my1[pl.ds(icol * NR, NR)].astype(f32)
                yk2 = my2[pl.ds(icol * NR, NR)].astype(f32)
                ykp = myp[pl.ds(icol * NR, NR)].astype(f32)
                b = rho_r[icol] * dot3(yk1, yk2, ykp,
                                       dd1[...], dd2[...], ddp[...])
                scale = jnp.where(active, alpha_r[icol] - b, 0.0)
                dd1[...] = dd1[...] + scale * sk1
                dd2[...] = dd2[...] + scale * sk2
                ddp[...] = ddp[...] + scale * skp

            # ---- line-search setup ----
            if is_fbe:
                # direction value <grad, dir>; dirs = H(lbfgs_dir)
                dval = dot3(yv1[...], yv2[...], yvq[...],
                            dd1[...], dd2[...], ddp[...])
                wd1[...] = dd1[...]
                wd2[...] = dd2[...]
                wdp[...] = ddp[...]
                sweep(dd1, dd2, ddp, hx, hu, affine=False)
            else:
                # NAMA (src/SmpcController.cu:1326-1414): unconditional
                # residual step, then search along d = lbfgsDir - step*res
                dval = -dot3(rs1[...], rs2[...], rsp[...],
                             dd1[...], dd2[...], ddp[...])
                sweep(rs1, rs2, rsp, hx, hu, affine=False)
                q = jnp.where(qn_on, step_size, 0.0)
                lsw1[...] = lsw1[...] + q * rs1[...]
                lsw2[...] = lsw2[...] + q * rs2[...]
                lswp[...] = lswp[...] + q * rsp[...]
                o_x[...] = o_x[...] + q * hx[...]
                o_u[...] = o_u[...] + q * hu[...]
                wd1[...] = dd1[...] - step_size * rs1[...]
                wd2[...] = dd2[...] - step_size * rs2[...]
                wdp[...] = ddp[...] - step_size * rsp[...]
                sweep(wd1, wd2, wdp, hx, hu, affine=False)

            # ---- cumulative backtracking tau loop (statically unrolled
            # masked trials; replace-style semantics identical to the
            # XLA lax.while_loop in solver/quasi_newton.py: the final
            # worsening trial stays applied, skipped solves apply zero
            # increments) ----
            positive = dval > 0
            skip = positive | (jnp.abs(dval) < LS_TOLERANCE) | ~qn_on
            done = skip
            tau = f32(1.0)
            applied = f32(0.0)
            for k in range(LS_MAX_STEPS + 1):
                act = ~done

                # the whole trial is a real branch (scf.if): completed
                # searches skip the remaining trials' work entirely
                @pl.when(act)
                def _(tau=tau):
                    o_x[...] = o_x[...] + tau * hx[...]
                    o_u[...] = o_u[...] + tau * hu[...]
                    lsw1[...] = lsw1[...] + tau * wd1[...]
                    lsw2[...] = lsw2[...] + tau * wd2[...]
                    lswp[...] = lswp[...] + tau * wdp[...]
                    tr1, tr2, trp, tvg = prox_pieces(
                        o_x[...], o_u[...],
                        lsw1[...], lsw2[...], lswp[...])
                    rs1[...] = tr1
                    rs2[...] = tr2
                    rsp[...] = trp
                    val_r[0] = fbe_value(
                        lsw1[...], lsw2[...], lswp[...],
                        tr1, tr2, trp, o_u[...], tvg)

                # the SMEM scalar relays the trial value out of the
                # branch; stale reads are harmless (all consumers are
                # masked by act below)
                val = val_r[0]
                applied = jnp.where(act, tau, applied)
                improved = val <= value_ref
                tau_base = f32(-1.0) if k == 0 else tau
                tau_next = jnp.where(improved & (k + 1 < LS_MAX_STEPS),
                                     tau_base + f32(0.5 ** (k + 1)), tau)
                tau = jnp.where(act, tau_next, tau)
                done = done | ~improved
            tau_out = jnp.where(
                skip,
                jnp.where(positive & qn_on, f32(1.0), f32(0.0)),
                jnp.abs(applied))

            # ---- dual update (src/SmpcController.cu:865-880) ----
            ypx1[...] = o_yx1[...]
            ypx2[...] = o_yx2[...]
            ypps[...] = o_yps[...]
            o_yx1[...] = lsw1[...] + step_size * rs1[...]
            o_yx2[...] = lsw2[...] + step_size * rs2[...]
            o_yps[...] = lswp[...] + step_size * rsp[...]
            yvp1[...] = yv1[...]
            yvp2[...] = yv2[...]
            yvpp[...] = yvq[...]

            bx = upd(upd((f32(-1.0), f32(0.0)), rs1[...]), rs2[...])
            bp = upd((f32(-1.0), f32(0.0)), rsp[...])
            o_inf[it, 0] = jnp.maximum(bx[1], bp[1])
            o_val[it, 0] = jnp.where(qn_on, value_ref, 0.0)
            o_tau[it, 0] = tau_out
            # true residual magnitude for the tolerance stopping rule
            return col, mem, skips, hess, jnp.maximum(bx[0], bp[0])

        if tolerance is None:
            def fori_body(it, carry):
                return iteration(it, carry)[:4]

            lax.fori_loop(0, max_iterations, fori_body,
                          (jnp.int32(0), jnp.int32(0), jnp.int32(0),
                           f32(1.0)))
            o_it[0, 0] = jnp.int32(max_iterations)
        else:
            def w_cond(state):
                return ((state[0] < max_iterations) &
                        (state[5] > tolerance))

            def w_body(state):
                it = state[0]
                col, mem, skips, hess, mag = iteration(it, state[1:5])
                return (it + 1, col, mem, skips, hess, mag)

            state = lax.while_loop(
                w_cond, w_body,
                (jnp.int32(0), jnp.int32(0), jnp.int32(0),
                 jnp.int32(0), f32(1.0), f32(jnp.inf)))
            it_end = state[0]
            o_it[0, 0] = it_end

            def zero_tail(i, _):
                o_inf[i, 0] = f32(0.0)
                o_val[i, 0] = f32(0.0)
                o_tau[i, 0] = f32(0.0)
                return 0

            lax.fori_loop(it_end, max_iterations, zero_tail, 0)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = (
        jax.ShapeDtypeStruct((NR, PX), f32),   # y_xi1
        jax.ShapeDtypeStruct((NR, PX), f32),   # y_xi2
        jax.ShapeDtypeStruct((NR, PU), f32),   # y_psi
        jax.ShapeDtypeStruct((NR, PX), f32),   # x
        jax.ShapeDtypeStruct((NR, PU), f32),   # u
        jax.ShapeDtypeStruct((max_iterations, 1), f32),   # infeas
        jax.ShapeDtypeStruct((max_iterations, 1), f32),   # value_fbe
        jax.ShapeDtypeStruct((max_iterations, 1), f32),   # tau
        jax.ShapeDtypeStruct((1, 1), jnp.int32),          # iterations
    )
    scratch = [
        pltpu.VMEM((NR, PX), f32),   # ypx1
        pltpu.VMEM((NR, PX), f32),   # ypx2
        pltpu.VMEM((NR, PU), f32),   # ypps
        pltpu.VMEM((NR, PX), f32),   # yvp1
        pltpu.VMEM((NR, PX), f32),   # yvp2
        pltpu.VMEM((NR, PU), f32),   # yvpp
        pltpu.VMEM((NR, PX), f32),   # lsw1
        pltpu.VMEM((NR, PX), f32),   # lsw2
        pltpu.VMEM((NR, PU), f32),   # lswp
        pltpu.VMEM((NR, PX), f32),   # rs1
        pltpu.VMEM((NR, PX), f32),   # rs2
        pltpu.VMEM((NR, PU), f32),   # rsp
        pltpu.VMEM((NR, PX), f32),   # yv1
        pltpu.VMEM((NR, PX), f32),   # yv2
        pltpu.VMEM((NR, PU), f32),   # yvq
        pltpu.VMEM((NR, PX), f32),   # dd1
        pltpu.VMEM((NR, PX), f32),   # dd2
        pltpu.VMEM((NR, PU), f32),   # ddp
        pltpu.VMEM((NR, PX), f32),   # wd1
        pltpu.VMEM((NR, PX), f32),   # wd2
        pltpu.VMEM((NR, PU), f32),   # wdp
        pltpu.VMEM((NR, PX), f32),   # hx
        pltpu.VMEM((NR, PU), f32),   # hu
        pltpu.VMEM((NR, PX), f32),   # t_s
        pltpu.VMEM((NR, PV), f32),   # a_s
        pltpu.VMEM((NR, PV), f32),   # v_s
        pltpu.VMEM((NR, PU), f32),   # du_s
        pltpu.VMEM((NR, PX), f32),   # xa_s
        pltpu.VMEM((n_cols * NR, PX), nb),   # mat_s xi1
        pltpu.VMEM((n_cols * NR, PX), nb),   # mat_s xi2
        pltpu.VMEM((n_cols * NR, PU), nb),   # mat_s psi
        pltpu.VMEM((n_cols * NR, PX), nb),   # mat_y xi1
        pltpu.VMEM((n_cols * NR, PX), nb),   # mat_y xi2
        pltpu.VMEM((n_cols * NR, PU), nb),   # mat_y psi
        pltpu.SMEM((n_cols,), f32),           # rho
        pltpu.SMEM((n_cols,), f32),           # alphas
        pltpu.SMEM((1,), f32),                # line-search trial value
    ]
    n_in = len(QN_CONST_NAMES) + len(QN_STEP_NAMES) + 3
    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vmem] * n_in,
        out_specs=(vmem,) * 5 + (smem,) * 4,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )

    def solve(const_arrays, step_p, y0):
        return call(*const_arrays,
                    *(step_p[k] for k in QN_STEP_NAMES), *y0)

    return solve


def make_qn_pallas(fa: dict, *, algorithm, inv_step, step_size,
                   penalty_state, penalty_safety, xs_upper,
                   max_iterations, lbfgs_buffer_size,
                   project_control: bool = True,
                   interpret: bool | str = "auto",
                   tolerance: float | None = None,
                   lbfgs_dtype=None):
    """Full FBE/NAMA solve on the fused whole-solve kernel.

    Same contract as ``pallas_apg.make_apg_pallas``: returns
    run(step, y0=None) with ``step`` the standard solver step dict and
    ``y0`` an optional padded dual warm start {"xi1","xi2","psi"}
    (the previous solve's out["y"]).  Compiled once; reuse across
    control steps.
    """
    if interpret == "auto":
        interpret = jax.devices()[0].platform == "cpu"
    consts = pad_qn_constants(fa)
    dims = consts["dims"]
    N, ns, nx, nu, nv, NSP, PX, PU, PV = dims
    solve = make_pallas_qn_solve(
        consts, algorithm=algorithm, inv_step=inv_step,
        step_size=step_size, penalty_state=penalty_state,
        penalty_safety=penalty_safety, xs_upper=xs_upper,
        max_iterations=max_iterations,
        lbfgs_buffer_size=lbfgs_buffer_size, interpret=interpret,
        tolerance=tolerance, lbfgs_dtype=lbfgs_dtype)
    # physical root-control bounds (solve_step.root_control_bounds)
    if "umin_phys" in fa:
        umin00 = jnp.asarray(np.asarray(fa["umin_phys"]))
        umax00 = jnp.asarray(np.asarray(fa["umax_phys"]))
    else:
        umin00 = jnp.asarray(np.asarray(fa["umin"])[0, 0])
        umax00 = jnp.asarray(np.asarray(fa["umax"])[0, 0])
    const_device = tuple(jnp.asarray(consts[k]) for k in QN_CONST_NAMES)

    @jax.jit
    def run_impl(const_arrays, step, y0):
        step_p = pad_qn_step(step, dims)
        y0t = (y0["xi1"].reshape(-1, PX), y0["xi2"].reshape(-1, PX),
               y0["psi"].reshape(-1, PU))
        yx1, yx2, yps, x, u, infs, vals, taus, its = solve(
            const_arrays, step_p, y0t)
        x = x.reshape(N, NSP, PX)
        u = u.reshape(N, NSP, PU)
        u0 = u[0, 0, :nu]
        if project_control:
            u0 = jnp.clip(u0, umin00, umax00)
        return {"control": u0,
                "x": x[:, :ns, :nx], "u": u[:, :ns, :nu],
                "y": {"xi1": yx1.reshape(N, NSP, PX),
                      "xi2": yx2.reshape(N, NSP, PX),
                      "psi": yps.reshape(N, NSP, PU)},
                "primal_infeasibility": infs[:, 0],
                "value_fbe": vals[:, 0], "tau": taus[:, 0],
                "iterations": its[0, 0]}

    def run(step, y0=None):
        if y0 is None:
            f32 = jnp.float32
            y0 = {"xi1": jnp.zeros((N, NSP, PX), f32),
                  "xi2": jnp.zeros((N, NSP, PX), f32),
                  "psi": jnp.zeros((N, NSP, PU), f32)}
        return run_impl(const_device, step, y0)

    return run


def make_qn_pallas_batch(fa: dict, **kwargs):
    """Batched fused FBE/NAMA: B independent instances per call.

    Unlike the APG kernel (pallas_apg.make_apg_pallas_batch, which
    vmaps the batch onto the Pallas grid), the QN kernel's working set
    includes the (buffer_size+1)-column L-BFGS curvature pairs — under
    a vmap->grid batching rule Mosaic double-buffers every operand
    block on top of that and the compile exceeds VMEM at Barcelona
    bench scale (measured).  So the batch runs as ``lax.map`` over the
    whole-solve kernel inside one jitted program: sequential kernel
    invocations on the single core (which is how a grid executes
    anyway), single-instance VMEM footprint, one dispatch for all B
    solves.
    """
    run = make_qn_pallas(fa, **kwargs)
    m_cold = jax.jit(lambda steps: jax.lax.map(run, steps))
    m_warm = jax.jit(lambda steps, y0: jax.lax.map(
        lambda args: run(args[0], args[1]), (steps, y0)))

    def run_batch(steps, y0=None):
        return m_cold(steps) if y0 is None else m_warm(steps, y0)

    return run_batch


def make_qn_pallas_batch_shared(fa: dict, **kwargs):
    """Shared-forecast batched fused FBE/NAMA: fn(base, inst[, y0]).

    Device-side batch assembly contract of
    ``solver.apg.expand_shared_step`` (O(tree)+O(B nu) bytes per step).
    """
    from rapidnet_tpu.solver.apg import expand_shared_step

    run = make_qn_pallas(fa, **kwargs)

    def one(base, x0, pu, puh, dlt, y0=None):
        step = expand_shared_step(base, x0, pu, puh, dlt)
        return run(step) if y0 is None else run(step, y0)

    # lax.map, not vmap->grid: see make_qn_pallas_batch (VMEM)
    m_cold = jax.jit(lambda base, inst: jax.lax.map(
        lambda a: one(base, *a),
        (inst["x0"], inst["prev_u"], inst["prev_uhat"],
         inst["delta_beta0"])))
    m_warm = jax.jit(lambda base, inst, y0: jax.lax.map(
        lambda a: one(base, *a),
        (inst["x0"], inst["prev_u"], inst["prev_uhat"],
         inst["delta_beta0"], y0)))

    def run_batch(base, inst, y0=None):
        return (m_cold(base, inst) if y0 is None
                else m_warm(base, inst, y0))

    return run_batch
