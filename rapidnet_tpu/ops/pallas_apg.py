"""Fused Pallas kernel: one full APG iteration in VMEM.

The XLA path (solver/apg.py) lowers each iteration to ~50 small kernels
(stage scans of tiny matmuls + elementwise chains + reductions); on TPU
the per-kernel overhead dominates for small/medium trees.  This kernel
runs the ENTIRE iteration — dual extrapolation, the backward/forward
tree sweeps, prox-of-g with its global penalty norms, the fixed-point
residual, the dual update and the infeasibility diagnostic — as one
``pallas_call`` with all state resident in VMEM:

* lane padding: nx/nu/nv padded to 128 (MXU/VPU lane width); scenario
  slots padded to a sublane multiple.  Padded entries are zero in every
  input, and stay zero through the recursions (d1/d2/g pads are 0, so
  primal pads are 0; bound pads are 0, so dual pads are 0), which keeps
  the global norms and max-abs diagnostics exact without masking;
* prox algebra is re-associated so only the projection *differences*
  are materialised:  with  pre = prim + c*w,  box = pre - diff  and
  dual = box + k*diff,  the residual is  res = (1-k)*diff - c*w  — no
  primal/dual scratch buffers needed;
* the whole-solve scan stays in XLA (theta sequence, warm start, early
  termination compose unchanged); per-step data (beta/uhat/e/x0) are
  runtime inputs, so one compilation serves the whole closed loop.

Use for single-device solves whose padded working set fits VMEM
(``fits_vmem``); the XLA path remains the general/sharded fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

CONST_NAMES = ("d1", "d2", "g", "nhp", "rep_x",
               "xmin", "xmax", "xs", "umin", "umax",
               "BbT", "Lm", "iWT", "LT", "BT", "Cs")
STEP_NAMES = ("beta", "uhat", "e", "x0", "pdu")


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_axis(a, size, axis):
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, size - a.shape[axis])
    return np.pad(np.asarray(a), pad)


def _dims(fa):
    N, ns, nx = fa["d1"].shape
    nu = fa["g"].shape[-1]
    nv = fa["invWbar"].shape[0]
    return (N, ns, nx, nu, nv, _pad_to(ns, 8), _pad_to(nx, LANE),
            _pad_to(nu, LANE), _pad_to(nv, LANE))


def _fan(a, NSP, P):
    a = np.asarray(a, np.float32)
    return pad_axis(pad_axis(a, NSP, 1), P, 2)


def pad_constants(fa: dict) -> dict:
    """Padded, kernel-ready constant arrays (host side, once)."""
    dims = _dims(fa)
    N, ns, nx, nu, nv, NSP, PX, PU, PV = dims

    def mat(a, R, C):
        return pad_axis(pad_axis(np.asarray(a, np.float32), R, 0), C, 1)

    rep = np.asarray(fa["rep"], np.float32)[..., None]
    nhp = np.asarray(fa["nhp"], np.float32)
    out = {
        "dims": dims,
        "d1": _fan(fa["d1"], NSP, PX), "d2": _fan(fa["d2"], NSP, PX),
        "g": _fan(fa["g"], NSP, PU),
        "nhp": _fan(np.broadcast_to(nhp, (N, ns, nv)), NSP, PV),
        "rep_x": _fan(np.broadcast_to(rep, (N, ns, nx)), NSP, PX),
        "xmin": _fan(fa["xmin"], NSP, PX),
        "xmax": _fan(fa["xmax"], NSP, PX),
        "xs": _fan(fa["xs"], NSP, PX),
        "umin": _fan(fa["umin"], NSP, PU),
        "umax": _fan(fa["umax"], NSP, PU),
        "BbT": mat(np.asarray(fa["Bb"]).T, PX, PV),
        "Lm": mat(fa["L"], PU, PV),
        "iWT": mat(np.asarray(fa["invWbar"]).T, PV, PV),
        "LT": mat(np.asarray(fa["L"]).T, PV, PU),
        "BT": mat(np.asarray(fa["B"]).T, PU, PX),
    }
    prefix = tuple(sorted(fa["prefix_C"].keys(), reverse=True))
    if prefix:
        Cs = np.stack([pad_axis(pad_axis(np.asarray(fa["prefix_C"][s]),
                                         NSP, 0), NSP, 1)
                       for s in prefix])
    else:
        Cs = np.zeros((1, NSP, NSP), np.float32)
    out["Cs"] = Cs
    out["prefix_stages"] = prefix
    return out


def pad_step(step: dict, dims) -> dict:
    """Padded per-control-step arrays (runtime inputs)."""
    N, ns, nx, nu, nv, NSP, PX, PU, PV = dims
    return {
        "beta": jnp.asarray(_fan(step["beta"], NSP, PV)),
        "uhat": jnp.asarray(_fan(step["uhat"], NSP, PU)),
        "e": jnp.asarray(_fan(step["e"], NSP, PX)),
        "x0": jnp.asarray(pad_axis(
            np.asarray(step["x0"], np.float32)[None], PX, 1)),
        "pdu": jnp.asarray(pad_axis(
            np.asarray(step["prev_u"], np.float32)[None] -
            np.asarray(step["prev_uhat"], np.float32)[None], PU, 1)),
    }


def vmem_bytes(consts: dict) -> int:
    total = sum(v.nbytes for v in consts.values() if hasattr(v, "nbytes"))
    N, ns, nx, nu, nv, NSP, PX, PU, PV = consts["dims"]
    per_state = N * NSP * (2 * PX + PU) * 4
    total += 3 * per_state                      # y, y_prev in, y out
    total += N * NSP * (PX + PU) * 4            # x, u outputs
    total += N * NSP * (2 * PX + PU + PV) * 4   # diff + v scratch
    total += N * NSP * (PV + PU + PX) * 4       # step inputs
    return total


def fits_vmem(consts: dict, budget: int = 96 * 1024 * 1024) -> bool:
    return vmem_bytes(consts) <= budget


def make_pallas_iteration(consts: dict, *, inv_step, step_size,
                          penalty_state, penalty_safety, xs_upper,
                          interpret: bool = False):
    """Build it(step_padded, y, y_prev, lam) -> (y_new, x, u, infeas)."""
    dims = consts["dims"]
    N, ns, nx, nu, nv, NSP, PX, PU, PV = dims
    prefix_stages = consts["prefix_stages"]
    first_prefix = prefix_stages[0] + 1 if prefix_stages else 0
    tail_len = N - first_prefix
    c = float(inv_step)
    step_size = float(step_size)
    penalty_state = float(penalty_state)
    penalty_safety = float(penalty_safety)
    xs_upper = float(xs_upper)

    def kernel(lam_ref,
               d1, d2, g, nhp, rep_x, xmin, xmax, xs, umin, umax,
               BbT, Lm, iWT, LT, BT, Cs,
               beta, uhat, e, x0, pdu,
               yx1, yx2, yps, px1, px2, pps,
               o_yx1, o_yx2, o_yps, o_x, o_u, o_inf,
               v_s, df1_s, df2_s, dfp_s):
        lam = lam_ref[0, 0]

        def w_xi1(s):
            return (1.0 + lam) * yx1[s] - lam * px1[s]

        def w_xi2(s):
            return (1.0 + lam) * yx2[s] - lam * px2[s]

        def w_psi(s):
            return (1.0 + lam) * yps[s] - lam * pps[s]

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        # ---------------- backward sweep ----------------
        def bwd_stage(s, q, r):
            sigma = beta[s] + r
            t = d1[s] * w_xi1(s) + d2[s] * w_xi2(s) + q
            inner = sigma + dot(t, BbT[:]) + dot(g[s] * w_psi(s), Lm[:])
            v_s[s] = nhp[s] * dot(inner, iWT[:])
            return t, inner

        def bwd_body(i, carry):
            q, r = carry
            return bwd_stage(N - 1 - i, q, r)

        q = jnp.zeros((NSP, PX), jnp.float32)
        r = jnp.zeros((NSP, PV), jnp.float32)
        q, r = lax.fori_loop(0, tail_len, bwd_body, (q, r))
        # branching prefix, unrolled with aggregation matmuls
        for s in range(first_prefix - 1, -1, -1):
            q, r = bwd_stage(s, q, r)
            if s > 0 and s in prefix_stages:
                C = Cs[prefix_stages.index(s)]
                q = dot(C, q)
                r = dot(C, r)

        # ---------------- forward sweep + prox diffs ----------------
        def fwd_body(s, carry):
            du, xc, s1, s2 = carry
            u = uhat[s] + dot(v_s[s], LT[:]) + du
            x = xc + e[s] + dot(u, BT[:])
            o_u[s] = u
            o_x[s] = x
            pre1 = d1[s] * x + c * w_xi1(s)
            pre2 = d2[s] * x + c * w_xi2(s)
            prep = g[s] * u + c * w_psi(s)
            dfa = pre1 - jnp.clip(pre1, xmin[s], xmax[s])
            dfb = pre2 - jnp.clip(pre2, xs[s], xs_upper)
            dfp = prep - jnp.clip(prep, umin[s], umax[s])
            df1_s[s] = dfa
            df2_s[s] = dfb
            dfp_s[s] = dfp
            s1 = s1 + jnp.sum(rep_x[s] * dfa * dfa)
            s2 = s2 + jnp.sum(rep_x[s] * dfb * dfb)
            return (u - uhat[s], x, s1, s2)

        du0 = jnp.broadcast_to(pdu[0], (NSP, PU))
        xc0 = jnp.broadcast_to(x0[0], (NSP, PX))
        _, _, s1, s2 = lax.fori_loop(
            0, N, fwd_body, (du0, xc0, jnp.float32(0.0), jnp.float32(0.0)))

        # global penalty shrinks (src/SmpcController.cu:793-814)
        dist1 = jnp.sqrt(s1)
        dist2 = jnp.sqrt(s2)
        t1 = c * penalty_state
        t2 = c * penalty_safety
        k1 = jnp.where(dist1 > t1, 1.0 - t1 / jnp.maximum(dist1, 1e-30),
                       0.0)
        k2 = jnp.where(dist2 > t2, 1.0 - t2 / jnp.maximum(dist2, 1e-30),
                       0.0)

        # -------- residual + dual update + infeasibility --------
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

        def fin_body(s, carry):
            bx, bp = carry
            r1 = (1.0 - k1) * df1_s[s] - c * w_xi1(s)
            r2 = (1.0 - k2) * df2_s[s] - c * w_xi2(s)
            rp = dfp_s[s] - c * w_psi(s)
            o_yx1[s] = w_xi1(s) + step_size * r1
            o_yx2[s] = w_xi2(s) + step_size * r2
            o_yps[s] = w_psi(s) + step_size * rp
            bx = upd(upd(bx, r1), r2)
            bp = upd(bp, rp)
            return bx, bp

        init = ((jnp.float32(-1.0), jnp.float32(0.0)),
                (jnp.float32(-1.0), jnp.float32(0.0)))
        (_, vx), (_, vp) = lax.fori_loop(0, N, fin_body, init)
        o_inf[0, 0] = jnp.maximum(vx, vp)

    const_arrays = tuple(jnp.asarray(consts[k]) for k in CONST_NAMES)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jnp.float32

    out_shape = (
        jax.ShapeDtypeStruct((N, NSP, PX), f32),   # y_xi1
        jax.ShapeDtypeStruct((N, NSP, PX), f32),   # y_xi2
        jax.ShapeDtypeStruct((N, NSP, PU), f32),   # y_psi
        jax.ShapeDtypeStruct((N, NSP, PX), f32),   # x
        jax.ShapeDtypeStruct((N, NSP, PU), f32),   # u
        jax.ShapeDtypeStruct((1, 1), f32),         # infeas
    )
    scratch = [
        pltpu.VMEM((N, NSP, PV), f32),   # v
        pltpu.VMEM((N, NSP, PX), f32),   # diff1
        pltpu.VMEM((N, NSP, PX), f32),   # diff2
        pltpu.VMEM((N, NSP, PU), f32),   # diffp
    ]
    n_in = 1 + len(CONST_NAMES) + len(STEP_NAMES) + 6
    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[smem] + [vmem] * (n_in - 1),
        out_specs=(vmem,) * 6,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )

    def it(step_p, y, y_prev, lam):
        lam2d = jnp.asarray(lam, f32).reshape(1, 1)
        outs = call(lam2d, *const_arrays,
                    *(step_p[k] for k in STEP_NAMES),
                    y["xi1"], y["xi2"], y["psi"],
                    y_prev["xi1"], y_prev["xi2"], y_prev["psi"])
        y_new = {"xi1": outs[0], "xi2": outs[1], "psi": outs[2]}
        return y_new, outs[3], outs[4], outs[5][0, 0]

    return it


def make_apg_pallas(fa: dict, *, inv_step, step_size, penalty_state,
                    penalty_safety, xs_upper, max_iterations,
                    project_control: bool = True,
                    interpret: bool = False):
    """Full APG solve on the fused iteration kernel.

    Returns (run, pad_step_fn):
      run(step_padded, y0=None) -> outputs dict (jitted once; reuse
        across control steps)
      pad_step_fn(step) -> padded runtime inputs for run.
    """
    consts = pad_constants(fa)
    dims = consts["dims"]
    N, ns, nx, nu, nv, NSP, PX, PU, PV = dims
    it = make_pallas_iteration(
        consts, inv_step=inv_step, step_size=step_size,
        penalty_state=penalty_state, penalty_safety=penalty_safety,
        xs_upper=xs_upper, interpret=interpret)
    umin00 = jnp.asarray(np.asarray(fa["umin"])[0, 0])
    umax00 = jnp.asarray(np.asarray(fa["umax"])[0, 0])

    @jax.jit
    def run(step_p, y0=None):
        f32 = jnp.float32
        if y0 is None:
            y0 = {"xi1": jnp.zeros((N, NSP, PX), f32),
                  "xi2": jnp.zeros((N, NSP, PX), f32),
                  "psi": jnp.zeros((N, NSP, PU), f32)}

        def body(carry, _):
            y, y_prev, th0, th1, _, _ = carry
            lam = th1 * (1.0 / th0 - 1.0)
            y_new, x, u, inf = it(step_p, y, y_prev, lam)
            th1n = 0.5 * (jnp.sqrt(th1 ** 4 + 4 * th1 ** 2) - th1 ** 2)
            return (y_new, y, th1, th1n, x, u), inf

        f32z = jnp.zeros
        carry0 = (y0, y0, jnp.float32(1.0), jnp.float32(1.0),
                  f32z((N, NSP, PX), f32), f32z((N, NSP, PU), f32))
        (y, _, _, _, x, u), infs = lax.scan(
            body, carry0, None, length=max_iterations)
        u0 = u[0, 0, :nu]
        if project_control:
            u0 = jnp.clip(u0, umin00, umax00)
        return {"control": u0,
                "x": x[:, :ns, :nx], "u": u[:, :ns, :nu],
                "y": y, "primal_infeasibility": infs,
                "iterations": jnp.int32(max_iterations)}

    return run, lambda step: pad_step(step, dims)
