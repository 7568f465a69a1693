"""Fused Pallas kernel: the ENTIRE APG solve in one kernel.

The XLA path (solver/apg.py) lowers each iteration to ~25 kernels
(batched matmuls + cumsums + elementwise chains + reductions); for the
production tree sizes the whole dual state fits comfortably in VMEM, so
this kernel runs the full iteration loop — dual extrapolation, the
backward/forward tree sweeps, prox-of-g with its global penalty norms,
the fixed-point residual, dual update and the per-iteration
infeasibility diagnostic — as ONE ``pallas_call``: zero kernel-launch
overhead and zero HBM traffic inside the loop.

Design notes:

* lane padding: nx/nu/nv padded to 128 (MXU/VPU lane width); scenario
  slots padded to a sublane multiple.  Padded entries are zero in every
  input, and stay zero through the recursions (d1/d2/g pads are 0, so
  primal pads are 0; bound pads are 0, so dual pads are 0), which keeps
  the global norms and max-abs diagnostics exact without masking;
* all per-stage arrays are stored 2D as (N*NSP, P): the stage-s slab is
  rows [s*NSP, (s+1)*NSP).  The backward/forward recursions are affine
  with stage-invariant matrices (see solver/solve_step.py), so each
  sweep is ONE big (N*NSP, 128)@(128, 128) MXU matmul plus a stage-axis
  cumulative-sum loop of cheap (NSP, 128) VPU adds — the serial
  dependency chain contains no matmuls at all;
* prox algebra is re-associated so only the projection *differences*
  are materialised:  with  pre = prim + c*w,  box = pre - diff  and
  dual = box + k*diff,  the residual is  res = (1-k)*diff - c*w;
* the Nesterov lambda sequence is data-independent, so it is
  precomputed on the host and fed through SMEM; the per-iteration
  infeasibility trace is written to an SMEM output.

Use for single-device solves whose padded working set fits VMEM
(``fits_vmem``); the XLA path remains the general/sharded fallback and
the early-termination path.
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
    """(N, ns, p) -> flat (N*NSP, P) with zero padding."""
    a = np.asarray(a, np.float32)
    a = pad_axis(pad_axis(a, NSP, 1), P, 2)
    return a.reshape(-1, P)


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
    """Padded per-control-step arrays (device-side, jit-traceable).

    Takes the standard solver step dict (same as the XLA path) so one
    padding implementation serves eager callers and the jitted run.
    """
    N, ns, nx, nu, nv, NSP, PX, PU, PV = dims

    def fan(a, P):
        a = jnp.asarray(a, jnp.float32)
        a = jnp.pad(a, ((0, 0), (0, NSP - a.shape[1]),
                        (0, P - a.shape[2])))
        return a.reshape(-1, P)

    x0 = jnp.asarray(step["x0"], jnp.float32)[None]
    pdu = (jnp.asarray(step["prev_u"], jnp.float32) -
           jnp.asarray(step["prev_uhat"], jnp.float32))[None]
    return {
        "beta": fan(step["beta"], PV),
        "uhat": fan(step["uhat"], PU),
        "e": fan(step["e"], PX),
        "x0": jnp.pad(x0, ((0, 0), (0, PX - x0.shape[1]))),
        "pdu": jnp.pad(pdu, ((0, 0), (0, PU - pdu.shape[1]))),
    }


def vmem_bytes(consts: dict) -> int:
    total = sum(v.nbytes for v in consts.values() if hasattr(v, "nbytes"))
    N, ns, nx, nu, nv, NSP, PX, PU, PV = consts["dims"]
    per_state = N * NSP * (2 * PX + PU) * 4
    total += 3 * per_state                      # y out, y_prev, w scratch
    total += N * NSP * (PX + PU) * 4            # x, u outputs
    total += N * NSP * (2 * PX + PV + PU + PX) * 4   # t/a/v/du/x scratch
    total += N * NSP * (PV + PU + PX) * 4       # step inputs
    return total


def fits_vmem(consts: dict, budget: int = 96 * 1024 * 1024) -> bool:
    return vmem_bytes(consts) <= budget


def nesterov_lambdas(max_iterations: int) -> np.ndarray:
    """The data-independent extrapolation weights lam_k (f32 host calc).

    theta_0 = theta_1 = 1;  lam = th1*(1/th0 - 1);
    th1' = (sqrt(th1^4 + 4 th1^2) - th1^2)/2   (src/SmpcController.cu:
    1519-1520 + 535-557).
    """
    th0 = np.float32(1.0)
    th1 = np.float32(1.0)
    lams = np.zeros((max_iterations, 1), np.float32)
    for k in range(max_iterations):
        lams[k, 0] = th1 * (np.float32(1.0) / th0 - np.float32(1.0))
        th0 = th1
        th1 = np.float32(0.5) * (np.sqrt(th1 ** 4 + 4 * th1 ** 2)
                                 - th1 ** 2)
    return lams


def make_pallas_solve(consts: dict, *, inv_step, step_size,
                      penalty_state, penalty_safety, xs_upper,
                      max_iterations, interpret: bool = False,
                      tolerance: float | None = None):
    """Build the fused whole-solve kernel.

    Returns solve(step_padded, y0_tuple) ->
    (y_xi1, y_xi2, y_psi, x, u, infeas_trace, iterations).
    ``tolerance``: in-kernel early termination — the iteration loop
    becomes a while_loop on the true residual magnitude
    (max_abs_residual semantics, solver/solve_step.py:333-345), the
    infeasibility trace is zero-padded past the exit and the actual
    iteration count is returned — matching the XLA path's
    tolerance contract with zero host synchronisation.
    """
    dims = consts["dims"]
    N, ns, nx, nu, nv, NSP, PX, PU, PV = dims
    prefix_stages = consts["prefix_stages"]
    fp = prefix_stages[0] + 1 if prefix_stages else 0
    tail = N - fp
    c = float(inv_step)
    step_size = float(step_size)
    t1c = float(inv_step * penalty_state)
    t2c = float(inv_step * penalty_safety)
    xs_upper = float(xs_upper)
    f32 = jnp.float32

    def row(s):
        return pl.ds(s * NSP, NSP)

    def kernel(lams,
               d1, d2, g, nhp, rep_x, xmin, xmax, xs, umin, umax,
               BbT, Lm, iWT, LT, BT, Cs,
               beta, uhat, e, x0, pdu,
               y0x1, y0x2, y0ps,
               o_yx1, o_yx2, o_yps, o_x, o_u, o_inf, o_it,
               px1, px2, pps, w1, w2, wp, t_s, a_s, v_s, du_s, xa_s):

        def dot(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=lax.Precision.HIGHEST)

        o_yx1[...] = y0x1[...]
        o_yx2[...] = y0x2[...]
        o_yps[...] = y0ps[...]
        px1[...] = y0x1[...]
        px2[...] = y0x2[...]
        pps[...] = y0ps[...]

        def iteration(it, _):
            lam = lams[it, 0]
            # ---- dual extrapolation  w = (1+lam) y - lam y_prev ----
            w1[...] = (1.0 + lam) * o_yx1[...] - lam * px1[...]
            w2[...] = (1.0 + lam) * o_yx2[...] - lam * px2[...]
            wp[...] = (1.0 + lam) * o_yps[...] - lam * pps[...]

            # ---- backward sweep (batched matmuls + suffix cumsums) --
            t_s[...] = d1[...] * w1[...] + d2[...] * w2[...]
            a_s[...] = beta[...] + dot(g[...] * wp[...], Lm[...])

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

            # branching prefix, unrolled, with aggregation matmuls
            if fp > 0:
                if tail > 0:
                    q = t_s[row(fp)]
                    r = a_s[row(fp)]
                else:
                    q = jnp.zeros((NSP, PX), f32)
                    r = jnp.zeros((NSP, PV), f32)
                for s in range(fp - 1, -1, -1):
                    t = d1[row(s)] * w1[row(s)] + d2[row(s)] * w2[row(s)] + q
                    inner = (beta[row(s)] + r + dot(t, BbT[...]) +
                             dot(g[row(s)] * wp[row(s)], Lm[...]))
                    v_s[row(s)] = nhp[row(s)] * dot(inner, iWT[...])
                    q, r = t, inner
                    if s > 0 and s in prefix_stages:
                        C = Cs[prefix_stages.index(s)]
                        q = dot(C, q)
                        r = dot(C, r)

            # ---- forward sweep (batched matmuls + prefix cumsums) ---
            du_s[...] = dot(v_s[...], LT[...])

            def cums_du(s, _):
                du_s[row(s)] = du_s[row(s)] + du_s[row(s - 1)]
                return 0

            lax.fori_loop(1, N, cums_du, 0)
            o_u[...] = uhat[...] + du_s[...] + pdu[...]
            xa_s[...] = e[...] + dot(o_u[...], BT[...])

            def cums_x(s, _):
                xa_s[row(s)] = xa_s[row(s)] + xa_s[row(s - 1)]
                return 0

            lax.fori_loop(1, N, cums_x, 0)
            o_x[...] = xa_s[...] + x0[...]

            # ---- prox of g: projection diffs + global penalty norms --
            pre1 = d1[...] * o_x[...] + c * w1[...]
            df1 = pre1 - jnp.clip(pre1, xmin[...], xmax[...])
            pre2 = d2[...] * o_x[...] + c * w2[...]
            df2 = pre2 - jnp.clip(pre2, xs[...], xs_upper)
            prep = g[...] * o_u[...] + c * wp[...]
            dfp = prep - jnp.clip(prep, umin[...], umax[...])
            s1 = jnp.sum(rep_x[...] * df1 * df1)
            s2 = jnp.sum(rep_x[...] * df2 * df2)
            dist1 = jnp.sqrt(s1)
            dist2 = jnp.sqrt(s2)
            k1 = jnp.where(dist1 > t1c,
                           1.0 - t1c / jnp.maximum(dist1, 1e-30), 0.0)
            k2 = jnp.where(dist2 > t2c,
                           1.0 - t2c / jnp.maximum(dist2, 1e-30), 0.0)

            # ---- residual, dual update, infeasibility ----
            r1 = (1.0 - k1) * df1 - c * w1[...]
            r2 = (1.0 - k2) * df2 - c * w2[...]
            rp = dfp - c * wp[...]
            px1[...] = o_yx1[...]
            px2[...] = o_yx2[...]
            pps[...] = o_yps[...]
            o_yx1[...] = w1[...] + step_size * r1
            o_yx2[...] = w2[...] + step_size * r2
            o_yps[...] = wp[...] + step_size * rp

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

            bx = upd(upd((f32(-1.0), f32(0.0)), r1), r2)
            bp = upd((f32(-1.0), f32(0.0)), rp)
            o_inf[it, 0] = jnp.maximum(bx[1], bp[1])
            # true residual magnitude (max_abs_residual) for the
            # tolerance stopping rule — the signed trace above keeps
            # the reference-quirk diagnostic
            return jnp.maximum(bx[0], bp[0])

        if tolerance is None:
            lax.fori_loop(0, max_iterations,
                          lambda it, _: (iteration(it, 0), 0)[1], 0)
            o_it[0, 0] = jnp.int32(max_iterations)
        else:
            def w_cond(state):
                it, last = state
                return (it < max_iterations) & (last > tolerance)

            def w_body(state):
                it, _ = state
                return it + 1, iteration(it, 0)

            it_end, _ = lax.while_loop(
                w_cond, w_body, (jnp.int32(0), f32(jnp.inf)))
            o_it[0, 0] = it_end

            def zero_tail(i, _):
                o_inf[i, 0] = f32(0.0)
                return 0

            lax.fori_loop(it_end, max_iterations, zero_tail, 0)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    NR = N * NSP
    out_shape = (
        jax.ShapeDtypeStruct((NR, PX), f32),   # y_xi1
        jax.ShapeDtypeStruct((NR, PX), f32),   # y_xi2
        jax.ShapeDtypeStruct((NR, PU), f32),   # y_psi
        jax.ShapeDtypeStruct((NR, PX), f32),   # x
        jax.ShapeDtypeStruct((NR, PU), f32),   # u
        jax.ShapeDtypeStruct((max_iterations, 1), f32),   # infeas trace
        jax.ShapeDtypeStruct((1, 1), jnp.int32),          # iterations
    )
    scratch = [
        pltpu.VMEM((NR, PX), f32),   # y_prev xi1
        pltpu.VMEM((NR, PX), f32),   # y_prev xi2
        pltpu.VMEM((NR, PU), f32),   # y_prev psi
        pltpu.VMEM((NR, PX), f32),   # w xi1
        pltpu.VMEM((NR, PX), f32),   # w xi2
        pltpu.VMEM((NR, PU), f32),   # w psi
        pltpu.VMEM((NR, PX), f32),   # t
        pltpu.VMEM((NR, PV), f32),   # a (inner)
        pltpu.VMEM((NR, PV), f32),   # v
        pltpu.VMEM((NR, PU), f32),   # du
        pltpu.VMEM((NR, PX), f32),   # x accum
    ]
    n_in = 1 + len(CONST_NAMES) + len(STEP_NAMES) + 3
    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[smem] + [vmem] * (n_in - 1),
        out_specs=(vmem,) * 5 + (smem, smem),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )
    lams = jnp.asarray(nesterov_lambdas(max_iterations))

    def solve(const_arrays, step_p, y0):
        return call(lams, *const_arrays,
                    *(step_p[k] for k in STEP_NAMES), *y0)

    return solve


def make_apg_pallas(fa: dict, *, inv_step, step_size, penalty_state,
                    penalty_safety, xs_upper, max_iterations,
                    project_control: bool = True,
                    interpret: bool | str = "auto",
                    tolerance: float | None = None):
    """Full APG solve on the fused whole-solve kernel.

    Returns run(step, y0=None) -> outputs dict, where ``step`` is the
    standard solver step dict (same as the XLA path; padding happens
    device-side inside the jit).  y0 is an optional padded dual warm
    start {"xi1", "xi2", "psi"} (each (N, NSP, P)) as returned in
    out["y"] — pass the previous solve's out["y"] for receding-horizon
    warm starting.  Compiled once; reuse across control steps.
    """
    if interpret == "auto":
        # interpret mode lets the same code path run on CPU (tests, dev)
        interpret = jax.devices()[0].platform == "cpu"
    consts = pad_constants(fa)
    dims = consts["dims"]
    N, ns, nx, nu, nv, NSP, PX, PU, PV = dims
    solve = make_pallas_solve(
        consts, inv_step=inv_step, step_size=step_size,
        penalty_state=penalty_state, penalty_safety=penalty_safety,
        xs_upper=xs_upper, max_iterations=max_iterations,
        interpret=interpret, tolerance=tolerance)
    # physical root-control bounds (solve_step.root_control_bounds)
    if "umin_phys" in fa:
        umin00 = jnp.asarray(np.asarray(fa["umin_phys"]))
        umax00 = jnp.asarray(np.asarray(fa["umax_phys"]))
    else:
        umin00 = jnp.asarray(np.asarray(fa["umin"])[0, 0])
        umax00 = jnp.asarray(np.asarray(fa["umax"])[0, 0])
    # Constants live on device as explicit arguments (NOT jit-baked
    # literals): baked literals are re-shipped with every execute on
    # remote-device transports, costing a fixed ~tens-of-ms per solve.
    const_device = tuple(jnp.asarray(consts[k]) for k in CONST_NAMES)

    @jax.jit
    def run_impl(const_arrays, step, y0):
        step_p = pad_step(step, dims)
        y0t = (y0["xi1"].reshape(-1, PX), y0["xi2"].reshape(-1, PX),
               y0["psi"].reshape(-1, PU))
        yx1, yx2, yps, x, u, infs, its = solve(const_arrays, step_p,
                                               y0t)
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
                "iterations": its[0, 0]}

    def run(step, y0=None):
        """step: the standard solver step dict (as for the XLA path)."""
        if y0 is None:
            f32 = jnp.float32
            y0 = {"xi1": jnp.zeros((N, NSP, PX), f32),
                  "xi2": jnp.zeros((N, NSP, PX), f32),
                  "psi": jnp.zeros((N, NSP, PU), f32)}
        return run_impl(const_device, step, y0)

    return run


def make_apg_pallas_batch(fa: dict, **kwargs):
    """Batched fused-kernel solve: B independent instances per call.

    ``jax.vmap`` over the whole-solve ``pallas_call`` turns the batch
    axis into a kernel grid dimension — each grid step is one complete
    solve, VMEM-resident, sharing the factor constants.  Measured ~5x
    solves/s over single-solve dispatch at the Barcelona bench scale
    (fills the chip and amortises fixed per-call overhead).

    Returns fn(steps, y0=None) where every leaf of ``steps`` (and of
    the padded warm start ``y0``) has a leading batch axis.
    """
    run = make_apg_pallas(fa, **kwargs)
    v_cold = jax.jit(jax.vmap(lambda s: run(s)))
    v_warm = jax.jit(jax.vmap(run))

    def run_batch(steps, y0=None):
        return v_cold(steps) if y0 is None else v_warm(steps, y0)

    return run_batch


def make_apg_pallas_batch_shared(fa: dict, **kwargs):
    """Shared-forecast batched fused-kernel solve: fn(base, inst[, y0]).

    Same contract as ``solver.apg.make_apg_batch_shared`` — the batched
    step dicts are assembled on device from the shared base + the
    per-instance vectors (O(tree) + O(B nu) host->device bytes per
    control step), then each grid step runs one whole-solve kernel.
    """
    from rapidnet_tpu.solver.apg import expand_shared_step

    run = make_apg_pallas(fa, **kwargs)

    def one(base, x0, pu, puh, dlt, y0=None):
        step = expand_shared_step(base, x0, pu, puh, dlt)
        return run(step) if y0 is None else run(step, y0)

    v_cold = jax.jit(jax.vmap(one, in_axes=(None, 0, 0, 0, 0)))
    v_warm = jax.jit(jax.vmap(one, in_axes=(None, 0, 0, 0, 0, 0)))

    def run_batch(base, inst, y0=None):
        args = (base, inst["x0"], inst["prev_u"], inst["prev_uhat"],
                inst["delta_beta0"])
        return v_cold(*args) if y0 is None else v_warm(*args, y0)

    return run_batch
