"""Streaming oracle sweeps for the quasi-Newton solvers (large trees).

The FBE/NAMA iteration runs the SAME backward/forward tree recursion as
APG three times per iteration (solve step + Hessian oracle(s) — the
reference's computeHessianOracalGlobalFbe is solveStep with the affine
terms removed, src/SmpcController.cu:884-1055).  At >VMEM tree scale
the XLA sweeps materialise every stage intermediate in HBM; these
kernels stream the stages through VMEM exactly like the streaming APG
pair (ops/pallas_stream.py — same transposed (d, ns) layout, same
rank-1 reconstruction, same factored Cp/Bp prefix aggregation), but
expose the *bare* oracle:

  S1 (reverse grid): duals (w1, w2, wp) [+ beta] -> v per stage
  S2 (forward grid): v [+ uhat, e, x0, pdu] -> x, u and the primal
     H-application (p1, p2, pp)

so the quasi-Newton control flow (prox, FBE value, L-BFGS, line
searches — solver/qn_stream.py) stays in XLA on transposed slabs.
Built in two variants: ``affine=True`` (the solve step) and
``affine=False`` (the Hessian oracle — the affine operands are not
even read, saving their HBM traffic on the 2 extra sweeps/iteration).

``stage_block=k`` processes k consecutive stages per grid invocation
(grid length N/k, operand blocks (k, P, NSP)): the stage recursion
stays sequential inside the kernel, but each grid step issues 1/k as
many DMA descriptors and the double-buffered pipeline moves k×-bigger
blocks — the round-4 verdict attributed the streaming gap to exactly
this per-invocation setup (docs/roofline.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rapidnet_tpu.ops.pallas_stream import pack_stream_constants

__all__ = ["make_stream_sweeps", "pack_stream_constants"]


def make_stream_sweeps(consts: dict, *, affine: bool,
                       interpret: bool | str = "auto",
                       precision: str | lax.Precision =
                           lax.Precision.HIGHEST,
                       stage_block: int = 1):
    """Build (backward, forward) streaming sweep callables.

    consts: the host-side pack of ``pack_stream_constants(fa)``.
    Returns ``backward(cd, w1, w2, wp[, beta]) -> v`` and
    ``forward(cd, v[, uhat, e, x0, pdu]) -> (x, u, p1, p2, pp)`` where
    every slab is stage-major transposed (N, P, NSP) and ``cd`` is the
    jnp-converted constant dict (the caller owns it so the arrays are
    staged once per solve, not per call).
    ``stage_block``: stages per grid invocation (must divide N).
    """
    if interpret == "auto":
        interpret = jax.devices()[0].platform == "cpu"
    N, ns, nx, nu, nv, NSP, PX, PU, PV = consts["dims"]
    Rmax = consts["Rmax"]
    prefix_stages = consts["prefix_stages"]
    n_pref = max(len(prefix_stages), 1)
    f32 = jnp.float32
    PREC = precision
    K = int(stage_block)
    if K < 1 or N % K != 0:
        raise ValueError(f"stage_block={K} must divide N={N}")
    NB = N // K

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=PREC)

    # ---------------- S1: backward sweep ----------------
    def s1(sq, nhp, cx1, cx2, cu, Bb, LT, iW, CpT, BpT,
           *refs):
        if affine:
            beta, w1, w2, wp, o_v, t_s, a_s = refs
        else:
            w1, w2, wp, o_v, t_s, a_s = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            t_s[...] = jnp.zeros((PX, NSP), f32)
            a_s[...] = jnp.zeros((PV, NSP), f32)

        for j in range(K):
            r = K - 1 - j                  # row inside the block
            s = N - 1 - (i * K + j)        # dynamic stage index
            sqv = sq[r]
            d1 = cx1[r] * sqv
            d2 = cx2[r] * sqv
            g = cu[r] * sqv

            t_new = d1 * w1[r] + d2 * w2[r] + t_s[...]
            inner = (a_s[...] + dot(Bb[...], t_new) +
                     dot(LT[...], g * wp[r]))
            if affine:
                inner = inner + beta[r]
            o_v[r] = nhp[r] * dot(iW[...], inner)

            q, rr = t_new, inner
            for k, ps in enumerate(prefix_stages):
                if ps > 0:
                    is_s = s == ps

                    @pl.when(is_s)
                    def _(k=k, q=q, rr=rr):
                        qp = dot(q, CpT[k])
                        rp_ = dot(rr, CpT[k])
                        t_s[...] = dot(qp, BpT[k])
                        a_s[...] = dot(rp_, BpT[k])

                    @pl.when(jnp.logical_not(is_s))
                    def _(q=q, rr=rr):
                        t_s[...] = q
                        a_s[...] = rr
                    q, rr = t_s[...], a_s[...]
            if not prefix_stages:
                t_s[...] = q
                a_s[...] = rr

    # ---------------- S2: forward sweep + primal ----------------
    def s2(sq, cx1, cx2, cu, L, B, *refs):
        if affine:
            (x0, pdu, v, uhat, e,
             o_x, o_u, o_p1, o_p2, o_pp, du_s, x_s) = refs
        else:
            v, o_x, o_u, o_p1, o_p2, o_pp, du_s, x_s = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            if affine:
                du_s[...] = jnp.broadcast_to(pdu[...], (PU, NSP))
                x_s[...] = jnp.broadcast_to(x0[...], (PX, NSP))
            else:
                du_s[...] = jnp.zeros((PU, NSP), f32)
                x_s[...] = jnp.zeros((PX, NSP), f32)

        for r in range(K):
            sqv = sq[r]
            d1 = cx1[r] * sqv
            d2 = cx2[r] * sqv
            g = cu[r] * sqv

            du = du_s[...] + dot(L[...], v[r])
            u = (uhat[r] + du) if affine else du
            x = x_s[...] + dot(B[...], u)
            if affine:
                x = x + e[r]
            du_s[...] = du
            x_s[...] = x
            o_x[r] = x
            o_u[r] = u
            o_p1[r] = d1 * x
            o_p2[r] = d2 * x
            o_pp[r] = g * u

    # ---------------- specs ----------------
    def rev(i):
        return (NB - 1 - i, 0, 0)

    def fwd(i):
        return (i, 0, 0)

    def blk(P, index_map):
        return pl.BlockSpec((K, P, NSP), index_map,
                            memory_space=pltpu.VMEM)

    def colb(P, index_map):
        return pl.BlockSpec((K, P, 1), index_map,
                            memory_space=pltpu.VMEM)

    def fullb(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    dslab = jax.ShapeDtypeStruct((N, PX, NSP), f32)
    uslab = jax.ShapeDtypeStruct((N, PU, NSP), f32)
    vslab = jax.ShapeDtypeStruct((N, PV, NSP), f32)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)

    s1_in = [blk(1, rev), blk(1, rev),                    # sq nhp
             colb(PX, rev), colb(PX, rev), colb(PU, rev),
             fullb((PV, PX)), fullb((PV, PU)),            # Bb LT
             fullb((PV, PV)),                             # iW
             fullb((n_pref, NSP, Rmax)),                  # CpT
             fullb((n_pref, Rmax, NSP))]                  # BpT
    if affine:
        s1_in.append(blk(PV, rev))                        # beta
    s1_in += [blk(PX, rev), blk(PX, rev), blk(PU, rev)]   # w

    s1_call = pl.pallas_call(
        s1, grid=(NB,), in_specs=s1_in,
        out_specs=blk(PV, rev), out_shape=vslab,
        scratch_shapes=[pltpu.VMEM((PX, NSP), f32),
                        pltpu.VMEM((PV, NSP), f32)],
        interpret=interpret, compiler_params=params)

    s2_in = [blk(1, fwd),
             colb(PX, fwd), colb(PX, fwd), colb(PU, fwd),
             fullb((PU, PV)), fullb((PX, PU))]            # L B
    if affine:
        s2_in += [fullb((PX, 1)), fullb((PU, 1))]         # x0 pdu
    s2_in.append(blk(PV, fwd))                            # v
    if affine:
        s2_in += [blk(PU, fwd), blk(PX, fwd)]             # uhat e

    s2_call = pl.pallas_call(
        s2, grid=(NB,), in_specs=s2_in,
        out_specs=(blk(PX, fwd), blk(PU, fwd),
                   blk(PX, fwd), blk(PX, fwd), blk(PU, fwd)),
        out_shape=(dslab, uslab, dslab, dslab, uslab),
        scratch_shapes=[pltpu.VMEM((PU, NSP), f32),
                        pltpu.VMEM((PX, NSP), f32)],
        interpret=interpret, compiler_params=params)

    if affine:
        def backward(cd, w1, w2, wp, beta):
            return s1_call(cd["sq"], cd["nhp"], cd["cx1"], cd["cx2"],
                           cd["cu"], cd["Bb"], cd["LT"], cd["iW"],
                           cd["CpT"], cd["BpT"], beta, w1, w2, wp)

        def forward(cd, v, uhat, e, x0, pdu):
            return s2_call(cd["sq"], cd["cx1"], cd["cx2"], cd["cu"],
                           cd["L"], cd["B"], x0, pdu, v, uhat, e)
    else:
        def backward(cd, w1, w2, wp):
            return s1_call(cd["sq"], cd["nhp"], cd["cx1"], cd["cx2"],
                           cd["cu"], cd["Bb"], cd["LT"], cd["iW"],
                           cd["CpT"], cd["BpT"], w1, w2, wp)

        def forward(cd, v):
            return s2_call(cd["sq"], cd["cx1"], cd["cx2"], cd["cu"],
                           cd["L"], cd["B"], v)

    return backward, forward
