"""Pallas kernels for the streaming L-BFGS buffer passes.

The Gram-form L-BFGS of solver/qn_stream.py needs exactly two passes
over the s/y history per iteration: (1) dot every buffer column
against [s_new, y_new, grad] (plus the six self-dots), (2) materialise
the direction as a weighted combination of the columns.  At config-5
scale the buffer is ~0.3 GB (f32), so these two passes ARE the L-BFGS
cost — and XLA, with the buffers threaded through a scan carry and a
cond, does not reliably fuse the sibling reductions into single
sweeps (measured ~2.7 ms/iter against a ~0.8 ms two-pass floor).
These kernels make the two passes explicit: grid over stages, each
step holds the (n_cols, P, lanes) column block of every buffer in
VMEM once, accumulating the dots in SMEM / emitting the combined
direction block.  Works on both the single-device (lanes = NSP) and
per-shard (lanes = NSLP, inside shard_map) streaming layouts; callers
psum the dot outputs on a mesh.

Reference counterpart: updateLbfgsBuffer dots + twoLoopRecursionLbfgs
column walks (src/SmpcController.cu:1103-1232) — the reference pays
one cuBLAS dot per column per loop step; here the whole history is
touched once per pass regardless of memory length.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_lbfgs_kernels"]


def make_lbfgs_kernels(*, N: int, n_cols: int, PX: int, PU: int,
                       lanes: int, nb, interpret: bool):
    """Build (dot_sweep, combine) callables over the dual-triple
    buffers.

    Buffer layout per key: (n_cols, N, P, lanes), dtype ``nb``
    (float32 or bfloat16 storage).  Slabs: (N, P, lanes) f32.

    dot_sweep(rep, mat_s, mat_y, s, yv, g) ->
        (dS, dY, selfdots) with dS[m] = (<s_m, s>, <s_m, yv>,
        <s_m, g>) etc. and selfdots = (<s,s>, <s,yv>, <yv,yv>,
        <g,g>, <s,g>, <yv,g>) — ONE pass over both buffers.
        ``mat_s``/``mat_y``/``s``/``yv``/``g`` are dicts over the
        dual-triple keys; ``rep`` is the (N, 1, lanes) node-count
        weight.

    combine(coef, mat_s, mat_y, g) -> direction dict,
        direction = sum_m cs[m] s_m + sum_m cy[m] y_m + cg * g —
        ONE pass over both buffers.  ``coef`` is a (2*n_cols + 1,)
        f32 vector [cs..., cy..., cg].
    """
    f32 = jnp.float32
    M = n_cols
    KEYS = ("y1", "y2", "yp")
    PD = {"y1": PX, "y2": PX, "yp": PU}

    def bufb(P):
        return pl.BlockSpec((M, 1, P, lanes), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)

    def slabb(P):
        return pl.BlockSpec((1, P, lanes), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)

    # ---------------- pass 1: dot sweep ----------------
    def dots_kernel(rep, ms1, ms2, msp, my1, my2, myp,
                    s1, s2, sp_, yv1, yv2, yvp, g1, g2, gp,
                    o_dS, o_dY, o_self, accS, accY, accF):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            # SMEM stores must be scalar under Mosaic
            for m in range(M):
                for t in range(3):
                    accS[m, t] = f32(0.0)
                    accY[m, t] = f32(0.0)
            for t in range(8):
                accF[t] = f32(0.0)

        rv = rep[0]                               # (1, lanes)
        for (ms, my, s_, yv_, g_) in (
                (ms1, my1, s1, yv1, g1),
                (ms2, my2, s2, yv2, g2),
                (msp, myp, sp_, yvp, gp)):
            sf = s_[0].astype(f32)
            yf = yv_[0].astype(f32)
            gf = g_[0].astype(f32)
            ts = rv * sf
            ty = rv * yf
            tg = rv * gf
            for m in range(M):
                cs_ = ms[m, 0].astype(f32)
                cy_ = my[m, 0].astype(f32)
                accS[m, 0] = accS[m, 0] + jnp.sum(cs_ * ts)
                accS[m, 1] = accS[m, 1] + jnp.sum(cs_ * ty)
                accS[m, 2] = accS[m, 2] + jnp.sum(cs_ * tg)
                accY[m, 0] = accY[m, 0] + jnp.sum(cy_ * ts)
                accY[m, 1] = accY[m, 1] + jnp.sum(cy_ * ty)
                accY[m, 2] = accY[m, 2] + jnp.sum(cy_ * tg)
            accF[0] = accF[0] + jnp.sum(ts * sf)       # <s, s>
            accF[1] = accF[1] + jnp.sum(ts * yf)       # <s, yv>
            accF[2] = accF[2] + jnp.sum(ty * yf)       # <yv, yv>
            accF[3] = accF[3] + jnp.sum(tg * gf)       # <g, g>
            accF[4] = accF[4] + jnp.sum(ts * gf)       # <s, g>
            accF[5] = accF[5] + jnp.sum(ty * gf)       # <yv, g>

        @pl.when(i == N - 1)
        def _():
            for m in range(M):
                for t in range(3):
                    o_dS[m, t] = accS[m, t]
                    o_dY[m, t] = accY[m, t]
            for t in range(8):
                o_self[t] = accF[t]

    dots_call = pl.pallas_call(
        dots_kernel, grid=(N,),
        in_specs=[slabb(1),
                  bufb(PX), bufb(PX), bufb(PU),
                  bufb(PX), bufb(PX), bufb(PU),
                  slabb(PX), slabb(PX), slabb(PU),
                  slabb(PX), slabb(PX), slabb(PU),
                  slabb(PX), slabb(PX), slabb(PU)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),) * 3,
        out_shape=(jax.ShapeDtypeStruct((M, 3), f32),
                   jax.ShapeDtypeStruct((M, 3), f32),
                   jax.ShapeDtypeStruct((8,), f32)),
        scratch_shapes=[pltpu.SMEM((M, 3), f32),
                        pltpu.SMEM((M, 3), f32),
                        pltpu.SMEM((8,), f32)],
        interpret=interpret, compiler_params=params)

    def dot_sweep(rep, mat_s, mat_y, s, yv, g):
        dS, dY, selfd = dots_call(
            rep, mat_s["y1"], mat_s["y2"], mat_s["yp"],
            mat_y["y1"], mat_y["y2"], mat_y["yp"],
            s["y1"], s["y2"], s["yp"],
            yv["y1"], yv["y2"], yv["yp"],
            g["y1"], g["y2"], g["yp"])
        return dS, dY, selfd

    # ---------------- pass 2: weighted combination ----------------
    def comb_kernel(coef, ms1, ms2, msp, my1, my2, myp, g1, g2, gp,
                    o1, o2, op):
        for (ms, my, g_, o_, P) in (
                (ms1, my1, g1, o1, PX),
                (ms2, my2, g2, o2, PX),
                (msp, myp, gp, op, PU)):
            out = coef[0, 2 * M] * g_[0]
            for m in range(M):
                out += (coef[0, m] * ms[m, 0].astype(f32)
                        + coef[0, M + m] * my[m, 0].astype(f32))
            o_[0] = out

    comb_call = pl.pallas_call(
        comb_kernel, grid=(N,),
        in_specs=[pl.BlockSpec((1, 2 * M + 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  bufb(PX), bufb(PX), bufb(PU),
                  bufb(PX), bufb(PX), bufb(PU),
                  slabb(PX), slabb(PX), slabb(PU)],
        out_specs=(slabb(PX), slabb(PX), slabb(PU)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((N, PD[k], lanes), f32)
            for k in KEYS),
        interpret=interpret, compiler_params=params)

    def combine(coef, mat_s, mat_y, g):
        o1, o2, op = comb_call(
            coef.reshape(1, -1),
            mat_s["y1"], mat_s["y2"], mat_s["yp"],
            mat_y["y1"], mat_y["y2"], mat_y["yp"],
            g["y1"], g["y2"], g["yp"])
        return {"y1": o1, "y2": o2, "yp": op}

    return dot_sweep, combine
