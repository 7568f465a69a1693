"""Streaming Pallas APG iteration for LARGE scenario trees.

The whole-solve kernels (ops/pallas_apg.py, ops/pallas_qn.py) hold the
entire padded working set in VMEM; at 1000+ scenarios (BASELINE config
5: 24 stages x 1024 scenarios) that is >100 MB and cannot fit.  The
XLA path at that scale is HBM-bandwidth bound and pays for
materialising every intermediate (measured 844 us/iter vs a ~300 us
traffic floor — docs/roofline.md).  This module streams the tree
through VMEM instead:

* **Transposed (d, ns) layout.**  The fan slabs are stored stage-major
  transposed: a stage slice is (d, ns) with the scenario axis on the
  128-wide lanes — ns = 1024 pads to zero waste, where the (ns, d)
  layout pads every d (63/97/114) up to 128 (up to 2x read
  amplification).
* **Rank-1 reconstruction.**  The preconditioner diagonals d1/d2/g and
  ALL constraint bounds are sqrt(node-prob) x per-stage rows
  (Engine.__init__); the kernels read one (1, ns) sqrtp line plus
  (d, 1) per-stage columns and form them on the VPU instead of
  streaming five (ns, d) slabs from HBM.
* **Two grid-over-stages kernels per iteration**, double-buffered by
  the Pallas pipeline:
    K1 (reverse grid): the PREVIOUS iteration's prox-residual + dual
       update + Nesterov extrapolation fused elementwise, then the
       backward tree recursion (stage carries t, a in VMEM scratch;
       branching-prefix child->parent aggregation via the factored
       Cp/Bp matmuls) -> v per stage + updated duals + the signed
       infeasibility champion of the previous iteration.
    K2 (forward grid): forward substitution (u, x), the primal H
       application and the prox PRE-images (prim + c*w), plus the two
       global penalty-norm partials the prox shrink factors need.
  The shrink scalars couple all stages, so they are combined between
  the two kernels in XLA (two scalars per iteration — no HBM slabs).

Reference counterpart: one full APG iteration
(src/SmpcController.cu:1500-1525 and the solve-step recursions
:563-755) — the reference launches ~10 cuBLAS calls per stage per
sweep plus separate prox/residual/update kernels and two host syncs;
here one iteration is two pallas_calls and two scalar ops, all
device-resident.

Numerics: identical operation set and order as solver/apg.py within
each stage; matmuls run at Precision.HIGHEST.  The dual update of
iteration i is applied inside iteration i+1's K1 (fused), with an XLA
tail for the final update — trajectories match the XLA path to f32
rounding (see tests/test_pallas_stream.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8


def _pad(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _padr(a, rows):
    """Pad axis -2 (sublane/rows) of a stage-major (N, d, ns) array."""
    pad = [(0, 0)] * a.ndim
    pad[-2] = (0, rows - a.shape[-2])
    return np.pad(a, pad)


def pack_stream_constants(fa: dict) -> dict:
    """Host-side one-time pack: transposed slabs, rank-1 factors,
    padded shared matrices and factored prefix aggregation."""
    d1 = np.asarray(fa["d1"], np.float32)      # (N, ns, nx)
    N, ns, nx = d1.shape
    nu = np.asarray(fa["g"]).shape[-1]
    nv = np.asarray(fa["invWbar"]).shape[0]
    NSP = _pad(ns, LANE)
    PX, PU, PV = _pad(nx, SUB), _pad(nu, SUB), _pad(nv, SUB)

    prob = np.asarray(fa["prob"], np.float32)[..., 0]     # (N, ns)
    sq = np.sqrt(prob)
    # rank-1 columns: d1 = cx1 * sq  (recover per-stage rows by the
    # representative slot 0, whose sqrtp is nonzero)
    with np.errstate(divide="ignore", invalid="ignore"):
        cx1 = np.asarray(fa["d1"])[:, 0, :] / sq[:, :1]   # (N, nx)
        cx2 = np.asarray(fa["d2"])[:, 0, :] / sq[:, :1]
        cu = np.asarray(fa["g"])[:, 0, :] / sq[:, :1]     # (N, nu)
        bx_min = np.asarray(fa["xmin"])[:, 0, :] / sq[:, :1]
        bx_max = np.asarray(fa["xmax"])[:, 0, :] / sq[:, :1]
        bx_s = np.asarray(fa["xs"])[:, 0, :] / sq[:, :1]
        bu_min = np.asarray(fa["umin"])[:, 0, :] / sq[:, :1]
        bu_max = np.asarray(fa["umax"])[:, 0, :] / sq[:, :1]
    # exact rank-1 check: the streaming path reconstructs every diagonal
    # and bound slab as (per-stage row) x sqrt(node prob); verify ALL of
    # them (a factor dict where only d1 is factorable — e.g. hand-built
    # per-node bounds — must fall back to the XLA path, not silently
    # produce wrong solves)
    for name, row in (("d1", cx1), ("d2", cx2), ("g", cu),
                      ("xmin", bx_min), ("xmax", bx_max), ("xs", bx_s),
                      ("umin", bu_min), ("umax", bu_max)):
        rec = row[:, None, :] * sq[:, :, None]
        if not np.allclose(rec, np.asarray(fa[name]), rtol=1e-5,
                           atol=1e-6):
            raise ValueError(
                f"{name} is not sqrt(prob) x per-stage row — the "
                "streaming kernel requires the standard preconditioner "
                "structure (engine/engine.py)")

    def col(a, P):
        return _padr(np.asarray(a, np.float32)[:, :, None], P)

    nhp = np.asarray(fa["nhp"], np.float32)[..., 0]       # (N, ns)
    out = {
        "dims": (N, ns, nx, nu, nv, NSP, PX, PU, PV),
        "sq": np.pad(sq, ((0, 0), (0, NSP - ns)))[:, None, :],
        "nhp": np.pad(nhp, ((0, 0), (0, NSP - ns)))[:, None, :],
        "rep": np.pad(np.asarray(fa["rep"], np.float32),
                      ((0, 0), (0, NSP - ns)))[:, None, :],
        "cx1": col(cx1, PX), "cx2": col(cx2, PX), "cu": col(cu, PU),
        "bx_min": col(bx_min, PX), "bx_max": col(bx_max, PX),
        "bx_s": col(bx_s, PX),
        "bu_min": col(bu_min, PU), "bu_max": col(bu_max, PU),
        "Bb": _padr(np.pad(np.asarray(fa["Bb"], np.float32),
                           ((0, 0), (0, PX - nx)))[None], PV)[0],
        "LT": _padr(np.pad(np.asarray(fa["L"], np.float32).T,
                           ((0, 0), (0, PU - nu)))[None], PV)[0],
        "iW": _padr(np.pad(np.asarray(fa["invWbar"], np.float32),
                           ((0, 0), (0, PV - nv)))[None], PV)[0],
        "L": _padr(np.pad(np.asarray(fa["L"], np.float32),
                          ((0, 0), (0, PV - nv)))[None], PU)[0],
        "B": _padr(np.pad(np.asarray(fa["B"], np.float32),
                          ((0, 0), (0, PU - nu)))[None], PX)[0],
    }

    # factored prefix aggregation, transposed + ns-padded:
    # q_t (d, ns) @ CpT (ns, Rmax) -> parents (d, Rmax);
    # parents @ BpT (Rmax, ns) -> q_t'
    stages = tuple(sorted(fa["prefix_Cp"].keys(), reverse=True))
    out["prefix_stages"] = stages
    if stages:
        Rmax = _pad(max(np.asarray(fa["prefix_Cp"][s]).shape[0]
                        for s in stages), LANE)
        CpT = np.zeros((len(stages), NSP, Rmax), np.float32)
        BpT = np.zeros((len(stages), Rmax, NSP), np.float32)
        for k, s in enumerate(stages):
            Cp = np.asarray(fa["prefix_Cp"][s], np.float32)
            Bp = np.asarray(fa["prefix_Bp"][s], np.float32)
            CpT[k, :ns, :Cp.shape[0]] = Cp.T
            BpT[k, :Bp.shape[1], :ns] = Bp.T
        out["CpT"], out["BpT"] = CpT, BpT
        out["Rmax"] = Rmax
    else:
        out["Rmax"] = LANE
        out["CpT"] = np.zeros((1, NSP, LANE), np.float32)
        out["BpT"] = np.zeros((1, LANE, NSP), np.float32)
    return out


STREAM_VMEM_LIMIT = 100 * 1024 * 1024


def vmem_bytes_stream(consts: dict) -> int:
    """Upper estimate of the streaming kernels' VMEM working set.

    Counts the double-buffered per-stage (P, NSP) blocks of the larger
    kernel (K1), the full-resident shared matrices and aggregation
    operators, and the stage scratch.  Used by the controller's auto
    backend selection so trees whose per-stage blocks exceed the VMEM
    budget keep the XLA path instead of failing at Mosaic compile time
    (the per-stage working set scales with ns)."""
    N, ns, nx, nu, nv, NSP, PX, PU, PV = consts["dims"]
    Rmax = consts["Rmax"]
    n_pref = max(len(consts["prefix_stages"]), 1)
    dual_rows = 2 * PX + PU                 # one dual/pre/residual group
    # K1 per-stage rows: sq+nhp, beta, pre/y/z in, y'/z' out, v out
    k1_rows = 2 + 2 * PV + 5 * dual_rows
    blocks = 2 * k1_rows * NSP * 4          # x2: pipeline double-buffer
    full = (4 * (PV * (PX + PU + PV) + PU * PV + PX * PU)
            + 2 * n_pref * NSP * Rmax * 4   # CpT + BpT
            + 12 * max(PX, PU) * 4)         # rank-1 columns
    scratch = (PX + PV) * NSP * 4
    return blocks + full + scratch


def fits_vmem_stream(consts: dict,
                     budget: int = STREAM_VMEM_LIMIT) -> bool:
    return vmem_bytes_stream(consts) <= budget


def estimate_stream_dims(fa: dict, n_shards: int = 1) -> dict:
    """Shape-only estimate of the streaming pack's dims/Rmax — enough
    to run :func:`fits_vmem_stream` without paying the tens-of-MB
    transpose/pad pass of :func:`pack_stream_constants`.

    ``n_shards > 1`` sizes the PER-SHARD lane block (``NSLP``): the
    sharded streaming kernels (ops/pallas_stream_sharded.py) stream
    per-shard blocks, so gating an n-chip mesh on the full-tree lane
    width would be ~n× too conservative and silently route exactly the
    very-large trees the multi-chip fast path exists for onto the
    slower XLA shard_map path.  Rank-1 structure is NOT validated here
    — the factory's own pack still raises ValueError for
    non-streamable factor dicts (callers in auto mode catch it and
    fall back to XLA)."""
    N, ns, nx = np.asarray(fa["d1"]).shape
    nu = np.asarray(fa["g"]).shape[-1]
    nv = np.asarray(fa["invWbar"]).shape[0]
    nsl = -(-ns // max(int(n_shards), 1))         # ceil
    NSLP = _pad(nsl, LANE)
    PX, PU, PV = _pad(nx, SUB), _pad(nu, SUB), _pad(nv, SUB)
    stages = tuple(sorted(fa["prefix_Cp"].keys(), reverse=True))
    if stages:
        Rmax = _pad(max(np.asarray(fa["prefix_Cp"][s]).shape[0]
                        for s in stages), LANE)
    else:
        Rmax = LANE
    return {"dims": (N, ns, nx, nu, nv, NSLP, PX, PU, PV),
            "Rmax": Rmax, "prefix_stages": stages}


def _to_t(a, NSP, P):
    """(N, ns, d) -> padded stage-major transposed (N, P, NSP)."""
    a = jnp.asarray(a, jnp.float32)
    N, ns, d = a.shape
    a = jnp.transpose(a, (0, 2, 1))
    return jnp.pad(a, ((0, 0), (0, P - d), (0, NSP - ns)))


def _from_t(a, ns, d):
    """(N, P, NSP) -> (N, ns, d)."""
    return jnp.transpose(a[:, :d, :ns], (0, 2, 1))


def pack_stream_step(step: dict, dims) -> dict:
    """Per-control-step transposes (inside jit; one-time per solve)."""
    N, ns, nx, nu, nv, NSP, PX, PU, PV = dims
    return {
        "beta": _to_t(step["beta"], NSP, PV),
        "uhat": _to_t(step["uhat"], NSP, PU),
        "e": _to_t(step["e"], NSP, PX),
        "x0": jnp.pad(jnp.asarray(step["x0"], jnp.float32),
                      (0, PX - nx))[:, None],
        "pdu": jnp.pad(jnp.asarray(step["prev_u"], jnp.float32) -
                       jnp.asarray(step["prev_uhat"], jnp.float32),
                       (0, PU - nu))[:, None],
    }


def make_apg_stream(fa: dict, *, inv_step: float, step_size: float,
                    penalty_state: float, penalty_safety: float,
                    xs_upper: float, max_iterations: int,
                    project_control: bool = True,
                    interpret: bool | str = "auto",
                    precision: str | lax.Precision =
                        lax.Precision.HIGHEST,
                    consts: dict | None = None,
                    stage_block: int | str = 1):
    """Streaming-kernel APG solve: run(step, y0=None) -> solver outputs.

    Same output contract as solver/apg.make_apg (control, x, u, v, y,
    primal_infeasibility, iterations).  Fixed iteration budget only —
    use the XLA path for tolerance-based early exit.

    ``precision``: MXU pass count for the in-kernel matmuls.  HIGHEST
    (default, bf16x6) matches the XLA path bit-for-bit in the golden
    tests; DEFAULT (bf16x1) is the measured 5%-faster relaxation at a
    1.5e-3 relative control deviation (see docs/roofline.md; Mosaic
    lowers no middle tier — HIGH raises at compile).

    ``consts``: a precomputed ``pack_stream_constants(fa)`` result, so
    a caller that already packed to run the VMEM gate does not pay the
    tens-of-MB transpose/pad pass twice.

    ``stage_block``: stages per K1/K2 grid invocation (must divide N;
    'auto' picks the largest divisor ≤ 4).  The stage recursion stays
    sequential in-kernel; bigger blocks amortise per-invocation DMA
    setup — the round-4 attributed remainder of the streaming gap
    (docs/roofline.md).  Identical math at any block size.
    """
    if interpret == "auto":
        interpret = jax.devices()[0].platform == "cpu"
    if consts is None:
        consts = pack_stream_constants(fa)
    N, ns, nx, nu, nv, NSP, PX, PU, PV = consts["dims"]
    Rmax = consts["Rmax"]
    prefix_stages = consts["prefix_stages"]
    n_pref = max(len(prefix_stages), 1)
    c = float(inv_step)
    step = float(step_size)
    t1c = float(inv_step * penalty_state)
    t2c = float(inv_step * penalty_safety)
    xs_up = float(xs_upper)
    f32 = jnp.float32
    PREC = precision
    if stage_block == "auto":
        stage_block = max(k for k in (4, 3, 2, 1) if N % k == 0)
    K = int(stage_block)
    if K < 1 or N % K != 0:
        raise ValueError(f"stage_block={K} must divide N={N}")
    NB = N // K

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=PREC)

    # ---------------- K1: fused dual-update + backward sweep ----------
    # grid i = 0..NB-1 visits stages s = N-1-i*K .. N-K-i*K
    def k1(sc, sq, nhp, cx1, cx2, cu, bxmin, bxmax, bxs, bumin, bumax,
           Bb, LT, iW, CpT, BpT, beta,
           pre1, pre2, prep, y1, y2, yp, z1, z2, zp,
           o_y1, o_y2, o_yp, o_z1, o_z2, o_zp, o_v, o_inf,
           t_s, a_s, hilo):
        i = pl.program_id(0)
        lam_prev, lam_i, upd, k1f, k2f = (sc[0, 0], sc[0, 1], sc[0, 2],
                                          sc[0, 3], sc[0, 4])

        @pl.when(i == 0)
        def _():
            hilo[0] = f32(-jnp.inf)
            hilo[1] = f32(jnp.inf)
            hilo[2] = f32(-jnp.inf)
            hilo[3] = f32(jnp.inf)
            t_s[...] = jnp.zeros((PX, NSP), f32)
            a_s[...] = jnp.zeros((PV, NSP), f32)

        for j in range(K):
            rj = K - 1 - j                 # block row (stage-major)
            s = N - 1 - (i * K + j)        # dynamic stage index
            sqv = sq[rj]                                  # (1, NSP)
            d1 = cx1[rj] * sqv                            # (PX, NSP)
            d2 = cx2[rj] * sqv
            g = cu[rj] * sqv

            def upd_block(pre, w_prev, box_lo, box_hi, shrink):
                diff = pre - jnp.clip(pre, box_lo, box_hi)
                return (1.0 - shrink) * diff - c * w_prev

            # previous iteration's w, residual, dual update
            w1p = y1[rj] + lam_prev * z1[rj]
            w2p = y2[rj] + lam_prev * z2[rj]
            wpp = yp[rj] + lam_prev * zp[rj]
            r1 = upd_block(pre1[rj], w1p, bxmin[rj] * sqv,
                           bxmax[rj] * sqv, k1f)
            r2 = upd_block(pre2[rj], w2p, bxs[rj] * sqv, xs_up, k2f)
            rp = upd_block(prep[rj], wpp, bumin[rj] * sqv,
                           bumax[rj] * sqv, 0.0)
            y1n = y1[rj] + upd * (lam_prev * z1[rj] + step * r1)
            y2n = y2[rj] + upd * (lam_prev * z2[rj] + step * r2)
            ypn = yp[rj] + upd * (lam_prev * zp[rj] + step * rp)
            z1n = y1n - y1[rj]
            z2n = y2n - y2[rj]
            zpn = ypn - yp[rj]
            o_y1[rj] = y1n
            o_y2[rj] = y2n
            o_yp[rj] = ypn
            o_z1[rj] = z1n
            o_z2[rj] = z2n
            o_zp[rj] = zpn

            # signed max-abs champion of the previous residual
            hx = jnp.maximum(jnp.max(r1), jnp.max(r2))
            lx = jnp.minimum(jnp.min(r1), jnp.min(r2))
            hilo[0] = jnp.maximum(hilo[0], hx)
            hilo[1] = jnp.minimum(hilo[1], lx)
            hilo[2] = jnp.maximum(hilo[2], jnp.max(rp))
            hilo[3] = jnp.minimum(hilo[3], jnp.min(rp))

            if j == K - 1:
                @pl.when(i == NB - 1)
                def _():
                    vx = jnp.where(hilo[0] > -hilo[1], hilo[0],
                                   hilo[1])
                    vp = jnp.where(hilo[2] > -hilo[3], hilo[2],
                                   hilo[3])
                    o_inf[0, 0] = jnp.maximum(vx, vp)

            # this iteration's extrapolated dual
            w1 = y1n + lam_i * z1n
            w2 = y2n + lam_i * z2n
            wp = ypn + lam_i * zpn

            # backward stage math (solver/solve_step.py stage_math,
            # transposed)
            t_new = d1 * w1 + d2 * w2 + t_s[...]
            inner = (beta[rj] + a_s[...] + dot(Bb[...], t_new) +
                     dot(LT[...], g * wp))
            o_v[rj] = nhp[rj] * dot(iW[...], inner)

            # child -> parent handoff (factored aggregation at the
            # branching-prefix stages; identity elsewhere)
            q, r = t_new, inner
            for k, ps in enumerate(prefix_stages):
                if ps > 0:
                    is_s = s == ps

                    @pl.when(is_s)
                    def _(k=k, q=q, r=r):
                        qp = dot(q, CpT[k])           # (PX, Rmax)
                        rp_ = dot(r, CpT[k])          # (PV, Rmax)
                        t_s[...] = dot(qp, BpT[k])
                        a_s[...] = dot(rp_, BpT[k])

                    @pl.when(jnp.logical_not(is_s))
                    def _(q=q, r=r):
                        t_s[...] = q
                        a_s[...] = r
                    # subsequent checks see the stored value
                    q, r = t_s[...], a_s[...]
            if not prefix_stages:
                t_s[...] = q
                a_s[...] = r

    # ---------------- K2: forward + primal + prox pre-images ----------
    def k2(sc, sq, cx1, cx2, cu, bxmin, bxmax, bxs, rep, L, B,
           x0, pdu, v, uhat, e, y1, y2, yp, z1, z2, zp,
           o_x, o_u, o_pre1, o_pre2, o_prep, o_d1, o_d2,
           du_s, x_s, acc):
        i = pl.program_id(0)
        lam_i = sc[0, 1]

        @pl.when(i == 0)
        def _():
            du_s[...] = jnp.broadcast_to(pdu[...], (PU, NSP))
            x_s[...] = jnp.broadcast_to(x0[...], (PX, NSP))
            acc[0] = f32(0.0)
            acc[1] = f32(0.0)

        for rj in range(K):
            sqv = sq[rj]
            d1 = cx1[rj] * sqv
            d2 = cx2[rj] * sqv
            g = cu[rj] * sqv

            du = du_s[...] + dot(L[...], v[rj])
            u = uhat[rj] + du
            x = x_s[...] + e[rj] + dot(B[...], u)
            du_s[...] = du
            x_s[...] = x
            o_x[rj] = x
            o_u[rj] = u

            w1 = y1[rj] + lam_i * z1[rj]
            w2 = y2[rj] + lam_i * z2[rj]
            wp = yp[rj] + lam_i * zp[rj]
            pre1 = d1 * x + c * w1
            pre2 = d2 * x + c * w2
            prep = g * u + c * wp
            o_pre1[rj] = pre1
            o_pre2[rj] = pre2
            o_prep[rj] = prep

            rv = rep[rj]                               # (1, NSP)
            df1 = pre1 - jnp.clip(pre1, bxmin[rj] * sqv,
                                  bxmax[rj] * sqv)
            df2 = pre2 - jnp.clip(pre2, bxs[rj] * sqv, xs_up)
            acc[0] = acc[0] + jnp.sum(rv * df1 * df1)
            acc[1] = acc[1] + jnp.sum(rv * df2 * df2)

            if rj == K - 1:
                @pl.when(i == NB - 1)
                def _():
                    o_d1[0, 0] = acc[0]
                    o_d2[0, 0] = acc[1]

    # ---------------- specs ----------------
    def rev(i):
        return (NB - 1 - i, 0, 0)

    def fwd(i):
        return (i, 0, 0)

    def blk(P, index_map):
        return pl.BlockSpec((K, P, NSP), index_map,
                            memory_space=pltpu.VMEM)

    def colb(P, index_map):
        """Per-stage (P, 1) column blocks (rank-1 factors/bounds)."""
        return pl.BlockSpec((K, P, 1), index_map,
                            memory_space=pltpu.VMEM)

    def fullb(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    smem_sc = pl.BlockSpec((1, 8), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    smem_out = pl.BlockSpec(memory_space=pltpu.SMEM)

    dslab = jax.ShapeDtypeStruct((N, PX, NSP), f32)
    uslab = jax.ShapeDtypeStruct((N, PU, NSP), f32)
    vslab = jax.ShapeDtypeStruct((N, PV, NSP), f32)
    scal = jax.ShapeDtypeStruct((1, 1), f32)

    k1_call = pl.pallas_call(
        k1,
        grid=(NB,),
        in_specs=[smem_sc,
                  blk(1, rev), blk(1, rev),                  # sq nhp
                  colb(PX, rev), colb(PX, rev), colb(PU, rev),
                  colb(PX, rev), colb(PX, rev), colb(PX, rev),  # bx*
                  colb(PU, rev), colb(PU, rev),                 # bu*
                  fullb((PV, PX)), fullb((PV, PU)),          # Bb LT
                  fullb((PV, PV)),                           # iW
                  fullb((n_pref, NSP, Rmax)),                # CpT
                  fullb((n_pref, Rmax, NSP)),                # BpT
                  blk(PV, rev),                              # beta
                  blk(PX, rev), blk(PX, rev), blk(PU, rev),  # pre*
                  blk(PX, rev), blk(PX, rev), blk(PU, rev),  # y
                  blk(PX, rev), blk(PX, rev), blk(PU, rev)],  # z
        out_specs=(blk(PX, rev), blk(PX, rev), blk(PU, rev),   # y'
                   blk(PX, rev), blk(PX, rev), blk(PU, rev),   # z'
                   blk(PV, rev),                               # v
                   smem_out),                                  # inf
        out_shape=(dslab, dslab, uslab, dslab, dslab, uslab,
                   vslab, scal),
        scratch_shapes=[pltpu.VMEM((PX, NSP), f32),
                        pltpu.VMEM((PV, NSP), f32),
                        pltpu.SMEM((4,), f32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    k2_call = pl.pallas_call(
        k2,
        grid=(NB,),
        in_specs=[smem_sc,
                  blk(1, fwd),                                  # sq
                  colb(PX, fwd), colb(PX, fwd), colb(PU, fwd),
                  colb(PX, fwd), colb(PX, fwd), colb(PX, fwd),  # bx*
                  blk(1, fwd),                                  # rep
                  fullb((PU, PV)), fullb((PX, PU)),           # L B
                  fullb((PX, 1)), fullb((PU, 1)),             # x0 pdu
                  blk(PV, fwd), blk(PU, fwd), blk(PX, fwd),   # v uhat e
                  blk(PX, fwd), blk(PX, fwd), blk(PU, fwd),   # y
                  blk(PX, fwd), blk(PX, fwd), blk(PU, fwd)],  # z
        out_specs=(blk(PX, fwd), blk(PU, fwd),                # x u
                   blk(PX, fwd), blk(PX, fwd), blk(PU, fwd),  # pre*
                   smem_out, smem_out),                       # dists
        out_shape=(dslab, uslab, dslab, dslab, uslab, scal, scal),
        scratch_shapes=[pltpu.VMEM((PU, NSP), f32),
                        pltpu.VMEM((PX, NSP), f32),
                        pltpu.SMEM((2,), f32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    cd = {k: jnp.asarray(consts[k]) for k in
          ("sq", "nhp", "rep", "cx1", "cx2", "cu", "bx_min", "bx_max",
           "bx_s", "bu_min", "bu_max", "Bb", "LT", "iW", "L", "B",
           "CpT", "BpT")}

    # Nesterov lambda sequence (host-side, static budget)
    th = np.ones(max_iterations + 1, np.float64)
    for i in range(max_iterations):
        th[i + 1] = 0.5 * (np.sqrt(th[i] ** 4 + 4 * th[i] ** 2)
                           - th[i] ** 2)
    # lam_i = th1_i * (1/th1_{i-1} - 1); lam_0 = 0 (matches the carried
    # (th0, th1) recurrence of solver/apg.py)
    lam_seq = np.float32(
        [0.0] + [th[i] * (1.0 / th[i - 1] - 1.0)
                 for i in range(1, max_iterations + 1)])

    # physical root-control bounds (solve_step.root_control_bounds)
    if "umin_phys" in fa:
        umin00 = jnp.asarray(np.asarray(fa["umin_phys"]))
        umax00 = jnp.asarray(np.asarray(fa["umax_phys"]))
    else:
        umin00 = jnp.asarray(np.asarray(fa["umin"])[0, 0])
        umax00 = jnp.asarray(np.asarray(fa["umax"])[0, 0])

    @jax.jit
    def run_impl(cd, step_in, y0):
        sp = pack_stream_step(step_in, consts["dims"])
        zeros_x = jnp.zeros((N, PX, NSP), f32)
        zeros_u = jnp.zeros((N, PU, NSP), f32)
        state = {
            "y1": y0["y1"], "y2": y0["y2"], "yp": y0["yp"],
            "z1": zeros_x, "z2": zeros_x, "zp": zeros_u,
            "pre1": zeros_x, "pre2": zeros_x, "prep": zeros_u,
            "k1": f32(0.0), "k2": f32(0.0),
        }
        lam = jnp.asarray(lam_seq)

        def body(st, it):
            lam_prev = lam[jnp.maximum(it - 1, 0)]
            lam_i = lam[it]
            upd = jnp.where(it > 0, 1.0, 0.0).astype(f32)
            sc = jnp.stack([lam_prev, lam_i, upd, st["k1"], st["k2"],
                            0.0, 0.0, 0.0]).reshape(1, 8)
            y1n, y2n, ypn, z1n, z2n, zpn, v, inf = k1_call(
                sc, cd["sq"], cd["nhp"], cd["cx1"], cd["cx2"],
                cd["cu"], cd["bx_min"], cd["bx_max"], cd["bx_s"],
                cd["bu_min"], cd["bu_max"], cd["Bb"], cd["LT"],
                cd["iW"], cd["CpT"], cd["BpT"], sp["beta"],
                st["pre1"], st["pre2"], st["prep"],
                st["y1"], st["y2"], st["yp"],
                st["z1"], st["z2"], st["zp"])
            x, u, pre1, pre2, prep, d1sq, d2sq = k2_call(
                sc, cd["sq"], cd["cx1"], cd["cx2"], cd["cu"],
                cd["bx_min"], cd["bx_max"], cd["bx_s"], cd["rep"],
                cd["L"], cd["B"], sp["x0"], sp["pdu"],
                v, sp["uhat"], sp["e"],
                y1n, y2n, ypn, z1n, z2n, zpn)
            dist1 = jnp.sqrt(d1sq[0, 0])
            dist2 = jnp.sqrt(d2sq[0, 0])
            k1f = jnp.where(dist1 > t1c,
                            1.0 - t1c / jnp.maximum(dist1, 1e-30), 0.0)
            k2f = jnp.where(dist2 > t2c,
                            1.0 - t2c / jnp.maximum(dist2, 1e-30), 0.0)
            new = {"y1": y1n, "y2": y2n, "yp": ypn,
                   "z1": z1n, "z2": z2n, "zp": zpn,
                   "pre1": pre1, "pre2": pre2, "prep": prep,
                   "k1": k1f, "k2": k2f,
                   "x": x, "u": u, "v": v}
            return new, inf[0, 0]

        state.update({"x": jnp.zeros((N, PX, NSP), f32),
                      "u": jnp.zeros((N, PU, NSP), f32),
                      "v": jnp.zeros((N, PV, NSP), f32)})
        st, infs = lax.scan(body, state, jnp.arange(max_iterations),
                            unroll=1)
        x, u, v = st["x"], st["u"], st["v"]

        # XLA tail: the final dual update + its infeasibility
        lam_last = lam[max_iterations - 1]
        sqv = cd["sq"]                                  # (N, 1, NSP)

        def tail_block(pre, y, z, lo, hi, shrink):
            w = y + lam_last * z
            diff = pre - jnp.clip(pre, lo, hi)
            res = (1.0 - shrink) * diff - c * w
            return w + step * res, res

        y1f, r1 = tail_block(st["pre1"], st["y1"], st["z1"],
                             cd["bx_min"] * sqv, cd["bx_max"] * sqv,
                             st["k1"])
        y2f, r2 = tail_block(st["pre2"], st["y2"], st["z2"],
                             cd["bx_s"] * sqv, xs_up, st["k2"])
        ypf, rp = tail_block(st["prep"], st["yp"], st["zp"],
                             cd["bu_min"] * sqv, cd["bu_max"] * sqv,
                             0.0)

        def champ(*rs):
            hi = jnp.max(jnp.stack([jnp.max(r) for r in rs]))
            lo = jnp.min(jnp.stack([jnp.min(r) for r in rs]))
            return jnp.where(hi > -lo, hi, lo)

        inf_last = jnp.maximum(champ(r1, r2), champ(rp))
        infs = jnp.concatenate([infs[1:], inf_last[None]])

        xi = jnp.concatenate([_from_t(y1f, ns, nx),
                              _from_t(y2f, ns, nx)], axis=-1)
        psi = _from_t(ypf, ns, nu)
        u0 = u[0, :nu, 0]
        if project_control:
            u0 = jnp.clip(u0, umin00, umax00)
        return {
            "control": u0,
            "x": _from_t(x, ns, nx), "u": _from_t(u, ns, nu),
            "v": _from_t(v, ns, nv),
            "y": {"xi": xi, "psi": psi},
            "primal_infeasibility": infs,
            "iterations": jnp.int32(max_iterations),
        }

    def run(step_in, y0=None):
        if y0 is None:
            y0t = {"y1": jnp.zeros((N, PX, NSP), f32),
                   "y2": jnp.zeros((N, PX, NSP), f32),
                   "yp": jnp.zeros((N, PU, NSP), f32)}
        else:
            xi = jnp.asarray(y0["xi"], f32)
            y0t = {"y1": _to_t(xi[..., :nx], NSP, PX),
                   "y2": _to_t(xi[..., nx:], NSP, PX),
                   "yp": _to_t(jnp.asarray(y0["psi"], f32), NSP, PU)}
        return run_impl(cd, step_in, y0t)

    return run


def make_apg_stream_fused(fa: dict, *, inv_step: float, step_size: float,
                          penalty_state: float, penalty_safety: float,
                          xs_upper: float, max_iterations: int,
                          project_control: bool = True,
                          interpret: bool | str = "auto",
                          precision: str | lax.Precision =
                              lax.Precision.HIGHEST):
    """Fused streaming APG: ONE pallas_call per iteration.

    The two-kernel version re-reads the duals in the forward kernel to
    rebuild the extrapolated w; here one kernel runs a (2N,) grid —
    the first N steps are the backward sweep (stages N-1..0, with the
    previous iteration's dual update fused in), the last N the forward
    sweep (stages 0..N-1) — and the extrapolated w and the candidate
    controls v live ENTIRELY in VMEM scratch between the phases.  Per
    iteration this removes one kernel dispatch + pipeline drain, the v
    HBM round-trip and all phase-1 dual reads (~30% of the two-kernel
    version's traffic).  Same numerics and output contract as
    :func:`make_apg_stream`.
    """
    if interpret == "auto":
        interpret = jax.devices()[0].platform == "cpu"
    consts = pack_stream_constants(fa)
    N, ns, nx, nu, nv, NSP, PX, PU, PV = consts["dims"]
    Rmax = consts["Rmax"]
    prefix_stages = consts["prefix_stages"]
    n_pref = max(len(prefix_stages), 1)
    c = float(inv_step)
    step = float(step_size)
    t1c = float(inv_step * penalty_state)
    t2c = float(inv_step * penalty_safety)
    xs_up = float(xs_upper)
    f32 = jnp.float32
    PREC = precision

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=PREC)

    def kernel(sc, sq, nhp, cx1, cx2, cu, bxmin, bxmax, bxs,
               bumin, bumax, rep, Bb, LT, iW, L, B, CpT, BpT,
               x0, pdu, beta, uhat, e,
               pre1, pre2, prep, y1, y2, yp, z1, z2, zp,
               o_y1, o_y2, o_yp, o_z1, o_z2, o_zp,
               o_x, o_u, o_pre1, o_pre2, o_prep, o_v,
               o_inf, o_d1, o_d2,
               w1f, w2f, wpf, vf, t_s, a_s, du_s, x_s, hilo, acc):
        i = pl.program_id(0)
        bwd = i < N
        lam_prev, lam_i, upd, k1f, k2f = (sc[0, 0], sc[0, 1], sc[0, 2],
                                          sc[0, 3], sc[0, 4])
        sqv = sq[0]
        d1 = cx1[0] * sqv
        d2 = cx2[0] * sqv
        g = cu[0] * sqv

        # ------- phase 0: dual update + w + backward stage -------
        @pl.when(bwd)
        def _():
            s = N - 1 - i

            def upd_block(pre, w_prev, lo, hi, shrink):
                diff = pre[0] - jnp.clip(pre[0], lo, hi)
                return (1.0 - shrink) * diff - c * w_prev

            w1p = y1[0] + lam_prev * z1[0]
            w2p = y2[0] + lam_prev * z2[0]
            wpp = yp[0] + lam_prev * zp[0]
            r1 = upd_block(pre1, w1p, bxmin[0] * sqv, bxmax[0] * sqv,
                           k1f)
            r2 = upd_block(pre2, w2p, bxs[0] * sqv, xs_up, k2f)
            rp = upd_block(prep, wpp, bumin[0] * sqv, bumax[0] * sqv,
                           0.0)
            y1n = y1[0] + upd * (lam_prev * z1[0] + step * r1)
            y2n = y2[0] + upd * (lam_prev * z2[0] + step * r2)
            ypn = yp[0] + upd * (lam_prev * zp[0] + step * rp)
            z1n = y1n - y1[0]
            z2n = y2n - y2[0]
            zpn = ypn - yp[0]
            o_y1[0] = y1n
            o_y2[0] = y2n
            o_yp[0] = ypn
            o_z1[0] = z1n
            o_z2[0] = z2n
            o_zp[0] = zpn

            @pl.when(i == 0)
            def _():
                hilo[0] = f32(-jnp.inf)
                hilo[1] = f32(jnp.inf)
                hilo[2] = f32(-jnp.inf)
                hilo[3] = f32(jnp.inf)

            hilo[0] = jnp.maximum(hilo[0],
                                  jnp.maximum(jnp.max(r1), jnp.max(r2)))
            hilo[1] = jnp.minimum(hilo[1],
                                  jnp.minimum(jnp.min(r1), jnp.min(r2)))
            hilo[2] = jnp.maximum(hilo[2], jnp.max(rp))
            hilo[3] = jnp.minimum(hilo[3], jnp.min(rp))

            @pl.when(i == N - 1)
            def _():
                vx = jnp.where(hilo[0] > -hilo[1], hilo[0], hilo[1])
                vp = jnp.where(hilo[2] > -hilo[3], hilo[2], hilo[3])
                o_inf[0, 0] = jnp.maximum(vx, vp)

            w1 = y1n + lam_i * z1n
            w2 = y2n + lam_i * z2n
            wp = ypn + lam_i * zpn
            w1f[pl.ds(s * PX, PX)] = w1
            w2f[pl.ds(s * PX, PX)] = w2
            wpf[pl.ds(s * PU, PU)] = wp

            @pl.when(i == 0)
            def _():
                t_s[...] = jnp.zeros((PX, NSP), f32)
                a_s[...] = jnp.zeros((PV, NSP), f32)

            t_new = d1 * w1 + d2 * w2 + t_s[...]
            inner = (beta[0] + a_s[...] + dot(Bb[...], t_new) +
                     dot(LT[...], g * wp))
            v_s = nhp[0] * dot(iW[...], inner)
            vf[pl.ds(s * PV, PV)] = v_s
            o_v[0] = v_s

            q, r = t_new, inner
            for k, ps in enumerate(prefix_stages):
                if ps > 0:
                    is_s = s == ps

                    @pl.when(is_s)
                    def _(k=k, q=q, r=r):
                        qp = dot(q, CpT[k])
                        rp_ = dot(r, CpT[k])
                        t_s[...] = dot(qp, BpT[k])
                        a_s[...] = dot(rp_, BpT[k])

                    @pl.when(jnp.logical_not(is_s))
                    def _(q=q, r=r):
                        t_s[...] = q
                        a_s[...] = r
                    q, r = t_s[...], a_s[...]
            if not prefix_stages:
                t_s[...] = q
                a_s[...] = r

        # ------- phase 1: forward + primal + prox pre-images -------
        @pl.when(jnp.logical_not(bwd))
        def _():
            s = i - N

            @pl.when(i == N)
            def _():
                du_s[...] = jnp.broadcast_to(pdu[...], (PU, NSP))
                x_s[...] = jnp.broadcast_to(x0[...], (PX, NSP))
                acc[0] = f32(0.0)
                acc[1] = f32(0.0)

            v = vf[pl.ds(s * PV, PV)]
            du = du_s[...] + dot(L[...], v)
            u = uhat[0] + du
            x = x_s[...] + e[0] + dot(B[...], u)
            du_s[...] = du
            x_s[...] = x
            o_x[0] = x
            o_u[0] = u

            w1 = w1f[pl.ds(s * PX, PX)]
            w2 = w2f[pl.ds(s * PX, PX)]
            wp = wpf[pl.ds(s * PU, PU)]
            p1 = d1 * x + c * w1
            p2 = d2 * x + c * w2
            pp = g * u + c * wp
            o_pre1[0] = p1
            o_pre2[0] = p2
            o_prep[0] = pp

            rv = rep[0]
            df1 = p1 - jnp.clip(p1, bxmin[0] * sqv, bxmax[0] * sqv)
            df2 = p2 - jnp.clip(p2, bxs[0] * sqv, xs_up)
            acc[0] = acc[0] + jnp.sum(rv * df1 * df1)
            acc[1] = acc[1] + jnp.sum(rv * df2 * df2)

            @pl.when(i == 2 * N - 1)
            def _():
                o_d1[0, 0] = acc[0]
                o_d2[0, 0] = acc[1]

    # ---- index maps: phase-aware stage selection / parking ----
    def both(i):
        return (jnp.where(i < N, N - 1 - i, i - N), 0, 0)

    def bwd_only(i):
        return (jnp.where(i < N, N - 1 - i, 0), 0, 0)

    def fwd_only(i):
        return (jnp.where(i < N, 0, i - N), 0, 0)

    def blk(P, index_map):
        return pl.BlockSpec((1, P, NSP), index_map,
                            memory_space=pltpu.VMEM)

    def colb(P, index_map):
        return pl.BlockSpec((1, P, 1), index_map,
                            memory_space=pltpu.VMEM)

    def fullb(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    smem_sc = pl.BlockSpec((1, 8), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    smem_out = pl.BlockSpec(memory_space=pltpu.SMEM)

    dslab = jax.ShapeDtypeStruct((N, PX, NSP), f32)
    uslab = jax.ShapeDtypeStruct((N, PU, NSP), f32)
    scal = jax.ShapeDtypeStruct((1, 1), f32)

    call = pl.pallas_call(
        kernel,
        grid=(2 * N,),
        in_specs=[smem_sc,
                  blk(1, both), blk(1, bwd_only),            # sq nhp
                  colb(PX, both), colb(PX, both), colb(PU, both),
                  colb(PX, both), colb(PX, both), colb(PX, both),
                  colb(PU, both), colb(PU, both),            # bu*
                  blk(1, fwd_only),                          # rep
                  fullb((PV, PX)), fullb((PV, PU)),          # Bb LT
                  fullb((PV, PV)),                           # iW
                  fullb((PU, PV)), fullb((PX, PU)),          # L B
                  fullb((n_pref, NSP, Rmax)),                # CpT
                  fullb((n_pref, Rmax, NSP)),                # BpT
                  fullb((PX, 1)), fullb((PU, 1)),            # x0 pdu
                  blk(PV, bwd_only),                         # beta
                  blk(PU, fwd_only), blk(PX, fwd_only),      # uhat e
                  blk(PX, bwd_only), blk(PX, bwd_only),
                  blk(PU, bwd_only),                         # pre*
                  blk(PX, bwd_only), blk(PX, bwd_only),
                  blk(PU, bwd_only),                         # y
                  blk(PX, bwd_only), blk(PX, bwd_only),
                  blk(PU, bwd_only)],                        # z
        out_specs=(blk(PX, bwd_only), blk(PX, bwd_only),
                   blk(PU, bwd_only),                        # y'
                   blk(PX, bwd_only), blk(PX, bwd_only),
                   blk(PU, bwd_only),                        # z'
                   blk(PX, fwd_only), blk(PU, fwd_only),     # x u
                   blk(PX, fwd_only), blk(PX, fwd_only),
                   blk(PU, fwd_only),                        # pre'
                   blk(PV, bwd_only),                        # v
                   smem_out, smem_out, smem_out),            # inf d1 d2
        out_shape=(dslab, dslab, uslab, dslab, dslab, uslab,
                   dslab, uslab, dslab, dslab, uslab,
                   jax.ShapeDtypeStruct((N, PV, NSP), f32),
                   scal, scal, scal),
        scratch_shapes=[pltpu.VMEM((N * PX, NSP), f32),      # w1f
                        pltpu.VMEM((N * PX, NSP), f32),      # w2f
                        pltpu.VMEM((N * PU, NSP), f32),      # wpf
                        pltpu.VMEM((N * PV, NSP), f32),      # vf
                        pltpu.VMEM((PX, NSP), f32),          # t_s
                        pltpu.VMEM((PV, NSP), f32),          # a_s
                        pltpu.VMEM((PU, NSP), f32),          # du_s
                        pltpu.VMEM((PX, NSP), f32),          # x_s
                        pltpu.SMEM((4,), f32),               # hilo
                        pltpu.SMEM((2,), f32)],              # acc
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )

    cd = {k: jnp.asarray(consts[k]) for k in
          ("sq", "nhp", "rep", "cx1", "cx2", "cu", "bx_min", "bx_max",
           "bx_s", "bu_min", "bu_max", "Bb", "LT", "iW", "L", "B",
           "CpT", "BpT")}
    th = np.ones(max_iterations + 1, np.float64)
    for i in range(max_iterations):
        th[i + 1] = 0.5 * (np.sqrt(th[i] ** 4 + 4 * th[i] ** 2)
                           - th[i] ** 2)
    lam_seq = np.float32(
        [0.0] + [th[i] * (1.0 / th[i - 1] - 1.0)
                 for i in range(1, max_iterations + 1)])
    if "umin_phys" in fa:
        umin00 = jnp.asarray(np.asarray(fa["umin_phys"]))
        umax00 = jnp.asarray(np.asarray(fa["umax_phys"]))
    else:
        umin00 = jnp.asarray(np.asarray(fa["umin"])[0, 0])
        umax00 = jnp.asarray(np.asarray(fa["umax"])[0, 0])

    @jax.jit
    def run_impl(cd, step_in, y0):
        sp = pack_stream_step(step_in, consts["dims"])
        zeros_x = jnp.zeros((N, PX, NSP), f32)
        zeros_u = jnp.zeros((N, PU, NSP), f32)
        state = {
            "y1": y0["y1"], "y2": y0["y2"], "yp": y0["yp"],
            "z1": zeros_x, "z2": zeros_x, "zp": zeros_u,
            "pre1": zeros_x, "pre2": zeros_x, "prep": zeros_u,
            "k1": f32(0.0), "k2": f32(0.0),
            "x": zeros_x, "u": zeros_u,
            "v": jnp.zeros((N, PV, NSP), f32),
        }
        lam = jnp.asarray(lam_seq)

        def body(st, it):
            lam_prev = lam[jnp.maximum(it - 1, 0)]
            lam_i = lam[it]
            upd = jnp.where(it > 0, 1.0, 0.0).astype(f32)
            sc = jnp.stack([lam_prev, lam_i, upd, st["k1"], st["k2"],
                            0.0, 0.0, 0.0]).reshape(1, 8)
            (y1n, y2n, ypn, z1n, z2n, zpn, x, u, pre1, pre2, prep,
             v, inf, d1sq, d2sq) = call(
                sc, cd["sq"], cd["nhp"], cd["cx1"], cd["cx2"],
                cd["cu"], cd["bx_min"], cd["bx_max"], cd["bx_s"],
                cd["bu_min"], cd["bu_max"], cd["rep"], cd["Bb"],
                cd["LT"], cd["iW"], cd["L"], cd["B"], cd["CpT"],
                cd["BpT"], sp["x0"], sp["pdu"], sp["beta"],
                sp["uhat"], sp["e"],
                st["pre1"], st["pre2"], st["prep"],
                st["y1"], st["y2"], st["yp"],
                st["z1"], st["z2"], st["zp"])
            dist1 = jnp.sqrt(d1sq[0, 0])
            dist2 = jnp.sqrt(d2sq[0, 0])
            k1f = jnp.where(dist1 > t1c,
                            1.0 - t1c / jnp.maximum(dist1, 1e-30), 0.0)
            k2f = jnp.where(dist2 > t2c,
                            1.0 - t2c / jnp.maximum(dist2, 1e-30), 0.0)
            new = {"y1": y1n, "y2": y2n, "yp": ypn,
                   "z1": z1n, "z2": z2n, "zp": zpn,
                   "pre1": pre1, "pre2": pre2, "prep": prep,
                   "k1": k1f, "k2": k2f, "x": x, "u": u, "v": v}
            return new, inf[0, 0]

        st, infs = lax.scan(body, state, jnp.arange(max_iterations),
                            unroll=1)
        x, u = st["x"], st["u"]

        lam_last = lam[max_iterations - 1]
        sqv = cd["sq"]

        def tail_block(pre, y, z, lo, hi, shrink):
            w = y + lam_last * z
            diff = pre - jnp.clip(pre, lo, hi)
            res = (1.0 - shrink) * diff - c * w
            return w + step * res, res

        y1f, r1 = tail_block(st["pre1"], st["y1"], st["z1"],
                             cd["bx_min"] * sqv, cd["bx_max"] * sqv,
                             st["k1"])
        y2f, r2 = tail_block(st["pre2"], st["y2"], st["z2"],
                             cd["bx_s"] * sqv, xs_up, st["k2"])
        ypf, rp = tail_block(st["prep"], st["yp"], st["zp"],
                             cd["bu_min"] * sqv, cd["bu_max"] * sqv,
                             0.0)

        def champ(*rs):
            hi = jnp.max(jnp.stack([jnp.max(r) for r in rs]))
            lo = jnp.min(jnp.stack([jnp.min(r) for r in rs]))
            return jnp.where(hi > -lo, hi, lo)

        inf_last = jnp.maximum(champ(r1, r2), champ(rp))
        infs = jnp.concatenate([infs[1:], inf_last[None]])

        xi = jnp.concatenate([_from_t(y1f, ns, nx),
                              _from_t(y2f, ns, nx)], axis=-1)
        psi = _from_t(ypf, ns, nu)
        u0 = u[0, :nu, 0]
        if project_control:
            u0 = jnp.clip(u0, umin00, umax00)
        return {
            "control": u0,
            "x": _from_t(x, ns, nx), "u": _from_t(u, ns, nu),
            "v": _from_t(st["v"], ns, nv),
            "y": {"xi": xi, "psi": psi},
            "primal_infeasibility": infs,
            "iterations": jnp.int32(max_iterations),
        }

    def run(step_in, y0=None):
        if y0 is None:
            y0t = {"y1": jnp.zeros((N, PX, NSP), f32),
                   "y2": jnp.zeros((N, PX, NSP), f32),
                   "yp": jnp.zeros((N, PU, NSP), f32)}
        else:
            xi = jnp.asarray(y0["xi"], f32)
            y0t = {"y1": _to_t(xi[..., :nx], NSP, PX),
                   "y2": _to_t(xi[..., nx:], NSP, PX),
                   "yp": _to_t(jnp.asarray(y0["psi"], f32), NSP, PU)}
        return run_impl(cd, step_in, y0t)

    return run
