"""Scenario-sharded streaming APG: Pallas kernels inside shard_map.

Round-3 state of the art ran large trees EITHER fast (streaming
kernels, single device — ops/pallas_stream.py) OR sharded (plain XLA
inside shard_map, paying a measured 57% partitioner fusion-boundary
tax — docs/performance.md).  This module composes them: each shard
runs the streaming kernels on its own contiguous scenario block, and
only the tree edges that actually cross shards ride the ICI.

Key structural facts (fan layout, model/scenario_tree.py):

* the FORWARD sweep is per-slot cumulative — embarrassingly parallel
  across shards; K2 runs unchanged on the local block.
* the BACKWARD sweep's child->parent aggregations at the branching
  prefix are shard-LOCAL for every stage deep enough that each
  parent's scenario interval sits inside one shard (intervals nest, so
  locality is monotone in depth).  Only the top ``s_hi`` stages cross
  shards — typically ONE (the root's aggregation).
* the cross-shard handoff factors through the distinct parents
  (the round-3 distinct-parent psum): each shard contributes
  ``q_local @ Cp_local^T`` — a (d, R) block with R = a few nodes —
  and the psum'd parents broadcast back via ``Bp_local``.  At 2
  shards x config 5 this is <1 kB/iteration of collective payload
  (vs 211 kB/iter for the sharded XLA path).

So one iteration = K1a (backward Pallas kernel over stages N-1..s_hi,
with the previous iteration's dual update fused, local aggregations
in-kernel, and the partial parent block as an output) -> one psum ->
an XLA tail for the s_hi root-side stages -> K2 (forward Pallas
kernel, all stages) -> two psum'd prox-norm scalars.

Reference counterpart: the same APG iteration
(src/SmpcController.cu:1500-1525, solve step :563-755); the reference
is single-GPU (src/Engine.cuh:673) — this distributed decomposition
has no reference equivalent and follows SURVEY.md §5's "shard the
scenario axis, keep the stage sweep local" design.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rapidnet_tpu.ops.pallas_stream import (LANE, _pad,
                                            pack_stream_constants)

try:  # JAX >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from jax.sharding import PartitionSpec as P


# ---------------------------------------------------------------------
# host-side shard analysis + packing
# ---------------------------------------------------------------------
def analyze_prefix_locality(fa: dict, n_shards: int) -> dict:
    """Classify each branching-prefix aggregation stage as shard-local
    or cross-shard for contiguous equal scenario blocks.

    Stage s is local iff every parent's child-slot support in Cp[s]
    lies inside one shard block.  Returns {"s_hi": topmost cross
    stage, "local": [...], "cross": [...]} (stages descending)."""
    ns = np.asarray(fa["d1"]).shape[1]
    if ns % n_shards != 0:
        raise ValueError(f"ns={ns} not divisible by {n_shards} shards")
    nsl = ns // n_shards
    stages = sorted(fa["prefix_Cp"].keys(), reverse=True)
    local, cross = [], []
    for s in stages:
        Cp = np.asarray(fa["prefix_Cp"][s])
        ok = True
        for r in range(Cp.shape[0]):
            cols = np.flatnonzero(Cp[r])
            if cols.size and (cols[0] // nsl) != (cols[-1] // nsl):
                ok = False
                break
        (local if ok else cross).append(s)
    s_hi = max(cross) if cross else 0
    # locality is monotone in the fan layout; verify (a local stage
    # below a cross stage would break the K1a/XLA-tail split)
    for s in local:
        if s < s_hi:
            raise ValueError(
                f"prefix stage {s} is shard-local below the cross-shard "
                f"stage {s_hi} — unsupported tree/shard layout")
    return {"s_hi": s_hi, "local": local, "cross": cross, "nsl": nsl}


def _to_t_sharded(a, n_shards, nsl, NSLP, Pdim):
    """(N, ns, d) -> (N, Pdim, n_shards*NSLP): transpose + PER-SHARD
    lane padding so shard boundaries stay block-aligned."""
    a = np.asarray(a, np.float32)
    N, ns, d = a.shape
    out = np.zeros((N, Pdim, n_shards * NSLP), np.float32)
    for j in range(n_shards):
        blk = a[:, j * nsl:(j + 1) * nsl, :]
        out[:, :d, j * NSLP:j * NSLP + nsl] = np.transpose(blk, (0, 2, 1))
    return out


def pack_stream_sharded(fa: dict, n_shards: int,
                        emulate_shards: int | None = None) -> dict:
    """Host-side pack for the sharded streaming solve.

    ``emulate_shards``: classify prefix stages (local vs cross-shard)
    as if the tree were split that many ways while packing for the
    real ``n_shards``.  Lets a 1-device mesh execute the EXACT program
    structure of an ``emulate_shards``-device solve (K1a split, psum,
    XLA tail) for on-chip overhead measurement — the math is identical
    because the cross-stage operators always cover the full local
    block."""
    base = pack_stream_constants(fa)      # validates rank-1 structure
    N, ns, nx, nu, nv, _NSP, PX, PU, PV = base["dims"]
    if emulate_shards is not None:
        # classification must be at least as conservative as the real
        # split: emulated blocks must nest inside real shard blocks,
        # else a stage spanning two real shards could be marked local
        # and its aggregation silently dropped
        if emulate_shards < n_shards or emulate_shards % n_shards != 0:
            raise ValueError(
                f"emulate_shards={emulate_shards} must be a multiple "
                f"of (and >=) the mesh's {n_shards} shards")
    cls = analyze_prefix_locality(fa, emulate_shards or n_shards)
    info = {"s_hi": cls["s_hi"], "local": cls["local"],
            "cross": cls["cross"], "nsl": ns // n_shards}
    if ns % n_shards != 0:
        raise ValueError(f"ns={ns} not divisible by {n_shards} shards")
    nsl = info["nsl"]
    NSLP = _pad(nsl, LANE)
    W = n_shards * NSLP                    # global padded lane width
    s_hi = info["s_hi"]
    if s_hi == 0:
        raise ValueError("single-shard tree — use make_apg_stream")

    prob = np.asarray(fa["prob"], np.float32)
    sq_f = np.sqrt(prob)
    out = {
        "dims": (N, ns, nx, nu, nv, NSLP, PX, PU, PV),
        "n_shards": n_shards, "nsl": nsl, "s_hi": s_hi,
        "local_stages": tuple(sorted(info["local"], reverse=True)),
        "cross_stages": tuple(sorted(info["cross"], reverse=True)),
        "sq": _to_t_sharded(sq_f, n_shards, nsl, NSLP, 1),
        "nhp": _to_t_sharded(np.asarray(fa["nhp"], np.float32),
                             n_shards, nsl, NSLP, 1),
        "rep": _to_t_sharded(np.asarray(fa["rep"], np.float32)[..., None],
                             n_shards, nsl, NSLP, 1),
    }
    for k in ("cx1", "cx2", "cu", "bx_min", "bx_max", "bx_s",
              "bu_min", "bu_max", "Bb", "LT", "iW", "L", "B"):
        out[k] = base[k]

    # shard-local aggregation operators, stacked over shards: each
    # local stage's parents partition by shard (support in one block)
    loc = out["local_stages"]
    n_loc = max(len(loc), 1)
    RL = LANE
    if loc:
        rl_needed = 0
        for s in loc:
            Cp = np.asarray(fa["prefix_Cp"][s])
            for j in range(n_shards):
                sup = [r for r in range(Cp.shape[0])
                       if np.flatnonzero(Cp[r]).size and
                       np.flatnonzero(Cp[r])[0] // nsl == j]
                rl_needed = max(rl_needed, len(sup))
        RL = _pad(max(rl_needed, 1), LANE)
    LCpT = np.zeros((n_shards, n_loc, NSLP, RL), np.float32)
    LBpT = np.zeros((n_shards, n_loc, RL, NSLP), np.float32)
    for k, s in enumerate(loc):
        Cp = np.asarray(fa["prefix_Cp"][s], np.float32)
        Bp = np.asarray(fa["prefix_Bp"][s], np.float32)
        for j in range(n_shards):
            cols = slice(j * nsl, (j + 1) * nsl)
            sup = [r for r in range(Cp.shape[0])
                   if np.flatnonzero(Cp[r]).size and
                   np.flatnonzero(Cp[r])[0] // nsl == j]
            LCpT[j, k, :nsl, :len(sup)] = Cp[sup, cols].T
            LBpT[j, k, :len(sup), :nsl] = Bp[cols, sup].T
    out["LCpT"], out["LBpT"], out["RL"] = LCpT, LBpT, RL

    # cross-shard operators (XLA side): per stage, each shard's column
    # slice; parents are global (psum'd)
    xops = {}
    for s in info["cross"]:
        Cp = np.asarray(fa["prefix_Cp"][s], np.float32)
        Bp = np.asarray(fa["prefix_Bp"][s], np.float32)
        R = Cp.shape[0]
        CpT = np.zeros((n_shards, NSLP, R), np.float32)
        BpT = np.zeros((n_shards, R, NSLP), np.float32)
        for j in range(n_shards):
            cols = slice(j * nsl, (j + 1) * nsl)
            CpT[j, :nsl] = Cp[:, cols].T
            BpT[j, :, :nsl] = Bp[cols, :].T
        xops[s] = (CpT, BpT)
    # the topmost cross stage's operators feed the K1a kernel output,
    # lane-padded for the (d, Rc) partial-parent block
    CpT_hi, BpT_hi = xops[s_hi]
    Rc = _pad(CpT_hi.shape[-1], LANE)
    out["XCpT"] = np.pad(CpT_hi, ((0, 0), (0, 0),
                                  (0, Rc - CpT_hi.shape[-1])))
    out["XBpT"] = np.pad(BpT_hi, ((0, 0), (0, Rc - BpT_hi.shape[1]),
                                  (0, 0)))
    out["Rc"] = Rc
    out["xops_low"] = {s: xops[s] for s in info["cross"] if s != s_hi}
    return out


# ---------------------------------------------------------------------
# the sharded solve factory
# ---------------------------------------------------------------------
def make_apg_stream_sharded(mesh, fa: dict, *, inv_step: float,
                            step_size: float, penalty_state: float,
                            penalty_safety: float, xs_upper: float,
                            max_iterations: int,
                            project_control: bool = True,
                            interpret: bool | str = "auto",
                            precision: str | lax.Precision =
                                lax.Precision.HIGHEST,
                            emulate_shards: int | None = None):
    """Streaming APG over a 1-D scenario mesh: run(step, y0=None).

    Same output contract as make_apg_stream; x/u/v/y outputs come back
    globally assembled (the solve itself keeps them sharded).
    ``emulate_shards``: see pack_stream_sharded — run the program
    structure of an N-way-sharded solve on a smaller (e.g. 1-device)
    mesh for overhead measurement."""
    if interpret == "auto":
        # resolve from the MESH devices, not the default platform: a
        # CPU mesh on a session whose default device is a TPU (the
        # dryrun fallback) must interpret, and vice versa
        interpret = mesh.devices.flat[0].platform == "cpu"
    axis = mesh.axis_names[0]
    n_shards = int(np.prod(mesh.devices.shape))
    consts = pack_stream_sharded(fa, n_shards,
                                 emulate_shards=emulate_shards)
    N, ns, nx, nu, nv, NSLP, PX, PU, PV = consts["dims"]
    nsl = consts["nsl"]
    s_hi = consts["s_hi"]
    local_stages = consts["local_stages"]
    n_loc = max(len(local_stages), 1)
    RL, Rc = consts["RL"], consts["Rc"]
    NG = n_shards * NSLP                   # global padded lanes
    c = float(inv_step)
    step_c = float(step_size)
    t1c = float(inv_step * penalty_state)
    t2c = float(inv_step * penalty_safety)
    xs_up = float(xs_upper)
    f32 = jnp.float32
    PREC = precision
    NK = N - s_hi                          # K1a grid length

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=PREC)

    # ---------------- K1a: dual update + backward stages N-1..s_hi ---
    def k1a(sc, sq, nhp, cx1, cx2, cu, bxmin, bxmax, bxs, bumin, bumax,
            Bb, LT, iW, LCpT, LBpT, XCpT, beta,
            pre1, pre2, prep, y1, y2, yp, z1, z2, zp,
            o_y1, o_y2, o_yp, o_z1, o_z2, o_zp, o_v, o_qp, o_rp,
            o_hilo, t_s, a_s, hilo):
        i = pl.program_id(0)
        s = N - 1 - i
        lam_prev, lam_i, upd, k1f, k2f = (sc[0, 0], sc[0, 1], sc[0, 2],
                                          sc[0, 3], sc[0, 4])
        sqv = sq[0]
        d1 = cx1[0] * sqv
        d2 = cx2[0] * sqv
        g = cu[0] * sqv

        def upd_block(pre, w_prev, lo, hi, shrink):
            diff = pre[0] - jnp.clip(pre[0], lo, hi)
            return (1.0 - shrink) * diff - c * w_prev

        w1p = y1[0] + lam_prev * z1[0]
        w2p = y2[0] + lam_prev * z2[0]
        wpp = yp[0] + lam_prev * zp[0]
        r1 = upd_block(pre1, w1p, bxmin[0] * sqv, bxmax[0] * sqv, k1f)
        r2 = upd_block(pre2, w2p, bxs[0] * sqv, xs_up, k2f)
        rp = upd_block(prep, wpp, bumin[0] * sqv, bumax[0] * sqv, 0.0)
        y1n = y1[0] + upd * (lam_prev * z1[0] + step_c * r1)
        y2n = y2[0] + upd * (lam_prev * z2[0] + step_c * r2)
        ypn = yp[0] + upd * (lam_prev * zp[0] + step_c * rp)
        o_y1[0] = y1n
        o_y2[0] = y2n
        o_yp[0] = ypn
        o_z1[0] = y1n - y1[0]
        o_z2[0] = y2n - y2[0]
        o_zp[0] = ypn - yp[0]

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

        @pl.when(i == NK - 1)
        def _():
            o_hilo[0, 0] = hilo[0]
            o_hilo[0, 1] = hilo[1]
            o_hilo[0, 2] = hilo[2]
            o_hilo[0, 3] = hilo[3]

        w1 = y1n + lam_i * (y1n - y1[0])
        w2 = y2n + lam_i * (y2n - y2[0])
        wp = ypn + lam_i * (ypn - yp[0])

        @pl.when(i == 0)
        def _():
            t_s[...] = jnp.zeros((PX, NSLP), f32)
            a_s[...] = jnp.zeros((PV, NSLP), f32)

        t_new = d1 * w1 + d2 * w2 + t_s[...]
        inner = (beta[0] + a_s[...] + dot(Bb[...], t_new) +
                 dot(LT[...], g * wp))
        o_v[0] = nhp[0] * dot(iW[...], inner)

        # shard-local aggregations (stages > s_hi)
        q, r = t_new, inner
        for k, ps in enumerate(local_stages):
            is_s = s == ps

            @pl.when(is_s)
            def _(k=k, q=q, r=r):
                qp = dot(q, LCpT[k])
                rp_ = dot(r, LCpT[k])
                t_s[...] = dot(qp, LBpT[k])
                a_s[...] = dot(rp_, LBpT[k])

            @pl.when(jnp.logical_not(is_s))
            def _(q=q, r=r):
                t_s[...] = q
                a_s[...] = r
            q, r = t_s[...], a_s[...]
        if not local_stages:
            t_s[...] = q
            a_s[...] = r

        # partial distinct-parent block of the topmost cross stage
        @pl.when(i == NK - 1)
        def _():
            o_qp[...] = dot(t_s[...], XCpT[...])
            o_rp[...] = dot(a_s[...], XCpT[...])

    # ---------------- K2: forward, fully shard-local ----------------
    def k2(sc, sq, cx1, cx2, cu, bxmin, bxmax, bxs, rep, L, B,
           x0, pdu, v, uhat, e, y1, y2, yp, z1, z2, zp,
           o_x, o_u, o_pre1, o_pre2, o_prep, o_d1, o_d2,
           du_s, x_s, acc):
        i = pl.program_id(0)
        lam_i = sc[0, 1]
        sqv = sq[0]
        d1 = cx1[0] * sqv
        d2 = cx2[0] * sqv
        g = cu[0] * sqv

        @pl.when(i == 0)
        def _():
            du_s[...] = jnp.broadcast_to(pdu[...], (PU, NSLP))
            x_s[...] = jnp.broadcast_to(x0[...], (PX, NSLP))
            acc[0] = f32(0.0)
            acc[1] = f32(0.0)

        du = du_s[...] + dot(L[...], v[0])
        u = uhat[0] + du
        x = x_s[...] + e[0] + dot(B[...], u)
        du_s[...] = du
        x_s[...] = x
        o_x[0] = x
        o_u[0] = u

        w1 = y1[0] + lam_i * z1[0]
        w2 = y2[0] + lam_i * z2[0]
        wp = yp[0] + lam_i * zp[0]
        pre1 = d1 * x + c * w1
        pre2 = d2 * x + c * w2
        prep = g * u + c * wp
        o_pre1[0] = pre1
        o_pre2[0] = pre2
        o_prep[0] = prep

        rv = rep[0]
        df1 = pre1 - jnp.clip(pre1, bxmin[0] * sqv, bxmax[0] * sqv)
        df2 = pre2 - jnp.clip(pre2, bxs[0] * sqv, xs_up)
        acc[0] = acc[0] + jnp.sum(rv * df1 * df1)
        acc[1] = acc[1] + jnp.sum(rv * df2 * df2)

        @pl.when(i == N - 1)
        def _():
            o_d1[0, 0] = acc[0]
            o_d2[0, 0] = acc[1]

    # ---------------- specs ----------------
    def rev(i):
        return (N - 1 - i, 0, 0)

    def fwd(i):
        return (i, 0, 0)

    def blk(Pd, index_map):
        return pl.BlockSpec((1, Pd, NSLP), index_map,
                            memory_space=pltpu.VMEM)

    def colb(Pd, index_map):
        return pl.BlockSpec((1, Pd, 1), index_map,
                            memory_space=pltpu.VMEM)

    def fullb(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    smem_sc = pl.BlockSpec((1, 8), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    smem_out = pl.BlockSpec(memory_space=pltpu.SMEM)

    dslab = jax.ShapeDtypeStruct((N, PX, NSLP), f32)
    uslab = jax.ShapeDtypeStruct((N, PU, NSLP), f32)
    vslab = jax.ShapeDtypeStruct((N, PV, NSLP), f32)
    scal = jax.ShapeDtypeStruct((1, 1), f32)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    k1a_call = pl.pallas_call(
        k1a, grid=(NK,),
        in_specs=[smem_sc,
                  blk(1, rev), blk(1, rev),
                  colb(PX, rev), colb(PX, rev), colb(PU, rev),
                  colb(PX, rev), colb(PX, rev), colb(PX, rev),
                  colb(PU, rev), colb(PU, rev),
                  fullb((PV, PX)), fullb((PV, PU)), fullb((PV, PV)),
                  fullb((n_loc, NSLP, RL)), fullb((n_loc, RL, NSLP)),
                  fullb((NSLP, Rc)),
                  blk(PV, rev),
                  blk(PX, rev), blk(PX, rev), blk(PU, rev),
                  blk(PX, rev), blk(PX, rev), blk(PU, rev),
                  blk(PX, rev), blk(PX, rev), blk(PU, rev)],
        out_specs=(blk(PX, rev), blk(PX, rev), blk(PU, rev),
                   blk(PX, rev), blk(PX, rev), blk(PU, rev),
                   blk(PV, rev),
                   fullb((PX, Rc)), fullb((PV, Rc)),
                   smem_out),
        out_shape=(dslab, dslab, uslab, dslab, dslab, uslab, vslab,
                   jax.ShapeDtypeStruct((PX, Rc), f32),
                   jax.ShapeDtypeStruct((PV, Rc), f32),
                   jax.ShapeDtypeStruct((1, 4), f32)),
        scratch_shapes=[pltpu.VMEM((PX, NSLP), f32),
                        pltpu.VMEM((PV, NSLP), f32),
                        pltpu.SMEM((4,), f32)],
        interpret=interpret, compiler_params=params)

    k2_call = pl.pallas_call(
        k2, grid=(N,),
        in_specs=[smem_sc,
                  blk(1, fwd),
                  colb(PX, fwd), colb(PX, fwd), colb(PU, fwd),
                  colb(PX, fwd), colb(PX, fwd), colb(PX, fwd),
                  blk(1, fwd),
                  fullb((PU, PV)), fullb((PX, PU)),
                  fullb((PX, 1)), fullb((PU, 1)),
                  blk(PV, fwd), blk(PU, fwd), blk(PX, fwd),
                  blk(PX, fwd), blk(PX, fwd), blk(PU, fwd),
                  blk(PX, fwd), blk(PX, fwd), blk(PU, fwd)],
        out_specs=(blk(PX, fwd), blk(PU, fwd),
                   blk(PX, fwd), blk(PX, fwd), blk(PU, fwd),
                   smem_out, smem_out),
        out_shape=(dslab, uslab, dslab, dslab, uslab, scal, scal),
        scratch_shapes=[pltpu.VMEM((PU, NSLP), f32),
                        pltpu.VMEM((PX, NSLP), f32),
                        pltpu.SMEM((2,), f32)],
        interpret=interpret, compiler_params=params)

    # Nesterov lambda sequence (identical to make_apg_stream)
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

    xops_low = {s: (jnp.asarray(CpT), jnp.asarray(BpT))
                for s, (CpT, BpT) in consts["xops_low"].items()}
    cross_low = tuple(s for s in consts["cross_stages"] if s != s_hi)

    # constant dict: sharded lane-wise pieces + replicated shared mats
    cd_host = {k: consts[k] for k in
               ("sq", "nhp", "rep", "cx1", "cx2", "cu", "bx_min",
                "bx_max", "bx_s", "bu_min", "bu_max", "Bb", "LT",
                "iW", "L", "B", "LCpT", "LBpT", "XCpT", "XBpT")}
    for s, (CpT, BpT) in xops_low.items():
        cd_host[f"xlo_c{s}"] = CpT
        cd_host[f"xlo_b{s}"] = BpT

    def cd_spec(k, v):
        if k in ("sq", "nhp", "rep"):
            return P(None, None, axis)
        if k in ("LCpT", "LBpT", "XCpT", "XBpT") or k.startswith("xlo_"):
            return P(axis, *([None] * (np.asarray(v).ndim - 1)))
        return P()

    cd_specs = {k: cd_spec(k, v) for k, v in cd_host.items()}
    slab_spec = P(None, None, axis)
    sp_specs = {"beta": slab_spec, "uhat": slab_spec, "e": slab_spec,
                "x0": P(), "pdu": P()}
    y_specs = {"y1": slab_spec, "y2": slab_spec, "yp": slab_spec}
    out_specs = {"x": slab_spec, "u": slab_spec, "v": slab_spec,
                 "y1": slab_spec, "y2": slab_spec, "yp": slab_spec,
                 "control": P(), "infs": P()}

    HIGH = lax.Precision.HIGHEST

    def xdot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=HIGH)

    def body_shard(cd, sp, y0):
        """Per-shard solve over the iteration scan (inside shard_map)."""
        zeros_x = jnp.zeros((N, PX, NSLP), f32)
        zeros_u = jnp.zeros((N, PU, NSLP), f32)
        lam = jnp.asarray(lam_seq)
        # stacked per-shard operators arrive with a leading local
        # shard axis of size 1 — squeeze it for the kernels
        cd = dict(cd)
        for k in list(cd):
            if k in ("LCpT", "LBpT", "XCpT", "XBpT") or \
                    k.startswith("xlo_"):
                cd[k] = cd[k][0]
        lcp = [cd[k] for k in ("LCpT", "LBpT")]
        state = {
            "y1": y0["y1"], "y2": y0["y2"], "yp": y0["yp"],
            "z1": zeros_x, "z2": zeros_x, "zp": zeros_u,
            "pre1": zeros_x, "pre2": zeros_x, "prep": zeros_u,
            "k1": f32(0.0), "k2": f32(0.0),
            "x": zeros_x, "u": zeros_u,
            "v": jnp.zeros((N, PV, NSLP), f32),
        }

        def low_tail(sc_vals, cd, sp, st, y1n, y2n, ypn, z1n, z2n, zpn,
                     v, qp, rp_, hilo):
            """XLA tail: the s_hi root-side stages (dual update, stage
            math, cross-shard aggregations) in the transposed layout."""
            lam_prev, lam_i, upd, k1f, k2f = sc_vals
            parents = lax.psum(
                jnp.concatenate([qp, rp_], axis=0), axis)
            t = xdot(parents[:PX], cd["XBpT"])
            a = xdot(parents[PX:], cd["XBpT"])
            hi_x, lo_x, hi_p, lo_p = (hilo[0, 0], hilo[0, 1],
                                      hilo[0, 2], hilo[0, 3])
            for s in range(s_hi - 1, -1, -1):
                sqv = cd["sq"][s]                  # (1, NSLP)
                d1 = cd["cx1"][s] * sqv
                d2 = cd["cx2"][s] * sqv
                g = cd["cu"][s] * sqv

                def upd_blk(pre, y, z, lo, hi, shrink):
                    w_prev = y + lam_prev * z
                    diff = pre - jnp.clip(pre, lo, hi)
                    r = (1.0 - shrink) * diff - c * w_prev
                    y_n = y + upd * (lam_prev * z + step_c * r)
                    return y_n, y_n - y, r

                y1s, z1s, r1 = upd_blk(
                    st["pre1"][s], st["y1"][s], st["z1"][s],
                    cd["bx_min"][s] * sqv, cd["bx_max"][s] * sqv, k1f)
                y2s, z2s, r2 = upd_blk(
                    st["pre2"][s], st["y2"][s], st["z2"][s],
                    cd["bx_s"][s] * sqv, xs_up, k2f)
                yps, zps, rp2 = upd_blk(
                    st["prep"][s], st["yp"][s], st["zp"][s],
                    cd["bu_min"][s] * sqv, cd["bu_max"][s] * sqv, 0.0)
                hi_x = jnp.maximum(hi_x, jnp.maximum(jnp.max(r1),
                                                     jnp.max(r2)))
                lo_x = jnp.minimum(lo_x, jnp.minimum(jnp.min(r1),
                                                     jnp.min(r2)))
                hi_p = jnp.maximum(hi_p, jnp.max(rp2))
                lo_p = jnp.minimum(lo_p, jnp.min(rp2))
                w1 = y1s + lam_i * z1s
                w2 = y2s + lam_i * z2s
                wp = yps + lam_i * zps
                t = d1 * w1 + d2 * w2 + t
                a = (sp["beta"][s] + a + xdot(cd["Bb"], t) +
                     xdot(cd["LT"], g * wp))
                v_s = cd["nhp"][s] * xdot(cd["iW"], a)
                y1n = lax.dynamic_update_slice(y1n, y1s[None], (s, 0, 0))
                y2n = lax.dynamic_update_slice(y2n, y2s[None], (s, 0, 0))
                ypn = lax.dynamic_update_slice(ypn, yps[None], (s, 0, 0))
                z1n = lax.dynamic_update_slice(z1n, z1s[None], (s, 0, 0))
                z2n = lax.dynamic_update_slice(z2n, z2s[None], (s, 0, 0))
                zpn = lax.dynamic_update_slice(zpn, zps[None], (s, 0, 0))
                v = lax.dynamic_update_slice(v, v_s[None], (s, 0, 0))
                if s > 0 and s in cross_low:
                    part = jnp.concatenate(
                        [xdot(t, cd[f"xlo_c{s}"]),
                         xdot(a, cd[f"xlo_c{s}"])], axis=0)
                    part = lax.psum(part, axis)
                    t = xdot(part[:PX], cd[f"xlo_b{s}"])
                    a = xdot(part[PX:], cd[f"xlo_b{s}"])
            # global signed infeasibility champion (previous iteration)
            hi_x = lax.pmax(hi_x, axis)
            lo_x = lax.pmin(lo_x, axis)
            hi_p = lax.pmax(hi_p, axis)
            lo_p = lax.pmin(lo_p, axis)
            vx = jnp.where(hi_x > -lo_x, hi_x, lo_x)
            vp = jnp.where(hi_p > -lo_p, hi_p, lo_p)
            inf = jnp.maximum(vx, vp)
            return y1n, y2n, ypn, z1n, z2n, zpn, v, inf

        def body(st, it):
            lam_prev = lam[jnp.maximum(it - 1, 0)]
            lam_i = lam[it]
            upd = jnp.where(it > 0, 1.0, 0.0).astype(f32)
            sc = jnp.stack([lam_prev, lam_i, upd, st["k1"], st["k2"],
                            0.0, 0.0, 0.0]).reshape(1, 8)
            (y1n, y2n, ypn, z1n, z2n, zpn, v, qp, rp_, hilo) = k1a_call(
                sc, cd["sq"], cd["nhp"], cd["cx1"], cd["cx2"],
                cd["cu"], cd["bx_min"], cd["bx_max"], cd["bx_s"],
                cd["bu_min"], cd["bu_max"], cd["Bb"], cd["LT"],
                cd["iW"], *lcp, cd["XCpT"], sp["beta"],
                st["pre1"], st["pre2"], st["prep"],
                st["y1"], st["y2"], st["yp"],
                st["z1"], st["z2"], st["zp"])
            (y1n, y2n, ypn, z1n, z2n, zpn, v, inf) = low_tail(
                (lam_prev, lam_i, upd, st["k1"], st["k2"]), cd, sp,
                st, y1n, y2n, ypn, z1n, z2n, zpn, v, qp, rp_, hilo)
            x, u, pre1, pre2, prep, d1sq, d2sq = k2_call(
                sc, cd["sq"], cd["cx1"], cd["cx2"], cd["cu"],
                cd["bx_min"], cd["bx_max"], cd["bx_s"], cd["rep"],
                cd["L"], cd["B"], sp["x0"], sp["pdu"],
                v, sp["uhat"], sp["e"],
                y1n, y2n, ypn, z1n, z2n, zpn)
            dist1 = jnp.sqrt(lax.psum(d1sq[0, 0], axis))
            dist2 = jnp.sqrt(lax.psum(d2sq[0, 0], axis))
            k1f = jnp.where(dist1 > t1c,
                            1.0 - t1c / jnp.maximum(dist1, 1e-30), 0.0)
            k2f = jnp.where(dist2 > t2c,
                            1.0 - t2c / jnp.maximum(dist2, 1e-30), 0.0)
            new = {"y1": y1n, "y2": y2n, "yp": ypn,
                   "z1": z1n, "z2": z2n, "zp": zpn,
                   "pre1": pre1, "pre2": pre2, "prep": prep,
                   "k1": k1f, "k2": k2f, "x": x, "u": u, "v": v}
            return new, inf

        st, infs = lax.scan(body, state, jnp.arange(max_iterations),
                            unroll=1)

        # final dual update + its infeasibility (XLA tail, cf.
        # make_apg_stream) — shard-local elementwise + global champion
        lam_last = lam[max_iterations - 1]
        sqv = cd["sq"]

        def tail_block(pre, y, z, lo, hi, shrink):
            w = y + lam_last * z
            diff = pre - jnp.clip(pre, lo, hi)
            res = (1.0 - shrink) * diff - c * w
            return w + step_c * res, res

        y1f, r1 = tail_block(st["pre1"], st["y1"], st["z1"],
                             cd["bx_min"] * sqv, cd["bx_max"] * sqv,
                             st["k1"])
        y2f, r2 = tail_block(st["pre2"], st["y2"], st["z2"],
                             cd["bx_s"] * sqv, xs_up, st["k2"])
        ypf, rp2 = tail_block(st["prep"], st["yp"], st["zp"],
                              cd["bu_min"] * sqv, cd["bu_max"] * sqv,
                              0.0)
        hi_x = lax.pmax(jnp.maximum(jnp.max(r1), jnp.max(r2)), axis)
        lo_x = lax.pmin(jnp.minimum(jnp.min(r1), jnp.min(r2)), axis)
        hi_p = lax.pmax(jnp.max(rp2), axis)
        lo_p = lax.pmin(jnp.min(rp2), axis)
        vx = jnp.where(hi_x > -lo_x, hi_x, lo_x)
        vp = jnp.where(hi_p > -lo_p, hi_p, lo_p)
        inf_last = jnp.maximum(vx, vp)
        infs = jnp.concatenate([infs[1:], inf_last[None]])

        # root control: slot 0 lives on shard 0 (transposed lane 0)
        u0 = st["u"][0, :, 0]
        u0 = jnp.where(lax.axis_index(axis) == 0, u0,
                       jnp.zeros_like(u0))
        u0 = lax.psum(u0, axis)
        return {"x": st["x"], "u": st["u"], "v": st["v"],
                "y1": y1f, "y2": y2f, "yp": ypf,
                "control": u0, "infs": infs}

    fn = shard_map(body_shard, mesh=mesh,
                   in_specs=(cd_specs, sp_specs, y_specs),
                   out_specs=out_specs, check_vma=False)

    # multi-process meshes need GLOBAL arrays at the jit boundary:
    # every host holds the full value, so stage replicated and let the
    # shard_map in_specs reshard (single-process staging unchanged)
    pi0 = jax.process_index()
    multiproc = any(d.process_index != pi0 for d in mesh.devices.flat)

    def _g(x):
        if not multiproc:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), np.asarray(x))

    cd_dev = {k: _g(v) for k, v in cd_host.items()}

    def to_t(a, Pd):
        """(N, ns, d) host/dev -> (N, Pd, NG) with per-shard padding."""
        a = jnp.asarray(a, f32)
        N_, ns_, d = a.shape
        a = a.reshape(N_, n_shards, nsl, d).transpose(0, 1, 3, 2)
        a = jnp.pad(a, ((0, 0), (0, 0), (0, Pd - d), (0, NSLP - nsl)))
        return a.transpose(0, 2, 1, 3).reshape(N_, Pd, NG)

    def from_t(a, d):
        """(N, Pd, NG) -> (N, ns, d)."""
        N_ = a.shape[0]
        a = a.reshape(N_, a.shape[1], n_shards, NSLP)
        a = a[:, :d, :, :nsl].transpose(0, 2, 3, 1)
        return a.reshape(N_, ns, d)

    @jax.jit
    def run_impl(cd, step_in, y0):
        sp = {
            "beta": to_t(step_in["beta"], PV),
            "uhat": to_t(step_in["uhat"], PU),
            "e": to_t(step_in["e"], PX),
            "x0": jnp.pad(jnp.asarray(step_in["x0"], f32),
                          (0, PX - nx))[:, None],
            "pdu": jnp.pad(jnp.asarray(step_in["prev_u"], f32) -
                           jnp.asarray(step_in["prev_uhat"], f32),
                           (0, PU - nu))[:, None],
        }
        out = fn(cd, sp, y0)
        u0 = out["control"][:nu]
        if project_control:
            u0 = jnp.clip(u0, umin00, umax00)
        xi = jnp.concatenate([from_t(out["y1"], nx),
                              from_t(out["y2"], nx)], axis=-1)
        return {
            "control": u0,
            "x": from_t(out["x"], nx), "u": from_t(out["u"], nu),
            "v": from_t(out["v"], nv),
            "y": {"xi": xi, "psi": from_t(out["yp"], nu)},
            "primal_infeasibility": out["infs"],
            "iterations": jnp.int32(max_iterations),
        }

    def run(step_in, y0=None):
        if multiproc:
            step_in = {k: _g(np.asarray(v, np.float32))
                       for k, v in step_in.items()}
        if y0 is None:
            # jnp.zeros on the single-process path: host-side zeros
            # would ship ~25 MB over a remote-device transport per
            # solve (measured 2.8x solve-time regression on the axon
            # tunnel)
            if multiproc:
                y0t = {"y1": _g(np.zeros((N, PX, NG), np.float32)),
                       "y2": _g(np.zeros((N, PX, NG), np.float32)),
                       "yp": _g(np.zeros((N, PU, NG), np.float32))}
            else:
                y0t = {"y1": jnp.zeros((N, PX, NG), f32),
                       "y2": jnp.zeros((N, PX, NG), f32),
                       "yp": jnp.zeros((N, PU, NG), f32)}
        else:
            xi = _g(np.asarray(y0["xi"], np.float32)) if multiproc \
                else jnp.asarray(y0["xi"], f32)
            psi = _g(np.asarray(y0["psi"], np.float32)) if multiproc \
                else jnp.asarray(y0["psi"], f32)
            y0t = {"y1": to_t(xi[..., :nx], PX),
                   "y2": to_t(xi[..., nx:], PX),
                   "yp": to_t(psi, PU)}
        return run_impl(cd_dev, step_in, y0t)

    return run


# ---------------------------------------------------------------------
# bare sharded oracle sweeps (for the quasi-Newton solvers)
# ---------------------------------------------------------------------
def make_sharded_sweeps(consts: dict, axis: str, *, affine: bool,
                        interpret: bool | str = "auto",
                        precision: str | lax.Precision =
                            lax.Precision.HIGHEST):
    """Sharded streaming sweeps WITHOUT the APG dual-update fusion.

    The quasi-Newton building block (cf. ops/pallas_stream_qn.py):
    ``backward(cd, w1, w2, wp[, beta]) -> v`` runs a per-shard S1
    kernel over stages N-1..s_hi with shard-local aggregations, one
    distinct-parent psum, and an XLA tail for the root-side stages;
    ``forward(cd, v[, uhat, e, x0, pdu]) -> (x, u, p1, p2, pp)`` is
    fully shard-local.  All slabs are the LOCAL (N, P, NSLP) blocks
    (call inside shard_map).
    """
    if interpret == "auto":
        interpret = jax.devices()[0].platform == "cpu"
    N, ns, nx, nu, nv, NSLP, PX, PU, PV = consts["dims"]
    s_hi = consts["s_hi"]
    local_stages = consts["local_stages"]
    cross_low = tuple(s for s in consts["cross_stages"] if s != s_hi)
    n_loc = max(len(local_stages), 1)
    RL, Rc = consts["RL"], consts["Rc"]
    NK = N - s_hi
    f32 = jnp.float32
    PREC = precision

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=PREC)

    def s1(sq, nhp, cx1, cx2, cu, Bb, LT, iW, LCpT, LBpT, XCpT, *refs):
        if affine:
            beta, w1, w2, wp, o_v, o_qp, o_rp, t_s, a_s = refs
        else:
            w1, w2, wp, o_v, o_qp, o_rp, t_s, a_s = refs
        i = pl.program_id(0)
        s = N - 1 - i
        sqv = sq[0]
        d1 = cx1[0] * sqv
        d2 = cx2[0] * sqv
        g = cu[0] * sqv

        @pl.when(i == 0)
        def _():
            t_s[...] = jnp.zeros((PX, NSLP), f32)
            a_s[...] = jnp.zeros((PV, NSLP), f32)

        t_new = d1 * w1[0] + d2 * w2[0] + t_s[...]
        inner = a_s[...] + dot(Bb[...], t_new) + dot(LT[...], g * wp[0])
        if affine:
            inner = inner + beta[0]
        o_v[0] = nhp[0] * dot(iW[...], inner)

        q, r = t_new, inner
        for k, ps in enumerate(local_stages):
            is_s = s == ps

            @pl.when(is_s)
            def _(k=k, q=q, r=r):
                qp = dot(q, LCpT[k])
                rp_ = dot(r, LCpT[k])
                t_s[...] = dot(qp, LBpT[k])
                a_s[...] = dot(rp_, LBpT[k])

            @pl.when(jnp.logical_not(is_s))
            def _(q=q, r=r):
                t_s[...] = q
                a_s[...] = r
            q, r = t_s[...], a_s[...]
        if not local_stages:
            t_s[...] = q
            a_s[...] = r

        @pl.when(i == NK - 1)
        def _():
            o_qp[...] = dot(t_s[...], XCpT[...])
            o_rp[...] = dot(a_s[...], XCpT[...])

    def s2(sq, cx1, cx2, cu, L, B, *refs):
        if affine:
            (x0, pdu, v, uhat, e,
             o_x, o_u, o_p1, o_p2, o_pp, du_s, x_s) = refs
        else:
            v, o_x, o_u, o_p1, o_p2, o_pp, du_s, x_s = refs
        i = pl.program_id(0)
        sqv = sq[0]
        d1 = cx1[0] * sqv
        d2 = cx2[0] * sqv
        g = cu[0] * sqv

        @pl.when(i == 0)
        def _():
            if affine:
                du_s[...] = jnp.broadcast_to(pdu[...], (PU, NSLP))
                x_s[...] = jnp.broadcast_to(x0[...], (PX, NSLP))
            else:
                du_s[...] = jnp.zeros((PU, NSLP), f32)
                x_s[...] = jnp.zeros((PX, NSLP), f32)

        du = du_s[...] + dot(L[...], v[0])
        u = (uhat[0] + du) if affine else du
        x = x_s[...] + dot(B[...], u)
        if affine:
            x = x + e[0]
        du_s[...] = du
        x_s[...] = x
        o_x[0] = x
        o_u[0] = u
        o_p1[0] = d1 * x
        o_p2[0] = d2 * x
        o_pp[0] = g * u

    def rev(i):
        return (N - 1 - i, 0, 0)

    def fwd(i):
        return (i, 0, 0)

    def blk(Pd, index_map):
        return pl.BlockSpec((1, Pd, NSLP), index_map,
                            memory_space=pltpu.VMEM)

    def colb(Pd, index_map):
        return pl.BlockSpec((1, Pd, 1), index_map,
                            memory_space=pltpu.VMEM)

    def fullb(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    dslab = jax.ShapeDtypeStruct((N, PX, NSLP), f32)
    uslab = jax.ShapeDtypeStruct((N, PU, NSLP), f32)
    vslab = jax.ShapeDtypeStruct((N, PV, NSLP), f32)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    s1_in = [blk(1, rev), blk(1, rev),
             colb(PX, rev), colb(PX, rev), colb(PU, rev),
             fullb((PV, PX)), fullb((PV, PU)), fullb((PV, PV)),
             fullb((n_loc, NSLP, RL)), fullb((n_loc, RL, NSLP)),
             fullb((NSLP, Rc))]
    if affine:
        s1_in.append(blk(PV, rev))
    s1_in += [blk(PX, rev), blk(PX, rev), blk(PU, rev)]

    s1_call = pl.pallas_call(
        s1, grid=(NK,), in_specs=s1_in,
        out_specs=(blk(PV, rev), fullb((PX, Rc)), fullb((PV, Rc))),
        out_shape=(vslab, jax.ShapeDtypeStruct((PX, Rc), f32),
                   jax.ShapeDtypeStruct((PV, Rc), f32)),
        scratch_shapes=[pltpu.VMEM((PX, NSLP), f32),
                        pltpu.VMEM((PV, NSLP), f32)],
        interpret=interpret, compiler_params=params)

    s2_in = [blk(1, fwd),
             colb(PX, fwd), colb(PX, fwd), colb(PU, fwd),
             fullb((PU, PV)), fullb((PX, PU))]
    if affine:
        s2_in += [fullb((PX, 1)), fullb((PU, 1))]
    s2_in.append(blk(PV, fwd))
    if affine:
        s2_in += [blk(PU, fwd), blk(PX, fwd)]

    s2_call = pl.pallas_call(
        s2, grid=(N,), in_specs=s2_in,
        out_specs=(blk(PX, fwd), blk(PU, fwd),
                   blk(PX, fwd), blk(PX, fwd), blk(PU, fwd)),
        out_shape=(dslab, uslab, dslab, dslab, uslab),
        scratch_shapes=[pltpu.VMEM((PU, NSLP), f32),
                        pltpu.VMEM((PX, NSLP), f32)],
        interpret=interpret, compiler_params=params)

    HIGH = lax.Precision.HIGHEST

    def xdot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=HIGH)

    def low_tail(cd, w1, w2, wp, beta, v, qp, rp_):
        """XLA tail: stage math for stages s_hi-1..0 on local blocks
        (no dual update here — w is the input), cross-shard handoffs
        via the distinct-parent psum."""
        parents = lax.psum(jnp.concatenate([qp, rp_], axis=0), axis)
        t = xdot(parents[:PX], cd["XBpT"])
        a = xdot(parents[PX:], cd["XBpT"])
        for s in range(s_hi - 1, -1, -1):
            sqv = cd["sq"][s]
            d1 = cd["cx1"][s] * sqv
            d2 = cd["cx2"][s] * sqv
            g = cd["cu"][s] * sqv
            t = d1 * w1[s] + d2 * w2[s] + t
            a_new = a + xdot(cd["Bb"], t) + xdot(cd["LT"], g * wp[s])
            if beta is not None:
                a_new = a_new + beta[s]
            a = a_new
            v_s = cd["nhp"][s] * xdot(cd["iW"], a)
            v = lax.dynamic_update_slice(v, v_s[None], (s, 0, 0))
            if s > 0 and s in cross_low:
                part = jnp.concatenate(
                    [xdot(t, cd[f"xlo_c{s}"]),
                     xdot(a, cd[f"xlo_c{s}"])], axis=0)
                part = lax.psum(part, axis)
                t = xdot(part[:PX], cd[f"xlo_b{s}"])
                a = xdot(part[PX:], cd[f"xlo_b{s}"])
        return v

    if affine:
        def backward(cd, w1, w2, wp, beta):
            v, qp, rp_ = s1_call(
                cd["sq"], cd["nhp"], cd["cx1"], cd["cx2"], cd["cu"],
                cd["Bb"], cd["LT"], cd["iW"], cd["LCpT"], cd["LBpT"],
                cd["XCpT"], beta, w1, w2, wp)
            return low_tail(cd, w1, w2, wp, beta, v, qp, rp_)

        def forward(cd, v, uhat, e, x0, pdu):
            return s2_call(cd["sq"], cd["cx1"], cd["cx2"], cd["cu"],
                           cd["L"], cd["B"], x0, pdu, v, uhat, e)
    else:
        def backward(cd, w1, w2, wp):
            v, qp, rp_ = s1_call(
                cd["sq"], cd["nhp"], cd["cx1"], cd["cx2"], cd["cu"],
                cd["Bb"], cd["LT"], cd["iW"], cd["LCpT"], cd["LBpT"],
                cd["XCpT"], w1, w2, wp)
            return low_tail(cd, w1, w2, wp, None, v, qp, rp_)

        def forward(cd, v):
            return s2_call(cd["sq"], cd["cx1"], cd["cx2"], cd["cu"],
                           cd["L"], cd["B"], v)

    return backward, forward
