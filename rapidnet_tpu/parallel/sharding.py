"""Multi-chip scale-out: scenario-axis sharding of the SMPC solve.

The reference is strictly single-GPU (one cublasHandle_t,
src/Engine.cuh:673; no NCCL/MPI anywhere).  Here the scenario/subtree
axis — the fan-layout slot axis — is sharded over a
``jax.sharding.Mesh``:

* the non-branching tail of both tree sweeps is embarrassingly parallel
  per scenario (each device owns a contiguous block of scenarios —
  contiguity is guaranteed by the fan-layout construction, so subtree
  edges never cross shards in the tail);
* only the branching-prefix child->parent reductions cross shards: the
  aggregation matmul ``C_s @ q`` runs on an ``all_gather``-ed q (a few
  kB, prefix stages only) — this rides ICI;
* the global penalty norms of prox-g and the infeasibility diagnostic
  are ``psum``/``all_gather`` scalars.

This matches the "shard the scenario axis, keep the stage sweep local"
strategy of SURVEY.md §2/§5.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from rapidnet_tpu.solver import apg as apg_mod

AXIS = "scen"
BATCH_AXIS = "batch"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def _fa_specs(fa: dict) -> dict:
    """PartitionSpecs for the factor-array dict (slot axis = AXIS)."""
    specs = {}
    for k, v in fa.items():
        if k == "prefix_C":
            specs[k] = {s: P(AXIS, None) for s in v}
        elif k == "rep":
            specs[k] = P(None, AXIS)
        elif hasattr(v, "ndim") and v.ndim == 3:
            specs[k] = P(None, AXIS, None)   # (N, ns, d)
        else:
            specs[k] = P()                   # shared small matrices
    return specs


def _step_specs(step: dict) -> dict:
    specs = {}
    for k, v in step.items():
        if hasattr(v, "ndim") and v.ndim == 3:
            specs[k] = P(None, AXIS, None)
        else:
            specs[k] = P()                   # x0 / prev_u / prev_uhat
    return specs


def shard_factor_arrays(fa: dict, mesh: Mesh) -> dict:
    specs = _fa_specs(fa)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), fa, specs,
        is_leaf=lambda x: not isinstance(x, dict))


def shard_step_arrays(step: dict, mesh: Mesh) -> dict:
    specs = _step_specs(step)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), step, specs)



def _broadcast_root_control(out: dict, fa: dict) -> dict:
    """Stage-0 control lives in slot 0 (the scenario-axis-0 owner's
    shard); project onto its preconditioned bounds and broadcast
    (reference parity with src/SmpcController.cu:1647-1649)."""
    u0 = jnp.clip(out["u"][0, 0], fa["umin"][0, 0], fa["umax"][0, 0])
    idx = lax.axis_index(AXIS)
    u0 = jnp.where(idx == 0, u0, jnp.zeros_like(u0))
    out["control"] = lax.psum(u0, AXIS)
    return out


def _base_out_specs() -> dict:
    """out_specs shared by every sharded solver (scenario axis = AXIS;
    'control' and the diagnostics replicated)."""
    return {
        "control": P(),        # computed on the slot-0 owner, broadcast
        "x": P(None, AXIS, None),
        "u": P(None, AXIS, None),
        "v": P(None, AXIS, None),
        "y": {"xi": P(None, AXIS, None), "psi": P(None, AXIS, None)},
        "primal_infeasibility": P(),
    }


def make_sharded_apg(mesh: Mesh, fa_template: dict, step_template: dict, *,
                     prefix_stages: tuple, inv_step: float, step_size: float,
                     penalty_state: float, penalty_safety: float,
                     xs_upper: float, max_iterations: int):
    """Jitted multi-device APG solve via shard_map over the scenario axis.

    Returns fn(fa, step) -> outputs where x/u/v/duals keep the scenario
    sharding; 'control' (stage-0 node's u, projected onto its bounds) and
    the infeasibility trace are replicated scalars/vectors.
    """
    run_core = apg_mod.make_apg(
        prefix_stages=prefix_stages, inv_step=inv_step, step_size=step_size,
        penalty_state=penalty_state, penalty_safety=penalty_safety,
        xs_upper=xs_upper, max_iterations=max_iterations,
        axis_name=AXIS, project_control=False)

    in_specs = (_fa_specs(fa_template), _step_specs(step_template))
    out_specs = dict(_base_out_specs(), iterations=P())

    def body(fa, step):
        return _broadcast_root_control(run_core(fa, step), fa)

    fn = shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn)


def make_mesh_2d(n_batch: int, n_scen: int, devices=None) -> Mesh:
    """2-D mesh: batch data-parallel axis x scenario axis.

    The framework's dp x sp analog: independent problem instances
    (batched receding-horizon runs) shard over BATCH_AXIS with zero
    cross-talk; each instance's scenario tree shards over AXIS with the
    branching-prefix/psum collectives staying inside the scenario
    submesh (innermost axis -> ICI-adjacent devices).
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[:n_batch * n_scen]).reshape(
        n_batch, n_scen)
    return Mesh(devices, (BATCH_AXIS, AXIS))


def make_sharded_apg_batch(mesh: Mesh, fa_template: dict,
                           step_template: dict, *, prefix_stages: tuple,
                           inv_step: float, step_size: float,
                           penalty_state: float, penalty_safety: float,
                           xs_upper: float, max_iterations: int):
    """Batched AND scenario-sharded APG over a 2-D (batch, scen) mesh.

    fn(fa, steps) where ``steps`` leaves carry a leading batch axis
    (sharded over BATCH_AXIS) and the scenario/slot axis is sharded
    over AXIS; the factor arrays are shared across the batch.  Returns
    per-instance controls (B, nu) plus the usual outputs with batch and
    scenario shardings.
    """
    run_core = apg_mod.make_apg(
        prefix_stages=prefix_stages, inv_step=inv_step,
        step_size=step_size, penalty_state=penalty_state,
        penalty_safety=penalty_safety, xs_upper=xs_upper,
        max_iterations=max_iterations,
        axis_name=AXIS, project_control=False)

    def add_batch(spec):
        return P(BATCH_AXIS, *spec)

    fa_specs = _fa_specs(fa_template)
    step_specs = jax.tree.map(add_batch, _step_specs(step_template))
    in_specs = (fa_specs, step_specs)
    out_specs = jax.tree.map(add_batch,
                             dict(_base_out_specs(), iterations=P()),
                             is_leaf=lambda x: isinstance(x, P))

    def body(fa, steps):
        return jax.vmap(
            lambda s: _broadcast_root_control(run_core(fa, s), fa))(steps)

    fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    return jax.jit(fn)


def shard_step_arrays_batch(steps: dict, mesh: Mesh) -> dict:
    """Place a batched step dict on a 2-D (batch, scen) mesh."""
    def spec(v):
        return P(BATCH_AXIS, *( _step_specs({"_": v[0]})["_"] ))
    return {k: jax.device_put(v, NamedSharding(mesh, spec(v)))
            for k, v in steps.items()}


def make_sharded_quasi_newton(mesh: Mesh, fa_template: dict,
                              step_template: dict, *, algorithm: str,
                              prefix_stages: tuple, inv_step: float,
                              step_size: float, penalty_state: float,
                              penalty_safety: float, xs_upper: float,
                              max_iterations: int, lbfgs_buffer_size: int):
    """Scenario-axis-sharded global-FBE / NAMA solve.

    Same layout as :func:`make_sharded_apg`; the quasi-Newton extras
    (L-BFGS dots, FBE value, line-search decisions) are global scalars
    computed with masked ``psum``s (quasi_newton.masked_dot), so the
    line-search control flow stays identical on every shard.
    """
    from rapidnet_tpu.solver import quasi_newton

    run_core = quasi_newton.make_solver(
        algorithm=algorithm, prefix_stages=prefix_stages,
        inv_step=inv_step, step_size=step_size,
        penalty_state=penalty_state, penalty_safety=penalty_safety,
        xs_upper=xs_upper, max_iterations=max_iterations,
        lbfgs_buffer_size=lbfgs_buffer_size,
        axis_name=AXIS, project_control=False)

    in_specs = (_fa_specs(fa_template), _step_specs(step_template))
    out_specs = dict(_base_out_specs(), value_fbe=P(), tau=P())

    def body(fa, step):
        return _broadcast_root_control(run_core(fa, step), fa)

    fn = shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn)
