"""Closed-loop SMPC controller (receding horizon driver).

Reference counterpart: ``SmpcController`` (src/SmpcController.cu) plus
the closed-loop loop of src/main.cu:34-68.  API parity:

  controller = SmpcController(config_path)         # or from objects
  controller.initialise()                          # factor step
  u = controller.control_action(sim_time)          # one solve
  controller.move_forward_in_time()                # built-in simulator
  controller.economic_kpi(T), ...                  # KPI getters

Differences from the reference (intentional):
  * the whole solve (500 APG iterations) is ONE jitted XLA program with
    no host synchronisation (the reference syncs per iteration for the
    prox norms and infeasibility, src/SmpcController.cu:792,810,1487);
  * the built-in simulator applies the demand disturbance e to the state
    update (the reference accidentally adds e to a dead buffer,
    src/SmpcController.cu:1695 — a bug we do not replicate);
  * closed-loop state lives in a plain dataclass with JSON import/export
    instead of rewriting the config file.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rapidnet_tpu.engine.engine import XS_UPPER, Engine, StepData
from rapidnet_tpu.model.config import (ALGORITHM_APG, ALGORITHM_FBE,
                                       ALGORITHM_NAMA, SmpcConfig)
from rapidnet_tpu.model.forecaster import Forecaster, JsonForecaster
from rapidnet_tpu.model.network import DwnNetwork
from rapidnet_tpu.model.scenario_tree import ScenarioTree
from rapidnet_tpu.solver import apg as apg_mod


def _factor_arrays(engine: Engine) -> dict:
    """FactorData -> dict of device arrays for the jitted solvers."""
    fd = engine.factor_step()
    fa = {
        "L": jnp.asarray(fd.L), "B": jnp.asarray(fd.B),
        "Bb": jnp.asarray(fd.Bb), "invWbar": jnp.asarray(fd.invWbar),
        "d1": jnp.asarray(fd.d1), "d2": jnp.asarray(fd.d2),
        "g": jnp.asarray(fd.g),
        "nhp": jnp.asarray(fd.neg_half_over_prob),
        "prob": jnp.asarray(fd.prob),
        "rep": jnp.asarray(fd.rep),
        "xmin": jnp.asarray(fd.xmin), "xmax": jnp.asarray(fd.xmax),
        "xs": jnp.asarray(fd.xs),
        "umin": jnp.asarray(fd.umin), "umax": jnp.asarray(fd.umax),
        "prefix_C": {s: jnp.asarray(C) for s, C in fd.prefix_C.items()},
        "prefix_Cp": {s: jnp.asarray(C) for s, C in fd.prefix_Cp.items()},
        "prefix_Bp": {s: jnp.asarray(B) for s, B in fd.prefix_Bp.items()},
        "Wv": jnp.asarray(engine.Wv),
        "alpha1": jnp.asarray(engine.network.alpha1),
        "W": jnp.asarray(engine.config.cost_w),
        # PHYSICAL control bounds for the final projection — see
        # solve_step.root_control_bounds (deliberate deviation from the
        # reference's projection onto preconditioned bounds)
        "umin_phys": jnp.asarray(engine.network.umin, jnp.float32),
        "umax_phys": jnp.asarray(engine.network.umax, jnp.float32),
    }
    return fa


def _step_arrays(step: StepData) -> dict:
    return {
        "beta": jnp.asarray(step.beta),
        "uhat": jnp.asarray(step.uhat),
        "e": jnp.asarray(step.e),
        "alpha_price": jnp.asarray(step.alpha_price),
        "x0": jnp.asarray(step.x0),
        "prev_u": jnp.asarray(step.prev_u),
        "prev_uhat": jnp.asarray(step.prev_uhat),
    }


class SmpcController:
    def __init__(self, config: SmpcConfig | str,
                 network: Optional[DwnNetwork] = None,
                 tree: Optional[ScenarioTree] = None,
                 forecaster: Optional[Forecaster] = None,
                 warm_start: bool = False,
                 tolerance: Optional[float] = None,
                 backend: str = "auto",
                 mesh=None,
                 stream_precision: str = "highest",
                 stream_lbfgs_dtype: str = "float32"):
        """backend: 'auto' | 'xla' | 'pallas'.  'auto' picks the fused
        whole-solve Pallas kernel (ops/pallas_apg.py for APG,
        ops/pallas_qn.py for FBE/NAMA) on a TPU whose padded working
        set fits VMEM — fixed-budget or tolerance solves (the kernels
        terminate in-kernel when ``tolerance`` is set) — and the
        general XLA path otherwise.

        mesh: optional ``jax.sharding.Mesh`` with a 'scen' axis — the
        closed loop then runs the scenario-axis-sharded shard_map solve
        (all three algorithms) over the mesh, e.g. a multi-host pod
        slice built by ``parallel.distributed.scenario_mesh()``.

        stream_precision: MXU dot precision for the STREAMING kernels
        (>VMEM trees): 'highest' (bf16x6 — reference-cuBLAS f32 parity,
        the default) or 'default' (bf16x1 — measured 5% faster at the
        1024-scenario config with a 1.5e-3 relative control deviation
        after 500 iterations; docs/roofline.md).  Mosaic supports no
        middle tier ('high' raises at compile).

        stream_lbfgs_dtype: storage dtype of the streaming FBE/NAMA
        L-BFGS history ('float32' default; 'bfloat16' measured ~16%
        faster at the 1024-scenario config with a few-1e-3 relative
        control deviation after 500 iterations — the history stores
        differences, the same bounded-relative-error argument as the
        bf16-z momentum knob).
        """
        if isinstance(config, str):
            config = SmpcConfig.from_json(config)
        if backend not in ("auto", "xla", "pallas", "stream"):
            raise ValueError(f"unknown backend '{backend}'")
        if stream_precision not in ("highest", "default"):
            raise ValueError(
                f"stream_precision must be 'highest' or 'default' "
                f"(Mosaic lowers no other dot precision), got "
                f"'{stream_precision}'")
        self.stream_precision = stream_precision
        if stream_lbfgs_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"stream_lbfgs_dtype must be 'float32' or 'bfloat16', "
                f"got '{stream_lbfgs_dtype}'")
        self.stream_lbfgs_dtype = stream_lbfgs_dtype
        if mesh is not None:
            if backend == "pallas":
                raise ValueError(
                    "the whole-solve Pallas kernels are single-device; "
                    "with a mesh use backend='stream' (per-shard "
                    "streaming kernels) or 'xla'/'auto'")
        self.mesh = mesh
        self.backend = backend
        self._use_pallas = False
        self._use_stream = False
        self._stream_consts = None     # packed-once streaming constants
        self.warm_start = warm_start
        self.tolerance = tolerance
        self._y_carry = None
        self.config = config
        self.network = network or DwnNetwork.from_json(
            config.path_to_network)
        self.tree = tree or ScenarioTree.from_json(
            config.path_to_scenario_tree)
        self.forecaster = forecaster or JsonForecaster(
            config.path_to_forecaster)
        self.engine = Engine(self.network, self.tree, config)

        self.simulator_flag = True
        self._fa = None
        self._solver = None
        self._last = None       # last solve outputs (host copies on demand)
        self._last_control = None
        self.solve_times_ms: list[float] = []

        # KPI accumulators (reference: src/SmpcController.cu:1778-1818)
        self.economic_kpi_acc = 0.0
        self.smooth_kpi_acc = 0.0
        self.safe_kpi_acc = 0.0
        self.network_kpi_acc = 0.0

    # ------------------------------------------------------------------
    def initialise(self) -> None:
        """Factor step + solver compilation (reference:
        initialiseSmpcController, src/SmpcController.cu:476-487)."""
        self._fa = _factor_arrays(self.engine)
        cfg = self.config
        if self.mesh is not None:
            self._initialise_sharded()
            return
        if self.backend != "xla":
            self._use_pallas = self._pick_pallas()
        if self._use_pallas or self._use_stream:
            p_kw = dict(inv_step=float(1.0 / cfg.step_size),
                        step_size=float(cfg.step_size),
                        penalty_state=float(cfg.penalty_state),
                        penalty_safety=float(cfg.penalty_safety),
                        xs_upper=float(XS_UPPER),
                        max_iterations=int(cfg.max_iterations))
            if self._use_stream:
                # large-tree streaming kernels (working set > VMEM)
                if cfg.algorithm == ALGORITHM_APG:
                    from rapidnet_tpu.ops import pallas_stream
                    self._solver = pallas_stream.make_apg_stream(
                        self._fa, precision=self.stream_precision,
                        consts=self._stream_consts, **p_kw)
                else:
                    from rapidnet_tpu.solver import qn_stream
                    self._solver = qn_stream.make_qn_stream(
                        self._fa, algorithm=cfg.algorithm,
                        lbfgs_buffer_size=int(cfg.lbfgs_buffer_size),
                        precision=self.stream_precision,
                        lbfgs_dtype=jnp.dtype(self.stream_lbfgs_dtype),
                        consts=self._stream_consts, **p_kw)
            elif cfg.algorithm == ALGORITHM_APG:
                from rapidnet_tpu.ops import pallas_apg
                self._solver = pallas_apg.make_apg_pallas(
                    self._fa, tolerance=self.tolerance, **p_kw)
            else:
                from rapidnet_tpu.ops import pallas_qn
                self._solver = pallas_qn.make_qn_pallas(
                    self._fa, algorithm=cfg.algorithm,
                    lbfgs_buffer_size=int(cfg.lbfgs_buffer_size),
                    tolerance=self.tolerance, **p_kw)
            return
        if cfg.algorithm == ALGORITHM_APG:
            run = apg_mod.make_apg(
                prefix_stages=self.engine.factor_step().prefix_stages,
                inv_step=float(1.0 / cfg.step_size),
                step_size=float(cfg.step_size),
                penalty_state=float(cfg.penalty_state),
                penalty_safety=float(cfg.penalty_safety),
                xs_upper=float(XS_UPPER),
                max_iterations=int(cfg.max_iterations),
                tolerance=self.tolerance)
        elif cfg.algorithm in (ALGORITHM_FBE, ALGORITHM_NAMA):
            from rapidnet_tpu.solver import quasi_newton
            run = quasi_newton.make_solver(
                algorithm=cfg.algorithm,
                prefix_stages=self.engine.factor_step().prefix_stages,
                inv_step=float(1.0 / cfg.step_size),
                step_size=float(cfg.step_size),
                penalty_state=float(cfg.penalty_state),
                penalty_safety=float(cfg.penalty_safety),
                xs_upper=float(XS_UPPER),
                max_iterations=int(cfg.max_iterations),
                lbfgs_buffer_size=int(cfg.lbfgs_buffer_size),
                tolerance=self.tolerance)
        else:
            raise ValueError(f"unknown algorithm '{cfg.algorithm}'")
        self._solver = jax.jit(run)

    def _initialise_sharded(self) -> None:
        """Build the scenario-sharded shard_map solver over self.mesh.

        backend='stream' (or 'auto' on a TPU mesh at >VMEM tree scale)
        runs the per-shard streaming Pallas kernels with the
        distinct-parent psum (ops/pallas_stream_sharded.py) — the fast
        multi-chip path; the XLA shard_map solve is the general
        fallback (all three algorithms, tolerance support)."""
        cfg = self.config
        if self.tolerance is None:
            # one parameterized dispatch for all three algorithms:
            # (whole-solve-fits check, streaming factory)
            if cfg.algorithm == ALGORITHM_APG:
                def fits_whole(fa):
                    from rapidnet_tpu.ops import pallas_apg
                    return pallas_apg.fits_vmem(
                        pallas_apg.pad_constants(fa))

                def factory(fa, kw):
                    from rapidnet_tpu.ops.pallas_stream_sharded import \
                        make_apg_stream_sharded
                    return make_apg_stream_sharded(
                        self.mesh, fa,
                        precision=self.stream_precision, **kw)
            else:
                def fits_whole(fa):
                    from rapidnet_tpu.ops import pallas_qn
                    return pallas_qn.fits_vmem_qn(
                        pallas_qn.pad_qn_constants(fa),
                        int(cfg.lbfgs_buffer_size))

                def factory(fa, kw):
                    from rapidnet_tpu.solver import qn_stream
                    return qn_stream.make_qn_stream(
                        fa, algorithm=cfg.algorithm,
                        lbfgs_buffer_size=int(cfg.lbfgs_buffer_size),
                        mesh=self.mesh,
                        precision=self.stream_precision,
                        lbfgs_dtype=jnp.dtype(self.stream_lbfgs_dtype),
                        **kw)

            want = self.backend == "stream"
            if self.backend == "auto":
                on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
                want = on_tpu and not fits_whole(self._fa)
                if want:
                    # the streaming kernels' own per-stage blocks must
                    # fit their VMEM budget too — a tree beyond that
                    # must keep the XLA shard_map path rather than fail
                    # at Mosaic compile time (mirrors the single-device
                    # auto gate in _pick_pallas).  Gate on the
                    # PER-SHARD lane width via the shape-only
                    # estimator: the sharded kernels stream per-shard
                    # blocks, and the full-tree pack here would be both
                    # ~n_shards× too conservative and a wasted
                    # tens-of-MB transpose pass (ADVICE r4).  A
                    # non-streamable factor dict is caught below: the
                    # factory's pack raises ValueError → XLA fallback.
                    from rapidnet_tpu.ops import pallas_stream
                    n_shards = int(np.prod(self.mesh.devices.shape))
                    want = pallas_stream.fits_vmem_stream(
                        pallas_stream.estimate_stream_dims(
                            self._fa, n_shards))
            if want:
                try:
                    self._solver = factory(self._fa, dict(
                        inv_step=float(1.0 / cfg.step_size),
                        step_size=float(cfg.step_size),
                        penalty_state=float(cfg.penalty_state),
                        penalty_safety=float(cfg.penalty_safety),
                        xs_upper=float(XS_UPPER),
                        max_iterations=int(cfg.max_iterations)))
                    self._use_stream = True
                    return
                except ValueError:
                    if self.backend == "stream":
                        raise
        elif self.backend == "stream":
            raise ValueError(
                "backend='stream' with a mesh requires a fixed "
                "iteration budget (tolerance solves run on the XLA "
                "path)")
        from rapidnet_tpu.parallel import (make_sharded_apg,
                                           make_sharded_quasi_newton,
                                           shard_factor_arrays)
        step_t = self.prepare_step(0)     # shape template (host arrays)
        kw = dict(prefix_stages=self.engine.factor_step().prefix_stages,
                  inv_step=float(1.0 / cfg.step_size),
                  step_size=float(cfg.step_size),
                  penalty_state=float(cfg.penalty_state),
                  penalty_safety=float(cfg.penalty_safety),
                  xs_upper=float(XS_UPPER),
                  max_iterations=int(cfg.max_iterations),
                  tolerance=self.tolerance)
        if cfg.algorithm == ALGORITHM_APG:
            run = make_sharded_apg(self.mesh, self._fa, step_t, **kw)
        elif cfg.algorithm in (ALGORITHM_FBE, ALGORITHM_NAMA):
            run = make_sharded_quasi_newton(
                self.mesh, self._fa, step_t, algorithm=cfg.algorithm,
                lbfgs_buffer_size=int(cfg.lbfgs_buffer_size), **kw)
        else:
            raise ValueError(f"unknown algorithm '{cfg.algorithm}'")
        self._fa = shard_factor_arrays(self._fa, self.mesh)
        self._solver = run

    def _pick_pallas(self) -> bool:
        """Auto/forced selection of a fused Pallas solve kernel:
        the whole-solve kernels (ops/pallas_apg.py, ops/pallas_qn.py)
        when the padded working set fits VMEM; the streaming
        grid-over-stages APG kernel (ops/pallas_stream.py, sets
        ``self._use_stream``) for larger trees."""
        if self.tolerance is not None and self.backend == "stream":
            # the streaming scan is fixed-budget; the whole-solve
            # kernels terminate in-kernel (round 5) — only 'stream'
            # rejects tolerance now
            raise ValueError(
                "backend='stream' does not support tolerance-based "
                "early termination; use backend='pallas' (in-kernel "
                "early exit) or 'xla'")
        if self.backend == "stream":
            self._use_stream = True
            return False
        if self.backend == "pallas":
            return True
        on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
        if not on_tpu:
            return False
        if self.config.algorithm == ALGORITHM_APG:
            from rapidnet_tpu.ops import pallas_apg
            if pallas_apg.fits_vmem(pallas_apg.pad_constants(self._fa)):
                return True
            if self.tolerance is not None:
                # >VMEM + tolerance: the streaming kernels are
                # fixed-budget — keep the XLA while_loop path
                return False
            # whole-solve working set exceeds VMEM: stream the tree
            # through VMEM instead (measured 1.4-1.5x over the XLA path
            # at the 1024-scenario ladder config) — but only when the
            # streaming kernel's own per-stage blocks fit its VMEM
            # budget (they scale with ns; a much larger tree must keep
            # the XLA path rather than fail at Mosaic compile time)
            try:
                from rapidnet_tpu.ops import pallas_stream
                sc = pallas_stream.pack_stream_constants(self._fa)
                if pallas_stream.fits_vmem_stream(sc):
                    self._use_stream = True
                    self._stream_consts = sc   # reuse in initialise()
            except ValueError:
                pass
            return False
        from rapidnet_tpu.ops import pallas_qn
        if pallas_qn.fits_vmem_qn(
                pallas_qn.pad_qn_constants(self._fa),
                int(self.config.lbfgs_buffer_size)):
            return True
        if self.tolerance is not None:
            return False       # >VMEM + tolerance: XLA while_loop path
        # whole-solve QN kernel exceeds VMEM: stream the oracle sweeps
        # (solver/qn_stream.py) when the tree factors are streamable
        # and the per-stage blocks fit the streaming VMEM budget
        try:
            from rapidnet_tpu.ops import pallas_stream
            sc = pallas_stream.pack_stream_constants(self._fa)
            if pallas_stream.fits_vmem_stream(sc):
                self._use_stream = True
                self._stream_consts = sc       # reuse in initialise()
        except ValueError:
            pass
        return False

    # ------------------------------------------------------------------
    def prepare_step(self, sim_time: int) -> dict:
        """Forecast + disturbance elimination for one control step."""
        ok_d = self.forecaster.predict_demand(sim_time)
        ok_p = self.forecaster.predict_prices(sim_time)
        if not (ok_d and ok_p):
            raise IndexError(f"forecaster exhausted at t={sim_time}")
        step = self.engine.prepare_step(
            self.forecaster.nominal_demand, self.forecaster.nominal_prices,
            self.config.current_x, self.config.prev_u,
            self.config.prev_demand)
        return _step_arrays(step)

    def _zero_y(self, step: dict) -> dict:
        """Zero dual pair in the XLA layout (cold start / jit signature)."""
        N, ns = step["beta"].shape[:2]
        nx = self._fa["d1"].shape[-1]
        nu = self._fa["g"].shape[-1]
        return {"xi": jnp.zeros((N, ns, 2 * nx), jnp.float32),
                "psi": jnp.zeros((N, ns, nu), jnp.float32)}

    def _coerce_y_carry(self) -> None:
        """Translate a warm-start dual carry between backend layouts.

        The XLA path stores the dual pair as {xi: (N, ns, 2nx), psi:
        (N, ns, nu)}; the fused Pallas kernel as lane-padded {xi1, xi2:
        (N, NSP, PX), psi: (N, NSP, PU)}.  A checkpoint saved under one
        backend must resume under the other (utils/checkpoint.py).
        """
        y = self._y_carry
        if y is None:
            return
        import jax.numpy as jnp
        N, ns, nx = (np.asarray(self._fa["d1"]).shape)
        nu = self._fa["g"].shape[-1]
        if self._use_pallas and "xi" in y:       # XLA -> Pallas padding
            from rapidnet_tpu.ops import pallas_apg
            NSP = pallas_apg._pad_to(ns, 8)
            PX = pallas_apg._pad_to(nx, pallas_apg.LANE)
            PU = pallas_apg._pad_to(nu, pallas_apg.LANE)

            def pad(a, P):
                a = jnp.asarray(a, jnp.float32)
                return jnp.pad(a, ((0, 0), (0, NSP - a.shape[1]),
                                   (0, P - a.shape[2])))

            xi = jnp.asarray(y["xi"])
            self._y_carry = {"xi1": pad(xi[..., :nx], PX),
                             "xi2": pad(xi[..., nx:], PX),
                             "psi": pad(y["psi"], PU)}
        elif not self._use_pallas and "xi1" in y:   # Pallas -> XLA
            xi1 = jnp.asarray(y["xi1"])[:, :ns, :nx]
            xi2 = jnp.asarray(y["xi2"])[:, :ns, :nx]
            self._y_carry = {
                "xi": jnp.concatenate([xi1, xi2], axis=-1),
                "psi": jnp.asarray(y["psi"])[:, :ns, :nu]}

    def control_action(self, sim_time: int) -> np.ndarray:
        """Run one receding-horizon solve; returns the control u0 (nu,)."""
        if self._solver is None:
            self.initialise()
        if self.warm_start:
            self._coerce_y_carry()
        step = self.prepare_step(sim_time)
        t0 = time.perf_counter()
        if self.mesh is not None and self._use_stream:
            # per-shard streaming kernels: run(step, y0) stages and
            # reshards internally
            y0 = self._y_carry if self.warm_start else None
            out = self._solver(step, y0)
        elif self.mesh is not None:
            from rapidnet_tpu.parallel import (shard_dual_arrays,
                                               shard_step_arrays)
            if self._y_carry is None:
                # the shard_map signature is fixed: cold start = zeros
                self._y_carry = shard_dual_arrays(
                    self._zero_y(step), self.mesh)
            out = self._solver(self._fa,
                               shard_step_arrays(step, self.mesh),
                               self._y_carry)
        elif self._use_pallas or self._use_stream:
            y0 = self._y_carry if self.warm_start else None
            out = self._solver(step, y0)
        else:
            # XLA path, all three algorithms: fn(fa, step, y0=None)
            if self.warm_start:
                if self._y_carry is None:
                    # zero warm start keeps the jit signature stable
                    self._y_carry = self._zero_y(step)
                out = self._solver(self._fa, step, self._y_carry)
            else:
                out = self._solver(self._fa, step, None)
        control = np.asarray(jax.block_until_ready(out["control"]))
        self.solve_times_ms.append((time.perf_counter() - t0) * 1e3)
        if self.warm_start:
            self._y_carry = out["y"]
        self._last = out
        self._last_control = control
        return control

    # ------------------------------------------------------------------
    def move_forward_in_time(self) -> np.ndarray:
        """Advance the closed loop by one time instance.

        With ``simulator_flag`` (default) runs the built-in simulator
        x+ = x + B u + Gd d (mass balance; reference moveForewardInTime,
        src/SmpcController.cu:1679-1717, minus its dead-buffer e bug)
        and updates the in-memory state.  Without it, the reference's
        external-simulator contract applies: the updated state is
        written into the config JSON and the (possibly
        externally-modified) state is re-read from it
        (src/SmpcController.cu:1712-1716, SmpcConfiguration
        file-setters :240-293).
        """
        u = self._last_control
        if u is None:
            raise RuntimeError("call control_action first")
        d = self.forecaster.nominal_demand[0]          # realised demand
        x = (self.config.current_x + self.network.matB @ u +
             self.network.matGd @ d).astype(np.float32)
        self._update_kpi(x, u)
        if self.simulator_flag:
            self.config.set_current_state(x)
            self.config.set_previous_control(u)
            self.config.set_previous_demand(d)
        else:
            self.update_smpc_configuration(x, u, d)
            self.reload_state_from_config()
        return x

    # ------------------------------------------------------------------
    # external-simulator JSON state contract
    def update_smpc_configuration(self, state, control, demand,
                                  path: Optional[str] = None) -> None:
        """Write currentX/prevU/prevDemand back into the config JSON
        (reference updateSmpcConfiguration,
        src/SmpcController.cu:1725-1773)."""
        from rapidnet_tpu.io import jsonio
        path = path or self.config.path_to_config
        if not path:
            raise ValueError("config has no backing JSON file")
        doc = jsonio.load_json(path)
        doc["currentX"] = np.asarray(state, np.float32).tolist()
        doc["prevU"] = np.asarray(control, np.float32).tolist()
        doc["prevDemand"] = np.asarray(demand, np.float32).tolist()
        jsonio.dump_json(path, doc)

    def reload_state_from_config(self, path: Optional[str] = None) -> None:
        """Re-read closed-loop state from the config JSON (reference
        SmpcConfiguration file-based setters,
        src/SmpcConfiguration.cu:240-293 — without replicating the
        setPreviousDemand-writes-to-prevU bug at :290)."""
        from rapidnet_tpu.io import jsonio
        path = path or self.config.path_to_config
        doc = jsonio.load_json(path)
        self.config.set_current_state(
            np.asarray(doc["currentX"], np.float32))
        self.config.set_previous_control(
            np.asarray(doc["prevU"], np.float32))
        self.config.set_previous_demand(
            np.asarray(doc["prevDemand"], np.float32))

    def _update_kpi(self, state: np.ndarray, control: np.ndarray) -> None:
        net, cfg = self.network, self.config
        prices = self.forecaster.nominal_prices[0]
        eco = float(np.sum(cfg.weight_economical *
                           (net.alpha1 + prices) * np.abs(control)))
        du = cfg.prev_u - control
        smooth = float(du @ du)
        level = np.minimum(state - net.xsafe, 0.0)
        safe = float(np.abs(level).sum())
        netk = float(np.abs(state).sum())
        self.economic_kpi_acc += eco
        self.smooth_kpi_acc += smooth
        self.safe_kpi_acc += safe
        self.network_kpi_acc += netk

    # KPI getters (reference: src/SmpcController.cu:1824-1859)
    def economic_kpi(self, sim_time: int) -> float:
        return self.economic_kpi_acc / 3600.0 / max(sim_time, 1)

    def smooth_kpi(self, sim_time: int) -> float:
        return self.smooth_kpi_acc / 3600.0 / max(sim_time, 1)

    def safety_kpi(self, sim_time: int) -> float:
        return self.safe_kpi_acc

    def network_kpi(self, sim_time: int) -> float:
        safe_norm = float(np.sum(self.network.xsafe))
        if self.network_kpi_acc == 0:
            return 0.0
        return 100.0 * max(sim_time, 1) * safe_norm / self.network_kpi_acc

    def live_buffer_count(self) -> int:
        """Number of live device arrays (leak-invariant probe).

        TPU analog of the reference's cudaMemGetInfo leak check
        (src/SmpcController.cu:1612-1624): the buffer census must be
        stable across solves once the solver is warm.
        """
        return len(jax.live_arrays())

    # ------------------------------------------------------------------
    def closed_loop(self, steps: int, output_json: Optional[str] = None
                    ) -> dict:
        """Run a closed-loop simulation (reference main.cu:45-69).

        Mirrors the reference's per-solve memory-leak invariant
        (src/SmpcController.cu:1612-1624): the live device-buffer count
        must not grow across warm solves; growth is reported in the log
        (the reference prints "RUNTIME ERROR: MEMORY LEAKS").
        """
        log = {}
        buffers0 = None
        for t in range(steps):
            u = self.control_action(t)
            if t == 0:
                buffers0 = self.live_buffer_count()   # post-warmup census
            log[f"control{t}"] = u.tolist()
            log[f"time{t}"] = [self.solve_times_ms[-1]]
            self.move_forward_in_time()
        if steps > 1 and buffers0 is not None:
            growth = self.live_buffer_count() - buffers0
            if growth > 0:
                log["memoryLeakWarning"] = (
                    f"RUNTIME ERROR: MEMORY LEAKS ({growth} device "
                    f"buffers gained across {steps - 1} warm solves)")
                print(log["memoryLeakWarning"], file=sys.stderr)
        log["economicKpi"] = self.economic_kpi(steps)
        log["smoothKpi"] = self.smooth_kpi(steps)
        log["safetyKpi"] = self.safety_kpi(steps)
        log["networkKpi"] = self.network_kpi(steps)
        if output_json:
            with open(output_json, "w") as f:
                json.dump(log, f, indent=1)
        return log

    # diagnostics
    @property
    def primal_infeasibility(self) -> np.ndarray:
        if self._last is None:
            return np.zeros(0, np.float32)
        return np.asarray(self._last["primal_infeasibility"])
