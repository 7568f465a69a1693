"""Fused Pallas TPU kernels (whole-solve, VMEM-resident).

``pallas_apg``: the full APG solve as one kernel (dual extrapolation,
backward/forward tree sweeps, prox, residual, dual update, diagnostics).
``pallas_qn``: the full global-FBE / NAMA solve as one kernel (three
sweeps per iteration, L-BFGS buffers + two-loop recursion, backtracking
line search, FBE value).
"""

from rapidnet_tpu.ops import pallas_apg, pallas_qn

__all__ = ["pallas_apg", "pallas_qn"]
