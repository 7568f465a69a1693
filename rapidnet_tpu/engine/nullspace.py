"""Null-space elimination of the input-coupling constraint E u + Ed d = 0.

Reference counterpart: ``Engine::calculateMatLandMatLhat``
(src/Engine.cu:466-669): a float64 SVD of E' via cuSolver, with
L = U[:, ne:nu] (orthonormal null-space basis of E) and
Lhat = -pinv(E) @ Ed.  Runs once per problem; float64 on host (the only
non-f32 computation in the framework, matching the reference).

Any u with E u + Ed d = 0 is parameterised as u = L v + Lhat d.
"""

from __future__ import annotations

import numpy as np


def nullspace_elimination(matE: np.ndarray, matEd: np.ndarray
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Return (L (nu, nu-ne), Lhat (nu, nd)) in float32.

    Note the SVD null-space basis is unique only up to an orthogonal
    rotation; the dual algorithms are invariant to the choice (the duals
    act on Hx/Hu, not v), but per-node factor matrices are basis
    dependent — callers that need fixture parity should prefer a
    config-provided L (see Engine.__init__).
    """
    E = np.asarray(matE, np.float64)
    Ed = np.asarray(matEd, np.float64)
    ne, nu = E.shape
    # SVD of E' (nu x ne), full U — matches cusolverDnDgesvd('A','A', nu, ne)
    U, S, Vt = np.linalg.svd(E.T, full_matrices=True)
    L = U[:, ne:nu]
    # pinv(E') = U diag(1/S) Vt  (only nonzero singular values)
    s_inv = np.where(np.abs(S) > 0, 1.0 / np.where(S == 0, 1.0, S), 0.0)
    pinv_Et = (U[:, :ne] * s_inv[None, :]) @ Vt     # (nu, ne) = pinv(E)
    Lhat = -pinv_Et @ Ed
    return L.astype(np.float32), Lhat.astype(np.float32)


def validate_nullspace(matE: np.ndarray, matEd: np.ndarray,
                       L: np.ndarray, Lhat: np.ndarray,
                       atol: float = 1e-4) -> None:
    """Check E L = 0 and E Lhat = -Ed (feasibility of the parameterisation)."""
    E = np.asarray(matE, np.float64)
    err_null = np.abs(E @ np.asarray(L, np.float64)).max()
    err_part = np.abs(E @ np.asarray(Lhat, np.float64) +
                      np.asarray(matEd, np.float64)).max()
    if err_null > atol or err_part > atol:
        raise ValueError(
            f"null-space elimination invalid: |E L|max={err_null:.2e}, "
            f"|E Lhat + Ed|max={err_part:.2e} (tolerance {atol:.0e}). "
            "A config-provided matL/matLhat probably does not match "
            "this network's matE/matEd — regenerate them, or drop the "
            "matL/matLhat keys so the SVD-based basis is used "
            "(engine/nullspace.nullspace_elimination).")
