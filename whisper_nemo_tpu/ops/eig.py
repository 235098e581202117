"""Device-side iterative eigensolving for spectral clustering at scale.

``jnp.linalg.eigh`` on this TPU path costs ~90 s of compilation per
distinct matrix shape, and full dense eigh is O(n³) for eigenpairs we
mostly discard — spectral clustering only needs the k ≲ 10 smallest
eigenpairs of the graph Laplacian. LOBPCG gets them with batched
matmuls (MXU-friendly, fast to compile): the smallest eigenpairs of a
PSD matrix L are the largest of ``σI − L`` with σ ≥ λmax(L)
(Gershgorin bound).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from jax.experimental.sparse.linalg import lobpcg_standard


def smallest_eigenpairs(
    lap: np.ndarray, k: int, iters: int = 200, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """k smallest eigenpairs of a symmetric PSD matrix (ascending).

    Returns (eigenvalues [k], eigenvectors [n, k]). Falls back to host
    LAPACK when the matrix is too small for a stable LOBPCG subspace.
    """
    n = lap.shape[0]
    if n < max(8 * k, 64):
        evals, evecs = np.linalg.eigh(np.asarray(lap, np.float64))
        return evals[:k].astype(np.float32), evecs[:, :k].astype(np.float32)

    lap_j = jnp.asarray(lap, jnp.float32)
    # Gershgorin upper bound on the spectrum of L = D - A
    sigma = float(2.0 * np.max(np.diag(lap)) + 1.0)
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    w, v, _ = lobpcg_standard(
        lambda x: sigma * x - lap_j @ x, x0, m=iters
    )
    evals = sigma - np.asarray(w)
    order = np.argsort(evals)
    return evals[order], np.asarray(v)[:, order]
