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

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.sparse.linalg import lobpcg_standard


def smallest_eigenpairs(
    lap: np.ndarray,
    k: int,
    iters: int = 200,
    seed: int = 0,
    subspace: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """k smallest eigenpairs of a symmetric PSD matrix (ascending).

    Returns (eigenvalues [k], eigenvectors [n, k]). Falls back to host
    LAPACK when the matrix is too small for a stable LOBPCG subspace.

    ``subspace`` (> k) widens the LOBPCG block beyond k: graph
    Laplacians of binarized affinities have tightly clustered smallest
    eigenvalues (near-components), which a k-wide block resolves
    slowly; a wider block converges the whole low cluster and the
    first k columns come out near-exact (same reasoning as the NME
    probe's wide block below). For spectral clustering specifically,
    ANY orthonormal basis of the k-smallest invariant subspace is
    equivalent — the k-means step is rotation-invariant — so block
    convergence, not per-vector convergence, is what matters.
    """
    n = lap.shape[0]
    width = max(k, subspace)
    if n < max(8 * width, 64):
        evals, evecs = np.linalg.eigh(np.asarray(lap, np.float64))
        return evals[:k].astype(np.float32), evecs[:, :k].astype(np.float32)

    lap_j = jnp.asarray(lap, jnp.float32)
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.standard_normal((n, width)), jnp.float32)
    w, v = _lobpcg_shifted_jit(lap_j, x0, iters)
    evals = np.asarray(w)
    order = np.argsort(evals)[:k]
    return evals[order], np.asarray(v)[:, order]


@partial(jax.jit, static_argnames=("iters",))
def _lobpcg_shifted_jit(lap: jnp.ndarray, x0: jnp.ndarray, iters: int):
    """LOBPCG on the shifted operator σI − L (σ = Gershgorin bound, so
    the smallest eigenpairs of L become the largest of the operator),
    as ONE compiled program — called eagerly, lobpcg's iteration
    dispatches hundreds of small ops through the tunnel-attached
    device queue."""
    sigma = 2.0 * jnp.max(jnp.diagonal(lap)) + 1.0
    w, v, _ = lobpcg_standard(lambda x: sigma * x - lap @ x, x0, m=iters)
    return sigma - w, v


@partial(jax.jit, static_argnames=("candidates", "k", "subspace", "iters"))
def _nme_probe_evals_jit(
    aff: jnp.ndarray,
    candidates: Tuple[int, ...],
    k: int,
    subspace: int,
    iters: int,
) -> jnp.ndarray:
    """For each neighbor count p in ``candidates``: binarize the [m, m]
    affinity (per-row top-p, symmetrized), build the graph Laplacian,
    and return its ``k`` smallest eigenvalues — one batched device
    program (binarize: top_k; eigensolve: vmapped LOBPCG on the shifted
    operator σI − L, matmuls only, so compilation stays seconds rather
    than the ~90 s/shape of a dense device eigh). Output [P, k],
    ascending per row.

    ``subspace`` (> k) sets the LOBPCG block width: the small-p
    fragmented graphs have tightly clustered low eigenvalues that a
    k-wide block cannot resolve (measured: gap error ~5% at p=5 with
    k=9, < 1% with a 64-wide block — enough to move the NME argmin off
    the exact answer). A wide block converges the whole low cluster, so
    the first k values come out near-exact."""
    m = aff.shape[0]

    def binarize(p: int):
        kth = jax.lax.top_k(aff, p)[0][:, -1]
        b = (aff >= kth[:, None]).astype(jnp.float32)
        return 0.5 * (b + b.T)

    laps = jnp.stack(
        [
            (lambda b: jnp.diag(b.sum(axis=1)) - b)(binarize(int(p)))
            for p in candidates
        ]
    )  # [P, m, m]
    # shared Gershgorin bound across probes (degrees ≤ max over batch)
    sigma = 2.0 * jnp.max(jax.vmap(jnp.diagonal)(laps)) + 1.0
    x0 = jax.random.normal(
        jax.random.PRNGKey(0), (len(candidates), m, subspace), jnp.float32
    )

    def solve(lap, x):
        w, _, _ = lobpcg_standard(
            lambda y: sigma * y - lap @ y, x, m=iters
        )
        return sigma - w

    evals = jax.vmap(solve)(laps, x0)
    return jnp.sort(evals, axis=1)[:, :k]


def nme_probe_evals(
    affinity, candidates, k: int, iters: int = 80
) -> np.ndarray:
    """Host wrapper: [P, k] smallest Laplacian eigenvalues per probed
    neighbor count (the device half of the NME p-search; consumed by
    ``diarize.clustering.nmesc_search``). Requires m ≥ 4·subspace
    (LOBPCG stability); callers gate on matrix size."""
    m = int(affinity.shape[0])
    # lobpcg_standard requires search_dim * 5 < matrix dim
    subspace = min(64, max(k, m // 6))
    if subspace * 5 >= m:
        raise ValueError(
            f"matrix dim {m} too small for a {subspace}-wide LOBPCG block"
        )
    return np.asarray(
        _nme_probe_evals_jit(
            jnp.asarray(affinity, jnp.float32),
            tuple(int(p) for p in candidates),
            int(k),
            int(subspace),
            int(iters),
        )
    )
