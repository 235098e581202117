"""Unit coverage for ops/eig.py (device LOBPCG eigensolving).

The integration surfaces are pinned elsewhere (test_clustering.py's
device-NME parity and the LOBPCG-vs-dense spectral label parity); this
file pins the solver itself: eigenvalue accuracy, invariant-subspace
alignment (the property spectral clustering actually consumes — the
basis within the subspace is arbitrary), the small-n LAPACK fallback,
and the widened-block option.
"""

import numpy as np

from whisper_nemo_tpu.ops.eig import smallest_eigenpairs


def _binarized_laplacian(n, seed, p=None):
    """Graph Laplacian of a top-p binarized random-cluster affinity —
    the matrix family the production paths feed the solver."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((3, 16)) * 4.0
    pts = np.concatenate(
        [c + rng.standard_normal((n // 3 + 1, 16)) for c in centers]
    )[:n]
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    aff = pts @ pts.T
    p = p or max(2, n // 5)
    idx = np.argpartition(-aff, p - 1, axis=1)[:, :p]
    b = np.zeros_like(aff)
    np.put_along_axis(b, idx, 1.0, axis=1)
    b = 0.5 * (b + b.T)
    return (np.diag(b.sum(axis=1)) - b).astype(np.float32)


def _subspace_alignment(u, v):
    """Minimum cosine of the principal angles between the column
    spaces of u and v (1.0 = identical subspaces)."""
    qu, _ = np.linalg.qr(u)
    qv, _ = np.linalg.qr(v)
    return float(np.linalg.svd(qu.T @ qv, compute_uv=False).min())


def test_eigenvalues_match_dense():
    lap = _binarized_laplacian(300, seed=0)
    k = 5
    evals, evecs = smallest_eigenpairs(lap, k, subspace=k + 8)
    ref = np.sort(np.linalg.eigvalsh(lap.astype(np.float64)))[:k]
    assert evecs.shape == (300, k)
    np.testing.assert_allclose(np.sort(evals), ref, atol=5e-3)


def test_invariant_subspace_matches_dense():
    """Individual eigenvectors are rotation-ambiguous within clustered
    eigenvalues; the SUBSPACE must match — that is what the k-means
    step of spectral clustering consumes."""
    lap = _binarized_laplacian(300, seed=1)
    k = 4
    _, v_iter = smallest_eigenpairs(lap, k, subspace=k + 8)
    ref_evals, ref_vecs = np.linalg.eigh(lap.astype(np.float64))
    # guard: the test matrix must have a real gap after k, else the
    # reference subspace itself is ill-defined
    assert ref_evals[k] - ref_evals[k - 1] > 1e-3
    assert _subspace_alignment(v_iter, ref_vecs[:, :k]) > 0.999


def test_small_n_fallback_exact():
    lap = _binarized_laplacian(30, seed=2, p=6)
    evals, evecs = smallest_eigenpairs(lap, 3)
    ref_evals, ref_vecs = np.linalg.eigh(lap.astype(np.float64))
    np.testing.assert_allclose(evals, ref_evals[:3], atol=1e-5)
    assert _subspace_alignment(evecs, ref_vecs[:, :3]) > 0.9999


def test_subspace_param_returns_k_columns():
    lap = _binarized_laplacian(200, seed=3)
    evals, evecs = smallest_eigenpairs(lap, 2, subspace=16)
    assert evals.shape == (2,)
    assert evecs.shape == (200, 2)
