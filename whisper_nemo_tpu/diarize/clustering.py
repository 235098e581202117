"""NME-SC spectral clustering for speaker diarization.

The clustering stage of the reference's NeMo stack (SURVEY D5c): cosine
affinity over speaker embeddings, per-row top-p binarization with the
Normalized Maximum Eigengap (NME) criterion auto-tuning p, speaker-count
estimation from the Laplacian eigengap, spectral embedding + k-means.
Config contract: the ``clustering.parameters`` block of the diarizer
config (max_num_speakers, max_rp_threshold, sparse_search_volume,
enhanced_count_thres, chunk_cluster_count, embeddings_per_chunk —
reference telephonic.yaml:47-56).

Dense linear algebra (affinity, eigh) runs through jax.numpy so large
problems land on the TPU; the small search/k-means glue stays in numpy.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def cosine_affinity(embeddings: np.ndarray) -> np.ndarray:
    """[N, D] -> [N, N] cosine similarity (device matmul, fp32)."""
    embs = jnp.asarray(embeddings, jnp.float32)
    norm = jnp.linalg.norm(embs, axis=1, keepdims=True)
    unit = embs / jnp.maximum(norm, 1e-8)
    return np.asarray(jnp.dot(unit, unit.T, preferred_element_type=jnp.float32))


@jax.jit
def _multiscale_affinity_jit(stacked: jnp.ndarray, weights: jnp.ndarray):
    norm = jnp.linalg.norm(stacked, axis=2, keepdims=True)
    unit = stacked / jnp.maximum(norm, 1e-8)
    return jnp.einsum(
        "snd,smd->nm",
        unit * weights[:, None, None],
        unit,
        preferred_element_type=jnp.float32,
    )


def multiscale_affinity(
    stacked_embs: np.ndarray, weights: np.ndarray
) -> jnp.ndarray:
    """[S, N, D] per-scale embeddings → scale-weighted [N, N] cosine
    affinity, built in ONE device call and LEFT ON DEVICE.

    The n² matrix never crosses the device↔host link here — at hour
    scale that transfer (5 scales × n² float) dominated the whole
    diarization stage (measured r2: 52 s of a 72 s stage on 3600 s
    audio). Downstream consumers pull only the small blocks they need
    (`nmesc_search`'s 512² subsample, `spectral_cluster`'s Nyström
    columns + degrees)."""
    return _multiscale_affinity_jit(
        jnp.asarray(stacked_embs, jnp.float32),
        jnp.asarray(weights, jnp.float32),
    )


@partial(jax.jit, static_argnums=(1,))
def _binarize_device_jit(affinity: jnp.ndarray, p: int):
    """Per-row top-p binarization by row threshold (kth-largest value).

    Ties at the threshold can keep more than p entries per row (the
    host `binarize_top_p` breaks ties arbitrarily at exactly p);
    real-valued affinities make ties measure-zero."""
    kth = jax.lax.top_k(affinity, p)[0][:, -1]
    binarized = (affinity >= kth[:, None]).astype(jnp.float32)
    return 0.5 * (binarized + binarized.T)


@partial(jax.jit, static_argnums=(1,))
def _nystrom_c_jit(affinity: jnp.ndarray, p: int, anchor_idx):
    """Binarize + degree-normalize on device; return the [n, m]
    normalized anchor-column block ``c`` (LEFT ON DEVICE) and its
    [m, m] anchor square ``w`` (the only piece the host eigh needs —
    shipping the full ``c`` cost ~1 s/hour over the tunnel)."""
    binarized = _binarize_device_jit(affinity, p)
    deg = jnp.maximum(binarized.sum(axis=1), 1e-8)
    d_inv_sqrt = 1.0 / jnp.sqrt(deg)
    c = (
        binarized[:, anchor_idx]
        * d_inv_sqrt[:, None]
        * d_inv_sqrt[anchor_idx][None, :]
    )
    return c, c[anchor_idx]


@jax.jit
def _nystrom_extend_jit(c: jnp.ndarray, u_scaled: jnp.ndarray):
    """Row-normalized Nyström extension ``c @ (u / λ)`` on device;
    only the [n, k] spectral embedding transfers back."""
    emb = jnp.dot(c, u_scaled, preferred_element_type=jnp.float32)
    norms = jnp.linalg.norm(emb, axis=1, keepdims=True)
    return emb / jnp.maximum(norms, 1e-8)


def binarize_top_p(affinity: np.ndarray, p_neighbors: int) -> np.ndarray:
    """Keep each row's top-p entries (as 1s), symmetrize by average.

    NeMo's binarization keeps the affinity graph sparse enough for a
    clean eigengap; symmetrizing with 0.5·(B+Bᵀ) preserves symmetry for
    the eigensolver.
    """
    n = affinity.shape[0]
    p = int(np.clip(p_neighbors, 1, n))
    idx = np.argpartition(-affinity, p - 1, axis=1)[:, :p]
    binarized = np.zeros_like(affinity)
    np.put_along_axis(binarized, idx, 1.0, axis=1)
    return 0.5 * (binarized + binarized.T)


def laplacian(affinity_bin: np.ndarray) -> np.ndarray:
    degree = np.diag(affinity_bin.sum(axis=1))
    return degree - affinity_bin


def eigen_decompose(lap: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Ascending eigenvalues/vectors of a symmetric matrix.

    Runs on the host: XLA's TPU eigh pays a ~90 s compile per distinct
    shape (measured on v5e via the axon path), while LAPACK handles the
    diarization-scale matrices (≤ a few thousand) in seconds with no
    compilation. Device-side iterative eigensolving for very large N
    lives in ``ops.eig.smallest_eigenpairs`` (LOBPCG).
    """
    evals, evecs = np.linalg.eigh(np.asarray(lap, np.float32))
    return evals, evecs


def estimate_num_speakers(
    evals: np.ndarray, max_num_speakers: int
) -> Tuple[int, float]:
    """Speaker count from the largest Laplacian eigengap.

    Returns (num_speakers, eigengap value). Eigenvalues near zero count
    connected components; the gap after the k-th smallest eigenvalue
    marks k clusters.
    """
    evals = np.sort(np.maximum(evals, 0.0))
    bound = min(max_num_speakers, len(evals) - 1)
    gaps = evals[1 : bound + 1] - evals[:bound]
    k = int(np.argmax(gaps)) + 1
    return k, float(gaps[k - 1])


def _nme_ratio(affinity: np.ndarray, p: int, max_num_speakers: int) -> Tuple[float, int]:
    binarized = binarize_top_p(affinity, p)
    lap = laplacian(binarized)
    # the p-search only needs eigenvalues (no vectors): eigvalsh is
    # ~2-3x cheaper than the full decomposition
    evals = np.linalg.eigvalsh(np.asarray(lap, np.float32))
    n_spk, gap = estimate_num_speakers(evals, max_num_speakers)
    # normalized maximum eigengap: larger gap per neighbor count is better
    g = gap / (p + 1e-10)
    return (p / max(g, 1e-10)), n_spk


def nmesc_search(
    affinity: np.ndarray,
    max_num_speakers: int = 8,
    max_rp_threshold: float = 0.25,
    sparse_search_volume: int = 30,
    search_subsample: int = 512,
    maj_vote_spk_count: bool = False,
) -> Tuple[int, int]:
    """Search the neighbor count p minimizing the NME ratio.

    Returns (best_p, estimated_num_speakers). Contract: the
    max_rp_threshold bounds p ≤ N·max_rp; sparse_search_volume sets how
    many p values are probed (reference telephonic.yaml:52-53).

    With ``maj_vote_spk_count`` (telephonic.yaml:51) the speaker count
    is the mode of the estimates across every probed p value instead of
    the estimate at the NME-optimal p — NeMo's majority-vote stabilizer
    for noisy eigengaps.

    For large N the p-search runs on an evenly strided subsample of the
    affinity (each probe costs an O(n³) eigendecomposition; the chosen
    neighbor *ratio* transfers back to the full matrix), then the final
    clustering still uses every segment.
    """
    import os

    n = affinity.shape[0]
    on_device = not isinstance(affinity, np.ndarray)
    scale = 1.0
    if n > search_subsample:
        idx = np.linspace(0, n - 1, search_subsample).astype(int)
        # works for host AND device affinities; a device matrix keeps
        # the subsample on device (only probe eigenvalues come back)
        search_aff = affinity[idx][:, idx]
        scale = n / len(idx)
    else:
        search_aff = affinity
    m = search_aff.shape[0]
    p_max = max(2, int(np.floor(m * max_rp_threshold)))
    candidates = np.unique(
        np.linspace(1, p_max, num=min(sparse_search_volume, p_max)).astype(int)
    )

    # device p-search (VERDICT r2 weak #6 / roadmap item): all probes'
    # binarize + Laplacian + k-smallest eigenvalues in one batched
    # device program (LOBPCG — matmuls, seconds to compile) instead of
    # ~30 serial 512² eigvalsh calls on the contended 1-core host.
    # "auto": on for device-resident affinities on a real accelerator;
    # WNT_DEVICE_NME=1/0 forces/disables (tests pin parity with 1).
    mode = os.environ.get("WNT_DEVICE_NME", "auto")
    use_device = (
        mode == "1"
        or (
            mode == "auto"
            and on_device
            and jax.devices()[0].platform in ("tpu", "axon")
        )
    ) and m >= 64
    evals_table = None
    if use_device:
        from ..ops.eig import nme_probe_evals

        k = min(max_num_speakers + 1, m)
        table = nme_probe_evals(search_aff, candidates, k)
        if np.isfinite(table).all():
            evals_table = table

    best = (np.inf, 2, 1)  # (nme, p, n_spk)
    estimates = []
    if evals_table is not None:
        for p, evals in zip(candidates, evals_table):
            n_spk, gap = estimate_num_speakers(evals, max_num_speakers)
            g = gap / (p + 1e-10)
            nme = p / max(g, 1e-10)
            estimates.append(n_spk)
            if nme < best[0]:
                best = (nme, int(p), n_spk)
    else:
        search_aff = np.asarray(search_aff)
        for p in candidates:
            nme, n_spk = _nme_ratio(search_aff, int(p), max_num_speakers)
            estimates.append(n_spk)
            if nme < best[0]:
                best = (nme, int(p), n_spk)
    est = best[2]
    if maj_vote_spk_count and estimates:
        # mode; ties resolve to the smaller count (torch.mode semantics)
        est = int(np.argmax(np.bincount(np.asarray(estimates))))
    return max(1, int(round(best[1] * scale))), est


def enhanced_speaker_count(
    embeddings: np.ndarray,
    random_test_count: int = 5,
    anchor_spk_n: int = 3,
    anchor_sample_n: int = 10,
    anchor_spread: float = 0.1,
) -> int:
    """Anchor-augmented speaker counting for short sessions.

    The short-session stabilizer behind NeMo's ``enhanced_count_thres``
    knob (reference telephonic.yaml:50, active below 80 segments):
    eigengap estimates are unstable when N is small, so ``anchor_spk_n``
    synthetic speakers — each a tight cluster of ``anchor_sample_n``
    samples around a random unit-sphere centroid (relative spread
    ``anchor_spread``; random directions in embedding space are
    near-orthogonal to the data and to each other) — are appended
    before counting. The anchors pin ``anchor_spk_n`` clean clusters
    into the spectrum so the gap after the real clusters is read
    against a stable baseline. The trial repeats over
    ``random_test_count`` seeds; the mode of the estimates minus the
    anchor count (floored at 1) is the final count.
    """
    emb = np.asarray(embeddings, np.float32)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    emb = emb / np.maximum(norms, 1e-8)  # cosine affinity is used anyway
    emb_dim = emb.shape[1]
    n_anchor = anchor_spk_n * anchor_sample_n
    estimates = []
    for seed in range(random_test_count):
        rng = np.random.default_rng(seed)
        new_embs = []
        for _ in range(anchor_spk_n):
            center = rng.standard_normal(emb_dim)
            center /= max(np.linalg.norm(center), 1e-8)
            noise = rng.standard_normal((anchor_sample_n, emb_dim))
            noise /= np.maximum(
                np.linalg.norm(noise, axis=1, keepdims=True), 1e-8
            )
            samples = center[None, :] + anchor_spread * noise
            samples /= np.linalg.norm(samples, axis=1, keepdims=True)
            new_embs.append(samples)
        aug = np.vstack(new_embs + [emb]).astype(np.float32)
        aff = cosine_affinity(aug)
        # tighter rp bound and smaller search volume than the main
        # clustering pass (NeMo's enhanced-counting NMESC settings),
        # ceiling lifted so the anchors count as their own speakers;
        # majority vote across probed p values — fragmented small-p
        # graphs give outlier estimates, the p-consensus is the anchors
        # plus the real clusters
        _, est = nmesc_search(
            aff,
            max_num_speakers=min(aug.shape[0] - 1, n_anchor + emb.shape[0] // 2),
            max_rp_threshold=0.15,
            sparse_search_volume=10,
            maj_vote_spk_count=True,
        )
        estimates.append(est)
    mode = int(np.argmax(np.bincount(np.asarray(estimates))))
    return max(mode - anchor_spk_n, 1)


def _kmeans(
    points: np.ndarray, k: int, seed: int = 0, iters: int = 50
) -> np.ndarray:
    """k-means with k-means++ init.

    Distances use the ``|x|² + |c|² − 2x·c`` GEMM expansion: the
    broadcast form materialized an [n, k, d] temp — 3.8 GB *per Lloyd
    iteration* at the long-form chunk size (10k × 960-d, k=50), which
    pinned the 4 h bench's diarize stage on the 1-core host for tens
    of minutes. Seeding updates the min-distance incrementally (one
    O(n·d) GEMV per added center). Large chunks run seeding AND Lloyd
    on the accelerator (`_kmeans_device`)."""
    rng = np.random.default_rng(seed)
    n = len(points)
    if k >= n:
        return np.arange(n)
    pts = np.ascontiguousarray(points, np.float32)

    if n * pts.shape[1] >= 2_000_000:
        # long-form chunks: seeding AND Lloyd on device in one program
        # (50 sequential host GEMVs over a 38 MB matrix cost ~2-4 s per
        # chunk on the contended 1-core host; the Gumbel-max pick
        # samples ∝ d² exactly like k-means++)
        return _kmeans_device(pts, k, seed, iters)

    x2 = np.einsum("nd,nd->n", pts, pts)
    centers = np.empty((k, pts.shape[1]), np.float32)
    c = pts[rng.integers(n)]
    centers[0] = c
    d2 = np.maximum(x2 + float(c @ c) - 2.0 * (pts @ c), 0.0)
    for j in range(1, k):
        total = d2.sum()
        if total <= 1e-12:
            c = pts[rng.integers(n)]
        else:
            c = pts[rng.choice(n, p=d2 / total)]
        centers[j] = c
        d2 = np.minimum(
            d2, np.maximum(x2 + float(c @ c) - 2.0 * (pts @ c), 0.0)
        )

    labels = np.zeros(n, np.int32)
    for _ in range(iters):
        c2 = np.einsum("kd,kd->k", centers, centers)
        dists = x2[:, None] + c2[None, :] - 2.0 * (pts @ centers.T)
        new_labels = dists.argmin(axis=1).astype(np.int32)
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
        for j in range(k):
            mask = labels == j
            if mask.any():
                centers[j] = pts[mask].mean(axis=0)
    return labels


@partial(jax.jit, static_argnames=("k", "n_iters"))
def _kmeans_device_jit(p, seed, k, n_iters):
    """k-means++ seeding + Lloyd, entirely on device.

    The ∝d² sampling uses the Gumbel-max trick (argmax of
    log d² + Gumbel noise is an exact categorical draw), so no
    per-center host round-trip; the first center is a uniform draw
    (zero logits). Numerically the same algorithm as the host path,
    with the jax PRNG stream instead of numpy's."""
    x2 = jnp.einsum("nd,nd->n", p, p)
    keys = jax.random.split(jax.random.PRNGKey(seed), k)

    def seed_step(carry, key_i):
        d2, first = carry
        logits = jnp.where(first, 0.0, jnp.log(jnp.maximum(d2, 1e-30)))
        idx = jnp.argmax(logits + jax.random.gumbel(key_i, logits.shape))
        c = p[idx]
        dc = jnp.maximum(x2 + jnp.dot(c, c) - 2.0 * (p @ c), 0.0)
        d2 = jnp.where(first, dc, jnp.minimum(d2, dc))
        return (d2, jnp.zeros((), bool)), c

    (_, _), centers = jax.lax.scan(
        seed_step, (jnp.ones_like(x2), jnp.ones((), bool)), keys
    )

    def assign(c):
        c2 = jnp.einsum("kd,kd->k", c, c)
        d = x2[:, None] + c2[None, :] - 2.0 * (p @ c.T)
        return jnp.argmin(d, axis=1)

    def step(c, _):
        labels = assign(c)
        onehot = jax.nn.one_hot(labels, c.shape[0], dtype=p.dtype)
        sums = onehot.T @ p
        counts = onehot.sum(axis=0)[:, None]
        new_c = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), c)
        return new_c, None

    c, _ = jax.lax.scan(step, centers, None, length=n_iters)
    labels = assign(c)
    # exact means of the FINAL assignment (what longform_cluster
    # reclusters); empty clusters fall back to the global mean, like
    # the host path's chunk.mean(axis=0)
    onehot = jax.nn.one_hot(labels, k, dtype=p.dtype)
    sums = onehot.T @ p
    counts = onehot.sum(axis=0)[:, None]
    means = jnp.where(
        counts > 0, sums / jnp.maximum(counts, 1.0), p.mean(axis=0)[None]
    )
    return labels, means


def _kmeans_device(pts, k: int, seed: int, iters: int) -> np.ndarray:
    labels, _ = _kmeans_device_jit(jnp.asarray(pts), seed, k, iters)
    return np.asarray(labels).astype(np.int32)


def _overcluster_chunk(chunk, k: int, seed: int, iters: int = 50):
    """(labels [n], means [k, d]) for one long-form chunk.

    Device arrays and large host chunks run fully on the accelerator —
    including the final-assignment means, whose host computation
    (k boolean-mask reductions over a 38 MB chunk) was several seconds
    per chunk on the 1-core box. Small host chunks keep the numpy
    path (same numerics as always)."""
    n = chunk.shape[0]
    if k >= n:
        return np.arange(n), np.asarray(chunk, np.float32)
    on_device = not isinstance(chunk, np.ndarray)
    if on_device or n * chunk.shape[1] >= 2_000_000:
        labels_d, means_d = _kmeans_device_jit(
            jnp.asarray(chunk, jnp.float32), seed, k, iters
        )
        return (
            np.asarray(labels_d).astype(np.int64),
            np.asarray(means_d, np.float32),
        )
    labels = _kmeans(chunk, k, seed=seed, iters=iters)
    means = np.stack(
        [
            chunk[labels == j].mean(axis=0)
            if (labels == j).any()
            else chunk.mean(axis=0)
            for j in range(k)
        ]
    )
    return labels, means




def spectral_cluster(
    affinity_bin: np.ndarray, n_speakers: int, seed: int = 0
) -> np.ndarray:
    """Rows of the k smallest-eigenvalue eigenvectors, k-means'd.

    Past ``_NYSTROM_THRESHOLD`` segments the spectral embedding comes
    from a Nyström extension instead of a full O(n³) eigh."""
    n = affinity_bin.shape[0]
    if n > _NYSTROM_THRESHOLD:
        embedding = _nystrom_embedding(affinity_bin, n_speakers)
    else:
        lap = laplacian(affinity_bin)
        _, evecs = eigen_decompose(lap)
        embedding = evecs[:, :n_speakers]
    norms = np.linalg.norm(embedding, axis=1, keepdims=True)
    embedding = embedding / np.maximum(norms, 1e-8)
    return _kmeans(embedding, n_speakers, seed)


def spectral_cluster_device(
    affinity_dev, p_neighbors: int, n_speakers: int, seed: int = 0
) -> np.ndarray:
    """`spectral_cluster` for an affinity living on device: binarize on
    device and transfer only what the chosen eigens path needs — the
    Nyström blocks (n·m + n floats) past the threshold, the single
    binarized matrix otherwise."""
    n = affinity_dev.shape[0]
    p = int(np.clip(p_neighbors, 1, n))
    if n > _NYSTROM_THRESHOLD:
        m = min(_NYSTROM_ANCHORS, n)
        idx = np.linspace(0, n - 1, m).astype(int)
        c_dev, w_dev = _nystrom_c_jit(affinity_dev, p, jnp.asarray(idx))
        # the small [m, m] anchor eigenproblem is the only host work:
        # top-k eigenpairs of the normalized affinity via LAPACK's
        # subset driver (~0.1 s at m=1024 vs ~0.3 s for the full f64
        # decomposition)
        w = np.asarray(w_dev, np.float64)
        try:
            from scipy.linalg import eigh as scipy_eigh

            evals, evecs = scipy_eigh(
                w, subset_by_index=[m - n_speakers, m - 1]
            )
        except ImportError:  # CI environments without scipy
            evals, evecs = np.linalg.eigh(w)
            evals = evals[m - n_speakers:]
            evecs = evecs[:, m - n_speakers:]
        order = np.argsort(-evals)
        lam = np.maximum(evals[order], 1e-8)
        u = evecs[:, order]
        embedding = np.asarray(
            _nystrom_extend_jit(
                c_dev, jnp.asarray((u / lam[None, :]).astype(np.float32))
            )
        )
        return _kmeans(embedding, n_speakers, seed)
    else:
        if _use_device_eig(n):
            # mid-size dense path on device: binarize + Laplacian stay
            # in HBM and LOBPCG extracts only the k-smallest subspace
            # (matmuls — seconds). The host alternative transfers the
            # n² binarized matrix (64 MB at n≈4000, ~2 s of tunnel)
            # and pays a full O(n³) LAPACK eigh on the 1-core box —
            # measured 20.8 s inside the cluster mark at the meeting
            # preset's hour workload (n_base=3987, just under the
            # Nyström threshold; BASELINE.md r5).
            lap_dev = _laplacian_device_jit(
                _binarize_device_jit(affinity_dev, p)
            )
            from ..ops.eig import smallest_eigenpairs

            _, embedding = smallest_eigenpairs(
                lap_dev, n_speakers, subspace=n_speakers + 8
            )
        else:
            binarized = np.asarray(_binarize_device_jit(affinity_dev, p))
            lap = laplacian(binarized)
            _, evecs = eigen_decompose(lap)
            embedding = evecs[:, :n_speakers]
    norms = np.linalg.norm(embedding, axis=1, keepdims=True)
    embedding = embedding / np.maximum(norms, 1e-8)
    return _kmeans(embedding, n_speakers, seed)


def _use_device_eig(n: int) -> bool:
    """Route the ≤-threshold dense spectral path through the device
    LOBPCG when the host full eigh would dominate (n ≳ 1500 costs
    seconds-to-tens-of-seconds on the 1-core host). "auto" enables it
    on real accelerators only; ``WNT_DEVICE_EIG=1/0`` forces/disables
    (the parity test pins LOBPCG labels == dense-eigh labels with 1).
    The k-means consuming the result is invariant to the basis chosen
    within the k-smallest invariant subspace, so the two paths agree
    wherever the eigengap is meaningful."""
    mode = os.environ.get("WNT_DEVICE_EIG", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return n >= 64
    return (
        n >= 1536
        and jax.devices()[0].platform in ("tpu", "axon")
    )


@jax.jit
def _laplacian_device_jit(binarized: jnp.ndarray) -> jnp.ndarray:
    return jnp.diag(binarized.sum(axis=1)) - binarized


_NYSTROM_THRESHOLD = 4096
_NYSTROM_ANCHORS = 1024


def _nystrom_from_blocks(
    deg: np.ndarray, cols: np.ndarray, idx: np.ndarray, k: int
) -> np.ndarray:
    """Nyström spectral embedding from (degrees, anchor-column block).

    Eigen-decompose the normalized affinity on the anchor subset and
    extend the eigenvectors to every point: O(n·m + m³) instead of
    O(n³). Normalized-affinity formulation (top eigenvectors of
    D^-1/2 A D^-1/2 ≡ smallest of the normalized Laplacian)."""
    deg = np.maximum(deg, 1e-8)
    d_inv_sqrt = 1.0 / np.sqrt(deg)
    c = (cols * d_inv_sqrt[:, None]) * d_inv_sqrt[idx][None, :]
    w = c[idx]  # [m, m]

    evals, evecs = np.linalg.eigh(w.astype(np.float64))
    order = np.argsort(-evals)[:k]
    lam = np.maximum(evals[order], 1e-8)
    u = evecs[:, order]
    return (c @ (u / lam[None, :])).astype(np.float32)


def _nystrom_embedding(
    affinity: np.ndarray, k: int, n_anchors: int = _NYSTROM_ANCHORS
) -> np.ndarray:
    """Nyström embedding of a host-resident affinity."""
    n = affinity.shape[0]
    m = min(n_anchors, n)
    idx = np.linspace(0, n - 1, m).astype(int)
    return _nystrom_from_blocks(
        affinity.sum(axis=1), affinity[:, idx], idx, k
    )


def nme_spectral_clustering(
    embeddings: np.ndarray,
    num_speakers: Optional[int] = None,
    max_num_speakers: int = 8,
    min_num_speakers: int = 1,
    max_rp_threshold: float = 0.25,
    sparse_search_volume: int = 30,
    affinity: Optional[np.ndarray] = None,
    seed: int = 0,
    enhanced_count_thres: int = 0,
    maj_vote_spk_count: bool = False,
) -> np.ndarray:
    """Full NME-SC pipeline: embeddings (or a precomputed multiscale
    affinity) → per-segment speaker labels.

    ``num_speakers`` forces the oracle count (the pyannote-equivalent
    knob, reference main.py:150-159); otherwise the count is estimated
    and clamped to [min_num_speakers, max_num_speakers]. Below
    ``enhanced_count_thres`` segments (telephonic.yaml:50 sets 80) the
    estimate comes from anchor-augmented enhanced counting instead —
    the short-session stabilizer for the telephonic sweet spot.
    ``maj_vote_spk_count`` takes the mode over all probed p values
    (telephonic.yaml:51).
    """
    if affinity is None:
        affinity = cosine_affinity(embeddings)
    on_device = not isinstance(affinity, np.ndarray)
    n = affinity.shape[0]
    if n == 1:
        return np.zeros(1, np.int32)
    if n == 2:
        same = float(affinity[0, 1]) > 0.5
        if num_speakers == 1 or (num_speakers is None and same):
            return np.zeros(2, np.int32)
        return np.arange(2, dtype=np.int32)

    best_p, est = nmesc_search(
        affinity, max_num_speakers, max_rp_threshold, sparse_search_volume,
        maj_vote_spk_count=maj_vote_spk_count,
    )
    if (
        num_speakers is None
        and embeddings is not None
        and 0 < n < enhanced_count_thres
    ):
        est = enhanced_speaker_count(embeddings)
    n_spk = num_speakers if num_speakers is not None else est
    n_spk = int(np.clip(n_spk, min_num_speakers, max_num_speakers))
    if on_device:
        return spectral_cluster_device(affinity, best_p, n_spk, seed)
    binarized = binarize_top_p(affinity, best_p)
    return spectral_cluster(binarized, n_spk, seed)


def longform_cluster(
    embeddings: np.ndarray,
    num_speakers: Optional[int] = None,
    max_num_speakers: int = 8,
    chunk_cluster_count: int = 50,
    embeddings_per_chunk: int = 10000,
    **kwargs,
) -> np.ndarray:
    """Long-form path: over-cluster each chunk, recluster the cluster
    means, propagate labels (reference telephonic.yaml:55-56 contract).
    """
    n = embeddings.shape[0]
    if n <= embeddings_per_chunk:
        return nme_spectral_clustering(
            embeddings,
            num_speakers=num_speakers,
            max_num_speakers=max_num_speakers,
            **kwargs,
        )
    # chunked path: per-chunk affinities are derived from embeddings, so a
    # caller-supplied full affinity no longer applies
    kwargs.pop("affinity", None)
    chunk_labels = np.zeros(n, np.int64)
    means = []
    offset = 0
    for start in range(0, n, embeddings_per_chunk):
        chunk = embeddings[start : start + embeddings_per_chunk]
        k = min(chunk_cluster_count, chunk.shape[0])
        labels, chunk_means = _overcluster_chunk(chunk, k, seed=start)
        chunk_labels[start : start + chunk.shape[0]] = labels + offset
        means.append(chunk_means)
        offset += k
    means = np.concatenate(means, axis=0)
    meta_labels = nme_spectral_clustering(
        means,
        num_speakers=num_speakers,
        max_num_speakers=max_num_speakers,
        **kwargs,
    )
    return meta_labels[chunk_labels].astype(np.int32)
