import numpy as np
import pytest

from whisper_nemo_tpu.diarize.clustering import (
    binarize_top_p,
    cosine_affinity,
    estimate_num_speakers,
    eigen_decompose,
    laplacian,
    longform_cluster,
    nme_spectral_clustering,
    nmesc_search,
    spectral_cluster,
)


def _gaussian_speakers(n_per, n_spk, dim=32, sep=5.0, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_spk, dim)) * sep
    embs, labels = [], []
    for k in range(n_spk):
        embs.append(centers[k] + rng.standard_normal((n_per, dim)))
        labels += [k] * n_per
    return np.concatenate(embs).astype(np.float32), np.array(labels)


def _clustering_accuracy(pred, true):
    """Best-permutation accuracy (small label sets)."""
    from itertools import permutations

    best = 0.0
    for perm in permutations(range(max(pred.max(), true.max()) + 1)):
        mapped = np.array([perm[p] for p in pred])
        best = max(best, (mapped == true).mean())
    return best


def test_cosine_affinity_range():
    embs = np.random.default_rng(0).standard_normal((10, 8)).astype(np.float32)
    aff = cosine_affinity(embs)
    assert aff.shape == (10, 10)
    np.testing.assert_allclose(np.diag(aff), 1.0, atol=1e-5)
    assert np.abs(aff).max() <= 1.0 + 1e-5


def test_binarize_symmetric():
    aff = cosine_affinity(
        np.random.default_rng(1).standard_normal((12, 6)).astype(np.float32)
    )
    b = binarize_top_p(aff, 3)
    np.testing.assert_allclose(b, b.T)
    assert set(np.unique(b)).issubset({0.0, 0.5, 1.0})


def test_eigengap_counts_components():
    # block-diagonal affinity with 3 disconnected cliques
    blocks = [np.ones((4, 4)), np.ones((5, 5)), np.ones((3, 3))]
    n = sum(b.shape[0] for b in blocks)
    aff = np.zeros((n, n))
    off = 0
    for b in blocks:
        k = b.shape[0]
        aff[off : off + k, off : off + k] = b
        off += k
    evals, _ = eigen_decompose(laplacian(aff))
    k, gap = estimate_num_speakers(evals, 8)
    assert k == 3
    assert gap > 1.0


def test_nme_clustering_recovers_speakers():
    for n_spk in (2, 3, 4):
        embs, true = _gaussian_speakers(30, n_spk, seed=n_spk)
        pred = nme_spectral_clustering(embs, max_num_speakers=8)
        assert len(np.unique(pred)) == n_spk
        assert _clustering_accuracy(pred, true) > 0.95


def test_oracle_num_speakers_forced():
    embs, true = _gaussian_speakers(20, 2, seed=7)
    pred = nme_spectral_clustering(embs, num_speakers=2)
    assert len(np.unique(pred)) == 2
    assert _clustering_accuracy(pred, true) > 0.95


def test_single_and_pair_edge_cases():
    one = nme_spectral_clustering(np.ones((1, 8), np.float32))
    assert one.tolist() == [0]
    same = np.ones((2, 8), np.float32)
    assert nme_spectral_clustering(same).tolist() == [0, 0]
    opposite = np.array([[1.0] * 8, [-1.0] * 8], np.float32)
    assert nme_spectral_clustering(opposite).tolist() == [0, 1]


def test_longform_overclustering_path():
    embs, true = _gaussian_speakers(300, 2, seed=3)
    pred = longform_cluster(
        embs, embeddings_per_chunk=100, chunk_cluster_count=10
    )
    assert len(pred) == len(true)
    assert len(np.unique(pred)) == 2
    assert _clustering_accuracy(pred, true) > 0.9


def test_nmesc_search_returns_valid_p():
    embs, _ = _gaussian_speakers(25, 2, seed=5)
    aff = cosine_affinity(embs)
    p, n_spk = nmesc_search(aff, 8, 0.25, 10)
    assert 1 <= p <= len(aff) * 0.25 + 1
    assert n_spk == 2


def test_nystrom_path_recovers_speakers():
    """Above the Nyström threshold the approximate spectral embedding
    must still recover speakers near-perfectly."""
    import whisper_nemo_tpu.diarize.clustering as cl

    embs, true = _gaussian_speakers(1200, 3, seed=11)  # 3600 segments
    old = cl._NYSTROM_THRESHOLD
    cl._NYSTROM_THRESHOLD = 1000  # force the Nyström path
    try:
        pred = nme_spectral_clustering(embs, num_speakers=3)
    finally:
        cl._NYSTROM_THRESHOLD = old
    assert len(np.unique(pred)) == 3
    assert _clustering_accuracy(pred, true) > 0.95


def test_nystrom_matches_exact_on_moderate_n():
    import whisper_nemo_tpu.diarize.clustering as cl

    embs, true = _gaussian_speakers(200, 2, seed=12)
    exact = nme_spectral_clustering(embs, num_speakers=2)
    old = cl._NYSTROM_THRESHOLD
    cl._NYSTROM_THRESHOLD = 100
    try:
        approx = nme_spectral_clustering(embs, num_speakers=2)
    finally:
        cl._NYSTROM_THRESHOLD = old
    assert _clustering_accuracy(approx, true) > 0.95
    # same partition up to label permutation
    agree = max(
        (approx == exact).mean(), (approx == 1 - exact).mean()
    )
    assert agree > 0.95


def test_enhanced_count_on_small_n():
    """Enhanced counting (anchor augmentation) recovers the speaker
    count on short sessions where N < enhanced_count_thres (contract:
    reference telephonic.yaml:50, active below 80 segments)."""
    from whisper_nemo_tpu.diarize.clustering import enhanced_speaker_count

    for n_spk in (2, 3):
        embs, _ = _gaussian_speakers(12, n_spk, sep=8.0, seed=n_spk)
        assert enhanced_speaker_count(embs) == n_spk


def test_enhanced_count_thres_changes_estimate():
    """The knob must be consumed: with a tiny ambiguous session the
    enhanced path and the plain eigengap path may disagree, and the
    labels must still cover the enhanced-path count."""
    embs, true = _gaussian_speakers(10, 2, sep=8.0, seed=3)
    labels_enh = nme_spectral_clustering(
        embs, enhanced_count_thres=80
    )
    assert len(labels_enh) == len(true)
    assert set(labels_enh) == {0, 1}
    assert _clustering_accuracy(labels_enh, true) == 1.0
    # above the threshold the enhanced path must NOT run (N=20 >= 10)
    labels_plain = nme_spectral_clustering(
        embs, enhanced_count_thres=10
    )
    assert len(labels_plain) == len(true)


def test_maj_vote_spk_count():
    """Majority-vote counting takes the mode over probed p values
    (contract: telephonic.yaml:51)."""
    embs, true = _gaussian_speakers(30, 3, sep=8.0, seed=1)
    aff = cosine_affinity(embs)
    _, est_maj = nmesc_search(aff, maj_vote_spk_count=True)
    assert est_maj == 3
    labels = nme_spectral_clustering(embs, maj_vote_spk_count=True)
    assert _clustering_accuracy(labels, true) == 1.0


def test_pipeline_passes_counting_knobs():
    """The diarizer config's enhanced_count_thres / maj_vote_spk_count
    reach the clustering call (the knobs were dead in round 1)."""
    import inspect

    from whisper_nemo_tpu.diarize import pipeline as pl

    src = inspect.getsource(pl.NeuralDiarizer.diarize if hasattr(
        pl, "NeuralDiarizer") else pl)
    assert "enhanced_count_thres=cl.enhanced_count_thres" in inspect.getsource(pl)
    assert "maj_vote_spk_count=cl.maj_vote_spk_count" in inspect.getsource(pl)


def test_multiscale_affinity_device_matches_host():
    """The one-call device affinity equals the per-scale host
    accumulation (weighted cosine similarity sum)."""
    from whisper_nemo_tpu.diarize.clustering import multiscale_affinity

    rng = np.random.default_rng(3)
    stacked = rng.standard_normal((3, 40, 16)).astype(np.float32)
    weights = np.array([0.5, 0.3, 0.2])

    host = np.zeros((40, 40))
    for s in range(3):
        host += weights[s] * cosine_affinity(stacked[s])

    dev = np.asarray(multiscale_affinity(stacked, weights))
    np.testing.assert_allclose(dev, host, atol=1e-4)


def test_device_affinity_clustering_matches_host_path():
    """nme_spectral_clustering over a device-resident affinity (the
    hour-scale fast path: binarize + Nyström blocks on device) gives
    the same labels as the host path on well-separated speakers."""
    import jax.numpy as jnp

    from whisper_nemo_tpu.diarize.clustering import multiscale_affinity

    embs, true = _gaussian_speakers(60, 3, seed=7)
    host_labels = nme_spectral_clustering(embs, num_speakers=3)

    aff_dev = multiscale_affinity(embs[None], np.array([1.0]))
    assert not isinstance(aff_dev, np.ndarray)
    dev_labels = nme_spectral_clustering(
        None, num_speakers=3, affinity=aff_dev
    )
    assert _clustering_accuracy(dev_labels, true) > 0.95
    assert _clustering_accuracy(host_labels, true) > 0.95


def test_spectral_cluster_device_nystrom_branch():
    """Past the Nyström threshold the device path transfers only the
    anchor blocks; labels must still recover the planted speakers."""
    from whisper_nemo_tpu.diarize import clustering as cl

    embs, true = _gaussian_speakers(100, 2, seed=9)
    aff = cl.multiscale_affinity(embs[None], np.array([1.0]))
    old = cl._NYSTROM_THRESHOLD
    cl._NYSTROM_THRESHOLD = 50  # force the Nyström branch at n=200
    try:
        labels = cl.spectral_cluster_device(aff, p_neighbors=40,
                                            n_speakers=2)
    finally:
        cl._NYSTROM_THRESHOLD = old
    assert _clustering_accuracy(labels, true) > 0.95


def test_spectral_cluster_device_lobpcg_matches_dense():
    """The mid-size dense branch routed through the device LOBPCG
    (WNT_DEVICE_EIG=1) labels identically to the host full-eigh path
    (=0): k-means on the spectral embedding is invariant to the basis
    chosen within the k-smallest invariant subspace. This is the path
    the meeting preset's hour workload takes (n_base≈4000, just under
    the Nyström threshold, where the host eigh measured 20.8 s on
    chip — BASELINE.md r5)."""
    import os

    from whisper_nemo_tpu.diarize import clustering as cl

    embs, true = _gaussian_speakers(80, 3, seed=11)  # n=240
    aff = cl.multiscale_affinity(embs[None], np.array([1.0]))
    assert not isinstance(aff, np.ndarray)
    try:
        os.environ["WNT_DEVICE_EIG"] = "0"
        dense = cl.spectral_cluster_device(aff, p_neighbors=48,
                                           n_speakers=3)
        os.environ["WNT_DEVICE_EIG"] = "1"
        lobpcg = cl.spectral_cluster_device(aff, p_neighbors=48,
                                            n_speakers=3)
    finally:
        os.environ.pop("WNT_DEVICE_EIG", None)
    assert _clustering_accuracy(dense, true) > 0.95
    assert _clustering_accuracy(lobpcg, true) > 0.95
    assert _clustering_accuracy(lobpcg, dense) == 1.0


def test_map_scales_to_base_matches_bruteforce():
    """The O(n log m) bisection mapping equals the naive
    nearest-center argmin (including first-index tie-breaking)."""
    from whisper_nemo_tpu.diarize.segments import (
        map_scales_to_base,
        multiscale_segmentation,
    )

    regions = [(0.0, 7.3), (9.1, 14.0), (15.5, 23.2)]
    scales = multiscale_segmentation(
        regions, [1.5, 1.0, 0.5], [0.75, 0.5, 0.25]
    )
    got = map_scales_to_base(scales)

    base_centers = np.array([s.center for s in scales[-1]])
    for si, segs in enumerate(scales):
        centers = np.array([s.center for s in segs])
        dists = np.abs(base_centers[None, :] - centers[:, None])
        expected = np.argmin(dists, axis=0)
        np.testing.assert_array_equal(got[si], expected)


def test_device_nme_search_matches_host():
    """The batched device NME p-search (WNT_DEVICE_NME=1: binarize +
    Laplacian + LOBPCG eigenvalues in one jit, ops/eig.py) must agree
    with the host eigvalsh loop: speaker estimates exactly, and the
    NME-optimal p except at documented near-ties (< ~1% NME margin,
    where f32 LOBPCG residual on fragmented small-p graphs can flip
    the argmin without changing the count)."""
    import os

    from whisper_nemo_tpu.diarize import clustering as cl

    rng = np.random.default_rng(7)
    prev = os.environ.get("WNT_DEVICE_NME")
    try:
        for n_spk, per in ((2, 600), (6, 120), (3, 40)):
            centers = rng.standard_normal((n_spk, 48))
            centers /= np.linalg.norm(centers, axis=1, keepdims=True)
            embs = np.concatenate(
                [c + 0.2 * rng.standard_normal((per, 48)) for c in centers]
            )
            aff = cl.cosine_affinity(embs)
            os.environ["WNT_DEVICE_NME"] = "0"
            p_host, est_host = cl.nmesc_search(aff, max_num_speakers=8)
            os.environ["WNT_DEVICE_NME"] = "1"
            p_dev, est_dev = cl.nmesc_search(aff, max_num_speakers=8)
            assert est_dev == est_host, (n_spk, est_host, est_dev)
            assert p_dev == p_host, (n_spk, p_host, p_dev)
    finally:
        if prev is None:
            os.environ.pop("WNT_DEVICE_NME", None)
        else:
            os.environ["WNT_DEVICE_NME"] = prev
