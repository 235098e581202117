import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_nemo_tpu.models import marblenet, msdd, titanet
from whisper_nemo_tpu.ops.features import log_mel_features


def test_log_mel_features_shapes():
    wave = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    feats = np.asarray(log_mel_features(jnp.asarray(wave), n_mels=64))
    assert feats.shape == (101, 64)
    # per-feature normalization: ~zero mean, unit variance
    assert np.abs(feats.mean(axis=0)).max() < 0.1
    assert np.abs(feats.std(axis=0) - 1.0).max() < 0.2


def test_marblenet_frame_probs():
    dims = marblenet.MarbleNetDims(filters=(32, 16, 16, 16))
    params = marblenet.init_marblenet_params(jax.random.PRNGKey(0), dims)
    feats = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 101, 64)),
        jnp.float32,
    )
    probs = np.asarray(marblenet.speech_probs(params, feats, dims))
    assert probs.shape == (2, 101)
    assert (probs >= 0).all() and (probs <= 1).all()


@pytest.fixture(scope="module")
def small_titanet():
    dims = titanet.TitaNetDims(
        filters=(32, 32, 32, 96),
        kernels=(3, 7, 11, 1),
        repeat=2,
        se_reduction=4,
        emb_dim=48,
    )
    params = titanet.init_titanet_params(jax.random.PRNGKey(0), dims)
    return params, dims


def test_titanet_embedding_shapes(small_titanet):
    params, dims = small_titanet
    feats = jnp.asarray(
        np.random.default_rng(2).standard_normal((3, 151, 80)), jnp.float32
    )
    lengths = jnp.asarray([151, 100, 50])
    embs = np.asarray(titanet.embed(params, feats, lengths, dims))
    assert embs.shape == (3, 48)
    assert np.isfinite(embs).all()


def test_titanet_mask_invariance(small_titanet):
    """Padding beyond the valid length must not change the embedding."""
    params, dims = small_titanet
    rng = np.random.default_rng(3)
    base = rng.standard_normal((1, 100, 80)).astype(np.float32)
    padded = np.concatenate(
        [base, rng.standard_normal((1, 51, 80)).astype(np.float32)], axis=1
    )
    e1 = np.asarray(
        titanet.embed(params, jnp.asarray(base), jnp.asarray([100]), dims)
    )
    e2 = np.asarray(
        titanet.embed(params, jnp.asarray(padded), jnp.asarray([100]), dims)
    )
    np.testing.assert_allclose(e1, e2, atol=2e-3)


def test_titanet_same_speaker_similarity(small_titanet):
    """Embeddings must be deterministic and distance-meaningful: the
    same window twice → identical; different audio → different."""
    params, dims = small_titanet
    rng = np.random.default_rng(4)
    a = rng.standard_normal((1, 120, 80)).astype(np.float32)
    b = rng.standard_normal((1, 120, 80)).astype(np.float32)
    ea = np.asarray(titanet.embed(params, jnp.asarray(a), jnp.asarray([120]), dims))
    ea2 = np.asarray(titanet.embed(params, jnp.asarray(a), jnp.asarray([120]), dims))
    eb = np.asarray(titanet.embed(params, jnp.asarray(b), jnp.asarray([120]), dims))
    np.testing.assert_allclose(ea, ea2, atol=1e-5)
    assert np.linalg.norm(ea - eb) > 1e-3


def test_msdd_infer_contract():
    dims = msdd.MsddDims(n_scales=3, emb_dim=16, hidden=32, proj=16)
    params = msdd.init_msdd_params(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(5)
    seg_embs = rng.standard_normal((3, 40, 16)).astype(np.float32)
    labels = np.array([0] * 20 + [1] * 20)
    activity = msdd.msdd_infer(
        params,
        seg_embs,
        labels,
        scale_weights=[1, 1, 1],
        sigmoid_threshold=0.7,
        diar_window=5,
        seg_duration=0.5,
    )
    assert activity.shape == (40, 2)
    # every segment has at least one active speaker (fallback rule)
    assert activity.any(axis=1).all()


def test_msdd_mean_sigmoids_match_windowed_loop():
    """The single-dispatch vectorized window pass must equal a naive
    per-window loop (fresh LSTM state per window, remainder window at
    its exact length) — including a bidirectional param tree, whose
    reverse LSTM is what exact remainder handling protects."""
    import itertools

    import jax.numpy as jnp

    dims = msdd.MsddDims(n_scales=2, emb_dim=8, hidden=16, proj=8)
    params = msdd.init_msdd_params(jax.random.PRNGKey(1), dims)
    params["lstm_rev"] = jax.tree_util.tree_map(
        lambda x: x + 0.01, params["lstm"]
    )
    # bidirectional trees project from 2*hidden (engine/nemo_weights)
    import jax.numpy as _jnp

    params["out"]["w"] = _jnp.concatenate(
        [params["out"]["w"], params["out"]["w"] * 0.5], axis=0
    )
    rng = np.random.default_rng(9)
    t_total, window_t = 23, 5  # remainder window of 3
    seg = rng.standard_normal((2, t_total, 8)).astype(np.float32)
    labels = np.array([0] * 8 + [1] * 8 + [2] * 7)
    weights = [1.0, 1.0]

    mean_sig, speakers = msdd.msdd_mean_sigmoids(
        params, seg, labels, weights,
        diar_window=window_t, seg_duration=1.0,
    )

    # naive reference: host averages, per-window feature + LSTM calls
    avg = np.stack(
        [
            np.stack([seg[s][labels == spk].mean(0) for spk in speakers])
            for s in range(2)
        ]
    )
    pairs = list(itertools.combinations(range(3), 2))
    w = jnp.asarray(weights, jnp.float32)
    sig_sum = np.zeros((t_total, 3))
    for start in range(0, t_total, window_t):
        chunk = jnp.asarray(seg[:, start : start + window_t])
        feats = jnp.stack(
            [
                msdd.pair_features(chunk, jnp.asarray(avg[:, [a, b]]), w)
                for a, b in pairs
            ]
        )
        probs = np.asarray(jax.nn.sigmoid(msdd.msdd_logits(params, feats)))
        for pi, (a, b) in enumerate(pairs):
            tc = probs.shape[1]
            sig_sum[start : start + tc, a] += probs[pi, :, 0]
            sig_sum[start : start + tc, b] += probs[pi, :, 1]
    ref = sig_sum / 2.0  # each of 3 speakers appears in 2 pairs
    np.testing.assert_allclose(mean_sig, ref, atol=2e-5)


def test_msdd_single_speaker_short_circuit():
    dims = msdd.MsddDims(n_scales=2)
    params = msdd.init_msdd_params(jax.random.PRNGKey(0), dims)
    seg_embs = np.zeros((2, 10, 192), np.float32)
    labels = np.zeros(10, np.int64)
    activity = msdd.msdd_infer(params, seg_embs, labels, [1, 1])
    assert activity.shape == (10, 1)
    assert activity.all()


def test_msdd_speaker_limit_falls_back_to_clustering():
    dims = msdd.MsddDims(n_scales=2)
    params = msdd.init_msdd_params(jax.random.PRNGKey(0), dims)
    seg_embs = np.random.default_rng(0).standard_normal((2, 12, 192)).astype(np.float32)
    labels = np.arange(12) % 6  # 6 speakers > overlap_infer_spk_limit=5
    activity = msdd.msdd_infer(
        params, seg_embs, labels, [1, 1], overlap_infer_spk_limit=5
    )
    assert activity.shape == (12, 6)
    assert (activity.sum(axis=1) == 1).all()
