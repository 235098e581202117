"""Multiscale diarization decoder (MSDD) in pure-functional JAX.

The overlap-aware refinement stage of the reference's diarization stack
(SURVEY D5d: ``diar_msdd_telephonic``, sigmoid 0.7, 50 s split windows,
pairwise inference, overlap off above 5 speakers —
telephonic.yaml:58-67). Given multiscale segment embeddings and the
cluster-average embedding of each speaker, a per-pair LSTM over the
scale-similarity features emits an independent sigmoid speech
probability per speaker per segment, which is what allows two speakers
to be active at once (overlap).

The LSTM is a ``lax.scan``; pairwise inference over K speakers runs the
(K choose 2) pairs as a batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import combinations
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class MsddDims:
    n_scales: int = 5
    emb_dim: int = 192
    hidden: int = 256
    proj: int = 96


def _lstm_step(p, carry, x):
    h, c = carry
    z = (
        jnp.dot(x, p["wx"], preferred_element_type=jnp.float32)
        + jnp.dot(h, p["wh"], preferred_element_type=jnp.float32)
        + p["b"]
    )
    i, f, g, o = jnp.split(z, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return (h, c), h


def _lstm(p, xs):
    """[B, T, F] → [B, T, H] (unidirectional scan over time)."""
    b = xs.shape[0]
    h0 = jnp.zeros((b, p["wh"].shape[0]), xs.dtype)
    carry, hs = jax.lax.scan(
        lambda carry, x: _lstm_step(p, carry, x),
        (h0, h0),
        xs.swapaxes(0, 1),
    )
    return hs.swapaxes(0, 1)


def pair_features(
    seg_embs: jnp.ndarray,  # [n_scales, T, D] multiscale segment embeddings
    spk_avg: jnp.ndarray,  # [n_scales, 2, D] cluster-average embeddings
    scale_weights: jnp.ndarray,  # [n_scales]
) -> jnp.ndarray:
    """Scale-similarity features for one speaker pair: [T, 2*n_scales+2].

    Per scale: cosine similarity of each segment embedding to both
    speakers' averages, weighted; plus the per-segment similarity margin
    (who is closer) summarized over scales.
    """
    def _norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

    seg_n = _norm(seg_embs)  # [S, T, D]
    avg_n = _norm(spk_avg)  # [S, 2, D]
    sims = jnp.einsum(
        "std,skd->stk", seg_n, avg_n, preferred_element_type=jnp.float32
    )  # [S, T, 2]
    w = scale_weights[:, None, None] / jnp.sum(scale_weights)
    weighted = (sims * w).sum(axis=0)  # [T, 2]
    flat = sims.transpose(1, 0, 2).reshape(sims.shape[1], -1)  # [T, 2S]
    return jnp.concatenate([flat, weighted], axis=-1)


def msdd_logits(
    params: Params,
    feats: jnp.ndarray,  # [B, T, 2*n_scales+2] pair features
) -> jnp.ndarray:
    """Pair features → per-speaker logits [B, T, 2].

    Converted NeMo checkpoints (engine/nemo_weights.convert_msdd) may
    omit the input projection and carry a reverse-direction LSTM
    (``lstm_rev``); both are handled structurally so random-init and
    converted param trees share this forward.
    """
    x = feats
    if "in" in params:
        x = jnp.dot(
            x, params["in"]["w"], preferred_element_type=jnp.float32
        ) + params["in"]["b"]
        x = jnp.tanh(x)
    h = _lstm(params["lstm"], x)
    if "lstm_rev" in params:
        h_rev = _lstm(params["lstm_rev"], x[:, ::-1])[:, ::-1]
        h = jnp.concatenate([h, h_rev], axis=-1)
    return (
        jnp.dot(h, params["out"]["w"], preferred_element_type=jnp.float32)
        + params["out"]["b"]
    )


def init_msdd_params(key, dims: MsddDims) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    f_in = 2 * dims.n_scales + 2
    return {
        "in": {
            "w": jax.random.normal(k1, (f_in, dims.proj)) / np.sqrt(f_in),
            "b": jnp.zeros((dims.proj,)),
        },
        "lstm": {
            "wx": jax.random.normal(k2, (dims.proj, 4 * dims.hidden))
            / np.sqrt(dims.proj),
            "wh": jax.random.normal(k3, (dims.hidden, 4 * dims.hidden))
            / np.sqrt(dims.hidden),
            "b": jnp.zeros((4 * dims.hidden,)),
        },
        "out": {
            "w": jax.random.normal(k4, (dims.hidden, 2))
            / np.sqrt(dims.hidden),
            "b": jnp.zeros((2,)),
        },
    }


def msdd_mean_sigmoids(
    params: Params,
    seg_embs: np.ndarray,  # [n_scales, T, D]
    cluster_labels: np.ndarray,  # [T] from spectral clustering
    scale_weights: Sequence[float],
    diar_window: int = 50,
    seg_duration: float = 0.5,
    infer_batch_size: int = 25,
    overlap_infer_spk_limit: int = 5,
    split_infer: bool = True,
):
    """Pair-averaged per-speaker sigmoid probabilities [T, n_spk], or
    ``None`` when MSDD does not apply (single speaker, or the count
    exceeds ``overlap_infer_spk_limit`` — reference telephonic.yaml:64).

    ``split_infer=False`` (telephonic.yaml:65) disables the
    ``diar_window``-second windowing and runs the pair LSTMs over the
    whole sequence in one pass.
    """
    seg_dev = jnp.asarray(seg_embs)  # no-op for device-resident input
    n_scales, t_total, d = seg_dev.shape
    speakers = np.unique(np.asarray(cluster_labels))
    n_spk = len(speakers)

    if n_spk == 1 or n_spk > overlap_infer_spk_limit:
        return None, speakers

    # cluster-average embeddings per scale, on device (the host
    # boolean-mask means cost S*K passes over a 120 MB array at 4 h)
    label_idx = np.searchsorted(speakers, np.asarray(cluster_labels))
    onehot = jax.nn.one_hot(
        jnp.asarray(label_idx), n_spk, dtype=jnp.float32
    )  # [T, K]
    counts = jnp.maximum(onehot.sum(axis=0), 1.0)
    avg = (
        jnp.einsum(
            "tk,std->skd", onehot, seg_dev.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        / counts[None, :, None]
    )  # [S, K, D]

    w = jnp.asarray(scale_weights, jnp.float32)
    if split_infer:
        window_t = max(1, int(diar_window / max(seg_duration, 1e-6)))
    else:
        window_t = t_total
    window_t = min(window_t, t_total)

    pairs = list(combinations(range(n_spk), 2))
    pair_idx = np.asarray(pairs)  # [P, 2]
    avg_pairs = avg[:, jnp.asarray(pair_idx)]  # [S, P, 2, D]
    avg_pairs = jnp.moveaxis(avg_pairs, 1, 0)  # [P, S, 2, D]

    # every full window for every pair in ONE dispatch (the per-window
    # loop paid a device round-trip per 50 s window — ~312 sync points
    # at 4 h); the remainder window runs at its exact length, so both
    # LSTM directions see the same sequences as the windowed loop did
    nw_full, rem = divmod(t_total, window_t)
    body = None
    if nw_full:
        body = seg_dev[:, : nw_full * window_t].reshape(
            n_scales, nw_full, window_t, d
        )
        # pow-2 window-count bucket: zero windows are trimmed below, so
        # a serving deployment compiles O(log) body shapes instead of
        # one per recording length
        nw_b = 1 << max(0, (nw_full - 1).bit_length())
        if nw_b > nw_full:
            body = jnp.pad(
                body, ((0, 0), (0, nw_b - nw_full), (0, 0), (0, 0))
            )
    tail = seg_dev[:, nw_full * window_t :][:, None] if rem else None

    prob_parts = []
    for bstart in range(0, len(pairs), infer_batch_size):
        bpairs = avg_pairs[bstart : bstart + infer_batch_size]
        parts = []
        if body is not None:
            parts.append(
                np.asarray(_msdd_window_probs(params, body, bpairs, w))[
                    :, : nw_full * window_t
                ]
            )
        if tail is not None:
            # eager (unjitted): the remainder length varies per
            # recording, and a fresh XLA program per novel length would
            # stall serving; one window's eager ops cost ~ms
            parts.append(
                np.asarray(_msdd_window_probs_impl(params, tail, bpairs, w))
            )
        prob_parts.append(np.concatenate(parts, axis=1))
    probs = np.concatenate(prob_parts, axis=0)  # [P, t_total, 2]

    sig_sum = np.zeros((t_total, n_spk), np.float64)
    for pi, (a, b) in enumerate(pairs):
        sig_sum[:, a] += probs[pi, :, 0]
        sig_sum[:, b] += probs[pi, :, 1]
    sig_cnt = np.array(
        [sum(1 for p in pairs if k in p) for k in range(n_spk)], np.float64
    )
    mean_sig = sig_sum / np.maximum(sig_cnt[None, :], 1.0)
    return mean_sig, speakers


def _msdd_window_probs_impl(params, seg_win, avg_pairs, w):
    """[S, n_win, Tc, D] windows × [P, S, 2, D] pair averages →
    sigmoid probabilities [P, n_win*Tc, 2]; the windows dimension rides
    the LSTM batch axis, so the whole pass is one compiled program."""
    s, n_win, tc, d = seg_win.shape

    def feats_for_pair(avg_pair):  # [S, 2, D] -> [n_win, Tc, F]
        return jax.vmap(
            lambda chunk: pair_features(chunk, avg_pair, w), in_axes=1
        )(seg_win)

    feats = jax.vmap(feats_for_pair)(avg_pairs)  # [P, n_win, Tc, F]
    p, _, _, f = feats.shape
    logits = msdd_logits(params, feats.reshape(p * n_win, tc, f))
    return jax.nn.sigmoid(logits).reshape(p, n_win * tc, 2)


_msdd_window_probs = jax.jit(_msdd_window_probs_impl)


def _binarize(mean_sig, speakers, cluster_labels, threshold: float):
    """Threshold mean sigmoids; empty segments fall back to the
    clustering label."""
    activity = mean_sig > threshold
    empty = ~activity.any(axis=1)
    for i, spk in enumerate(speakers):
        activity[empty & (cluster_labels == spk), i] = True
    return activity


def msdd_infer_multi(
    params: Params,
    seg_embs: np.ndarray,  # [n_scales, T, D]
    cluster_labels: np.ndarray,  # [T] from spectral clustering
    scale_weights: Sequence[float],
    sigmoid_thresholds: Sequence[float] = (0.7,),
    diar_window: int = 50,
    seg_duration: float = 0.5,
    infer_batch_size: int = 25,
    overlap_infer_spk_limit: int = 5,
    split_infer: bool = True,
) -> Dict[float, np.ndarray]:
    """Overlap-aware speaker activity at EVERY threshold in the config's
    list-valued ``sigmoid_threshold`` (telephonic.yaml:60-66): the pair
    LSTM forward runs once; each threshold binarizes the shared mean
    sigmoids. Returns {threshold: [T, n_spk] bool}.
    """
    mean_sig, speakers = msdd_mean_sigmoids(
        params, seg_embs, cluster_labels, scale_weights,
        diar_window=diar_window, seg_duration=seg_duration,
        infer_batch_size=infer_batch_size,
        overlap_infer_spk_limit=overlap_infer_spk_limit,
        split_infer=split_infer,
    )
    t_total = seg_embs.shape[1]
    n_spk = len(speakers)
    if mean_sig is None:
        activity = np.zeros((t_total, n_spk), bool)
        for i, spk in enumerate(speakers):
            activity[:, i] = cluster_labels == spk
        return {float(th): activity for th in sigmoid_thresholds}
    return {
        float(th): _binarize(mean_sig, speakers, cluster_labels, float(th))
        for th in sigmoid_thresholds
    }


def msdd_infer(
    params: Params,
    seg_embs: np.ndarray,  # [n_scales, T, D]
    cluster_labels: np.ndarray,  # [T] from spectral clustering
    scale_weights: Sequence[float],
    sigmoid_threshold: float = 0.7,
    diar_window: int = 50,
    seg_duration: float = 0.5,
    infer_batch_size: int = 25,
    overlap_infer_spk_limit: int = 5,
    split_infer: bool = True,
) -> np.ndarray:
    """Overlap-aware per-segment speaker activity [T, n_spk] bool.

    Follows the reference's MSDD inference contract: split into
    ``diar_window``-second chunks (unless ``split_infer=False``), run
    every speaker pair, average the per-speaker sigmoids over the pairs
    containing that speaker, threshold at ``sigmoid_threshold``; if the
    estimated speaker count exceeds ``overlap_infer_spk_limit`` (or a
    segment ends with no active speaker) fall back to the clustering
    label.
    """
    return msdd_infer_multi(
        params, seg_embs, cluster_labels, scale_weights,
        sigmoid_thresholds=(float(sigmoid_threshold),),
        diar_window=diar_window, seg_duration=seg_duration,
        infer_batch_size=infer_batch_size,
        overlap_infer_spk_limit=overlap_infer_spk_limit,
        split_infer=split_infer,
    )[float(sigmoid_threshold)]
