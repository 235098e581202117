"""Per-segment forced alignment (the fast path).

The global aligner (api.py) Viterbi-decodes the whole transcript against
the whole recording — O(T·L) with L growing linearly in audio length,
which dominates long-form latency. When the ASR already produced
segments with time bounds, each segment's text only needs aligning
against its own audio span: Σ tᵢ·lᵢ work instead of T·L, and the
segments batch.

Shapes are bucketed (emission length and label count rounded up to
power-of-two buckets) so a handful of compilations serve any workload;
within a bucket, segments run through a vmapped Viterbi. Padding is
sound, not approximate: two dedicated pad-label columns score 0 only in
the padded "free" frames appended after the real emissions (real labels
score −∞ there, pad labels score −∞ in real frames), so the optimal
path aligns every real label inside real audio and walks the pad labels
afterwards.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ctc import NEG_INF, _viterbi_backtrack
from .api import AlignmentModel, AlignmentTokenizer, generate_emissions
from .text import preprocess_text

_T_BUCKETS = (128, 256, 512, 1024, 2048, 4096)
_L_BUCKETS = (32, 64, 128, 256, 512, 1024)

# HBM budget per dispatched Viterbi group: the batched trellis holds
# e_states (f32) + backpointers (int8) at [rows, t_b + l_b, 2*l_b + 1]
# — ~13 MB/row at the (2048, 512) bucket — so an unchunked 4 h
# workload (576 × 25 s segments in ONE group) asks for ~7.6 GB of
# trellis on top of the resident models and died RESOURCE_EXHAUSTED
# (first exposed by bench.py --seconds 14400). Groups larger than the
# budget dispatch in power-of-two-padded chunks (bounded compile
# count; padded rows are repeats whose outputs are never read). The
# 12-byte/element estimate leaves ~2x headroom for fusion temporaries.
_GROUP_BYTES_BUDGET = 2.0e9


def _bucket(value: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


@jax.jit
def _viterbi_batch(emissions, state_labels, allow_skip):
    from ..ops.ctc import _gather_state_emissions, _viterbi_forward_states

    e_states = jax.vmap(_gather_state_emissions)(emissions, state_labels)
    alphas, bps = jax.vmap(_viterbi_forward_states)(e_states, allow_skip)
    paths = jax.vmap(_viterbi_backtrack)(alphas, bps)
    return paths


def _add_star_device(emissions, blank_id: int,
                     discount: float = float(np.log(0.5))):
    """Device twin of ops.ctc.add_star_column (jnp in, jnp out)."""
    masked = emissions.at[:, blank_id].set(NEG_INF)
    star = masked.max(axis=1, keepdims=True) + discount
    return jnp.concatenate([emissions, star], axis=1)


@functools.partial(jax.jit, static_argnames=("t_b", "l_b"))
def _viterbi_group_device(em_pad, t0s, t_effs, state_labels, allow_skip,
                          t_b: int, l_b: int):
    """One bucket group, entirely on device: slice each segment's span
    out of the resident emissions, assemble the padded block that
    :func:`_prepare_item` specifies (that host function remains the
    readable layout reference and the unit-test oracle), run the
    batched Viterbi, and return the state paths plus the per-frame
    emission score of the chosen state.

    Only [B, t_b + l_b] paths (int32) and scores (f32) leave the
    device — the hour-scale [T, V] emissions array never crosses the
    host link (~24 MB down plus a ~2x padded re-upload per call on the
    old host path, which dominated the align stage whenever the tunnel
    ran below its ~25-45 MB/s healthy band).
    """
    from ..ops.ctc import _gather_state_emissions, _viterbi_forward_states

    v = em_pad.shape[1]
    pad_cols = jnp.full((t_b, 2), NEG_INF, em_pad.dtype)

    def build(t0, t_eff):
        raw = jax.lax.dynamic_slice(em_pad, (t0, 0), (t_b, v))
        rows = jnp.arange(t_b)
        real = rows < t_eff
        top = jnp.where(real[:, None], raw, NEG_INF)
        # idle frames between t_eff and the bucket edge: blank-certain
        top = top.at[:, 0].set(jnp.where(real, raw[:, 0], 0.0))
        return jnp.concatenate([top, pad_cols], axis=1)

    tops = jax.vmap(build)(t0s, t_effs)  # [B, t_b, v+2]
    # free frames: only blank and the two pad labels are admissible
    bottom = jnp.full((v + 2,), NEG_INF, em_pad.dtype)
    bottom = bottom.at[0].set(0.0).at[v].set(0.0).at[v + 1].set(0.0)
    bottoms = jnp.broadcast_to(
        bottom, (tops.shape[0], l_b, v + 2)
    )
    blocks = jnp.concatenate([tops, bottoms], axis=1)

    e_states = jax.vmap(_gather_state_emissions)(blocks, state_labels)
    alphas, bps = jax.vmap(_viterbi_forward_states)(e_states, allow_skip)
    paths = jax.vmap(_viterbi_backtrack)(alphas, bps)
    scores = jnp.take_along_axis(e_states, paths[:, :, None], axis=2)
    return paths, scores[..., 0]


def _extend_labels(labels: np.ndarray, l_bucket: int, v: int) -> np.ndarray:
    """Pad a label row to ``l_bucket`` with alternating pad-label ids
    (``v`` and ``v+1`` — the two columns appended past the vocabulary)."""
    pad0, pad1 = v, v + 1
    l = min(len(labels), l_bucket)
    labels_ext = np.empty((l_bucket,), np.int32)
    labels_ext[:l] = labels[:l]
    for i in range(l, l_bucket):
        labels_ext[i] = pad0 if (i - l) % 2 == 0 else pad1
    return labels_ext


def _prepare_item(
    em_star: np.ndarray,  # [t, V] emissions incl. star column
    labels: np.ndarray,  # [l] ids into V
    t_bucket: int,
    l_bucket: int,
):
    """Pad one segment into (emissions [t_bucket + l_bucket, V+2],
    labels [l_bucket], n_real_labels).

    Host reference for the device block builder in
    :func:`_viterbi_group_device` (kept as the unit-test oracle —
    tests/test_align_segmented.py pins the two against each other)."""
    t, v = em_star.shape
    t = min(t, t_bucket)  # oversize segments clip to the largest bucket
    l = len(labels)
    pad0, pad1 = v, v + 1
    total_t = t_bucket + l_bucket

    em = np.full((total_t, v + 2), NEG_INF, np.float32)
    em[:t, :v] = em_star[:t]
    # real frames beyond t (within the bucket): blank-certain idling
    em[t:t_bucket, 0] = 0.0
    # free frames: only blank and the pad labels are admissible
    em[t_bucket:, 0] = 0.0
    em[t_bucket:, pad0] = 0.0
    em[t_bucket:, pad1] = 0.0

    l = min(l, l_bucket)  # a 30 s segment never carries >1024 char labels
    labels_ext = _extend_labels(labels, l_bucket, v)
    return em, labels_ext, l


def _trellis_arrays(labels: np.ndarray, blank: int):
    n = len(labels)
    ll = 2 * n + 1
    state_labels = np.full((ll,), blank, np.int32)
    state_labels[1::2] = labels
    allow_skip = np.zeros((ll,), bool)
    for s in range(3, ll, 2):
        allow_skip[s] = labels[(s - 1) // 2] != labels[(s - 3) // 2]
    return state_labels, allow_skip


def align_segments(
    model: AlignmentModel,
    tokenizer: AlignmentTokenizer,
    audio: np.ndarray,
    segments: Sequence[dict],  # {'start','end','text'} seconds
    language: str = "eng",
    batch_size: int = 8,
    margin_s: float = 0.5,
) -> List[dict]:
    """Word timestamps for ASR segments via per-segment batched Viterbi.

    Returns the same rows as ``postprocess_results``:
    ``{"text", "start", "end", "score"}`` in global seconds, plus a
    ``"segment"`` key carrying the index of the input segment each word
    was aligned under (faster-whisper's word records are exact
    per-segment partitions, so consumers attach by this index rather
    than by a time-window heuristic).
    """
    import os as _os
    import time as _time

    debug = _os.environ.get("WNT_DEBUG_TIMING")
    t_start = _time.time()
    emissions, stride = generate_emissions(
        model, audio, batch_size, device=True
    )
    t_emissions = _time.time()
    t_total = emissions.shape[0]
    em_star_full = _add_star_device(
        jnp.asarray(emissions), tokenizer.blank_id
    )
    # headroom rows so every bucket's dynamic_slice stays in bounds
    em_pad = jnp.pad(
        em_star_full, ((0, _T_BUCKETS[-1]), (0, 0)),
        constant_values=NEG_INF,
    )
    if debug:
        # force the emissions wave to attribute its wall time (debug
        # only: the sync point removes dispatch/host overlap)
        jax.block_until_ready(em_pad)
    t_em_wait = _time.time()

    # build per-segment work items (text/labels on host; audio frames
    # stay device-resident — items carry only [t0, t1) indices)
    items = []
    for seg_index, seg in enumerate(segments):
        text = seg["text"].strip()
        if not text:
            continue
        tokens_starred, text_starred = preprocess_text(
            text, romanize=True, language=language
        )
        labels: List[int] = []
        token_label_counts: List[int] = []
        for tok in tokens_starred:
            ids = tokenizer.word_to_ids(tok)
            labels.extend(ids)
            token_label_counts.append(len(ids))
        t0 = max(0, int((seg["start"] - margin_s) * 1000 / stride))
        t1 = min(t_total, int(np.ceil((seg["end"] + margin_s) * 1000 / stride)))
        if t1 <= t0:
            continue
        items.append(
            {
                "t0": t0,
                "t1": t1,
                "labels": np.asarray(labels, np.int32),
                "counts": token_label_counts,
                "tokens_starred": tokens_starred,
                "text_starred": text_starred,
                "seg_index": seg_index,
            }
        )

    # group by (T, L) bucket; dispatch every group's device Viterbi
    # before collecting any (the tunnel round-trips overlap)
    groups: Dict[tuple, List[int]] = {}
    for i, item in enumerate(items):
        key = (
            _bucket(item["t1"] - item["t0"], _T_BUCKETS),
            _bucket(len(item["labels"]), _L_BUCKETS),
        )
        groups.setdefault(key, []).append(i)

    t_items = _time.time()
    dispatched = []
    for (t_b, l_b), idxs in groups.items():
        t0s, t_effs, slabels, skips = [], [], [], []
        for i in idxs:
            item = items[i]
            t0s.append(item["t0"])
            t_effs.append(min(item["t1"] - item["t0"], t_b))
            labels_ext = _extend_labels(
                item["labels"], l_b, em_star_full.shape[1]
            )
            sl, sk = _trellis_arrays(labels_ext, tokenizer.blank_id)
            slabels.append(sl)
            skips.append(sk)
        t0s = np.asarray(t0s, np.int32)
        t_effs = np.asarray(t_effs, np.int32)
        slabels = np.stack(slabels)
        skips = np.stack(skips)

        row_bytes = 12.0 * (t_b + l_b) * (2 * l_b + 1)
        rows_cap = max(1, int(_GROUP_BYTES_BUDGET / row_bytes))
        for c0 in range(0, len(idxs), rows_cap):
            c1 = min(c0 + rows_cap, len(idxs))
            rows_b = min(rows_cap, _next_pow2(c1 - c0))
            pad = rows_b - (c1 - c0)

            def chunk(arr):
                a = arr[c0:c1]
                if pad:
                    a = np.concatenate([a, np.repeat(a[:1], pad, axis=0)])
                return jnp.asarray(a)

            paths_dev, scores_dev = _viterbi_group_device(
                em_pad,
                chunk(t0s),
                chunk(t_effs),
                chunk(slabels),
                chunk(skips),
                t_b=t_b,
                l_b=l_b,
            )
            dispatched.append(
                ((t_b, l_b), idxs[c0:c1], paths_dev, scores_dev)
            )

    t_dispatch = _time.time()
    results: List[dict] = []
    for (t_b, l_b), idxs, paths_dev, scores_dev in dispatched:
        paths = np.asarray(paths_dev)
        frame_scores = np.asarray(scores_dev)
        for row, i in enumerate(idxs):
            item = items[i]
            n_real = len(item["labels"])
            t_real = min(item["t1"] - item["t0"], t_b)
            path = paths[row][:t_real]
            frame_labels = np.where(path % 2 == 1, (path - 1) // 2, -1)
            frame_labels = np.where(
                frame_labels < n_real, frame_labels, -1
            ).astype(np.int32)
            results.extend(
                _words_from_frames(
                    item, frame_labels, frame_scores[row][:t_real], stride
                )
            )
    results.sort(key=lambda w: w["start"])
    if debug:
        from ..utils import get_logger

        get_logger(__name__).info(
            "align timing: emissions-dispatch=%.2fs emissions-wait=%.2fs"
            " items=%.2fs viterbi-dispatch=%.2fs collect+post=%.2fs"
            " groups=%s",
            t_emissions - t_start,
            t_em_wait - t_emissions,
            t_items - t_em_wait,
            t_dispatch - t_items,
            _time.time() - t_dispatch,
            {k: len(vs) for k, vs in groups.items()},
        )
    return results


def _label_segments_from_scores(
    frame_labels: np.ndarray,
    frame_scores: np.ndarray,
    labels: np.ndarray,
) -> List[dict]:
    """ops.ctc.label_segments computed from the per-frame path scores
    the device Viterbi returns instead of the full emissions matrix.

    Identical values: the CTC state path is monotonic, so every frame
    inside a label's [start, end) run has that label as its path state,
    and ``frame_scores[t] == emissions[t, labels[i]]`` there.
    """
    n = len(labels)
    frame_labels = np.asarray(frame_labels)
    frame_scores = np.asarray(frame_scores, np.float64)

    # per-label [start, end) runs, vectorized (the per-frame Python
    # loop was ~720k iterations per 4 h measured run): CTC paths are
    # monotonic, so each label's frames are one contiguous run and
    # min/max scatter reductions recover it exactly
    starts = np.full(n, -1, np.int64)
    ends = np.full(n, -1, np.int64)
    idx = np.flatnonzero(frame_labels >= 0)
    lab = frame_labels[idx]
    if len(idx):
        first = np.full(n, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(first, lab, idx)
        np.maximum.at(ends, lab, idx + 1)
        got = ends >= 0
        starts[got] = first[got]

    # zero-width fallback: a label with no frames sits at the previous
    # label's end (ends are monotone over assigned labels, so a
    # forward-fill of assigned ends IS the running prev_end)
    got = starts >= 0
    filled_ends = np.where(got, ends, 0)
    prev_ends = np.maximum.accumulate(
        np.concatenate([[0], filled_ends[:-1]])
    )
    starts = np.where(got, starts, prev_ends)
    ends = np.where(got, ends, prev_ends)

    # per-label mean of exp(score) over the run's frames
    scores = np.zeros(n, np.float64)
    if len(idx):
        np.add.at(scores, lab, np.exp(frame_scores[idx]))
        counts = np.zeros(n, np.int64)
        np.add.at(counts, lab, 1)
        scores = np.where(counts > 0, scores / np.maximum(counts, 1), 0.0)

    return [
        {
            "label": int(labels[i]),
            "start": int(starts[i]),
            "end": int(ends[i]),
            "score": float(scores[i]),
        }
        for i in range(n)
    ]


def _words_from_frames(item, frame_labels, frame_scores, stride) -> List[dict]:
    """Per-token spans → word rows with global-time conversion."""
    segs = _label_segments_from_scores(
        frame_labels, frame_scores, item["labels"]
    )
    words = []
    cursor = 0
    for tok, text, count in zip(
        item["tokens_starred"], item["text_starred"], item["counts"]
    ):
        span = segs[cursor : cursor + count]
        cursor += count
        if tok == "<star>" or not span:
            continue
        start_f = item["t0"] + span[0]["start"]
        end_f = item["t0"] + span[-1]["end"]
        words.append(
            {
                "text": text,
                "start": start_f * stride / 1000.0,
                "end": end_f * stride / 1000.0,
                "score": float(np.mean([s["score"] for s in span])),
                "segment": item["seg_index"],
            }
        )
    return words
