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

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ctc import NEG_INF, _viterbi_backtrack, add_star_column
from .api import AlignmentModel, AlignmentTokenizer, generate_emissions
from .text import preprocess_text

_T_BUCKETS = (128, 256, 512, 1024, 2048, 4096)
_L_BUCKETS = (32, 64, 128, 256, 512, 1024)


def _bucket(value: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


@jax.jit
def _viterbi_batch(emissions, state_labels, allow_skip):
    from ..ops.ctc import _gather_state_emissions, _viterbi_forward_states

    e_states = jax.vmap(_gather_state_emissions)(emissions, state_labels)
    alphas, bps = jax.vmap(_viterbi_forward_states)(e_states, allow_skip)
    paths = jax.vmap(_viterbi_backtrack)(alphas, bps)
    return paths


def _prepare_item(
    em_star: np.ndarray,  # [t, V] emissions incl. star column
    labels: np.ndarray,  # [l] ids into V
    t_bucket: int,
    l_bucket: int,
):
    """Pad one segment into (emissions [t_bucket + l_bucket, V+2],
    labels [l_bucket], n_real_labels)."""
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
    labels_ext = np.empty((l_bucket,), np.int32)
    labels_ext[:l] = labels[:l]
    for i in range(l, l_bucket):
        labels_ext[i] = pad0 if (i - l) % 2 == 0 else pad1
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
    ``{"text", "start", "end", "score"}`` in global seconds.
    """
    import os as _os
    import time as _time

    debug = _os.environ.get("WNT_DEBUG_TIMING")
    t_start = _time.time()
    emissions, stride = generate_emissions(model, audio, batch_size)
    t_emissions = _time.time()
    t_total = emissions.shape[0]
    em_star_full = add_star_column(emissions, tokenizer.blank_id)
    v = em_star_full.shape[1]

    # build per-segment work items
    items = []
    for seg in segments:
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
                "em": em_star_full[t0:t1],
                "labels": np.asarray(labels, np.int32),
                "counts": token_label_counts,
                "tokens_starred": tokens_starred,
                "text_starred": text_starred,
            }
        )

    # group by (T, L) bucket and run batched Viterbi per group
    groups: Dict[tuple, List[int]] = {}
    for i, item in enumerate(items):
        key = (
            _bucket(item["em"].shape[0], _T_BUCKETS),
            _bucket(len(item["labels"]), _L_BUCKETS),
        )
        groups.setdefault(key, []).append(i)

    results: List[dict] = []
    for (t_b, l_b), idxs in groups.items():
        ems, slabels, skips = [], [], []
        for i in idxs:
            em, labels_ext, _ = _prepare_item(
                items[i]["em"], items[i]["labels"], t_b, l_b
            )
            sl, sk = _trellis_arrays(labels_ext, tokenizer.blank_id)
            ems.append(em)
            slabels.append(sl)
            skips.append(sk)
        paths = np.asarray(
            _viterbi_batch(
                jnp.asarray(np.stack(ems)),
                jnp.asarray(np.stack(slabels)),
                jnp.asarray(np.stack(skips)),
            )
        )
        for row, i in enumerate(idxs):
            item = items[i]
            n_real = len(item["labels"])
            t_real = item["em"].shape[0]
            path = paths[row][: min(t_real, t_b)]
            frame_labels = np.where(path % 2 == 1, (path - 1) // 2, -1)
            frame_labels = np.where(
                frame_labels < n_real, frame_labels, -1
            ).astype(np.int32)
            results.extend(
                _words_from_frames(item, frame_labels, stride)
            )
    results.sort(key=lambda w: w["start"])
    if debug:
        from ..utils import get_logger

        get_logger(__name__).info(
            "align timing: emissions=%.2fs viterbi+post=%.2fs groups=%s",
            t_emissions - t_start,
            _time.time() - t_emissions,
            {k: len(vs) for k, vs in groups.items()},
        )
    return results


def _words_from_frames(item, frame_labels, stride) -> List[dict]:
    """Per-token spans → word rows with global-time conversion."""
    from ..ops.ctc import label_segments

    segs = label_segments(frame_labels, item["em"], item["labels"])
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
            }
        )
    return words
