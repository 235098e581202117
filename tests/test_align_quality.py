"""End-to-end alignment timing-quality gate (VERDICT r2 weak #4).

Parity tests pin the Viterbi kernel and span grouping against torch;
this gate scores *timing quality* of the composed alignment tail —
``preprocess_text`` → ``get_alignments`` (star column + Viterbi) →
``get_spans`` → ``postprocess_results`` — on synthetic emissions whose
ground-truth word times are known by construction, and bounds the mean
and max word-boundary error.

Emissions are crafted, not model-generated: random acoustic weights
carry no transcript information, so a model forward cannot produce a
meaningful timing target in the zero-egress environment. The crafted
lattice mimics a CTC head's output (peaked char log-probs over each
word's frames, noisy blanks in the gaps), which is exactly the input
contract of the alignment stage (reference diarize.py:176-184).
"""

import numpy as np
import pytest

from whisper_nemo_tpu.align.api import (
    AlignmentTokenizer,
    get_alignments,
    get_spans,
    postprocess_results,
)
from whisper_nemo_tpu.align.text import preprocess_text

STRIDE_MS = 20.0  # wav2vec2 frame stride


def _synthetic_emissions(words, word_times, total_s, rng, peak=6.0):
    """Log-prob lattice [T, V]: each word's characters occupy equal
    slices of its [t0, t1) interval; gap frames favor blank. Gaussian
    logit noise keeps the argmax path non-degenerate."""
    tok = AlignmentTokenizer()
    vocab = len(tok.vocab) - 1  # star column appended by get_alignments
    t_total = int(round(total_s * 1000 / STRIDE_MS))
    logits = rng.normal(0.0, 0.5, (t_total, vocab)).astype(np.float32)
    logits[:, tok.blank_id] += peak  # default: blank
    for word, (t0, t1) in zip(words, word_times):
        ids = tok.word_to_ids(word)
        f0 = int(round(t0 * 1000 / STRIDE_MS))
        f1 = int(round(t1 * 1000 / STRIDE_MS))
        span = max(f1 - f0, len(ids))
        for ci, cid in enumerate(ids):
            c0 = f0 + (ci * span) // len(ids)
            c1 = f0 + ((ci + 1) * span) // len(ids)
            logits[c0:c1, tok.blank_id] -= peak
            logits[c0:c1, cid] += peak
    # log-softmax
    m = logits.max(axis=1, keepdims=True)
    lse = m + np.log(np.exp(logits - m).sum(axis=1, keepdims=True))
    return logits - lse


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_word_timing_error_bounded(seed):
    rng = np.random.default_rng(seed)
    words = (
        "alignment quality gate with synthetic words at known times "
        "covering short and considerably longer tokens"
    ).split()
    # lay words out with 120-400 ms gaps, 60 ms/char speech rate
    word_times = []
    cursor = 0.3
    for w in words:
        dur = max(0.15, 0.06 * len(w))
        word_times.append((cursor, cursor + dur))
        cursor += dur + rng.uniform(0.12, 0.4)
    total_s = cursor + 0.3

    emissions = _synthetic_emissions(words, word_times, total_s, rng)

    tokens_starred, text_starred = preprocess_text(
        " ".join(words), romanize=True, language="eng"
    )
    tokenizer = AlignmentTokenizer()
    segments, scores, blank = get_alignments(
        emissions, tokens_starred, tokenizer
    )
    spans = get_spans(tokens_starred, segments, blank)
    word_ts = postprocess_results(text_starred, spans, STRIDE_MS, scores)

    assert len(word_ts) == len(words)
    start_err, end_err = [], []
    for got, (t0, t1), w in zip(word_ts, word_times, words):
        assert got["text"] == w
        start_err.append(abs(got["start"] - t0))
        end_err.append(abs(got["end"] - t1))
    errs = np.asarray(start_err + end_err)
    # one frame = 20 ms; allow ~1.5 frames mean, 4 frames worst-case
    assert errs.mean() < 0.03, (errs.mean(), errs.max())
    assert errs.max() < 0.08, sorted(
        zip(errs, [w for w in words for _ in (0, 1)]), reverse=True
    )[:3]
