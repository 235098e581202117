"""ctc-forced-aligner–compatible API over the TPU alignment stack.

The six functions the reference CLI consumes (diarize.py:154-184):

    model, tokenizer = load_alignment_model(device, dtype)
    emissions, stride = generate_emissions(model, waveform, batch_size)
    tokens_starred, text_starred = preprocess_text(text, romanize, language)
    segments, scores, blank_token = get_alignments(emissions,
                                                   tokens_starred, tokenizer)
    spans = get_spans(tokens_starred, segments, blank_token)
    word_timestamps = postprocess_results(text_starred, spans,
                                          stride, scores)

``word_timestamps`` rows carry ``text``/``start``/``end``/``score`` in
seconds (consumed at reference helpers.py:319-323).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.devcache import device_waveform
from ..engine.checkpoint import load_params, model_cache_dir
from ..models.wav2vec2 import (
    Wav2Vec2Dims,
    ctc_logits,
    init_wav2vec2_params,
)
from ..ops.ctc import add_star_column, forced_align, label_segments
from ..utils import get_logger
from .text import preprocess_text  # re-exported API surface

logger = get_logger(__name__)

SAMPLE_RATE = 16000
CHUNK_SECONDS = 30


def default_vocab() -> dict:
    """Character CTC vocabulary: blank + lowercase letters + digits +
    apostrophe + word-boundary + ``<star>`` wildcard (last index)."""
    symbols = ["<blank>"] + list("abcdefghijklmnopqrstuvwxyz") + list(
        "0123456789"
    ) + ["'", "|"]
    vocab = {s: i for i, s in enumerate(symbols)}
    vocab["<star>"] = len(vocab)  # matches the appended star column
    return vocab


class AlignmentTokenizer:
    """Maps words to character label ids for the CTC head."""

    def __init__(self, vocab: Optional[dict] = None):
        self.vocab = vocab or default_vocab()
        self.blank_id = self.vocab["<blank>"]
        self.star_id = self.vocab["<star>"]

    def word_to_ids(self, word: str) -> List[int]:
        if word == "<star>":
            return [self.star_id]
        ids = [self.vocab[c] for c in word if c in self.vocab]
        return ids if ids else [self.star_id]

    def get_vocab(self) -> dict:
        return dict(self.vocab)


@dataclass
class AlignmentModel:
    params: dict
    dims: Wav2Vec2Dims
    dtype: object

    @property
    def device(self):
        return jax.devices()[0]

    @property
    def logits_fn(self):
        """Cached jitted emission function (rebuilding the jit wrapper
        per call would discard the compilation cache)."""
        if not hasattr(self, "_logits_fn"):
            dims, dtype = self.dims, self.dtype
            self._logits_fn = jax.jit(
                lambda p, w: jax.nn.log_softmax(
                    ctc_logits(p, w, dims, dtype), axis=-1
                )
            )
        return self._logits_fn


def load_alignment_model(
    device: str = "auto", dtype=None
) -> Tuple[AlignmentModel, AlignmentTokenizer]:
    """Resolve the aligner acoustic model (MMS-style wav2vec2 CTC).

    Checkpoint: ``<cache>/ctc_aligner.npz``; deterministic random init
    otherwise (zero-egress fallback, logged)."""
    tokenizer = AlignmentTokenizer()
    vocab_size = len(tokenizer.vocab) - 1  # star column appended at runtime
    if os.environ.get("WNT_TEST_SMALL_MODELS"):
        dims = Wav2Vec2Dims(
            vocab_size=vocab_size,
            hidden_size=64,
            num_layers=2,
            num_heads=4,
            intermediate_size=128,
            conv_dim=(32,) * 7,
        )
    else:
        # MMS-300M-scale acoustic model (the reference aligner's size,
        # SURVEY D4): 24-layer / 1024-wide wav2vec2 in the large/MMS
        # layout (pre-LN encoder, per-conv-layer LayerNorm)
        dims = Wav2Vec2Dims(
            vocab_size=vocab_size,
            hidden_size=1024,
            num_layers=24,
            num_heads=16,
            intermediate_size=4096,
            do_stable_layer_norm=True,
        )
    ckpt = os.path.join(model_cache_dir(), "ctc_aligner.npz")
    if os.path.exists(ckpt):
        params = load_params(ckpt)
    else:
        logger.warning(
            "no aligner checkpoint at %s; using deterministic random init",
            ckpt,
        )
        params = init_wav2vec2_params(jax.random.PRNGKey(1), dims)
    jdtype = jnp.bfloat16 if dtype in ("float16", "bfloat16") else jnp.float32
    if jdtype == jnp.bfloat16:
        # store weights in the compute dtype (HBM-traffic halving; see
        # WhisperEngine)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            params,
        )
    return AlignmentModel(params, dims, jdtype), tokenizer


@partial(jax.jit, static_argnums=(1, 2))
def _chunk_waveform(wave, n_rows, chunk):
    """Device-resident waveform -> [n_rows, chunk] zero-padded rows
    (``n_rows * chunk >= len(wave)``; rows beyond the audio are zero,
    padding the final batch without a host round-trip). Pure
    pad+reshape — no gather."""
    return jnp.pad(wave, (0, n_rows * chunk - wave.shape[0])).reshape(
        n_rows, chunk
    )


def generate_emissions(
    model: AlignmentModel,
    waveform: np.ndarray,
    batch_size: int = 8,
    device: bool = False,
) -> Tuple[np.ndarray, float]:
    """Waveform -> (log-prob emissions [T, V], stride in ms per frame).

    Audio is processed as batched 30 s chunks; the trailing chunk is
    zero-padded and its emissions trimmed proportionally.

    ``device=True`` keeps the emissions on the accelerator (a jnp
    array) instead of collecting to host numpy — at hour scale the
    [T, V] array is ~24 MB, and the segmented aligner consumes it
    entirely on device (align/segmented.py), so moving it over the
    host link is pure waste.
    """
    chunk = CHUNK_SECONDS * SAMPLE_RATE
    n_samples = (
        len(waveform) if hasattr(waveform, "__len__")
        else waveform.shape[0]
    )
    n_chunks = max(1, int(np.ceil(n_samples / chunk)))
    # chunk rows padded up to the batch multiple so every batch keeps
    # one compiled shape; rows are gathered on device from the resident
    # waveform (no 230 MB/h re-upload over the host link)
    n_rows = int(np.ceil(n_chunks / batch_size)) * batch_size
    chunks = _chunk_waveform(device_waveform(waveform), n_rows, chunk)

    logits_fn = model.logits_fn
    # dispatch every batch before collecting any (async executions):
    # the device streams through the chunks while finished batches'
    # emissions transfer back
    futures = []
    for i in range(0, n_rows, batch_size):
        futures.append(
            logits_fn(model.params, chunks[i : i + batch_size])
        )
    if device:
        import jax.numpy as jnp

        emissions = jnp.concatenate(futures, axis=0)
    else:
        pieces = [np.asarray(f) for f in futures]
        emissions = np.concatenate(pieces, axis=0)  # [≥n_chunks, T_c, V]
    t_per_chunk = emissions.shape[1]
    emissions = emissions[:n_chunks].reshape(-1, emissions.shape[-1])

    total_frames = (
        int(round(n_samples / chunk * t_per_chunk))
        if n_samples % chunk
        else emissions.shape[0]
    )
    emissions = emissions[: max(total_frames, 1)]
    stride_ms = n_samples / emissions.shape[0] / SAMPLE_RATE * 1000
    return emissions, stride_ms


def get_alignments(
    emissions: np.ndarray,
    tokens_starred: Sequence[str],
    tokenizer: AlignmentTokenizer,
) -> Tuple[List[dict], List[float], int]:
    """Viterbi-align the starred token stream against emissions.

    Returns (per-label segments with frame spans, per-label scores, the
    blank label id)."""
    labels: List[int] = []
    for tok in tokens_starred:
        labels.extend(tokenizer.word_to_ids(tok))
    labels_arr = np.asarray(labels, np.int32)

    emissions_star = add_star_column(emissions, tokenizer.blank_id)
    frame_labels, _score = forced_align(
        emissions_star, labels_arr, tokenizer.blank_id
    )
    segments = label_segments(frame_labels, emissions_star, labels_arr)
    scores = [seg["score"] for seg in segments]
    return segments, scores, tokenizer.blank_id


def get_spans(
    tokens_starred: Sequence[str],
    segments: List[dict],
    blank_token: int,
) -> List[List[dict]]:
    """Group per-label segments back into per-starred-token spans."""
    spans: List[List[dict]] = []
    cursor = 0
    tokenizer = AlignmentTokenizer()
    for tok in tokens_starred:
        n = len(tokenizer.word_to_ids(tok))
        spans.append(segments[cursor : cursor + n])
        cursor += n
    return spans


def postprocess_results(
    text_starred: Sequence[str],
    spans: List[List[dict]],
    stride: float,
    scores: Sequence[float],
) -> List[dict]:
    """Spans -> word timestamps in seconds.

    Skips ``<star>`` wildcards; each word's time range covers its first
    to last aligned character (contract: consumed at reference
    helpers.py:319-323 via ``wrd_dict["start"/"end"/"text"]``).
    """
    results: List[dict] = []
    for word, span in zip(text_starred, spans):
        if word == "<star>" or not span:
            continue
        start_frame = span[0]["start"]
        end_frame = span[-1]["end"]
        score = float(np.mean([s["score"] for s in span]))
        results.append(
            {
                "text": word,
                "start": start_frame * stride / 1000.0,
                "end": end_frame * stride / 1000.0,
                "score": score,
            }
        )
    return results
