"""Pod-scale long-form transcription: windows sharded over a mesh.

BASELINE.json config 5 ("multi-hour audio, chunked streaming decode
batched across a v5e pod"): the 30 s decode windows are data-parallel
work items, so the batch axis shards over the ``dp`` mesh axis while
parameters stay replicated (or tp-sharded via
``shard_whisper_params``). XLA inserts zero collectives for the
replicated-params case — every chip decodes its own windows; the only
synchronization is the final host gather of tokens.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.transcribe import Segment, TranscriptionInfo, WhisperEngine
from ..engine.decode import build_suppress_mask
from ..ops.mel import HOP_LENGTH, N_SAMPLES, SAMPLE_RATE, log_mel_spectrogram_batch
from ..engine.transcribe import compression_ratio, _merge_spans_into_windows
from ..vad import get_speech_timestamps


def transcribe_windows_sharded(
    engine: WhisperEngine,
    audio: np.ndarray,
    mesh: Mesh,
    language: str = "en",
    windows_per_device: int = 4,
    min_new_tokens: int = 0,
    max_new_tokens: Optional[int] = None,
) -> Tuple[List[Segment], TranscriptionInfo]:
    """Batched transcription with the window batch sharded over the
    mesh's ``dp`` axis. Parameters are used as-is (replicate or shard
    them beforehand with ``shard_whisper_params``)."""
    n_dev = mesh.shape["dp"]
    batch = n_dev * windows_per_device
    duration = len(audio) / SAMPLE_RATE

    spans = get_speech_timestamps(audio) or [
        {"start": 0, "end": len(audio)}
    ]
    windows = _merge_spans_into_windows(spans, N_SAMPLES)
    suppress = build_suppress_mask(engine.dims.n_vocab, [])

    dp_sharding = NamedSharding(mesh, P("dp", None, None))

    segments: List[Segment] = []
    with mesh:
        for start in range(0, len(windows), batch):
            group = windows[start : start + batch]
            waves = np.zeros((batch, N_SAMPLES), np.float32)
            for i, (s, e) in enumerate(group):
                chunk = audio[s:e][:N_SAMPLES]
                waves[i, : len(chunk)] = chunk
            mels = log_mel_spectrogram_batch(
                jnp.asarray(waves), engine.dims.n_mels
            )
            mels = jax.device_put(mels, dp_sharding)
            feats = engine.encode_windows(mels)
            tokens, lengths, sum_lp, no_speech, n_prompt = (
                engine._decode_batch(
                    feats,
                    language,
                    np.asarray(suppress),
                    True,
                    0.0,
                    min_new_tokens=min_new_tokens,
                    max_new_tokens=max_new_tokens,
                )
            )
            for i, (s, e) in enumerate(group):
                toks = tokens[i, n_prompt : n_prompt + lengths[i]].tolist()
                text = engine.tokenizer.decode(toks)
                segments.append(
                    Segment(
                        id=len(segments),
                        seek=s // HOP_LENGTH,
                        start=s / SAMPLE_RATE,
                        end=e / SAMPLE_RATE,
                        text=text,
                        tokens=toks,
                        avg_logprob=float(sum_lp[i]) / (int(lengths[i]) + 1),
                        compression_ratio=compression_ratio(text),
                        no_speech_prob=float(no_speech[i]),
                    )
                )
    info = TranscriptionInfo(
        language=language, language_probability=1.0, duration=duration
    )
    return segments, info
