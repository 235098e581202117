"""faster-whisper–compatible facade over the TPU engine.

Drop-in for the API surface the reference CLI exercises
(diarize.py:121-147):

    model = WhisperModel(name, device=..., compute_type=...)
    pipeline = BatchedInferencePipeline(model)
    audio = decode_audio(path)
    segments, info = pipeline.transcribe(audio, language,
                                         suppress_tokens=..., batch_size=8)
    segments, info = model.transcribe(audio, language,
                                      suppress_tokens=..., vad_filter=True)
    model.hf_tokenizer  # vocab scan for suppress lists

``segments`` is an iterable of objects with ``.text``/``.start``/
``.end`` etc.; ``info.language`` carries the detected language.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

from ..engine.transcribe import Segment, TranscriptionInfo, WhisperEngine
from ..text.languages import langs_to_iso


@dataclass
class Word:
    """faster-whisper's per-word record (``word_timestamps=True``).

    ``probability`` semantics differ from upstream faster-whisper by
    design: upstream derives it from the decoder's attention-DTW word
    alignment (mean token probability along the DTW path), while this
    engine stamps words with the CTC forced aligner and reports the
    **mean per-frame CTC posterior** of the word's aligned span —
    ``mean(exp(log_softmax(emissions)[t, label_t]))`` over the word's
    frames (reference call shape: diarize.py:121-145 with
    ``word_timestamps=True``). Both live in [0, 1] and read as "how
    confidently the acoustic model supports this word here", but the
    distributions are not interchangeable: CTC posteriors are sharper
    (near-1 on clean matches, near-0 on forced mismatches), so a
    threshold tuned on faster-whisper output needs re-tuning here.
    """

    start: float
    end: float
    word: str
    probability: float


def _attach_word_timestamps(
    segments: List[Segment], audio: np.ndarray, language: str
) -> None:
    """Populate ``Segment.words`` using the CTC forced aligner (our
    engine's equivalent of faster-whisper's attention-DTW word stamps).

    Words partition exactly by segment: each segment's text aligns
    against its own audio span, and every aligned word attaches to the
    segment it was aligned under (faster-whisper's contract is exact
    per-segment word lists — a time-window filter would double- or
    zero-attach words near segment boundaries)."""
    from ..align.api import load_alignment_model
    from ..align.segmented import align_segments

    spoken = [s for s in segments if s.text.strip()]
    timed = [
        {"start": s.start, "end": s.end, "text": s.text} for s in spoken
    ]
    if not timed:
        return
    import jax as _jax

    model, tokenizer = load_alignment_model(
        "auto",
        dtype=(
            "bfloat16"
            if _jax.devices()[0].platform in ("tpu", "axon")
            else None
        ),
    )
    words = align_segments(
        model, tokenizer, audio, timed,
        language=langs_to_iso.get(language, "eng"),
    )
    for seg in segments:
        seg.words = []
    for w in words:
        # clamp defensively: the aligner's mean-exp posterior is in
        # [0, 1] by construction (see Word.probability), but fp noise
        # at the log/exp boundary must never leak a 1.0000001 to
        # callers that assume faster-whisper's [0, 1] contract
        prob = min(1.0, max(0.0, float(w["score"])))
        spoken[w["segment"]].words.append(
            Word(w["start"], w["end"], w["text"], prob)
        )


class WhisperModel:
    def __init__(
        self,
        model_size_or_path: str = "tiny",
        device: str = "auto",
        device_index: int = 0,
        compute_type: str = "default",
        mesh=None,
        **_ignored,
    ):
        # ``device`` is accepted for CLI compatibility; placement on TPU
        # is governed by jax's platform selection and the mesh config
        # (``mesh``: a Mesh, a "dp=4,tp=2" spec string, None = read
        # WNT_MESH, False = force single device).
        self.engine = WhisperEngine(
            model_size_or_path, compute_type, mesh=mesh
        )
        self.model_size = model_size_or_path

    @property
    def hf_tokenizer(self):
        """Tokenizer exposing ``get_vocab()`` (reference diarize.py:127)."""
        return self.engine.tokenizer

    def transcribe(
        self,
        audio: np.ndarray,
        language: Optional[str] = None,
        task: str = "transcribe",
        beam_size: int = 5,
        suppress_tokens: Sequence[int] = (-1,),
        vad_filter: bool = False,
        without_timestamps: bool = False,
        word_timestamps: bool = False,
        temperature: Sequence[float] | float = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        compression_ratio_threshold: float = 2.4,
        log_prob_threshold: float = -1.0,
        no_speech_threshold: float = 0.6,
        condition_on_previous_text: bool = True,
        initial_prompt: Optional[str] = None,
        **_ignored,
    ) -> Tuple[Iterable[Segment], TranscriptionInfo]:
        if isinstance(temperature, (int, float)):
            temperature = (float(temperature),)
        if isinstance(audio, (str, os.PathLike)):
            # faster-whisper accepts a path as well as a waveform
            from ..audio import decode_audio

            audio = decode_audio(os.fspath(audio))
        segments, info = self.engine.transcribe_sequential(
            np.asarray(audio, np.float32),
            language=language,
            suppress_tokens=tuple(suppress_tokens),
            vad_filter=vad_filter,
            temperatures=tuple(temperature),
            compression_ratio_threshold=compression_ratio_threshold,
            logprob_threshold=log_prob_threshold,
            no_speech_threshold=no_speech_threshold,
            condition_on_previous_text=condition_on_previous_text,
            without_timestamps=without_timestamps,
            beam_size=beam_size,
            task=task,
            initial_prompt=initial_prompt,
        )
        if word_timestamps:
            _attach_word_timestamps(
                segments, np.asarray(audio, np.float32), info.language
            )
        return iter(segments), info


class BatchedInferencePipeline:
    """Batched VAD-windowed inference (reference diarize.py:124,132-138)."""

    def __init__(self, model: WhisperModel):
        self.model = model

    def transcribe(
        self,
        audio: np.ndarray,
        language: Optional[str] = None,
        task: str = "transcribe",
        beam_size: int = 5,
        suppress_tokens: Sequence[int] = (-1,),
        batch_size: int = 8,
        without_timestamps: bool = True,
        word_timestamps: bool = False,
        **_ignored,
    ) -> Tuple[Iterable[Segment], TranscriptionInfo]:
        segments, info = self.model.engine.transcribe_batched(
            np.asarray(audio, np.float32),
            language=language,
            suppress_tokens=tuple(suppress_tokens),
            batch_size=batch_size,
            without_timestamps=without_timestamps,
            beam_size=beam_size,
            task=task,
        )
        if word_timestamps:
            _attach_word_timestamps(
                segments, np.asarray(audio, np.float32), info.language
            )
        return iter(segments), info
