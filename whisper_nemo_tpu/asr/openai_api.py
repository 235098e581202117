"""openai-whisper–compatible facade over the TPU engine.

Drop-in for the dict contract the reference serverless handler consumes
(main.py:381-391, 405-411, 445):

    model = load_model("large-v2", device)
    result = model.transcribe(path, language=..., fp16=True,
                              condition_on_previous_text=False,
                              no_speech_threshold=0.6,
                              logprob_threshold=-1.0,
                              compression_ratio_threshold=2.4,
                              temperature=0.0, verbose=False)
    result["text"], result["segments"][i]["start"/"end"/"text"/
    "no_speech_prob"], result["language"]
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from ..audio.decode import decode_audio
from ..engine.transcribe import WhisperEngine


class OpenAIWhisperModel:
    def __init__(self, name: str, device=None, compute_type=None):
        # openai-whisper's fp32-by-default is kept for the drop-in
        # facade, with bf16 for large (its fp16 analogue on TPU);
        # callers that know their deployment pass compute_type
        # explicitly — the serving handler's f32 medium.en engine
        # (weights AND batch-16 decode executables at 2x bf16 width)
        # was what pushed its 1 h jobs into RESOURCE_EXHAUSTED (r5)
        compute = compute_type or (
            "bfloat16" if name.startswith("large") else "default"
        )
        # string devices ("cuda"/"cpu") keep the openai-whisper call
        # signature; a jax.Device commits the engine to that chip
        jax_device = None if isinstance(device, str) else device
        self.engine = WhisperEngine(name, compute, device=jax_device)
        self.name = name

    def transcribe(
        self,
        audio: Union[str, np.ndarray],
        language: Optional[str] = None,
        task: str = "transcribe",
        beam_size: Optional[int] = None,
        fp16: bool = True,
        condition_on_previous_text: bool = True,
        no_speech_threshold: float = 0.6,
        logprob_threshold: float = -1.0,
        compression_ratio_threshold: float = 2.4,
        temperature: Union[float, Sequence[float]] = (
            0.0, 0.2, 0.4, 0.6, 0.8, 1.0,
        ),
        suppress_tokens: Union[str, Sequence[int], None] = "-1",
        word_timestamps: bool = False,
        verbose: Optional[bool] = None,
        **_ignored,
    ) -> dict:
        if isinstance(audio, str):
            audio = decode_audio(audio)
        if isinstance(temperature, (int, float)):
            temperature = (float(temperature),)
        if isinstance(suppress_tokens, str):
            # openai-whisper's default is the string "-1" (expanded to
            # the non-speech list by text.tokenizer.get_suppressed_tokens)
            suppress_tokens = (
                tuple(int(t) for t in suppress_tokens.split(","))
                if suppress_tokens
                else ()
            )
        segments, info = self.engine.transcribe_sequential(
            np.asarray(audio, np.float32),
            language=language,
            suppress_tokens=tuple(suppress_tokens or ()),
            temperatures=tuple(temperature),
            compression_ratio_threshold=compression_ratio_threshold,
            logprob_threshold=logprob_threshold,
            no_speech_threshold=no_speech_threshold,
            condition_on_previous_text=condition_on_previous_text,
            beam_size=beam_size or 1,
            task=task,
        )
        if word_timestamps:
            from .faster_whisper_api import _attach_word_timestamps

            _attach_word_timestamps(
                segments, np.asarray(audio, np.float32), info.language
            )
        seg_dicts = [
            {
                "id": s.id,
                "seek": s.seek,
                "start": s.start,
                "end": s.end,
                "text": s.text,
                "tokens": s.tokens,
                "temperature": s.temperature,
                "avg_logprob": s.avg_logprob,
                "compression_ratio": s.compression_ratio,
                "no_speech_prob": s.no_speech_prob,
                **(
                    {
                        "words": [
                            {
                                "word": w.word,
                                "start": w.start,
                                "end": w.end,
                                "probability": w.probability,
                            }
                            for w in (s.words or [])
                        ]
                    }
                    if word_timestamps
                    else {}
                ),
            }
            for s in segments
        ]
        return {
            "text": "".join(s.text for s in segments),
            "segments": seg_dicts,
            "language": info.language,
            "duration": info.duration,
        }


def load_model(
    name: str, device: Optional[str] = None, compute_type: Optional[str] = None
) -> OpenAIWhisperModel:
    """Contract: ``whisper.load_model`` (reference main.py:110).

    ``compute_type`` extends the openai-whisper signature (None keeps
    its fp32/bf16-for-large behavior) so deployments can pin the
    engine width — the serving handler passes int8."""
    return OpenAIWhisperModel(name, device, compute_type=compute_type)
