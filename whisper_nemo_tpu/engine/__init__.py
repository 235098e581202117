"""Inference engine: decode loops, checkpoints, quantization,
converters, streaming."""

from .streaming import CommittedWord, StreamingTranscriber
from .transcribe import Segment, TranscriptionInfo, WhisperEngine

__all__ = [
    "CommittedWord",
    "Segment",
    "StreamingTranscriber",
    "TranscriptionInfo",
    "WhisperEngine",
]
