from .faster_whisper_api import (
    BatchedInferencePipeline,
    WhisperModel,
    Word,
)
from .openai_api import load_model
from ..audio.decode import decode_audio
from ..engine.transcribe import Segment, TranscriptionInfo

__all__ = [
    "BatchedInferencePipeline",
    "Segment",
    "TranscriptionInfo",
    "WhisperModel",
    "Word",
    "decode_audio",
    "load_model",
]
