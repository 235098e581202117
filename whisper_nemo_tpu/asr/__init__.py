from .faster_whisper_api import BatchedInferencePipeline, WhisperModel
from .openai_api import load_model
from ..audio.decode import decode_audio

__all__ = [
    "BatchedInferencePipeline",
    "WhisperModel",
    "decode_audio",
    "load_model",
]
