from .schemas import TranscriptionRequest, TranscriptionResponse
from .handler import handler, load_models, serve

__all__ = [
    "TranscriptionRequest",
    "TranscriptionResponse",
    "handler",
    "load_models",
    "serve",
]
