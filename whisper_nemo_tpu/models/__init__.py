from .whisper import (
    WHISPER_DIMS,
    WhisperDims,
    decoder_forward,
    encode,
    init_whisper_params,
)

__all__ = [
    "WHISPER_DIMS",
    "WhisperDims",
    "decoder_forward",
    "encode",
    "init_whisper_params",
]
