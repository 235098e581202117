from .languages import (
    LANGUAGES,
    TO_LANGUAGE_CODE,
    langs_to_iso,
    punct_model_langs,
    process_language_arg,
    whisper_langs,
)

__all__ = [
    "LANGUAGES",
    "TO_LANGUAGE_CODE",
    "langs_to_iso",
    "punct_model_langs",
    "process_language_arg",
    "whisper_langs",
]
