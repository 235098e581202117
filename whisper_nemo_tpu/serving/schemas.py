"""Request/response schemas for the serverless transcription API.

Pydantic models matching the reference's serverless contract
(main.py:58-83): the same field names, defaults, language allow-list and
speaker-count knobs, so clients of the reference can switch unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from pydantic import BaseModel, HttpUrl, field_validator

VALID_LANGUAGES = ["fr", "en", "es", "de", "it", "auto"]


class TranscriptionRequest(BaseModel):
    audio_url: HttpUrl
    language: Optional[str] = "fr"
    num_speakers: Optional[int] = None
    min_speakers: Optional[int] = 1
    max_speakers: Optional[int] = 4
    transcription_only: Optional[bool] = False

    @field_validator("language")
    @classmethod
    def validate_language(cls, v):
        if v not in VALID_LANGUAGES:
            raise ValueError(
                f"Invalid language. Choose from: {VALID_LANGUAGES}"
            )
        return v


class TranscriptionResponse(BaseModel):
    success: bool
    model: str
    transcription_brute: str
    transcription_formatee: Optional[str] = None
    segments_detailles: Optional[List[Dict[str, Any]]] = None
    parametres: Dict[str, Any]
    statistiques: Dict[str, Any]
    processing_time: float
    error: Optional[str] = None
