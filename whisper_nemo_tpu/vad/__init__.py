from .binarize import binarize_probs, filter_segments, median_smooth
from .energy import get_speech_timestamps

__all__ = [
    "binarize_probs",
    "filter_segments",
    "get_speech_timestamps",
    "median_smooth",
]
