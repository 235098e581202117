"""Frame-probability → speech-segment binarization.

Implements the NeMo-style VAD postprocessing contract driven by the
``VadParams`` config (reference telephonic.yaml:26-37 and the overrides
in helpers.py:296-298): onset/offset hysteresis thresholds, segment
padding, minimum on/off durations, and optional median smoothing. Used
by both the MarbleNet VAD and the energy fallback VAD.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def median_smooth(probs: np.ndarray, window_frames: int) -> np.ndarray:
    """Sliding median filter over frame probabilities."""
    if window_frames <= 1:
        return probs
    pad = window_frames // 2
    padded = np.pad(probs, (pad, pad), mode="edge")
    windows = np.lib.stride_tricks.sliding_window_view(padded, window_frames)
    return np.median(windows, axis=-1)[: len(probs)]


def binarize_probs(
    probs: np.ndarray,
    frame_shift: float,
    onset: float = 0.5,
    offset: float = 0.3,
    pad_onset: float = 0.0,
    pad_offset: float = 0.0,
) -> List[Tuple[float, float]]:
    """Hysteresis binarization of frame speech probabilities.

    A segment opens when prob rises above ``onset`` and closes when it
    falls below ``offset``; boundaries are padded by ``pad_onset`` /
    ``pad_offset`` seconds (which may be negative, as the reference's
    pad_offset=-0.05 override is). Returns [(start_s, end_s), ...].
    """
    segments: List[Tuple[float, float]] = []
    active = False
    start = 0.0
    for i, p in enumerate(probs):
        t = i * frame_shift
        if not active and p >= onset:
            active = True
            start = t
        elif active and p < offset:
            segments.append((start, t))
            active = False
    if active:
        segments.append((start, len(probs) * frame_shift))

    padded = []
    for s, e in segments:
        s = max(0.0, s - pad_onset)
        e = e + pad_offset
        if e > s:
            padded.append((s, e))
    # merge overlaps introduced by padding
    merged: List[Tuple[float, float]] = []
    for s, e in padded:
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    return merged


def filter_segments(
    segments: List[Tuple[float, float]],
    min_duration_on: float = 0.0,
    min_duration_off: float = 0.0,
) -> List[Tuple[float, float]]:
    """Drop short speech segments and fill short gaps.

    ``min_duration_off``: gaps shorter than this merge the neighbors
    (short-pause deletion); ``min_duration_on``: segments shorter than
    this are removed — matching NeMo's ordering (gaps first).
    """
    if not segments:
        return []
    merged = [list(segments[0])]
    for s, e in segments[1:]:
        if s - merged[-1][1] < min_duration_off:
            merged[-1][1] = e
        else:
            merged.append([s, e])
    return [
        (s, e) for s, e in merged if (e - s) >= min_duration_on
    ]
