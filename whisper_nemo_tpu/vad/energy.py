"""Energy-based voice activity detection.

Fills the role of faster-whisper's ``vad_filter=True`` (reference
diarize.py:144) when no neural VAD weights are available: frame log-RMS
energy is normalized against a noise-floor estimate into a pseudo
probability, then run through the same hysteresis binarization the
neural VAD uses. The MarbleNet VAD (models/marblenet.py) plugs into the
identical segment contract.
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np

from .binarize import binarize_probs, filter_segments

SAMPLE_RATE = 16000


@functools.lru_cache(maxsize=1)
def _energies_jit():
    import jax

    from ..ops.framing import frame_energy

    # frame_energy, not frame_signal+mean: the materialized frame
    # matrix OOM'd at 4 h (3.7 GB + shifted-reshape temps); block sums
    # need O(T/hop) memory
    return jax.jit(frame_energy, static_argnums=(1, 2, 3))


def _frame_energies_device(audio, n_frames: int, win: int, hop: int):
    """Per-frame mean-square energy, computed on device.

    Framing uses the gather-free shifted-reshape (ops/framing.py); the
    waveform rides the shared device residency (audio/devcache.py), so
    a recording whose windows/features were already uploaded pays no
    extra transfer.
    """
    from ..audio.devcache import device_waveform

    return _energies_jit()(device_waveform(audio), n_frames, win, hop)


def frame_energy_probs(
    audio: np.ndarray,
    frame_shift: float = 0.02,
    frame_length: float = 0.04,
) -> np.ndarray:
    """Pseudo speech probabilities in [0, 1] from log-RMS energy.

    Energy is mapped linearly between the 10th percentile (noise floor)
    and the 95th percentile of frame log-energy.
    """
    hop = int(frame_shift * SAMPLE_RATE)
    win = int(frame_length * SAMPLE_RATE)
    if len(audio) < win:
        return np.zeros(0, np.float32)
    n_frames = 1 + (len(audio) - win) // hop
    if n_frames > 20_000:
        # long-form: frame energies on device from the resident
        # waveform (the host cumsum took 5-20 s per hour under the
        # 1-core contention of a live TPU process); the percentile
        # normalization below stays on the small [n_frames] vector
        window_energy = np.asarray(
            _frame_energies_device(audio, n_frames, win, hop)
        ).astype(np.float64)
    else:
        # short-form: windowed mean energy via cumulative sums, O(N)
        # host work with no device round-trip
        csum = np.concatenate(
            [[0.0], np.cumsum(np.asarray(audio, np.float64) ** 2)]
        )
        starts = hop * np.arange(n_frames)
        window_energy = (csum[starts + win] - csum[starts]) / win
    rms = np.sqrt(window_energy + 1e-12)
    log_e = 20 * np.log10(rms + 1e-12)
    lo, hi = np.percentile(log_e, 10), np.percentile(log_e, 95)
    if hi - lo < 6.0:  # nearly-constant energy: either all speech or all silence
        return (
            np.ones_like(log_e, np.float32)
            if hi > -45.0
            else np.zeros_like(log_e, np.float32)
        )
    probs = (log_e - lo) / (hi - lo)
    return np.clip(probs, 0.0, 1.0).astype(np.float32)


def get_speech_timestamps(
    audio: np.ndarray,
    onset: float = 0.6,
    offset: float = 0.4,
    min_duration_on: float = 0.1,
    min_duration_off: float = 0.3,
    pad: float = 0.1,
    frame_shift: float = 0.02,
) -> List[dict]:
    """Speech spans as ``[{"start": s0, "end": s1}, ...]`` in samples
    (the silero-style contract faster-whisper's VAD filter exposes)."""
    probs = frame_energy_probs(audio, frame_shift=frame_shift)
    segs = binarize_probs(
        probs, frame_shift, onset, offset, pad_onset=pad, pad_offset=pad
    )
    segs = filter_segments(segs, min_duration_on, min_duration_off)
    out = []
    duration = len(audio) / SAMPLE_RATE
    for s, e in segs:
        e = min(e, duration)
        out.append(
            {
                "start": int(s * SAMPLE_RATE),
                "end": int(e * SAMPLE_RATE),
            }
        )
    return out
