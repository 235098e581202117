import numpy as np

from whisper_nemo_tpu.vad import (
    binarize_probs,
    filter_segments,
    get_speech_timestamps,
    median_smooth,
)


def test_binarize_hysteresis():
    probs = np.array([0.1, 0.9, 0.9, 0.5, 0.2, 0.1, 0.9, 0.1])
    # onset 0.8, offset 0.3: opens at idx1, stays through 0.5, closes at 0.2
    segs = binarize_probs(probs, 1.0, onset=0.8, offset=0.3)
    assert segs == [(1.0, 4.0), (6.0, 7.0)]


def test_binarize_padding_and_merge():
    probs = np.array([0.0, 1.0, 0.0, 1.0, 0.0])
    segs = binarize_probs(probs, 1.0, onset=0.5, offset=0.5, pad_onset=0.6, pad_offset=0.6)
    # padding makes the two segments overlap -> merged
    assert len(segs) == 1
    assert segs[0][0] == 0.4


def test_binarize_negative_pad_offset():
    probs = np.array([0.0, 1.0, 1.0, 1.0, 0.0])
    segs = binarize_probs(probs, 1.0, onset=0.5, offset=0.5, pad_offset=-0.5)
    assert segs == [(1.0, 3.5)]


def test_filter_segments_gap_fill_and_min_duration():
    segs = [(0.0, 1.0), (1.1, 2.0), (5.0, 5.05)]
    out = filter_segments(segs, min_duration_on=0.2, min_duration_off=0.3)
    assert out == [(0.0, 2.0)]


def test_median_smooth():
    probs = np.array([0.0, 0.0, 1.0, 0.0, 0.0])
    sm = median_smooth(probs, 3)
    assert sm[2] == 0.0  # lone spike removed


def test_energy_vad_finds_speech_burst():
    rng = np.random.default_rng(0)
    sr = 16000
    audio = np.zeros(6 * sr, np.float32)
    # very quiet noise floor everywhere
    audio += rng.standard_normal(len(audio)).astype(np.float32) * 1e-4
    # loud "speech" burst from 2s to 4s
    audio[2 * sr : 4 * sr] += (
        rng.standard_normal(2 * sr).astype(np.float32) * 0.3
    )
    spans = get_speech_timestamps(audio)
    assert len(spans) == 1
    assert abs(spans[0]["start"] / sr - 2.0) < 0.3
    assert abs(spans[0]["end"] / sr - 4.0) < 0.3


def test_energy_vad_silence():
    audio = np.zeros(16000, np.float32)
    assert get_speech_timestamps(audio) == []
