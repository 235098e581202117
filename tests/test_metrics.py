import numpy as np
import pytest

from whisper_nemo_tpu.diarize.metrics import (
    diarization_error_rate,
    optimal_speaker_mapping,
)


def test_perfect_diarization_zero_der():
    ref = [(0.0, 5.0, 0), (5.0, 10.0, 1)]
    out = diarization_error_rate(ref, ref, collar=0.0)
    assert out["der"] == pytest.approx(0.0, abs=1e-6)


def test_label_permutation_is_free():
    ref = [(0.0, 5.0, 0), (5.0, 10.0, 1)]
    hyp = [(0.0, 5.0, 7), (5.0, 10.0, 3)]  # same turns, renamed speakers
    out = diarization_error_rate(ref, hyp, collar=0.0)
    assert out["der"] == pytest.approx(0.0, abs=1e-6)


def test_missed_speech():
    ref = [(0.0, 10.0, 0)]
    hyp = [(0.0, 5.0, 0)]
    out = diarization_error_rate(ref, hyp, collar=0.0)
    assert out["missed"] == pytest.approx(0.5, abs=0.01)
    assert out["der"] == pytest.approx(0.5, abs=0.01)


def test_false_alarm():
    ref = [(0.0, 5.0, 0)]
    hyp = [(0.0, 10.0, 0)]
    out = diarization_error_rate(ref, hyp, collar=0.0)
    assert out["false_alarm"] == pytest.approx(1.0, abs=0.01)


def test_speaker_confusion():
    ref = [(0.0, 5.0, 0), (5.0, 10.0, 1)]
    # second half attributed to the wrong (first) speaker
    hyp = [(0.0, 5.0, 0), (5.0, 10.0, 0)]
    out = diarization_error_rate(ref, hyp, collar=0.0)
    assert out["confusion"] == pytest.approx(0.5, abs=0.01)
    assert out["missed"] == pytest.approx(0.0, abs=0.01)


def test_collar_forgives_boundary_jitter():
    ref = [(0.0, 5.0, 0), (5.0, 10.0, 1)]
    hyp = [(0.0, 5.2, 0), (5.2, 10.0, 1)]  # 200ms late boundary
    strict = diarization_error_rate(ref, hyp, collar=0.0)
    with_collar = diarization_error_rate(ref, hyp, collar=0.25)
    assert strict["der"] > 0.0
    assert with_collar["der"] == pytest.approx(0.0, abs=1e-6)


def test_overlap_ignored_by_default():
    ref = [(0.0, 10.0, 0), (4.0, 6.0, 1)]  # overlap 4-6s
    hyp = [(0.0, 10.0, 0)]  # misses speaker 1 entirely
    lenient = diarization_error_rate(ref, hyp, collar=0.0, ignore_overlap=True)
    strict = diarization_error_rate(ref, hyp, collar=0.0, ignore_overlap=False)
    assert lenient["der"] == pytest.approx(0.0, abs=0.01)
    assert strict["der"] > 0.1


def test_optimal_mapping():
    ref = [(0.0, 5.0, 0), (5.0, 10.0, 1)]
    hyp = [(0.0, 5.0, 9), (5.0, 10.0, 4)]
    mapping = optimal_speaker_mapping(ref, hyp)
    assert mapping == {9: 0, 4: 1}
