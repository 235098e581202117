import numpy as np
import pytest

from whisper_nemo_tpu.engine.transcribe import _restore_vad_time


def test_restore_within_first_chunk():
    # speech at orig [2,4] and [10,12] → concat [0,2] and [2,4]
    time_map = [(0.0, 2.0, 2.0), (2.0, 10.0, 2.0)]
    assert _restore_vad_time(0.0, time_map) == pytest.approx(2.0)
    assert _restore_vad_time(1.5, time_map) == pytest.approx(3.5)


def test_restore_second_chunk():
    time_map = [(0.0, 2.0, 2.0), (2.0, 10.0, 2.0)]
    assert _restore_vad_time(2.5, time_map) == pytest.approx(10.5)
    assert _restore_vad_time(4.0, time_map) == pytest.approx(12.0)


def test_restore_beyond_end_extrapolates():
    time_map = [(0.0, 2.0, 2.0)]
    assert _restore_vad_time(3.0, time_map) == pytest.approx(5.0)


def test_boundary_maps_to_chunk_end():
    time_map = [(0.0, 5.0, 1.0), (1.0, 20.0, 1.0)]
    assert _restore_vad_time(1.0, time_map) == pytest.approx(6.0)
