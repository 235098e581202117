"""CLI integration: the reference CI's smoke contract, in-process and
as real subprocesses (nemo_process.py child entry, F4)."""

import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture()
def short_wav(tmp_path):
    from whisper_nemo_tpu.audio import write_wav

    rng = np.random.default_rng(0)
    audio = np.zeros(4 * 16000, np.float32)
    audio[16000:48000] = rng.standard_normal(32000).astype(np.float32) * 0.2
    path = tmp_path / "clip.wav"
    write_wav(str(path), audio)
    return path


def test_nemo_process_child_entry(short_wav, tmp_path):
    """F4: the child process decodes audio, writes the mono handoff and
    pred_rttms/mono_file.rttm (reference nemo_process.py contract)."""
    env = dict(os.environ, WNT_TEST_SMALL_MODELS="1")
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "nemo_process.py"),
            "-a", str(short_wav),
            "--device", "cpu",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert (tmp_path / "temp_outputs" / "mono_file.wav").exists()
    rttm = tmp_path / "temp_outputs" / "pred_rttms" / "mono_file.rttm"
    assert rttm.exists()


def test_sequential_flow_in_process(short_wav, tmp_path, monkeypatch):
    """F1 flow through run_sequential with a tiny model on CPU."""
    import argparse

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("WNT_TEST_SMALL_MODELS", "1")
    from whisper_nemo_tpu.cli.flow import run_sequential

    args = argparse.Namespace(
        audio=str(short_wav),
        stemming=False,
        suppress_numerals=False,
        model_name="tiny.en",
        batch_size=2,
        language="en",
        device="cpu",
        domain="telephonic",
    )
    run_sequential(args)
    base = os.path.splitext(str(short_wav))[0]
    assert os.path.exists(base + ".txt")
    assert os.path.exists(base + ".srt")
    # outputs are BOM-encoded like the reference (utf-8-sig)
    with open(base + ".srt", "rb") as f:
        assert f.read(3) == b"\xef\xbb\xbf"


def test_sequential_asr_keeps_timed_segments(short_wav, monkeypatch):
    """batch_size=0 (sequential+vad_filter) must still hand timed
    segments to alignment: the engine restores segment times from the
    VAD-concatenated stream to original-recording coordinates."""
    monkeypatch.setenv("WNT_TEST_SMALL_MODELS", "1")
    from whisper_nemo_tpu.cli.flow import run_asr

    result = run_asr(
        str(short_wav),
        model_name="tiny.en",
        batch_size=0,
        language="en",
        suppress_numerals=False,
        device="cpu",
    )
    assert result.segments is not None, "timed-segment handoff dropped"
    duration = len(result.audio) / 16000.0
    for seg in result.segments:
        assert 0.0 <= seg["start"] <= seg["end"] <= duration + 0.5
