import numpy as np
import pytest

from whisper_nemo_tpu.audio import write_wav
from whisper_nemo_tpu.config import create_config
from whisper_nemo_tpu.diarize import (
    NeuralDiarizer,
    SpeakerDiarizationPipeline,
    read_speaker_timestamps,
)


def _two_speaker_audio(seconds=8, sr=16000, seed=0):
    """Alternating 2 s bursts of band-distinct noise with gaps."""
    rng = np.random.default_rng(seed)
    audio = rng.standard_normal(seconds * sr).astype(np.float32) * 1e-4
    t = np.arange(sr * 2) / sr
    for i, start in enumerate(range(0, seconds - 1, 4)):
        tone = np.sin(2 * np.pi * (200 if i % 2 == 0 else 1200) * t)
        noise = rng.standard_normal(len(t)) * 0.05
        audio[start * sr : start * sr + len(t)] += (
            0.3 * tone + noise
        ).astype(np.float32)
    return audio


@pytest.fixture(scope="module")
def diarizer(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("diar")
    cfg = create_config(str(tmp))
    return NeuralDiarizer(cfg), tmp


def test_neural_diarizer_manifest_rttm_roundtrip(diarizer):
    diar, tmp = diarizer
    audio = _two_speaker_audio()
    write_wav(str(tmp / "mono_file.wav"), audio)
    turns = diar.diarize()
    rttm = tmp / "pred_rttms" / "mono_file.rttm"
    assert rttm.exists()
    parsed = read_speaker_timestamps(str(rttm))
    assert parsed, "expected at least one speaker turn"
    for start_ms, end_ms, spk in parsed:
        assert 0 <= start_ms < end_ms <= 9000
        assert spk >= 0
    # turns returned match the file
    assert len(parsed) == len(turns)


def test_diarize_waveform_speech_coverage(diarizer):
    diar, _ = diarizer
    audio = _two_speaker_audio(seconds=8, seed=1)
    turns = diar.diarize_waveform(audio)
    # bursts at 0-2s and 4-6s must be covered by some turn
    covered = lambda t: any(s <= t <= e for s, e, _ in turns)
    assert covered(1.0)
    assert covered(5.0)
    # silence at 3s / 7s should mostly not be speech
    assert turns, "no turns found"


def test_diarize_waveform_silence(diarizer):
    diar, _ = diarizer
    silence = np.zeros(4 * 16000, np.float32)
    assert diar.diarize_waveform(silence) == []


def test_oracle_speaker_count(diarizer):
    diar, _ = diarizer
    audio = _two_speaker_audio(seconds=12, seed=2)
    turns = diar.diarize_waveform(audio, num_speakers=2)
    speakers = {spk for _, _, spk in turns}
    assert len(speakers) == 2


def test_pyannote_facade(tmp_path):
    audio = _two_speaker_audio(seconds=6, seed=3)
    path = str(tmp_path / "a.wav")
    write_wav(path, audio)
    pipeline = SpeakerDiarizationPipeline.from_pretrained(
        "pyannote/speaker-diarization-3.1", use_auth_token="x"
    ).to(None)
    result = pipeline(path, min_speakers=1, max_speakers=4)
    rows = list(result.itertracks(yield_label=True))
    assert rows
    for turn, _, label in rows:
        assert turn.end > turn.start
        assert label.startswith("SPEAKER_")


def test_marblenet_vad_path_with_checkpoint(tmp_path, monkeypatch):
    """With a VAD checkpoint installed, the neural MarbleNet path runs
    (mel features → frame probs at 10 ms) instead of the energy VAD."""
    import jax

    from whisper_nemo_tpu.engine.checkpoint import save_params
    from whisper_nemo_tpu.models import marblenet

    monkeypatch.setenv("WNT_MODEL_DIR", str(tmp_path))
    dims = marblenet.MarbleNetDims(filters=(32, 16, 16, 16))
    params = marblenet.init_marblenet_params(jax.random.PRNGKey(0), dims)
    save_params(str(tmp_path / "vad_multilingual_marblenet.npz"), params)

    cfg = create_config(str(tmp_path))
    diar = NeuralDiarizer(cfg)
    diar.marblenet_dims = dims  # match the test checkpoint's size
    assert diar.vad_params is not None, "checkpoint not picked up"

    audio = np.random.default_rng(0).standard_normal(32000).astype(
        np.float32
    ) * 0.2
    probs = diar._frame_speech_probs(audio)
    # 2 s at 10 ms frames ≈ 200 probs, all in [0, 1]
    assert 150 < len(probs) <= 210
    assert (probs >= 0).all() and (probs <= 1).all()
