import numpy as np
import pytest

from whisper_nemo_tpu.ops.mel import (
    HOP_LENGTH,
    N_FFT,
    N_SAMPLES,
    log_mel_spectrogram,
    mel_filter_bank,
)


def _reference_logmel(audio: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """Golden reference: transformers' WhisperFeatureExtractor numerics
    (numpy STFT + slaney mel + whisper dynamic-range compression)."""
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=n_mels)
    out = fe(
        audio,
        sampling_rate=16000,
        padding="do_not_pad",
        return_tensors="np",
    )
    return out.input_features[0]


def test_mel_filter_bank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank as hf_fb

    ours = mel_filter_bank(201, 80)
    theirs = hf_fb(
        num_frequency_bins=201,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    ).astype(np.float32)
    np.testing.assert_allclose(ours, theirs, atol=1e-7)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_log_mel_matches_whisper_reference(impl):
    rng = np.random.default_rng(42)
    audio = (rng.standard_normal(N_SAMPLES) * 0.1).astype(np.float32)
    ours = np.asarray(log_mel_spectrogram(audio, impl=impl))
    golden = _reference_logmel(audio)
    assert ours.shape == golden.shape == (80, 3000)
    np.testing.assert_allclose(ours, golden, atol=2e-4)


def test_log_mel_shapes_128_mels():
    audio = np.zeros(N_SAMPLES, dtype=np.float32)
    out = log_mel_spectrogram(audio, n_mels=128, impl="xla")
    assert out.shape == (128, 3000)


def test_log_mel_short_audio():
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.05).astype(np.float32)
    ours = np.asarray(log_mel_spectrogram(audio, impl="xla"))
    golden = _reference_logmel(audio)
    assert ours.shape == golden.shape == (80, 100)
    np.testing.assert_allclose(ours, golden, atol=2e-4)


def test_log_mel_sine_peak_bin():
    # a pure 440 Hz tone should put most mel energy near the 440 Hz bin
    t = np.arange(N_SAMPLES) / 16000
    audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    out = np.asarray(log_mel_spectrogram(audio, impl="xla"))
    mean_per_mel = out.mean(axis=1)
    peak_mel = int(np.argmax(mean_per_mel))
    fb = mel_filter_bank(201, 80)
    freqs = np.linspace(0, 8000, 201)
    center = freqs[np.argmax(fb[:, peak_mel])]
    assert 350 < center < 550


def test_fixture_mel(fixture_opus):
    from whisper_nemo_tpu.audio import decode_audio

    audio = decode_audio(str(fixture_opus))
    n = (len(audio) // HOP_LENGTH) * HOP_LENGTH
    ours = np.asarray(log_mel_spectrogram(audio[:n], impl="xla"))
    golden = _reference_logmel(audio[:n])
    np.testing.assert_allclose(ours, golden, atol=2e-4)
