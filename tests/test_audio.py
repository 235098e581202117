import numpy as np
import pytest

from whisper_nemo_tpu.audio import (
    AudioDecodeError,
    decode_audio,
    probe_duration,
    read_wav,
    write_wav,
)


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, wave, 16000)
    back, rate = read_wav(path)
    assert rate == 16000
    assert back.shape == wave.shape
    np.testing.assert_allclose(back, wave, atol=2.0 / 32767)


def test_decode_wav_via_native(tmp_path):
    # sine at 440 Hz, 0.5 s
    t = np.arange(8000, dtype=np.float32) / 16000
    wave = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "sine.wav")
    write_wav(path, wave, 16000)
    decoded = decode_audio(path)
    assert decoded.dtype == np.float32
    assert abs(len(decoded) - 8000) <= 64
    # correlation with the original must be near-perfect
    n = min(len(decoded), 8000)
    corr = np.corrcoef(decoded[:n], wave[:n])[0, 1]
    assert corr > 0.99


def test_decode_resamples(tmp_path):
    # 1 s at 8 kHz should come back as ~16000 samples at 16 kHz
    t = np.arange(8000, dtype=np.float32) / 8000
    wave = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = str(tmp_path / "sr8k.wav")
    write_wav(path, wave, 8000)
    decoded = decode_audio(path, sampling_rate=16000)
    assert abs(len(decoded) - 16000) <= 128


def test_decode_stereo_downmix(tmp_path):
    import wave as wave_mod

    left = (np.ones(1000, dtype=np.float32) * 0.5 * 32767).astype("<i2")
    right = (np.ones(1000, dtype=np.float32) * -0.5 * 32767).astype("<i2")
    stereo = np.empty(2000, dtype="<i2")
    stereo[0::2] = left
    stereo[1::2] = right
    path = str(tmp_path / "stereo.wav")
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(stereo.tobytes())
    decoded = decode_audio(path)
    # downmix of +0.5/-0.5 is ~0
    assert np.abs(decoded).max() < 0.01


def test_decode_opus_fixture(fixture_opus):
    decoded = decode_audio(str(fixture_opus))
    assert decoded.dtype == np.float32
    dur = len(decoded) / 16000
    # the fixture is a ~40 s clip
    assert 10 < dur < 120
    assert np.abs(decoded).max() <= 1.5
    probed = probe_duration(str(fixture_opus))
    assert abs(probed - dur) < 1.0


def test_decode_missing_file():
    with pytest.raises(AudioDecodeError):
        decode_audio("/nonexistent/file.mp3")


def test_decode_garbage_file(tmp_path):
    path = tmp_path / "garbage.mp3"
    path.write_bytes(b"this is not audio at all" * 10)
    with pytest.raises(AudioDecodeError):
        decode_audio(str(path))


def test_decode_wav_fallback_without_native(tmp_path, monkeypatch):
    """Platforms without the libav toolchain (e.g. Windows CI) decode
    PCM WAVs through the pure-python fallback, including resampling;
    compressed formats raise AudioDecodeError."""
    from whisper_nemo_tpu.audio import decode as decode_mod

    def no_lib():
        raise OSError("no libav toolchain")

    monkeypatch.setattr(decode_mod, "_load_library", no_lib)

    t = np.arange(8000, dtype=np.float32) / 8000
    wave = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = str(tmp_path / "fb.wav")
    write_wav(path, wave, 8000)
    decoded = decode_mod.decode_audio(path, sampling_rate=16000)
    assert decoded.dtype == np.float32
    assert abs(len(decoded) - 16000) <= 128

    assert decode_mod.probe_duration(path) == pytest.approx(1.0, abs=0.01)
    assert not decode_mod.native_decoder_available()
    with pytest.raises(AudioDecodeError, match="native audio decoder"):
        decode_mod.decode_audio(str(tmp_path / "x.opus"))
