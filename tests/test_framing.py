"""Gather-free framing (ops/framing.py) and its consumers.

The shifted-reshape framing must be element-exact against the naive
index-matrix gather it replaces, for every (win, hop) pair in use:
Whisper mel (400/160), NeMo features (400/160), energy VAD (640/320
and the telephonic 2400/160 fallback).
"""

import numpy as np
import pytest


def _naive_frames(x, n_frames, win, hop):
    idx = np.arange(win)[None, :] + hop * np.arange(n_frames)[:, None]
    padded = np.zeros(idx.max() + 1, x.dtype)
    padded[: len(x)] = x[: len(padded)]
    return padded[idx]


@pytest.mark.parametrize(
    "win,hop", [(400, 160), (640, 320), (2400, 160), (512, 512)]
)
def test_frame_signal_matches_naive_gather(win, hop):
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops.framing import frame_signal

    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000).astype(np.float32)
    n_frames = 1 + (len(x) - win) // hop
    got = np.asarray(frame_signal(jnp.asarray(x), n_frames, win, hop))
    np.testing.assert_array_equal(
        got, _naive_frames(x, n_frames, win, hop)
    )


def test_frame_signal_batched():
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops.framing import frame_signal

    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 5000)).astype(np.float32)
    n_frames = 1 + (x.shape[1] - 400) // 160
    got = np.asarray(frame_signal(jnp.asarray(x), n_frames, 400, 160))
    for b in range(3):
        np.testing.assert_array_equal(
            got[b], _naive_frames(x[b], n_frames, 400, 160)
        )


@pytest.mark.parametrize(
    "win,hop", [(400, 160), (640, 320), (640, 160), (500, 160), (512, 512)]
)
def test_frame_energy_matches_frame_signal(win, hop):
    """The block-sum energy (no frame matrix — the 4 h OOM fix) must
    equal mean(square(frame_signal)) for every (win, hop) in use,
    including non-multiple remainders (500/160)."""
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops.framing import frame_energy, frame_signal

    rng = np.random.default_rng(4)
    x = rng.standard_normal(16000).astype(np.float32)
    n_frames = 1 + (len(x) - win) // hop
    ref = np.asarray(
        jnp.mean(
            jnp.square(frame_signal(jnp.asarray(x), n_frames, win, hop)),
            axis=-1,
        )
    )
    got = np.asarray(frame_energy(jnp.asarray(x), n_frames, win, hop))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)


def test_frame_energy_batched_and_padded():
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops.framing import frame_energy, frame_signal

    rng = np.random.default_rng(5)
    # 4319 < need=4320 for 25 frames at 400/160: exercises the zero-pad
    # branch (4321 would satisfy `need` and skip it)
    x = rng.standard_normal((2, 4319)).astype(np.float32)
    n_frames = 1 + (4321 - 400) // 160
    ref = np.asarray(
        jnp.mean(
            jnp.square(frame_signal(jnp.asarray(x), n_frames, 400, 160)),
            axis=-1,
        )
    )
    got = np.asarray(frame_energy(jnp.asarray(x), n_frames, 400, 160))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)


def test_log_mel_features_chunked_matches_single(monkeypatch):
    """Chunked feature computation (the 4 h OOM fix) is numerically
    identical to the single-call path, including the global
    normalization."""
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops import features as F

    rng = np.random.default_rng(6)
    x = rng.standard_normal(16000 * 5).astype(np.float32)
    base = np.asarray(F.log_mel_features(jnp.asarray(x), n_mels=64))
    monkeypatch.setattr(F, "_CHUNK_FRAMES", 100)
    chunked = np.asarray(F.log_mel_features(jnp.asarray(x), n_mels=64))
    np.testing.assert_allclose(chunked, base, rtol=1e-6, atol=1e-6)


def test_log_mel_features_unchanged_by_framing():
    """features.py output after the framing swap equals the direct
    gather formulation (same DFT constants, same normalization)."""
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops import features as F

    rng = np.random.default_rng(2)
    x = rng.standard_normal(16000 * 2).astype(np.float32)
    feats = np.asarray(F.log_mel_features(jnp.asarray(x), n_mels=64))

    cos_m, sin_m, fb = F._dft_constants(64)
    pad = F.WIN_LENGTH // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    n_frames = (len(xp) - F.WIN_LENGTH) // F.HOP_LENGTH + 1
    frames = _naive_frames(xp, n_frames, F.WIN_LENGTH, F.HOP_LENGTH)
    frames = np.pad(frames, ((0, 0), (0, F.N_FFT - F.WIN_LENGTH)))
    re, im = frames @ cos_m, frames @ sin_m
    mel = (re * re + im * im) @ fb
    ref = np.log(np.maximum(mel, 2.0**-24))
    ref = (ref - ref.mean(0)) / (ref.std(0) + 1e-5)
    np.testing.assert_allclose(feats, ref, atol=2e-3)


def test_energy_vad_device_path_matches_host():
    """Above the long-form threshold the device framing path produces
    the same speech spans as the host cumsum path."""
    from whisper_nemo_tpu.vad import energy

    rng = np.random.default_rng(3)
    sr = 16000
    # 12 min of alternating tone/silence (well past the 20k-frame
    # threshold at 20 ms hop)
    seconds = 12 * 60
    t = np.arange(seconds * sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    gate = (t % 20) < 10  # 10 s on / 10 s off
    x = (x * gate).astype(np.float32)

    spans_auto = energy.get_speech_timestamps(x)
    assert len(spans_auto) >= 30

    # force the host path for comparison
    n_frames = 1 + (len(x) - 640) // 320
    assert n_frames > 20_000
    probs_dev = energy.frame_energy_probs(x)
    csum = np.concatenate(
        [[0.0], np.cumsum(np.asarray(x, np.float64) ** 2)]
    )
    starts = 320 * np.arange(n_frames)
    we = (csum[starts + 640] - csum[starts]) / 640
    rms = np.sqrt(we + 1e-12)
    log_e = 20 * np.log10(rms + 1e-12)
    lo, hi = np.percentile(log_e, 10), np.percentile(log_e, 95)
    probs_host = np.clip((log_e - lo) / (hi - lo), 0, 1)
    np.testing.assert_allclose(probs_dev, probs_host, atol=1e-3)
