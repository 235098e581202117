"""Device-waveform residency cache + on-device window/chunk gathers.

The pipeline uploads each recording's waveform to the device exactly
once (audio/devcache.py); ASR windows, aligner chunks, and diarizer
features are gathered on device from that single copy. These tests pin
(a) the cache's identity semantics and (b) bit-equality of the gathered
windows/chunks against the host-sliced originals.
"""

import numpy as np
import pytest


def test_device_waveform_caches_by_identity():
    from whisper_nemo_tpu.audio.devcache import (
        clear_cache,
        device_waveform,
    )

    clear_cache()
    a = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    d1 = device_waveform(a)
    d2 = device_waveform(a)
    assert d1 is d2
    np.testing.assert_array_equal(np.asarray(d1), a)

    b = a.copy()
    d3 = device_waveform(b)
    assert d3 is not d1  # different host object, different buffer


def test_device_waveform_passthrough_and_dtype():
    import jax.numpy as jnp

    from whisper_nemo_tpu.audio.devcache import device_waveform

    dev = jnp.zeros(8)
    assert device_waveform(dev) is dev

    a16 = (np.random.default_rng(1).standard_normal(100) * 1000).astype(
        np.int16
    )
    d = device_waveform(a16)
    np.testing.assert_array_equal(
        np.asarray(d), a16.astype(np.float32)
    )


def test_device_waveform_lru_bound():
    from whisper_nemo_tpu.audio import devcache

    devcache.clear_cache()
    arrays = [np.zeros(10, np.float32) + i for i in range(4)]
    for a in arrays:
        devcache.device_waveform(a)
    assert len(devcache._cache) <= devcache._MAX_ENTRIES


def test_gather_windows_matches_host_slices():
    """ASR window gather == the host zero-pad + slice it replaces."""
    import jax.numpy as jnp

    from whisper_nemo_tpu.engine.transcribe import _gather_windows

    rng = np.random.default_rng(2)
    audio = rng.standard_normal(50_000).astype(np.float32)
    n_samples = 16_000
    windows = [(0, 16_000), (10_000, 26_000), (40_000, 50_000)]

    host = np.zeros((len(windows), n_samples), np.float32)
    for i, (s, e) in enumerate(windows):
        chunk = audio[s:e][:n_samples]
        host[i, : len(chunk)] = chunk

    starts = np.array([s for s, _ in windows], np.int32)
    lengths = np.array(
        [min(e - s, n_samples) for s, e in windows], np.int32
    )
    dev = np.asarray(
        _gather_windows(
            jnp.asarray(audio),
            jnp.asarray(starts),
            jnp.asarray(lengths),
            n_samples,
        )
    )
    np.testing.assert_array_equal(dev, host)


def test_chunk_waveform_matches_host_pad_reshape():
    """Aligner chunking == host zero-pad + reshape it replaces,
    including the zero rows that pad the final batch."""
    import jax.numpy as jnp

    from whisper_nemo_tpu.align.api import _chunk_waveform

    rng = np.random.default_rng(3)
    chunk = 4_000
    audio = rng.standard_normal(10_500).astype(np.float32)
    n_chunks = 3
    n_rows = 4  # padded to the batch multiple

    host = np.zeros(n_chunks * chunk, np.float32)
    host[: len(audio)] = audio
    host = host.reshape(n_chunks, chunk)
    host = np.concatenate([host, np.zeros((1, chunk), np.float32)])

    dev = np.asarray(
        _chunk_waveform(jnp.asarray(audio), n_rows, chunk)
    )
    np.testing.assert_array_equal(dev, host)


def test_transcribe_batched_device_gather_output_unchanged():
    """End-to-end: batched transcription over the device-gather path
    produces the same segments as before (vs a from-scratch engine run
    on a copy of the audio, which defeats the waveform cache)."""
    from whisper_nemo_tpu.engine.transcribe import WhisperEngine

    eng = WhisperEngine("tiny.en", compute_type="float32")
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal(16_000 * 3) * 0.1).astype(np.float32)

    segs1, _ = eng.transcribe_batched(
        audio, language="en", batch_size=2, max_new_tokens=8
    )
    segs2, _ = eng.transcribe_batched(
        audio.copy(), language="en", batch_size=2, max_new_tokens=8
    )
    assert [s.text for s in segs1] == [s.text for s in segs2]
    assert [s.tokens for s in segs1] == [s.tokens for s in segs2]


def test_clear_cache_runs_registered_hooks():
    """clear_cache() must also drop module-level jit caches registered
    by models (htdemucs pins executables + device constants otherwise;
    ADVICE r4)."""
    from whisper_nemo_tpu.audio import devcache

    calls = []
    devcache.register_clear_hook(lambda: calls.append(1))
    devcache.clear_cache()
    assert calls == [1]


def test_htdemucs_registers_apply_cache_clearer():
    from whisper_nemo_tpu.audio import devcache
    from whisper_nemo_tpu.models import htdemucs

    assert htdemucs.clear_apply_cache in devcache._clear_hooks
    # smoke: clearing with an empty cache is a no-op
    htdemucs.clear_apply_cache()
