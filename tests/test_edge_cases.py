"""Hardening: degenerate inputs through the public surfaces."""

import io

import numpy as np
import pytest

import jax

from whisper_nemo_tpu.engine.transcribe import WhisperEngine
from whisper_nemo_tpu.models.whisper import WhisperDims, init_whisper_params
from whisper_nemo_tpu.post import (
    get_sentences_speaker_mapping,
    get_words_speaker_mapping,
    write_srt,
)
from whisper_nemo_tpu.text.tokenizer import WhisperTokenizer


@pytest.fixture(scope="module")
def engine():
    dims = WhisperDims(
        n_audio_ctx=1500, n_audio_layer=1, n_text_layer=1,
        n_audio_state=64, n_text_state=64, n_audio_head=4, n_text_head=4,
        n_vocab=51865, n_text_ctx=96,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), dims)
    return WhisperEngine(
        "tiny", params=params, dims=dims,
        tokenizer=WhisperTokenizer.byte_fallback(),
    )


def test_batched_on_silence(engine):
    silence = np.zeros(3 * 16000, np.float32)
    segments, info = engine.transcribe_batched(
        silence, language="en", batch_size=1, max_new_tokens=4
    )
    assert info.duration == pytest.approx(3.0)
    assert isinstance(segments, list)  # VAD falls back to one window


def test_batched_on_tiny_audio(engine):
    blip = (np.random.default_rng(0).standard_normal(800) * 0.3).astype(
        np.float32
    )  # 50 ms
    segments, info = engine.transcribe_batched(
        blip, language="en", batch_size=1, max_new_tokens=4
    )
    assert info.duration == pytest.approx(0.05)


def test_sequential_on_short_audio(engine):
    short = (np.random.default_rng(1).standard_normal(4000) * 0.2).astype(
        np.float32
    )
    segments, info = engine.transcribe_sequential(
        short, language="en", temperatures=(0.0,), without_timestamps=True
    )
    assert info.duration == pytest.approx(0.25)


def test_unicode_through_writers():
    words = [
        {"text": "héllo", "start": 0.0, "end": 0.4},
        {"text": "wörld", "start": 0.5, "end": 0.9},
        {"text": "日本語。", "start": 1.0, "end": 1.5},
    ]
    turns = [[0, 2000, 0]]
    wsm = get_words_speaker_mapping(words, turns, "start")
    ssm = get_sentences_speaker_mapping(wsm, turns)
    buf = io.StringIO()
    write_srt(ssm, buf)
    out = buf.getvalue()
    assert "héllo" in out and "日本語。" in out


def test_beam_with_timestamps(engine):
    """Beam search under the timestamp grammar must produce monotone
    timestamp tokens."""
    from whisper_nemo_tpu.engine.decode import (
        beam_decode, build_suppress_mask,
    )
    import jax.numpy as jnp

    audio = (np.random.default_rng(2).standard_normal(16000) * 0.2).astype(
        np.float32
    )
    feats = engine.encode_windows(engine.mel_window(audio)[None])
    tok = engine.tokenizer
    prompt = jnp.asarray([tok.sot_sequence("en", without_timestamps=False)],
                         jnp.int32)
    opts = engine._make_opts(without_timestamps=False, max_new_tokens=16)
    mask = jnp.asarray(build_suppress_mask(engine.dims.n_vocab, []))
    tokens, lengths, *_ = beam_decode(
        engine.params, feats, prompt, mask, engine.dims, opts,
        n_prompt=3, beam_size=3,
    )
    gen = np.asarray(tokens)[0, 3 : 3 + int(lengths[0])]
    ts = [t for t in gen if t >= tok.timestamp_begin]
    assert ts == sorted(ts), "timestamps must be non-decreasing"
    if len(gen) > 0:
        assert gen[0] >= tok.timestamp_begin, "first token must be a timestamp"
