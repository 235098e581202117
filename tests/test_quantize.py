import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_nemo_tpu.engine.quantize import (
    quantize_linear,
    quantize_whisper_params,
)
from whisper_nemo_tpu.models.whisper import (
    WhisperDims,
    decoder_forward,
    encode,
    init_whisper_params,
)


def test_quantize_linear_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    q = quantize_linear(w)
    assert q["w_q"].dtype == jnp.int8
    deq = np.asarray(q["w_q"], np.float32) * np.asarray(q["scale"])
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01  # int8 per-channel: <1% of the channel max


def test_quantize_zero_column_safe():
    w = np.zeros((8, 4), np.float32)
    q = quantize_linear(w)
    assert np.asarray(q["w_q"]).max() == 0
    assert np.isfinite(np.asarray(q["scale"])).all()


@pytest.fixture(scope="module")
def tiny_model():
    dims = WhisperDims(
        n_audio_ctx=32, n_audio_layer=2, n_text_layer=2,
        n_audio_state=64, n_text_state=64, n_audio_head=4, n_text_head=4,
        n_vocab=512, n_text_ctx=16,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), dims)
    return params, dims


def test_quantized_forward_close_to_fp32(tiny_model):
    params, dims = tiny_model
    qparams = quantize_whisper_params(params)

    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((1, 80, 64)), jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 512, (1, 5)))

    audio_f = encode(params, mel, dims)
    audio_q = encode(qparams, mel, dims)
    # encoder features stay highly correlated
    corr = np.corrcoef(
        np.asarray(audio_f).ravel(), np.asarray(audio_q).ravel()
    )[0, 1]
    assert corr > 0.99

    logits_f = np.asarray(decoder_forward(params, tokens, audio_f, dims))
    logits_q = np.asarray(decoder_forward(qparams, tokens, audio_q, dims))
    corr = np.corrcoef(logits_f.ravel(), logits_q.ravel())[0, 1]
    assert corr > 0.99
    # greedy choices mostly agree
    agree = (
        logits_f.argmax(-1) == logits_q.argmax(-1)
    ).mean()
    assert agree >= 0.6


def test_engine_int8_compute_type(tiny_model):
    from whisper_nemo_tpu.engine.transcribe import WhisperEngine
    from whisper_nemo_tpu.text.tokenizer import WhisperTokenizer

    params, dims = tiny_model
    dims_full = WhisperDims(
        n_audio_layer=1, n_text_layer=1, n_audio_state=64, n_text_state=64,
        n_audio_head=4, n_text_head=4, n_vocab=51865, n_text_ctx=32,
    )
    params_full = init_whisper_params(jax.random.PRNGKey(2), dims_full)
    eng = WhisperEngine(
        "tiny", compute_type="int8", params=params_full, dims=dims_full,
        tokenizer=WhisperTokenizer.byte_fallback(),
    )
    # quantized param tree reached the engine
    assert "out_proj_q" in eng.params["decoder"]
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    segments, info = eng.transcribe_batched(audio, language="en", batch_size=1)
    assert isinstance(segments, list)
