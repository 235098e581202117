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


def test_w8a8_linear_matches_f32():
    """The int8-MXU encoder linear (dynamic per-row activation quant +
    int8×int8 dot) stays within combined-quantization error of the f32
    matmul."""
    from whisper_nemo_tpu.models.whisper import _linear

    rng = np.random.default_rng(2)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    b = rng.standard_normal((32,)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((4, 10, 64)), jnp.float32)
    q = quantize_linear(w)
    p = {"w_qm": q["w_q"], "scale": q["scale"], "b": jnp.asarray(b)}
    got = np.asarray(_linear(p, x))
    ref = np.asarray(x) @ w + b
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel
    assert got.dtype == np.float32  # epilogue returns the input dtype


def test_quantize_encoder_mxu_keys(tiny_model):
    params, _ = tiny_model
    qp = quantize_whisper_params(params, encoder_mxu=True)
    enc_lin = qp["encoder"]["blocks"][0]["mlp_in"]
    dec_blk = qp["decoder"]["blocks"][0]
    assert "w_qm" in enc_lin and "w_q" not in enc_lin
    # the step loop stays weight-only dequant (DMA-bound)...
    assert "w_q" in dec_blk["mlp_in"]
    assert "w_q" in dec_blk["cross_attn"]["q"]
    # ...but the per-window cross-KV prefill (compute-bound) rides MXU
    assert "w_qm" in dec_blk["cross_attn"]["k"]
    assert "w_qm" in dec_blk["cross_attn"]["v"]
    qp_off = quantize_whisper_params(params, encoder_mxu=False)
    assert "w_q" in qp_off["encoder"]["blocks"][0]["mlp_in"]
    assert "w_q" in qp_off["decoder"]["blocks"][0]["cross_attn"]["k"]


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


def test_int8_cross_kv_decode_close_to_fp(tiny_model):
    """int8 cross-attention KV: greedy tokens should largely agree with
    the full-precision path on the same features."""
    import jax.numpy as jnp

    from whisper_nemo_tpu.engine.decode import (
        DecodeOptions,
        build_suppress_mask,
        greedy_decode,
    )
    from whisper_nemo_tpu.text.tokenizer import WhisperTokenizer

    params, dims = tiny_model
    dims = WhisperDims(
        n_audio_ctx=32, n_audio_layer=2, n_text_layer=2,
        n_audio_state=64, n_text_state=64, n_audio_head=4, n_text_head=4,
        n_vocab=51865, n_text_ctx=64,
    )
    params = init_whisper_params(jax.random.PRNGKey(1), dims)
    tok = WhisperTokenizer.byte_fallback()
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 80, 64)), jnp.float32)
    feats = encode(params, mel, dims)
    prompt = jnp.asarray([tok.sot_sequence("en")], jnp.int32)
    opts = DecodeOptions(
        max_new_tokens=24, eot=tok.eot, sot=tok.sot,
        no_speech=tok.no_speech, no_timestamps=tok.no_timestamps,
        timestamp_begin=tok.timestamp_begin,
    )
    mask = jnp.asarray(build_suppress_mask(dims.n_vocab, []))
    t_fp, l_fp, *_ = greedy_decode(
        params, feats, prompt, mask, dims, opts, n_prompt=4, kv_int8=False
    )
    t_q, l_q, *_ = greedy_decode(
        params, feats, prompt, mask, dims, opts, n_prompt=4, kv_int8=True
    )
    a = np.asarray(t_fp)[0, 4:]
    b = np.asarray(t_q)[0, 4:]
    agree = (a == b).mean()
    assert agree > 0.5, f"int8 KV diverged too much: {agree}"
