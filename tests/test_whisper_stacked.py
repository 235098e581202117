"""Layer-stacked decode must match the unrolled decoder exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_nemo_tpu.models.whisper import (
    WhisperDims,
    cross_attention_kv,
    decode_step,
    encode,
    init_kv_cache,
    init_whisper_params,
    quantize_cross_kv,
)
from whisper_nemo_tpu.models.whisper_stacked import (
    decode_step_stacked,
    init_stacked_cache,
    stack_cross_kv,
    stack_decoder_blocks,
)


@pytest.fixture(scope="module")
def setup():
    dims = WhisperDims(
        n_audio_ctx=32, n_audio_layer=1, n_text_layer=3,
        n_audio_state=64, n_text_state=64, n_audio_head=4, n_text_head=4,
        n_vocab=512, n_text_ctx=16,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), dims)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 80, 64)), jnp.float32
    )
    audio = encode(params, mel, dims)
    return params, dims, audio


@pytest.mark.parametrize("quantize", [False, True])
def test_stacked_matches_unrolled(setup, quantize):
    params, dims, audio = setup
    cross = cross_attention_kv(params, audio, dims)
    if quantize:
        cross = quantize_cross_kv(cross)

    stacked_params = stack_decoder_blocks(params)
    stacked_cross = stack_cross_kv(cross)

    cache_u = init_kv_cache(2, dims)
    cache_s = init_stacked_cache(2, dims)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 512, size=(2, 6))
    for pos in range(6):
        tok = jnp.asarray(tokens[:, pos])
        lu, cache_u = decode_step(
            params, tok, jnp.int32(pos), cache_u, cross, dims
        )
        ls, cache_s = decode_step_stacked(
            stacked_params, tok, jnp.int32(pos), cache_s, stacked_cross, dims
        )
        np.testing.assert_allclose(
            np.asarray(lu), np.asarray(ls), rtol=1e-5, atol=1e-4
        )


def test_stacked_tree_shapes(setup):
    params, dims, _ = setup
    stacked = stack_decoder_blocks(params)
    blk = stacked["decoder"]["blocks_stacked"]
    assert blk["attn"]["q"]["w"].shape[0] == dims.n_text_layer
    assert "blocks" not in stacked["decoder"]
    # encoder untouched
    assert stacked["encoder"] is params["encoder"]


def test_prefix_buckets_cross_128_parity():
    """cache_len > 128 activates the lax.switch prefix buckets in the
    stacked decode (whisper_stacked._self_attention_prefix); a decode
    running past position 128 must produce exactly the tokens of the
    unrolled decoder (which always attends over the full window) —
    greedy AND beam, with n_vocab large enough for whisper's special
    ids so min_new_tokens EOT-suppression keeps the loop running
    across the bucket boundary."""
    from whisper_nemo_tpu.engine.decode import (
        DecodeOptions,
        beam_decode,
        greedy_decode,
    )

    dims = WhisperDims(
        n_audio_ctx=32, n_audio_layer=1, n_text_layer=2,
        n_audio_state=64, n_text_state=64, n_audio_head=4, n_text_head=4,
        n_vocab=51865, n_text_ctx=384,
    )
    params = init_whisper_params(jax.random.PRNGKey(1), dims)
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 80, 64)), jnp.float32
    )
    audio = encode(params, mel, dims)
    stacked = stack_decoder_blocks(params)

    prompt = jnp.tile(
        jnp.asarray([[50258, 50259, 50359, 50363]], jnp.int32), (2, 1)
    )
    suppress = jnp.zeros((dims.n_vocab,), jnp.float32)
    # 140 generated tokens -> cache_len 256, positions cross the
    # 128-boundary mid-decode (bucket switch 128 -> 256)
    opts = DecodeOptions(
        max_new_tokens=140, min_new_tokens=136, self_prefix_buckets=True
    )

    tok_u, len_u, lp_u, _ = greedy_decode(
        params, audio, prompt, suppress, dims, opts, n_prompt=4
    )
    tok_s, len_s, lp_s, _ = greedy_decode(
        stacked, audio, prompt, suppress, dims, opts, n_prompt=4
    )
    assert int(len_u[0]) > 128 - 4  # the decode actually crossed 128
    np.testing.assert_array_equal(np.asarray(tok_u), np.asarray(tok_s))
    np.testing.assert_array_equal(np.asarray(len_u), np.asarray(len_s))

    btok_u, blen_u, *_ = beam_decode(
        params, audio, prompt, suppress, dims, opts, n_prompt=4,
        beam_size=2,
    )
    btok_s, blen_s, *_ = beam_decode(
        stacked, audio, prompt, suppress, dims, opts, n_prompt=4,
        beam_size=2,
    )
    np.testing.assert_array_equal(np.asarray(btok_u), np.asarray(btok_s))
    np.testing.assert_array_equal(np.asarray(blen_u), np.asarray(blen_s))


@pytest.mark.parametrize("beam", [False, True])
def test_self_kv_int8_decode_close_to_float(setup, beam):
    """The int8 self-KV cache (WNT_SELF_KV_INT8) wires through prefill
    + decode steps (greedy mask path and beam ancestry path) and stays
    numerically close to the float cache — per-position int8 over D
    carries ~0.4% relative error, so decode logits agree to ~1e-2."""
    from whisper_nemo_tpu.engine.decode import DecodeOptions

    params, dims, audio = setup
    stacked = stack_decoder_blocks(params)
    prompt = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    suppress = jnp.zeros((dims.n_vocab,), jnp.float32)
    opts = DecodeOptions(
        max_new_tokens=8, min_new_tokens=8, eot=0, sot=1, no_speech=2,
        no_timestamps=3, timestamp_begin=4, blank_token=5,
    )
    from whisper_nemo_tpu.engine.decode import beam_decode, greedy_decode

    fn = beam_decode if beam else greedy_decode
    kw = {"beam_size": 2} if beam else {}
    tok_f, len_f, lp_f, _ = fn(
        stacked, audio, prompt, suppress, dims, opts, n_prompt=2, **kw
    )
    tok_q, len_q, lp_q, _ = fn(
        stacked, audio, prompt, suppress, dims, opts, n_prompt=2,
        self_kv_int8=True, **kw
    )
    assert tok_q.shape == tok_f.shape
    assert np.all(np.asarray(len_q) == 8)
    # cumulative logprob of the full rollout within quantization noise
    np.testing.assert_allclose(
        np.asarray(lp_q), np.asarray(lp_f), rtol=0.05, atol=0.05
    )


@pytest.mark.parametrize("layer_chunk", [1, 2, 3])
@pytest.mark.parametrize("quantized_weights", [False, True])
def test_fused_decode_layout_matches_two_step(
    setup, layer_chunk, quantized_weights
):
    """cross_kv_decode_layout_fused (layer-chunked lax.map, the
    HBM-bounded prefill that large-v3 b32 requires) is bit-identical
    to the two-step cross_attention_kv_stacked →
    quantize_cross_kv_decode_layout form, for every chunking and for
    bf16 / int8-weight projections."""
    from whisper_nemo_tpu.engine.quantize import quantize_whisper_params
    from whisper_nemo_tpu.models.whisper_stacked import (
        cross_attention_kv_stacked,
        cross_kv_decode_layout_fused,
        quantize_cross_kv_decode_layout,
    )

    params, dims, audio = setup
    if quantized_weights:
        params = quantize_whisper_params(params)
    stacked = stack_decoder_blocks(params)

    ref = quantize_cross_kv_decode_layout(
        cross_attention_kv_stacked(stacked, audio, dims)
    )
    got = cross_kv_decode_layout_fused(
        stacked, audio, dims, layer_chunk=layer_chunk
    )
    assert got["_k_len"] == ref["_k_len"] == audio.shape[1]
    assert got["_bits"] == 8
    np.testing.assert_array_equal(
        np.asarray(got["kv_dec"]), np.asarray(ref["kv_dec"])
    )
    # scales agree to 1 ulp (XLA fuses the amax reduction differently
    # inside lax.map); the int8 values above are bit-identical
    np.testing.assert_allclose(
        np.asarray(got["k_dec_scale"]), np.asarray(ref["k_dec_scale"]),
        rtol=2e-7,
    )
    np.testing.assert_allclose(
        np.asarray(got["v_dec_scale"]), np.asarray(ref["v_dec_scale"]),
        rtol=2e-7,
    )
