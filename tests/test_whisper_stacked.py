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
