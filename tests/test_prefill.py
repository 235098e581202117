"""Prefill must reproduce step-by-step prompt consumption exactly."""

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
    prefill_cache,
    quantize_cross_kv,
)


@pytest.fixture(scope="module")
def setup():
    dims = WhisperDims(
        n_audio_ctx=32, n_audio_layer=1, n_text_layer=2,
        n_audio_state=64, n_text_state=64, n_audio_head=4, n_text_head=4,
        n_vocab=512, n_text_ctx=24,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), dims)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 80, 64)), jnp.float32
    )
    audio = encode(params, mel, dims)
    return params, dims, audio


@pytest.mark.parametrize("quantize", [False, True])
def test_prefill_matches_stepwise(setup, quantize):
    params, dims, audio = setup
    cross = cross_attention_kv(params, audio, dims)
    if quantize:
        cross = quantize_cross_kv(cross)
    prompt = jnp.asarray(
        np.random.default_rng(1).integers(0, 512, size=(2, 5)), jnp.int32
    )

    # stepwise reference
    cache_ref = init_kv_cache(2, dims)
    for pos in range(5):
        logits_ref, cache_ref = decode_step(
            params, prompt[:, pos], jnp.int32(pos), cache_ref, cross, dims
        )

    from whisper_nemo_tpu.models.whisper import _vocab_logits

    cache_pf = init_kv_cache(2, dims)
    x_pf, cache_pf = prefill_cache(
        params, prompt, cache_pf, cross, dims
    )
    logits_pf = _vocab_logits(params["decoder"], x_pf[:, -1, :])

    np.testing.assert_allclose(
        np.asarray(logits_pf), np.asarray(logits_ref), rtol=1e-5, atol=1e-4
    )
    for lr, lp in zip(cache_ref, cache_pf):
        np.testing.assert_allclose(
            np.asarray(lr["k"])[:, :5], np.asarray(lp["k"])[:, :5],
            rtol=1e-5, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(lr["v"])[:, :5], np.asarray(lp["v"])[:, :5],
            rtol=1e-5, atol=1e-4,
        )


def test_prefill_with_padded_conditioning(setup):
    """Left-padded prompt through prefill == unpadded prefill."""
    params, dims, audio = setup
    cross = cross_attention_kv(params, audio, dims)
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.integers(0, 512, size=(2, 4)), jnp.int32)

    from whisper_nemo_tpu.models.whisper import _vocab_logits

    x_plain, _ = prefill_cache(
        params, prompt, init_kv_cache(2, dims), cross, dims
    )
    logits_plain = _vocab_logits(params["decoder"], x_plain[:, -1, :])

    pad = jnp.full((2, 3), 7, jnp.int32)
    padded = jnp.concatenate([pad, prompt], axis=1)
    kv_valid = jnp.concatenate(
        [
            jnp.zeros((2, 3), bool),
            jnp.ones((2, dims.n_text_ctx - 3), bool),
        ],
        axis=1,
    )
    pos_offset = jnp.full((2,), 3, jnp.int32)
    x_padded, _ = prefill_cache(
        params, padded, init_kv_cache(2, dims), cross, dims,
        kv_valid=kv_valid, pos_offset=pos_offset,
    )
    logits_padded = _vocab_logits(params["decoder"], x_padded[:, -1, :])
    np.testing.assert_allclose(
        np.asarray(logits_padded), np.asarray(logits_plain),
        rtol=1e-5, atol=1e-4,
    )
