"""Numerical parity of the JAX Whisper against torch/transformers.

Random-weight torch models are converted to our param tree; encoder
features and decoder logits must agree to float32 tolerance. This is the
zero-egress stand-in for golden tests against hub checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_nemo_tpu.engine.weights import (
    convert_hf_whisper_state_dict,
    dims_from_hf_config,
)
from whisper_nemo_tpu.models.whisper import (
    WHISPER_DIMS,
    WhisperDims,
    cross_attention_kv,
    decode_step,
    decoder_forward,
    encode,
    init_kv_cache,
    init_whisper_params,
    sinusoids,
)


@pytest.fixture(scope="module")
def tiny_torch_whisper():
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(0)
    cfg = WhisperConfig(
        vocab_size=211,
        d_model=64,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=256,
        decoder_ffn_dim=256,
        num_mel_bins=80,
        max_source_positions=100,
        max_target_positions=50,
        pad_token_id=0,
        bos_token_id=0,
        eos_token_id=1,
        decoder_start_token_id=2,
    )
    model = WhisperForConditionalGeneration(cfg).eval()
    return model, cfg


def test_sinusoids_properties():
    # whisper's sinusoidal table: first half sin, second half cos; the
    # zeroth position is [0...0, 1...1]; values bounded by 1.
    pos = sinusoids(100, 64)
    assert pos.shape == (100, 64)
    np.testing.assert_allclose(pos[0, :32], 0.0, atol=1e-7)
    np.testing.assert_allclose(pos[0, 32:], 1.0, atol=1e-7)
    assert np.abs(pos).max() <= 1.0 + 1e-6
    # highest-frequency channel advances by ~1 radian per step
    np.testing.assert_allclose(pos[1, 0], np.sin(1.0), atol=1e-6)


def test_encoder_parity(tiny_torch_whisper):
    import torch

    model, cfg = tiny_torch_whisper
    dims = dims_from_hf_config(cfg)
    params = convert_hf_whisper_state_dict(model.state_dict(), dims)

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 80, 200), dtype=np.float32)

    with torch.no_grad():
        theirs = model.model.encoder(
            torch.from_numpy(mel)
        ).last_hidden_state.numpy()

    ours = np.asarray(encode(params, jnp.asarray(mel), dims))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_decoder_teacher_forced_parity(tiny_torch_whisper):
    import torch

    model, cfg = tiny_torch_whisper
    dims = dims_from_hf_config(cfg)
    params = convert_hf_whisper_state_dict(model.state_dict(), dims)

    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 80, 200), dtype=np.float32)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 7))

    with torch.no_grad():
        out = model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        )
        theirs = out.logits.numpy()

    audio = encode(params, jnp.asarray(mel), dims)
    ours = np.asarray(
        decoder_forward(params, jnp.asarray(tokens), audio, dims)
    )
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=3e-4)


def test_incremental_decode_matches_teacher_forced(tiny_torch_whisper):
    model, cfg = tiny_torch_whisper
    dims = dims_from_hf_config(cfg)
    params = convert_hf_whisper_state_dict(model.state_dict(), dims)

    rng = np.random.default_rng(3)
    mel = rng.standard_normal((1, 80, 200), dtype=np.float32)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 6))

    audio = encode(params, jnp.asarray(mel), dims)
    full = np.asarray(
        decoder_forward(params, jnp.asarray(tokens), audio, dims)
    )

    cross_kv = cross_attention_kv(params, audio, dims)
    cache = init_kv_cache(1, dims)
    step_logits = []
    for pos in range(tokens.shape[1]):
        logits, cache = decode_step(
            params,
            jnp.asarray(tokens[:, pos]),
            jnp.int32(pos),
            cache,
            cross_kv,
            dims,
        )
        step_logits.append(np.asarray(logits))
    stepwise = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(stepwise, full, atol=2e-4)


def test_init_params_shapes():
    dims = WhisperDims(n_vocab=100, n_text_ctx=32, n_audio_ctx=50)
    params = init_whisper_params(jax.random.PRNGKey(0), dims)
    assert params["encoder"]["conv1"]["w"].shape == (3, 80, 384)
    assert params["decoder"]["tok_emb"].shape == (100, 384)
    audio = encode(
        params, jnp.zeros((1, 80, 100)), dims
    )
    assert audio.shape == (1, 50, 384)


def test_model_family_table():
    assert WHISPER_DIMS["medium.en"].n_text_layer == 24
    assert WHISPER_DIMS["large-v3"].n_mels == 128
    assert WHISPER_DIMS["large-v3-turbo"].n_text_layer == 4
    assert WHISPER_DIMS["tiny.en"].n_vocab == 51864
