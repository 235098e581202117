import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_nemo_tpu.models.wav2vec2 import (
    Wav2Vec2Dims,
    convert_hf_wav2vec2_state_dict,
    ctc_logits,
    dims_from_hf_wav2vec2_config,
    init_wav2vec2_params,
)


@pytest.fixture(scope="module")
def tiny_torch_w2v2():
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

    torch.manual_seed(0)
    cfg = Wav2Vec2Config(
        vocab_size=32,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        conv_dim=(32, 32),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
        num_feat_extract_layers=2,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
    )
    return Wav2Vec2ForCTC(cfg).eval(), cfg


def test_ctc_logits_parity(tiny_torch_w2v2):
    import torch

    model, cfg = tiny_torch_w2v2
    dims = dims_from_hf_wav2vec2_config(cfg)
    params = convert_hf_wav2vec2_state_dict(model.state_dict(), dims)
    wave = np.random.default_rng(0).standard_normal((2, 4000)).astype(
        np.float32
    )
    with torch.no_grad():
        theirs = model(torch.from_numpy(wave)).logits.numpy()
    ours = np.asarray(ctc_logits(params, jnp.asarray(wave), dims))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_init_and_forward_shapes():
    dims = Wav2Vec2Dims(
        vocab_size=40,
        hidden_size=64,
        num_layers=1,
        num_heads=4,
        intermediate_size=128,
        conv_dim=(16, 16),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    params = init_wav2vec2_params(jax.random.PRNGKey(0), dims)
    out = ctc_logits(params, jnp.zeros((1, 3200)), dims)
    assert out.shape[0] == 1 and out.shape[2] == 40
    assert dims.total_stride == 10


def test_ctc_logits_parity_stable_layer_norm():
    """MMS/large layout: pre-LN encoder + per-conv-layer LayerNorm."""
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

    torch.manual_seed(1)
    cfg = Wav2Vec2Config(
        vocab_size=32,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        conv_dim=(32, 32),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
        num_feat_extract_layers=2,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        conv_bias=True,
    )
    model = Wav2Vec2ForCTC(cfg).eval()
    dims = dims_from_hf_wav2vec2_config(cfg)
    assert dims.do_stable_layer_norm
    params = convert_hf_wav2vec2_state_dict(model.state_dict(), dims)
    wave = np.random.default_rng(1).standard_normal((2, 4000)).astype(
        np.float32
    )
    with torch.no_grad():
        theirs = model(torch.from_numpy(wave)).logits.numpy()
    ours = np.asarray(ctc_logits(params, jnp.asarray(wave), dims))
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


@pytest.mark.parametrize("t_samples", [4000, 4001, 16000 * 3 + 7])
def test_feature_extractor_gemm_parity(t_samples):
    """The frame+GEMM frontend formulation is element-exact vs the
    conv formulation at the MMS conv spec (k/s = 10/5, 3/2, 2/2),
    including ragged lengths (VERDICT r4 next #5)."""
    from whisper_nemo_tpu.models.wav2vec2 import (
        feature_extractor,
        feature_extractor_gemm,
    )

    dims = Wav2Vec2Dims(
        vocab_size=32,
        hidden_size=64,
        num_layers=1,
        num_heads=4,
        intermediate_size=128,
        conv_dim=(24,) * 7,
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        do_stable_layer_norm=True,
    )
    params = init_wav2vec2_params(jax.random.PRNGKey(0), dims)
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, t_samples)),
        jnp.float32,
    )
    a = np.asarray(feature_extractor(params["fe"], wave, dims))
    b = np.asarray(feature_extractor_gemm(params["fe"], wave, dims))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_ctc_logits_frontend_env_switch(monkeypatch):
    """WNT_W2V2_FRONTEND=gemm routes ctc_logits through the GEMM
    frontend with identical results."""
    dims = Wav2Vec2Dims(
        vocab_size=32,
        hidden_size=64,
        num_layers=1,
        num_heads=4,
        intermediate_size=128,
        conv_dim=(24, 24),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
        do_stable_layer_norm=False,
    )
    params = init_wav2vec2_params(jax.random.PRNGKey(1), dims)
    wave = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 8000)), jnp.float32
    )
    monkeypatch.delenv("WNT_W2V2_FRONTEND", raising=False)
    ref = np.asarray(ctc_logits(params, wave, dims))
    monkeypatch.setenv("WNT_W2V2_FRONTEND", "gemm")
    got = np.asarray(ctc_logits(params, wave, dims))
    np.testing.assert_allclose(got, ref, atol=2e-5)
