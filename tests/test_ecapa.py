import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_nemo_tpu.models import ecapa


@pytest.fixture(scope="module")
def small_ecapa():
    dims = ecapa.EcapaDims(
        channels=32, agg_channels=48, res2net_scale=4,
        se_reduction=4, attn_hidden=16, emb_dim=24,
    )
    params = ecapa.init_ecapa_params(jax.random.PRNGKey(0), dims)
    return params, dims


def test_ecapa_shapes(small_ecapa):
    params, dims = small_ecapa
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, 120, 80)), jnp.float32
    )
    lengths = jnp.asarray([120, 90, 40])
    embs = np.asarray(ecapa.embed(params, feats, lengths, dims))
    assert embs.shape == (3, 24)
    assert np.isfinite(embs).all()


def test_ecapa_mask_invariance(small_ecapa):
    params, dims = small_ecapa
    rng = np.random.default_rng(1)
    base = rng.standard_normal((1, 80, 80)).astype(np.float32)
    padded = np.concatenate(
        [base, rng.standard_normal((1, 41, 80)).astype(np.float32)], axis=1
    )
    e1 = np.asarray(
        ecapa.embed(params, jnp.asarray(base), jnp.asarray([80]), dims)
    )
    e2 = np.asarray(
        ecapa.embed(params, jnp.asarray(padded), jnp.asarray([80]), dims)
    )
    np.testing.assert_allclose(e1, e2, atol=2e-3)


def test_pipeline_with_ecapa_backbone(tmp_path):
    from whisper_nemo_tpu.audio import write_wav
    from whisper_nemo_tpu.config import create_config
    from whisper_nemo_tpu.diarize import NeuralDiarizer

    cfg = create_config(str(tmp_path))
    cfg.diarizer.speaker_embeddings.model_path = "ecapa_tdnn"
    diar = NeuralDiarizer(cfg)
    rng = np.random.default_rng(2)
    audio = np.zeros(6 * 16000, np.float32)
    audio[16000:64000] = rng.standard_normal(48000).astype(np.float32) * 0.2
    turns = diar.diarize_waveform(audio)
    assert turns, "ecapa-backed diarization produced no turns"
    for s, e, spk in turns:
        assert e > s and spk >= 0
