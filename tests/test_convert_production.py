"""Converter readiness drill at PRODUCTION checkpoint dims.

The four converters (whisper, aligner, NeMo, pyannote, demucs) were
exercised at toy dims elsewhere; the released checkpoints' real shapes
are exactly where layout mistakes hide (large-v3's 128 mel bins and
51,866-token vocab, MMS-300M's pre-LN stable-layer-norm stack,
titanet-large's 1024-channel SE blocks, pyannote segmentation's
4-layer LSTM). Zero-egress, so each test synthesizes a random torch
state dict at the production shape, runs the real converter, loads the
result through the framework loader, and checks forward parity on a
short input (production widths, short sequences — the 1-core host
budget). Reference install contract: weights-by-name loading,
/root/reference/helpers.py:280-301; model sources diarize.py:121,154,
main.py:110,117.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

torch.manual_seed(0)


def _fill_random(model: torch.nn.Module, std: float = 0.02) -> torch.nn.Module:
    """Vectorized random fill for a no-init-constructed model (module
    _init_weights on 1.5B params measured 106 s on this host; this
    takes seconds). Keeps BN running_var positive."""
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim == 1 and name.endswith(".weight"):
                # norm gammas: near 1, not near 0 — N(0, 0.02) gammas
                # collapse every normalized activation to noise scale,
                # an ill-conditioned regime real checkpoints never
                # occupy
                p.data.uniform_(0.8, 1.2)
            else:
                p.data.normal_(0.0, std)
        for name, b in model.named_buffers():
            if not b.dtype.is_floating_point:
                continue
            if "running_var" in name:
                b.data.uniform_(0.5, 1.5)
            else:
                b.data.normal_(0.0, std)
    return model.eval()


def _no_init(ctor):
    from transformers.modeling_utils import no_init_weights

    with no_init_weights():
        model = ctor()
    # no_init_weights skips weight TYING too (whisper's proj_out must
    # share decoder.embed_tokens, like the released checkpoints)
    model.tie_weights()
    return _fill_random(model)


# ---------------------------------------------------------------------------
# Whisper large-v3 (reference diarize.py:121 / main.py:110 model source)
# ---------------------------------------------------------------------------


def test_whisper_large_v3_roundtrip(tmp_path, monkeypatch):
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    from convert_checkpoint import convert_whisper
    from whisper_nemo_tpu.engine.checkpoint import load_params
    from whisper_nemo_tpu.engine.weights import dims_from_hf_config
    from whisper_nemo_tpu.models.whisper import decoder_forward, encode

    cfg = WhisperConfig(
        vocab_size=51866,
        d_model=1280,
        encoder_layers=32,
        decoder_layers=32,
        encoder_attention_heads=20,
        decoder_attention_heads=20,
        encoder_ffn_dim=5120,
        decoder_ffn_dim=5120,
        num_mel_bins=128,
        max_source_positions=1500,
        max_target_positions=448,
        pad_token_id=50256,
        decoder_start_token_id=50258,
    )
    model = _no_init(lambda: WhisperForConditionalGeneration(cfg))

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    from safetensors.torch import save_model

    save_model(model, str(hf_dir / "model.safetensors"))
    cfg.to_json_file(str(hf_dir / "config.json"))

    out_dir = tmp_path / "cache"
    out_dir.mkdir()
    out = convert_whisper(str(hf_dir), "large-v3", str(out_dir))
    assert out.endswith("large-v3.npz")

    dims = dims_from_hf_config(cfg)
    # the large-v3 shape pins: these are what distinguish it from v2
    assert dims.n_mels == 128
    assert dims.n_vocab == 51866
    assert dims.n_audio_layer == 32 and dims.n_text_layer == 32
    assert dims.n_audio_state == 1280

    params = load_params(out)

    mel = np.random.default_rng(0).standard_normal((1, 128, 3000)).astype(
        np.float32
    )
    with torch.no_grad():
        enc_ref = model.model.encoder(
            torch.from_numpy(mel)
        ).last_hidden_state.numpy()
    enc_ours = np.asarray(encode(params, jnp.asarray(mel), dims))
    np.testing.assert_allclose(enc_ours, enc_ref, atol=5e-3)

    # decoder parity in isolation: both decoders consume HF's encoder
    # output, so the comparison pins the decoder conversion alone (the
    # ~1e-3 f32 accumulation-order drift between the two encoders at
    # 1280x32 scale would otherwise amplify through 32 more layers)
    tokens = np.array([[50258, 50259, 50360, 50365]], np.int64)
    with torch.no_grad():
        dec_ref = (
            model.proj_out(
                model.model.decoder(
                    input_ids=torch.from_numpy(tokens),
                    encoder_hidden_states=torch.from_numpy(enc_ref),
                ).last_hidden_state
            )
            .numpy()
        )
    dec_ours = np.asarray(
        decoder_forward(
            params, jnp.asarray(tokens, jnp.int32), jnp.asarray(enc_ref),
            dims,
        )
    )
    np.testing.assert_allclose(dec_ours, dec_ref, atol=5e-3)


# ---------------------------------------------------------------------------
# MMS-300M CTC aligner (reference diarize.py:154-157 model source)
# ---------------------------------------------------------------------------


def test_aligner_mms_300m_roundtrip(tmp_path):
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

    from convert_checkpoint import convert_aligner
    from whisper_nemo_tpu.engine.checkpoint import load_params
    from whisper_nemo_tpu.models.wav2vec2 import (
        ctc_logits,
        dims_from_hf_wav2vec2_config,
    )

    cfg = Wav2Vec2Config(
        vocab_size=31,
        hidden_size=1024,
        num_hidden_layers=24,
        num_attention_heads=16,
        intermediate_size=4096,
        conv_dim=(512,) * 7,
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        num_feat_extract_layers=7,
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        do_stable_layer_norm=True,  # the MMS/large variant's layout
        feat_extract_norm="layer",
    )
    model = _no_init(lambda: Wav2Vec2ForCTC(cfg))

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    from safetensors.torch import save_model

    save_model(model, str(hf_dir / "model.safetensors"))
    cfg.to_json_file(str(hf_dir / "config.json"))

    out_dir = tmp_path / "cache"
    out_dir.mkdir()
    out = convert_aligner(str(hf_dir), str(out_dir))
    assert out.endswith("ctc_aligner.npz")

    dims = dims_from_hf_wav2vec2_config(cfg)
    assert dims.hidden_size == 1024 and dims.num_layers == 24
    assert dims.do_stable_layer_norm

    params = load_params(out)
    wave = (
        np.random.default_rng(1).standard_normal((1, 16000)) * 0.1
    ).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(wave)).logits.numpy()
    ours = np.asarray(ctc_logits(params, jnp.asarray(wave), dims))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3)


# ---------------------------------------------------------------------------
# titanet-large .nemo (reference helpers.py:280-281 model source)
# ---------------------------------------------------------------------------

_TITANET_LARGE_CFGS = None


def _titanet_large_cfgs():
    """The released titanet_large block spec (matches
    models/titanet.TitaNetDims: 1024-channel separable blocks with
    SE-16, 3072-channel epilogue, attention 128, embedding 192)."""
    from whisper_nemo_tpu.models.conv_asr import JasperBlockCfg

    return [
        JasperBlockCfg(filters=1024, repeat=1, kernel=3, separable=True),
        JasperBlockCfg(filters=1024, repeat=3, kernel=7, separable=True,
                       residual=True, se=True, se_reduction=16),
        JasperBlockCfg(filters=1024, repeat=3, kernel=11, separable=True,
                       residual=True, se=True, se_reduction=16),
        JasperBlockCfg(filters=1024, repeat=3, kernel=15, separable=True,
                       residual=True, se=True, se_reduction=16),
        JasperBlockCfg(filters=3072, repeat=1, kernel=1),
    ]


def test_titanet_large_roundtrip(tmp_path):
    from test_nemo_convert import (
        _Encoder,
        _SpkDecoderTorch,
        _fake_nemo,
        _jasper_yaml,
    )

    from whisper_nemo_tpu.engine import nemo_weights as nw
    from whisper_nemo_tpu.models import conv_asr

    cfgs = _titanet_large_cfgs()
    n_mels, attn, emb = 80, 128, 192

    class _Titanet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = _Encoder(n_mels, cfgs)
            self.decoder = _SpkDecoderTorch(cfgs[-1].filters, attn, emb)

        def forward(self, x):
            return self.decoder(self.encoder(x))

    model = _Titanet().eval()
    config = {
        "preprocessor": {"features": n_mels},
        "encoder": _jasper_yaml(cfgs),
        "decoder": {"attention_channels": attn, "emb_sizes": emb},
    }
    path = _fake_nemo(tmp_path, config, model)
    cfg_out, sd = nw.extract_nemo(path)
    got_cfgs, params, meta = nw.convert_titanet(cfg_out, sd)
    assert meta["emb_dim"] == 192
    assert [c.filters for c in got_cfgs] == [1024, 1024, 1024, 1024, 3072]

    x = np.random.default_rng(2).standard_normal((1, 120, n_mels)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = model(torch.from_numpy(x).transpose(1, 2))
    got = conv_asr.speaker_embed(
        params, got_cfgs, jnp.asarray(x), jnp.asarray([120])
    )
    assert got.shape == (1, 192)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=3e-3)


# ---------------------------------------------------------------------------
# MSDD at diar_msdd_telephonic dims (reference helpers.py:299-301)
# ---------------------------------------------------------------------------


def test_msdd_production_dims_roundtrip():
    from whisper_nemo_tpu.engine import nemo_weights as nw
    from whisper_nemo_tpu.models import msdd as msdd_mod
    from whisper_nemo_tpu.models.msdd import MsddDims

    dims = MsddDims()  # n_scales 5, emb 192, hidden 256, proj 96
    lstm = torch.nn.LSTM(
        dims.proj, dims.hidden, batch_first=True, bidirectional=True
    ).eval()
    proj = torch.nn.Linear(2 * dims.hidden, 2)
    sd = {f"msdd.lstm.{k}": v.numpy() for k, v in lstm.state_dict().items()}
    sd["msdd.hidden_to_spks.weight"] = proj.weight.detach().numpy()
    sd["msdd.hidden_to_spks.bias"] = proj.bias.detach().numpy()

    params, meta, unmapped = nw.convert_msdd({}, sd)
    assert meta["hidden"] == 256
    assert unmapped == []

    x = np.random.default_rng(3).standard_normal((2, 50, dims.proj)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = proj(lstm(torch.from_numpy(x))[0])
    got = msdd_mod.msdd_logits(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=5e-4)


# ---------------------------------------------------------------------------
# pyannote segmentation-3.0 PyanNet (reference main.py:116-119)
# ---------------------------------------------------------------------------


def test_pyannet_production_dims_roundtrip():
    import test_pyannote_convert as tpc

    from whisper_nemo_tpu.engine import pyannote_weights as pw
    from whisper_nemo_tpu.models import pyannet

    # segmentation-3.0's real head: 80 sinc filters (already the test
    # default), LSTM hidden 128 x 4 bidirectional layers, 7 powerset
    # classes
    old_h = tpc._H
    tpc._H = 128
    try:
        model = tpc._PyanNet(n_classes=7, layers=4).eval()
    finally:
        tpc._H = old_h

    params = pw.convert_pyannet(
        {k: v.detach().numpy() for k, v in model.state_dict().items()}
    )
    wav = (
        np.random.default_rng(4).standard_normal((1, 32000)) * 0.3
    ).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(wav)[:, None, :])
    got = pyannet.frame_logits(params, jnp.asarray(wav))
    assert got.shape == tuple(ref.shape)
    assert got.shape[-1] == 7
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-3)


# ---------------------------------------------------------------------------
# htdemucs at production dims (reference diarize.py:98-100 model source)
# ---------------------------------------------------------------------------


def test_htdemucs_production_dims_roundtrip():
    """Converter round-trip at the released htdemucs architecture
    (default HTDemucsDims IS the production config): every production
    tensor maps by name, dims inference recovers the architecture, and
    the mapped arrays are exact."""
    from convert_demucs import convert_state_dict
    from test_htdemucs import _to_torch_names

    from whisper_nemo_tpu.engine.checkpoint import flatten_tree
    from whisper_nemo_tpu.models.htdemucs import (
        HTDemucsDims,
        init_htdemucs_params,
    )

    dims = HTDemucsDims()
    params = init_htdemucs_params(jax.random.PRNGKey(0), dims)
    flat = flatten_tree(params)
    sd = _to_torch_names(flat)

    converted, got_dims = convert_state_dict(sd)
    assert got_dims.channels == dims.channels
    assert got_dims.depth == dims.depth
    assert got_dims.nfft == dims.nfft
    assert got_dims.t_layers == dims.t_layers
    assert got_dims.sources == dims.sources
    assert set(converted) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(converted[k], np.asarray(flat[k]))
