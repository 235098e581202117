"""Parity tests for the .nemo → conv_asr/msdd converters.

Zero-egress: real archives can't be fetched, so these tests build torch
modules whose state-dict key layout matches NeMo's (MaskedConv1d wraps
the conv as ``.conv``, bare BatchNorm1d entries inside ``mconv``,
``fc``-style squeeze-excite, ``res.0`` residual projections — the
layout ``engine/nemo_weights.py`` documents), run the converter over
their state dicts, and require the JAX forward to match the torch
forward. That covers the converter's real risk surface: weight-layout
transposes, batch-norm folding, gate ordering.
"""

import io
import json
import tarfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from whisper_nemo_tpu.engine import nemo_weights as nw
from whisper_nemo_tpu.models import conv_asr
from whisper_nemo_tpu.models.conv_asr import JasperBlockCfg

torch.manual_seed(0)


def _randomize_bn(bn: nn.BatchNorm1d) -> None:
    with torch.no_grad():
        bn.weight.copy_(torch.rand_like(bn.weight) + 0.5)
        bn.bias.copy_(torch.randn_like(bn.bias) * 0.1)
        bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.2)
        bn.running_var.copy_(torch.rand_like(bn.running_var) + 0.5)


class _MaskedConv(nn.Module):
    """NeMo MaskedConv1d key layout: the torch conv lives at ``.conv``."""

    def __init__(self, c_in, c_out, k, dilation=1, groups=1, bias=False):
        super().__init__()
        self.conv = nn.Conv1d(
            c_in, c_out, k, padding=dilation * (k - 1) // 2,
            dilation=dilation, groups=groups, bias=bias,
        )

    def forward(self, x):
        return self.conv(x)


class _SE(nn.Module):
    """NeMo SqueezeExcite: global average pool + bias-free fc bottleneck."""

    def __init__(self, c, reduction):
        super().__init__()
        self.fc = nn.Sequential(
            nn.Linear(c, c // reduction, bias=False),
            nn.ReLU(),
            nn.Linear(c // reduction, c, bias=False),
        )

    def forward(self, x):  # [B, C, T]
        gate = torch.sigmoid(self.fc(x.mean(-1)))
        return x * gate[:, :, None]


class _Block(nn.Module):
    """One JasperBlock: flat ``mconv`` list (convs, bare BNs, paramless
    activations), optional SE at the tail, ``res.0`` projection."""

    def __init__(self, c_in, cfg: JasperBlockCfg, conv_bias=False):
        super().__init__()
        mods = []
        c = c_in
        for r in range(cfg.repeat):
            if cfg.separable:
                mods.append(_MaskedConv(c, c, cfg.kernel, cfg.dilation,
                                        groups=c))
                mods.append(_MaskedConv(c, cfg.filters, 1, bias=conv_bias))
            else:
                mods.append(_MaskedConv(c, cfg.filters, cfg.kernel,
                                        cfg.dilation, bias=conv_bias))
            bn = nn.BatchNorm1d(cfg.filters)
            _randomize_bn(bn)
            mods.append(bn)
            if r != cfg.repeat - 1:
                mods.extend([nn.ReLU(), nn.Dropout(0.0)])
            c = cfg.filters
        if cfg.se:
            mods.append(_SE(cfg.filters, cfg.se_reduction))
        self.mconv = nn.ModuleList(mods)
        if cfg.residual:
            bn = nn.BatchNorm1d(cfg.filters)
            _randomize_bn(bn)
            self.res = nn.ModuleList(
                [nn.ModuleList([_MaskedConv(c_in, cfg.filters, 1), bn])]
            )

    def forward(self, x):
        out = x
        for m in self.mconv:
            out = m(out)
        if hasattr(self, "res"):
            r = x
            for m in self.res[0]:
                r = m(r)
            out = out + r
        return torch.relu(out)


class _Encoder(nn.Module):
    def __init__(self, n_mels, cfgs, conv_bias=False):
        super().__init__()
        blocks, c = [], n_mels
        for cfg in cfgs:
            blocks.append(_Block(c, cfg, conv_bias))
            c = cfg.filters
        self.encoder = nn.ModuleList(blocks)

    def forward(self, x):
        for b in self.encoder:
            x = b(x)
        return x


_VAD_CFGS = [
    JasperBlockCfg(filters=24, repeat=1, kernel=11, separable=True),
    JasperBlockCfg(filters=16, repeat=2, kernel=13, separable=True,
                   residual=True),
    JasperBlockCfg(filters=24, repeat=1, kernel=29, dilation=2,
                   separable=True, residual=True),
    JasperBlockCfg(filters=24, repeat=1, kernel=1),
]
_N_MELS = 16


def _jasper_yaml(cfgs):
    return {
        "jasper": [
            {
                "filters": c.filters, "repeat": c.repeat,
                "kernel": [c.kernel], "dilation": [c.dilation],
                "separable": c.separable, "residual": c.residual,
                "se": c.se, "se_reduction_ratio": c.se_reduction,
            }
            for c in cfgs
        ]
    }


class _VadTorch(nn.Module):
    def __init__(self):
        super().__init__()
        # conv_bias=True exercises bias-into-BN folding (NeMo itself
        # uses bias=False; the converter must handle both)
        self.encoder = _Encoder(_N_MELS, _VAD_CFGS, conv_bias=True)
        self.decoder = nn.Module()
        self.decoder.decoder_layers = nn.Sequential(
            nn.Conv1d(_VAD_CFGS[-1].filters, 2, 1)
        )

    def forward(self, x):  # [B, n_mels, T]
        return self.decoder.decoder_layers(self.encoder(x))


def _fake_nemo(tmp_path, config: dict, model: nn.Module) -> str:
    """Assemble a synthetic .nemo tar (model_config.yaml + ckpt)."""
    import yaml

    path = str(tmp_path / "model.nemo")
    with tarfile.open(path, "w:gz") as tar:
        cfg_bytes = yaml.safe_dump(config).encode()
        info = tarfile.TarInfo("./model_config.yaml")
        info.size = len(cfg_bytes)
        tar.addfile(info, io.BytesIO(cfg_bytes))
        buf = io.BytesIO()
        torch.save(model.state_dict(), buf)
        info = tarfile.TarInfo("./model_weights.ckpt")
        info.size = buf.tell()
        buf.seek(0)
        tar.addfile(info, buf)
    return path


def test_vad_nemo_roundtrip_parity(tmp_path):
    """Synthetic vad .nemo archive → extract → convert → JAX forward
    matches the torch model frame-for-frame."""
    model = _VadTorch().eval()
    config = {
        "preprocessor": {"features": _N_MELS},
        "encoder": _jasper_yaml(_VAD_CFGS),
    }
    path = _fake_nemo(tmp_path, config, model)

    cfg_out, sd = nw.extract_nemo(path)
    assert cfg_out["preprocessor"]["features"] == _N_MELS
    cfgs, params, meta = nw.convert_marblenet(cfg_out, sd)
    assert meta["n_mels"] == _N_MELS and len(meta["blocks"]) == 4

    x = np.random.default_rng(0).standard_normal((2, 40, _N_MELS)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = model(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2)
    got = conv_asr.vad_logits(params, cfgs, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-4)


def test_se_block_parity():
    """Squeeze-excite + residual block converts exactly."""
    cfgs = [JasperBlockCfg(filters=16, repeat=2, kernel=7, separable=True,
                           residual=True, se=True, se_reduction=4)]
    enc = _Encoder(12, cfgs).eval()
    sd = {f"encoder.{k}": v.numpy() for k, v in enc.state_dict().items()}
    params = nw.convert_jasper_encoder(sd, cfgs)
    x = np.random.default_rng(1).standard_normal((3, 25, 12)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = enc(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2)
    mask = jnp.ones((3, 25, 1), jnp.float32)
    got = conv_asr.encode(params, cfgs, jnp.asarray(x), mask)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-4)


class _SpkDecoderTorch(nn.Module):
    """TitaNet SpeakerDecoder semantics: global-context attentive
    statistics pooling (TDNN conv → ReLU → BN → tanh → 1×1 conv) then
    BN + linear to the embedding space."""

    def __init__(self, c, attn, emb):
        super().__init__()
        self.attn_conv1 = nn.Conv1d(3 * c, attn, 1)
        self.attn_bn = nn.BatchNorm1d(attn)
        self.attn_conv2 = nn.Conv1d(attn, c, 1)
        self.emb_bn = nn.BatchNorm1d(2 * c)
        self.emb = nn.Linear(2 * c, emb, bias=False)
        _randomize_bn(self.attn_bn)
        _randomize_bn(self.emb_bn)

    def forward(self, x):  # [B, C, T]
        mu = x.mean(-1, keepdim=True)
        sg = torch.sqrt(
            torch.clamp(x.var(-1, unbiased=False, keepdim=True), min=1e-10)
        )
        ctx = torch.cat(
            [x, mu.expand_as(x), sg.expand_as(x)], dim=1
        )
        a = self.attn_conv2(
            torch.tanh(self.attn_bn(torch.relu(self.attn_conv1(ctx))))
        )
        w = torch.softmax(a, dim=-1)
        mean = (w * x).sum(-1)
        var = (w * x * x).sum(-1) - mean**2
        pooled = torch.cat(
            [mean, torch.sqrt(torch.clamp(var, min=1e-10))], dim=-1
        )
        return self.emb(self.emb_bn(pooled))


_SPK_CFGS = [
    JasperBlockCfg(filters=20, repeat=1, kernel=3, separable=True),
    JasperBlockCfg(filters=20, repeat=2, kernel=7, separable=True,
                   residual=True, se=True, se_reduction=4),
    JasperBlockCfg(filters=24, repeat=1, kernel=1),
]


class _TitanetTorch(nn.Module):
    def __init__(self, n_mels=12, attn=8, emb=10):
        super().__init__()
        self.encoder = _Encoder(n_mels, _SPK_CFGS)
        self.decoder = _SpkDecoderTorch(_SPK_CFGS[-1].filters, attn, emb)

    def forward(self, x):  # [B, n_mels, T]
        return self.decoder(self.encoder(x))


def test_titanet_nemo_roundtrip_parity(tmp_path):
    model = _TitanetTorch().eval()
    config = {
        "preprocessor": {"features": 12},
        "encoder": _jasper_yaml(_SPK_CFGS),
        "decoder": {"attention_channels": 8, "emb_sizes": 10},
    }
    path = _fake_nemo(tmp_path, config, model)
    cfg_out, sd = nw.extract_nemo(path)
    cfgs, params, meta = nw.convert_titanet(cfg_out, sd)
    assert meta["emb_dim"] == 10

    x = np.random.default_rng(2).standard_normal((2, 30, 12)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = model(torch.from_numpy(x).transpose(1, 2))
    got = conv_asr.speaker_embed(
        params, cfgs, jnp.asarray(x), jnp.asarray([30, 30])
    )
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=3e-4)


def test_msdd_lstm_parity():
    """Bidirectional torch LSTM + output projection vs the converted
    scan (gate order i,f,g,o must survive the transpose)."""
    from whisper_nemo_tpu.models import msdd as msdd_mod

    lstm = nn.LSTM(6, 8, batch_first=True, bidirectional=True).eval()
    proj = nn.Linear(16, 2)
    sd = {f"msdd.lstm.{k}": v.numpy() for k, v in lstm.state_dict().items()}
    sd["msdd.hidden_to_spks.weight"] = proj.weight.detach().numpy()
    sd["msdd.hidden_to_spks.bias"] = proj.bias.detach().numpy()

    params, meta, unmapped = nw.convert_msdd({}, sd)
    assert meta["hidden"] == 8
    assert "lstm_rev" in params and "in" not in params
    assert unmapped == []

    x = np.random.default_rng(3).standard_normal((2, 9, 6)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = proj(lstm(torch.from_numpy(x))[0])
    got = msdd_mod.msdd_logits(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


def test_fold_bn_with_conv_bias():
    """BN(conv + bias) == scale·conv + shift on random stats."""
    rng = np.random.default_rng(4)
    c = 7
    gamma, beta = rng.random(c) + 0.5, rng.standard_normal(c)
    mean, var = rng.standard_normal(c), rng.random(c) + 0.3
    bias = rng.standard_normal(c)
    g, b = nw.fold_bn(gamma, beta, mean, var, conv_bias=bias)
    y = rng.standard_normal((5, c))
    ref = gamma * ((y + bias) - mean) / np.sqrt(var + nw._BN_EPS) + beta
    np.testing.assert_allclose(y * g + b, ref, atol=1e-6)


def test_diarizer_picks_up_converted_checkpoints(tmp_path, monkeypatch):
    """End-to-end: converted .nemo npz + cfg.json sidecars in the model
    dir switch the diarizer onto the exact conv_asr architectures."""
    from whisper_nemo_tpu.config import create_config
    from whisper_nemo_tpu.diarize import NeuralDiarizer
    from whisper_nemo_tpu.engine.checkpoint import save_params

    monkeypatch.setenv("WNT_MODEL_DIR", str(tmp_path))

    vad = _VadTorch().eval()
    _, vparams, vmeta = nw.convert_marblenet(
        {"preprocessor": {"features": _N_MELS},
         "encoder": _jasper_yaml(_VAD_CFGS)},
        {k: v.numpy() for k, v in vad.state_dict().items()},
    )
    save_params(str(tmp_path / "vad_multilingual_marblenet.npz"), vparams)
    (tmp_path / "vad_multilingual_marblenet.cfg.json").write_text(
        json.dumps(vmeta)
    )

    spk = _TitanetTorch().eval()
    _, sparams, smeta = nw.convert_titanet(
        {"preprocessor": {"features": 12},
         "encoder": _jasper_yaml(_SPK_CFGS),
         "decoder": {"attention_channels": 8, "emb_sizes": 10}},
        {k: v.numpy() for k, v in spk.state_dict().items()},
    )
    save_params(str(tmp_path / "titanet_large.npz"), sparams)
    (tmp_path / "titanet_large.cfg.json").write_text(json.dumps(smeta))

    diar = NeuralDiarizer(create_config(str(tmp_path)))
    assert diar._vad_cfgs is not None, "vad sidecar not detected"
    assert diar.spk_dims.n_mels == 12 and diar.spk_dims.emb_dim == 10

    audio = np.random.default_rng(5).standard_normal(32000).astype(
        np.float32
    ) * 0.2
    probs = diar._frame_speech_probs(audio)
    assert (probs >= 0).all() and (probs <= 1).all() and len(probs) > 150

    # embedding path: 2 windows through the converted titanet
    feats = jnp.asarray(
        np.random.default_rng(6).standard_normal((2, 50, 12)), jnp.float32
    )
    emb = diar._embed_jit(diar.spk_params, feats, jnp.asarray([50, 40]))
    assert emb.shape == (2, 10)
    assert np.isfinite(np.asarray(emb)).all()
