"""Parity tests for the pyannote PyanNet converter.

Zero-egress: builds a torch PyanNet replica with pyannote's key naming
(SincConv corner frequencies as parameters, filters computed in
forward with the Ravanelli/SincNet formula), converts its state dict,
and requires the JAX forward to match — covering the sinc-filter
materialization, conv/LSTM layout transposes, instance-norm semantics,
and the powerset decode."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from whisper_nemo_tpu.engine import pyannote_weights as pw
from whisper_nemo_tpu.models import pyannet

torch.manual_seed(0)

_K, _N, _H = 251, 80, 16  # kernel, sinc filters, lstm hidden (small)


def _torch_sinc_filters(low_hz, band_hz, k=_K, sr=16000,
                        min_low=50.0, min_band=50.0):
    low = min_low + torch.abs(low_hz)
    high = torch.clamp(low + min_band + torch.abs(band_hz), min_low, sr / 2)
    band = (high - low)[:, 0]
    n_lin = torch.linspace(0, k / 2 - 1, steps=k // 2)
    window = 0.54 - 0.46 * torch.cos(2 * np.pi * n_lin / k)
    n = (k - 1) / 2.0
    n_ = 2 * np.pi * torch.arange(-n, 0.0).view(1, -1) / sr
    f_low = torch.matmul(low, n_)
    f_high = torch.matmul(high, n_)
    left = ((torch.sin(f_high) - torch.sin(f_low)) / (n_ / 2)) * window
    center = 2 * band.view(-1, 1)
    filters = torch.cat([left, center, torch.flip(left, dims=[1])], dim=1)
    return (filters / (2 * band.view(-1, 1))).view(_N, 1, k)


class _Sinc(nn.Module):
    """Key layout sincnet.conv1d.0.low_hz_ / band_hz_ (bare variant)."""

    def __init__(self):
        super().__init__()
        self.low_hz_ = nn.Parameter(torch.rand(_N, 1) * 2000)
        self.band_hz_ = nn.Parameter(torch.rand(_N, 1) * 1000)

    def forward(self, x):
        return F.conv1d(x, _torch_sinc_filters(self.low_hz_, self.band_hz_),
                        stride=pyannet.SINC_STRIDE)


class _SincNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.wav_norm1d = nn.InstanceNorm1d(1, affine=True)
        self.conv1d = nn.ModuleList(
            [_Sinc(), nn.Conv1d(_N, 60, 5), nn.Conv1d(60, 60, 5)]
        )
        self.pool1d = nn.ModuleList([nn.MaxPool1d(3, 3) for _ in range(3)])
        self.norm1d = nn.ModuleList(
            [nn.InstanceNorm1d(c, affine=True) for c in (_N, 60, 60)]
        )
        for norm in [self.wav_norm1d, *self.norm1d]:
            with torch.no_grad():
                norm.weight.copy_(torch.rand_like(norm.weight) + 0.5)
                norm.bias.copy_(torch.randn_like(norm.bias) * 0.1)

    def forward(self, x):  # [B, 1, T]
        x = self.wav_norm1d(x)
        for c, (conv, pool, norm) in enumerate(
            zip(self.conv1d, self.pool1d, self.norm1d)
        ):
            x = conv(x)
            if c == 0:
                x = torch.abs(x)
            x = F.leaky_relu(norm(pool(x)))
        return x


class _PyanNet(nn.Module):
    """pyannote PyanNet replica with matching state-dict keys."""

    def __init__(self, n_classes=7, layers=2):
        super().__init__()
        self.sincnet = _SincNet()
        self.lstm = nn.LSTM(60, _H, num_layers=layers, batch_first=True,
                            bidirectional=True)
        self.linear = nn.ModuleList(
            [nn.Linear(2 * _H, _H), nn.Linear(_H, _H)]
        )
        self.classifier = nn.Linear(_H, n_classes)

    def forward(self, wav):  # [B, 1, T]
        x = self.sincnet(wav).transpose(1, 2)
        x, _ = self.lstm(x)
        for lin in self.linear:
            x = F.leaky_relu(lin(x))
        return self.classifier(x)


def test_pyannet_conversion_parity():
    model = _PyanNet().eval()
    params = pw.convert_pyannet(
        {k: v.detach().numpy() for k, v in model.state_dict().items()}
    )
    wav = np.random.default_rng(0).standard_normal((2, 16000)).astype(
        np.float32
    ) * 0.3
    with torch.no_grad():
        ref = model(torch.from_numpy(wav)[:, None, :])
    got = pyannet.frame_logits(params, jnp.asarray(wav))
    assert got.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-4)


def test_extract_unwraps_lightning(tmp_path):
    model = _PyanNet(layers=1).eval()
    path = str(tmp_path / "pytorch_model.bin")
    torch.save(
        {"state_dict": {f"model.{k}": v
                        for k, v in model.state_dict().items()}},
        path,
    )
    sd = pw.extract_pyannote(path)
    params = pw.convert_pyannet(sd)
    assert len(params["lstm"]) == 1 and len(params["linear"]) == 2


def test_powerset_decode():
    table = pyannet.powerset_table(3, 2)
    assert table.shape == (7, 3)
    # pyannote order: ∅, {0}, {1}, {2}, {0,1}, {0,2}, {1,2}
    np.testing.assert_array_equal(table[0], [0, 0, 0])
    np.testing.assert_array_equal(table[4], [1, 1, 0])
    np.testing.assert_array_equal(table[6], [0, 1, 1])


def test_speech_probs_and_activity_shapes():
    import jax

    params = pyannet.init_pyannet_params(
        jax.random.PRNGKey(0), lstm_layers=1, hidden=8
    )
    wav = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 16000)), jnp.float32
    )
    probs = pyannet.speech_probs(params, wav)
    act = pyannet.speaker_activity(params, wav)
    assert probs.shape[1] == act.shape[1]
    assert act.shape[2] == 3
    assert float(probs.min()) >= 0.0 and float(probs.max()) <= 1.0
    # ~59 fps front-end: 1 s of audio → ~55-60 frames
    assert 50 <= probs.shape[1] <= 62


def test_diarizer_uses_pyannet_vad(tmp_path, monkeypatch):
    """pyannote_segmentation.npz in the model dir becomes the neural
    VAD when no MarbleNet checkpoint is installed."""
    import jax

    from whisper_nemo_tpu.config import create_config
    from whisper_nemo_tpu.diarize import NeuralDiarizer
    from whisper_nemo_tpu.engine.checkpoint import save_params

    monkeypatch.setenv("WNT_MODEL_DIR", str(tmp_path))
    params = pyannet.init_pyannet_params(
        jax.random.PRNGKey(0), lstm_layers=1, hidden=8
    )
    save_params(str(tmp_path / "pyannote_segmentation.npz"), params)

    diar = NeuralDiarizer(create_config(str(tmp_path)))
    assert diar.pyannet_params is not None

    audio = np.random.default_rng(2).standard_normal(32000).astype(
        np.float32
    ) * 0.2
    probs = diar._frame_speech_probs(audio)
    # resampled onto the 10 ms VAD grid: 2 s → ~200 frames
    assert 150 < len(probs) <= 210
    assert (probs >= 0).all() and (probs <= 1).all()
