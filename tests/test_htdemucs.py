"""htdemucs: torch-primitive parity, converter strictness, forward
contract, and the CLI separation layout.

The demucs pip package is not installable in this environment (zero
egress), so full-model parity vs. the released weights cannot run here.
Instead every torch numeric convention the model depends on is pinned
against torch itself (installed): ConvTranspose1d/2d semantics,
GroupNorm(1, C) statistics, MultiheadAttention's packed in_proj, and
torch.stft/istft with normalized hann windows. The converter test then
proves the torch state-dict naming scheme round-trips losslessly into
the tree the JAX forward consumes.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_nemo_tpu.models.htdemucs import (
    HTDemucsDims,
    _conv_transpose1d,
    _conv_transpose2d,
    _group_norm1,
    _group_norm_seq,
    _istft,
    _mha,
    _spec,
    _ispec,
    _stft,
    apply_segments,
    htdemucs_forward,
    infer_dims,
    init_htdemucs_params,
    separate_vocals,
)

torch = pytest.importorskip("torch")


SMALL = HTDemucsDims(
    sources=("drums", "bass", "other", "vocals"),
    channels=4,
    depth=4,
    nfft=512,
    bottom_channels=32,
    t_layers=3,
    t_heads=4,
    segment=0.5,
    samplerate=16000,
)


# -- torch primitive parity ---------------------------------------------------


def test_conv_transpose1d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 17)).astype(np.float32)
    w = rng.standard_normal((3, 5, 8)).astype(np.float32)  # [I, O, K]
    b = rng.standard_normal(5).astype(np.float32)
    ours = np.asarray(
        _conv_transpose1d(
            {"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
            jnp.asarray(x),
            stride=4,
        )
    )
    ref = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=4,
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_conv_transpose2d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 9, 5)).astype(np.float32)
    w = rng.standard_normal((3, 4, 8, 1)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    ours = np.asarray(
        _conv_transpose2d(
            {"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
            jnp.asarray(x),
            stride=(4, 1),
        )
    )
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=(4, 1),
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_group_norm_single_group_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 6, 11)).astype(np.float32)
    w = rng.standard_normal(6).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    gn = torch.nn.GroupNorm(1, 6)
    gn.weight.data = torch.from_numpy(w)
    gn.bias.data = torch.from_numpy(b)
    ref = gn(torch.from_numpy(x)).detach().numpy()
    ours = np.asarray(
        _group_norm1(
            {"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
            jnp.asarray(x),
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    # the sequence variant is the same statistics on [B, T, C]
    ours_seq = np.asarray(
        _group_norm_seq(
            {"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
            jnp.asarray(x.transpose(0, 2, 1)),
        )
    )
    np.testing.assert_allclose(ours_seq, ref.transpose(0, 2, 1), atol=1e-4)


def test_multihead_attention_matches_torch():
    d, heads = 16, 4
    rng = np.random.default_rng(3)
    q = rng.standard_normal((2, 7, d)).astype(np.float32)
    k = rng.standard_normal((2, 9, d)).astype(np.float32)
    mha = torch.nn.MultiheadAttention(d, heads, batch_first=True)
    p = {
        "in_proj_weight": jnp.asarray(mha.in_proj_weight.detach().numpy()),
        "in_proj_bias": jnp.asarray(mha.in_proj_bias.detach().numpy()),
        "out_proj": {
            "weight": jnp.asarray(mha.out_proj.weight.detach().numpy()),
            "bias": jnp.asarray(mha.out_proj.bias.detach().numpy()),
        },
    }
    ref = mha(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(k)
    )[0].detach().numpy()
    ours = np.asarray(
        _mha(p, jnp.asarray(q), jnp.asarray(k), jnp.asarray(k), heads)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_stft_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    nfft, hop = 512, 128
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=nfft,
        hop_length=hop,
        window=torch.hann_window(nfft),
        win_length=nfft,
        normalized=True,
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).numpy()
    ours = np.asarray(_stft(jnp.asarray(x), nfft, hop))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_istft_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 4000)).astype(np.float32)
    nfft, hop = 512, 128
    z = torch.stft(
        torch.from_numpy(x), n_fft=nfft, hop_length=hop,
        window=torch.hann_window(nfft), normalized=True, center=True,
        pad_mode="reflect", return_complex=True,
    )
    ref = torch.istft(
        z, n_fft=nfft, hop_length=hop, window=torch.hann_window(nfft),
        normalized=True, center=True, length=4000,
    ).numpy()
    ours = np.asarray(_istft(jnp.asarray(z.numpy()), nfft, hop, 4000))
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    np.testing.assert_allclose(ours, x, atol=1e-4)


def test_spec_ispec_matches_demucs_contract():
    """_spec/_ispec vs a line-by-line torch transcription of demucs'
    hdemucs._spec/_ispec (pad by 3·hop/2, drop the nyquist bin, trim 2
    frames each side). The roundtrip itself is NOT identity — demucs
    discards the nyquist bin and zero-pads edge frames by design — so
    parity against the contract, not against the input, is the pin."""
    import math

    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 2, 8000)).astype(np.float32)
    nfft, hl = SMALL.nfft, SMALL.hop_length

    le = int(math.ceil(x.shape[-1] / hl))
    pad = hl // 2 * 3
    xp = torch.nn.functional.pad(
        torch.from_numpy(x), (pad, pad + le * hl - x.shape[-1]),
        mode="reflect",
    )
    zt = torch.stft(
        xp.reshape(-1, xp.shape[-1]), n_fft=nfft, hop_length=hl,
        window=torch.hann_window(nfft), normalized=True, center=True,
        pad_mode="reflect", return_complex=True,
    ).view(1, 2, nfft // 2 + 1, -1)[..., :-1, :][..., 2 : 2 + le]

    zj = _spec(jnp.asarray(x), SMALL)
    assert zj.shape == (1, 2, SMALL.freqs, le)
    np.testing.assert_allclose(np.asarray(zj), zt.numpy(), atol=1e-5)

    zp = torch.nn.functional.pad(zt, (2, 2, 0, 1))
    le_out = hl * int(math.ceil(8000 / hl)) + 2 * pad
    back_t = torch.istft(
        zp.reshape(-1, *zp.shape[2:]), n_fft=nfft, hop_length=hl,
        window=torch.hann_window(nfft), normalized=True, center=True,
        length=le_out,
    ).view(1, 2, le_out)[..., pad : pad + 8000]

    back_j = np.asarray(_ispec(zj, SMALL, 8000))
    np.testing.assert_allclose(back_j, back_t.numpy(), atol=1e-5)
    # interior reconstruction is close to the input (nyquist-bin loss
    # only); edges are attenuated by the zeroed pad frames by design
    interior = np.abs(back_j[..., 1000:-1000] - x[..., 1000:-1000])
    assert interior.max() < 0.15


# -- converter ----------------------------------------------------------------


def _to_torch_names(flat_tree):
    """'/'-joined tree keys → torch state-dict names (test inverse of
    tools/convert_demucs.rekey)."""
    inverse = {"conv1": "0", "norm1": "1", "conv2": "3", "norm2": "4"}
    out = {}
    for k, v in flat_tree.items():
        parts = k.split("/")
        if "dconv" in parts:
            i = parts.index("dconv")
            if parts[i + 3] == "scale":
                parts = parts[: i + 3] + ["6", "scale"]
            else:
                parts = (
                    parts[: i + 3]
                    + [inverse[parts[i + 3]]]
                    + parts[i + 4 :]
                )
        out[".".join(parts)] = np.asarray(v)
    return out


def test_converter_roundtrip_and_dims_inference():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_demucs import convert_state_dict

    from whisper_nemo_tpu.engine.checkpoint import flatten_tree

    params = init_htdemucs_params(jax.random.PRNGKey(0), SMALL)
    flat = flatten_tree(params)
    sd = _to_torch_names(flat)

    converted, dims = convert_state_dict(sd)
    assert dims.channels == SMALL.channels
    assert dims.depth == SMALL.depth
    assert dims.nfft == SMALL.nfft
    assert dims.bottom_channels == SMALL.bottom_channels
    assert dims.t_layers == SMALL.t_layers
    assert dims.sources == SMALL.sources
    assert set(converted) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(converted[k], np.asarray(flat[k]))


def test_converter_rejects_mismatched_state():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_demucs import convert_state_dict

    from whisper_nemo_tpu.engine.checkpoint import flatten_tree

    params = init_htdemucs_params(jax.random.PRNGKey(0), SMALL)
    sd = _to_torch_names(flatten_tree(params))
    sd.pop("decoder.1.rewrite.weight")
    sd["decoder.1.rewrite.weigth"] = np.zeros((1,), np.float32)  # typo key
    with pytest.raises(ValueError, match="missing"):
        convert_state_dict(sd)


# -- forward ------------------------------------------------------------------


@pytest.fixture(scope="module")
def small_model():
    params = init_htdemucs_params(jax.random.PRNGKey(1), SMALL)
    return params


def test_forward_shape_and_finite(small_model):
    rng = np.random.default_rng(7)
    mix = (rng.standard_normal((1, 2, 8000)) * 0.2).astype(np.float32)
    out = np.asarray(htdemucs_forward(small_model, jnp.asarray(mix), SMALL))
    assert out.shape == (1, len(SMALL.sources), 2, 8000)
    assert np.isfinite(out).all()


def test_forward_near_identity_sum_at_init(small_model):
    """At init the transformer/decoder residual scales (LayerScale
    1e-4, DConv scale 1e-3) keep the network near-linear; the summed
    source estimate must stay the same order of magnitude as the mix
    (a blown-up STFT/iSTFT convention would break this)."""
    rng = np.random.default_rng(8)
    mix = (rng.standard_normal((1, 2, 8000)) * 0.2).astype(np.float32)
    out = np.asarray(htdemucs_forward(small_model, jnp.asarray(mix), SMALL))
    assert np.abs(out).max() < np.abs(mix).max() * 50


def test_apply_segments_overlap_add(small_model):
    rng = np.random.default_rng(9)
    wave = (rng.standard_normal((2, 20000)) * 0.2).astype(np.float32)
    out = apply_segments(small_model, wave, SMALL, overlap=0.25)
    assert out.shape == (len(SMALL.sources), 2, 20000)
    assert np.isfinite(out).all()


# -- CLI contract -------------------------------------------------------------


def test_separate_vocals_raises_without_checkpoint(tmp_path, monkeypatch):
    monkeypatch.setenv("WNT_MODEL_DIR", str(tmp_path))
    with pytest.raises(FileNotFoundError):
        separate_vocals("/tmp/nope.wav", str(tmp_path))


def test_separate_vocals_with_checkpoint(tmp_path, monkeypatch, small_model):
    """Converted checkpoint + sidecar installed → the CLI layout
    contract holds (reference diarize.py:98-114)."""
    from whisper_nemo_tpu.audio import write_wav
    from whisper_nemo_tpu.engine.checkpoint import save_params

    monkeypatch.setenv("WNT_MODEL_DIR", str(tmp_path))
    save_params(str(tmp_path / "htdemucs.npz"), small_model)
    with open(tmp_path / "htdemucs.cfg.json", "w") as f:
        json.dump(
            {
                "sources": list(SMALL.sources),
                "segment": SMALL.segment,
                "samplerate": SMALL.samplerate,
            },
            f,
        )

    wave = (
        np.random.default_rng(10).standard_normal(16000) * 0.2
    ).astype(np.float32)
    src = tmp_path / "song.wav"
    write_wav(str(src), wave)
    out = separate_vocals(str(src), str(tmp_path / "temp_outputs"))
    assert out.endswith(os.path.join("htdemucs", "song", "vocals.wav"))
    assert os.path.exists(out)


def test_infer_dims_from_state_dict():
    flatten = __import__(
        "whisper_nemo_tpu.engine.checkpoint", fromlist=["flatten_tree"]
    ).flatten_tree
    params = init_htdemucs_params(jax.random.PRNGKey(2), SMALL)
    sd = _to_torch_names(flatten(params))
    dims = infer_dims(sd)
    assert dims.nfft == SMALL.nfft
    assert dims.sources == SMALL.sources
