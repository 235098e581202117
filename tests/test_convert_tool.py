"""End-to-end checkpoint conversion: save a random torch model in HF
format, convert with the CLI tool, load through the engine, verify
numerical parity."""

import json
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture()
def hf_whisper_dir(tmp_path):
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(0)
    cfg = WhisperConfig(
        vocab_size=51865,
        d_model=64,
        encoder_layers=1,
        decoder_layers=1,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=128,
        decoder_ffn_dim=128,
        num_mel_bins=80,
        max_source_positions=1500,
        max_target_positions=448,
        pad_token_id=0,
        decoder_start_token_id=50258,
    )
    model = WhisperForConditionalGeneration(cfg)
    hf_dir = tmp_path / "hf"
    model.save_pretrained(str(hf_dir), safe_serialization=True)
    return hf_dir, model, cfg


def test_convert_and_load_whisper(hf_whisper_dir, tmp_path, monkeypatch):
    import torch

    hf_dir, model, cfg = hf_whisper_dir
    out_dir = tmp_path / "cache"

    result = subprocess.run(
        [
            sys.executable,
            "tools/convert_checkpoint.py",
            "whisper",
            str(hf_dir),
            "--name",
            "tiny",
            "--out-dir",
            str(out_dir),
        ],
        capture_output=True,
        text=True,
        cwd=".",
    )
    assert result.returncode == 0, result.stderr
    assert (out_dir / "tiny.npz").exists()

    # resolve through the engine machinery and check encoder parity
    monkeypatch.setenv("WNT_MODEL_DIR", str(out_dir))
    import jax.numpy as jnp

    from whisper_nemo_tpu.engine.checkpoint import load_params
    from whisper_nemo_tpu.engine.weights import dims_from_hf_config
    from whisper_nemo_tpu.models.whisper import encode

    params = load_params(str(out_dir / "tiny.npz"))
    dims = dims_from_hf_config(cfg)
    mel = np.random.default_rng(0).standard_normal((1, 80, 3000)).astype(
        np.float32
    )
    with torch.no_grad():
        theirs = model.model.encoder(
            torch.from_numpy(mel)
        ).last_hidden_state.numpy()
    ours = np.asarray(encode(params, jnp.asarray(mel), dims))
    np.testing.assert_allclose(ours, theirs, atol=2e-4)
