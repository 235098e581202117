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


def _openai_sd_from_hf(model):
    """Rename an HF whisper state dict into OpenAI .pt layout (same
    tensors), for layout-equivalence testing."""
    ren = {}
    for k, v in model.model.state_dict().items():
        k2 = (
            k.replace("layers.", "blocks.")
            .replace("self_attn_layer_norm", "attn_ln")
            .replace("encoder_attn_layer_norm", "cross_attn_ln")
            .replace("self_attn.", "attn.")
            .replace("encoder_attn.", "cross_attn.")
            .replace("q_proj", "query")
            .replace("k_proj", "key")
            .replace("v_proj", "value")
            .replace("out_proj", "out")
            .replace("final_layer_norm", "mlp_ln")
            .replace("fc1", "mlp.0")
            .replace("fc2", "mlp.2")
            .replace("encoder.embed_positions.weight",
                     "encoder.positional_embedding")
            .replace("decoder.embed_positions.weight",
                     "decoder.positional_embedding")
            .replace("decoder.embed_tokens.weight",
                     "decoder.token_embedding.weight")
            .replace("encoder.layer_norm", "encoder.ln_post")
            .replace("decoder.layer_norm", "decoder.ln")
        )
        ren[k2] = v
    return ren


def test_openai_pt_layout_matches_hf(hf_whisper_dir):
    """Converting the OpenAI .pt layout must produce the identical
    param tree as the HF path (same underlying tensors)."""
    import jax

    from whisper_nemo_tpu.engine.weights import (
        convert_hf_whisper_state_dict,
        convert_openai_whisper_state_dict,
        dims_from_hf_config,
    )

    hf_dir, model, cfg = hf_whisper_dir
    dims = dims_from_hf_config(cfg)
    hf_tree = convert_hf_whisper_state_dict(model.state_dict(), dims)
    oa_tree = convert_openai_whisper_state_dict(
        _openai_sd_from_hf(model), dims
    )
    hf_leaves, hf_def = jax.tree_util.tree_flatten(hf_tree)
    oa_leaves, oa_def = jax.tree_util.tree_flatten(oa_tree)
    assert hf_def == oa_def
    for a, b in zip(hf_leaves, oa_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_whisper_pt_cli(hf_whisper_dir, tmp_path):
    """whisper-pt subcommand ingests a .pt file (dims +
    model_state_dict, the openai checkpoint format; main.py:110)."""
    import torch

    hf_dir, model, cfg = hf_whisper_dir
    ckpt = {
        "dims": {
            "n_mels": cfg.num_mel_bins,
            "n_audio_ctx": cfg.max_source_positions,
            "n_audio_state": cfg.d_model,
            "n_audio_head": cfg.encoder_attention_heads,
            "n_audio_layer": cfg.encoder_layers,
            "n_vocab": cfg.vocab_size,
            "n_text_ctx": cfg.max_target_positions,
            "n_text_state": cfg.d_model,
            "n_text_head": cfg.decoder_attention_heads,
            "n_text_layer": cfg.decoder_layers,
        },
        "model_state_dict": _openai_sd_from_hf(model),
    }
    pt_path = tmp_path / "large-v2.pt"
    torch.save(ckpt, pt_path)
    out_dir = tmp_path / "cache"
    result = subprocess.run(
        [
            sys.executable, "tools/convert_checkpoint.py", "whisper-pt",
            str(pt_path), "--name", "large-v2", "--out-dir", str(out_dir),
        ],
        capture_output=True, text=True, cwd=".",
    )
    assert result.returncode == 0, result.stderr
    assert (out_dir / "large-v2.npz").exists()

    from whisper_nemo_tpu.engine.checkpoint import load_params
    from whisper_nemo_tpu.engine.weights import (
        convert_hf_whisper_state_dict,
        dims_from_hf_config,
    )
    import jax

    loaded = load_params(str(out_dir / "large-v2.npz"))
    want = convert_hf_whisper_state_dict(
        model.state_dict(), dims_from_hf_config(cfg)
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(loaded), jax.tree_util.tree_leaves(want)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
