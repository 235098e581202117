#!/usr/bin/env python
"""Convert HF-format checkpoints to the framework's .npz param trees.

Usage:
    python tools/convert_checkpoint.py whisper <hf_dir> --name medium.en
    python tools/convert_checkpoint.py whisper-pt <ckpt.pt> --name large-v2
    python tools/convert_checkpoint.py aligner <hf_dir>
    python tools/convert_checkpoint.py punctuation <hf_dir>

``whisper-pt`` ingests OpenAI's published ``.pt`` checkpoints (the
files ``whisper.load_model`` downloads — the fork path's source,
reference main.py:110).

``<hf_dir>`` is a local directory holding ``config.json`` plus
``model.safetensors`` or ``pytorch_model.bin`` (and, for whisper,
``vocab.json``/``merges.txt``; for punctuation, ``tokenizer.json``).
Outputs land in ``WNT_MODEL_DIR`` (default ~/.cache/whisper_nemo_tpu),
where ``engine.checkpoint.resolve_model`` and friends pick them up.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_state_dict(hf_dir: str) -> dict:
    st_path = os.path.join(hf_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    bin_path = os.path.join(hf_dir, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch

        return torch.load(bin_path, map_location="cpu", weights_only=True)
    raise FileNotFoundError(
        f"no model.safetensors or pytorch_model.bin in {hf_dir}"
    )


def load_config(hf_dir: str) -> dict:
    with open(os.path.join(hf_dir, "config.json")) as f:
        return json.load(f)


def convert_whisper(hf_dir: str, name: str, out_dir: str) -> str:
    from types import SimpleNamespace

    from whisper_nemo_tpu.engine.checkpoint import save_params
    from whisper_nemo_tpu.engine.weights import (
        convert_hf_whisper_state_dict,
        dims_from_hf_config,
    )

    cfg = SimpleNamespace(**load_config(hf_dir))
    dims = dims_from_hf_config(cfg)
    params = convert_hf_whisper_state_dict(load_state_dict(hf_dir), dims)
    out = os.path.join(out_dir, f"{name}.npz")
    save_params(out, params)
    for asset in ("vocab.json", "merges.txt", "tokenizer.json"):
        src = os.path.join(hf_dir, asset)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out_dir, asset))
    return out


def convert_whisper_pt(pt_path: str, name: str, out_dir: str) -> str:
    """OpenAI-layout ``.pt`` (what ``whisper.load_model`` downloads;
    reference main.py:110) → .npz param tree."""
    import torch

    from whisper_nemo_tpu.engine.checkpoint import save_params
    from whisper_nemo_tpu.engine.weights import (
        convert_openai_whisper_state_dict,
        dims_from_openai_dims,
    )

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=True)
    dims = dims_from_openai_dims(ckpt["dims"])
    params = convert_openai_whisper_state_dict(
        ckpt["model_state_dict"], dims
    )
    out = os.path.join(out_dir, f"{name}.npz")
    save_params(out, params)
    return out


def convert_aligner(hf_dir: str, out_dir: str) -> str:
    from types import SimpleNamespace

    from whisper_nemo_tpu.engine.checkpoint import save_params
    from whisper_nemo_tpu.models.wav2vec2 import (
        convert_hf_wav2vec2_state_dict,
        dims_from_hf_wav2vec2_config,
    )

    cfg = SimpleNamespace(**load_config(hf_dir))
    dims = dims_from_hf_wav2vec2_config(cfg)
    params = convert_hf_wav2vec2_state_dict(load_state_dict(hf_dir), dims)
    out = os.path.join(out_dir, "ctc_aligner.npz")
    save_params(out, params)
    vocab_src = os.path.join(hf_dir, "vocab.json")
    if os.path.exists(vocab_src):
        shutil.copy(vocab_src, os.path.join(out_dir, "ctc_aligner.vocab.json"))
    return out


def convert_punctuation(hf_dir: str, out_dir: str,
                        name: str = "kredor/punctuate-all") -> str:
    from whisper_nemo_tpu.engine.checkpoint import save_params
    from whisper_nemo_tpu.models.punctuation import (
        XlmRobertaDims,
        convert_hf_xlmr_state_dict,
    )

    raw = load_config(hf_dir)
    dims = XlmRobertaDims(
        vocab_size=raw["vocab_size"],
        hidden_size=raw["hidden_size"],
        num_layers=raw["num_hidden_layers"],
        num_heads=raw["num_attention_heads"],
        intermediate_size=raw["intermediate_size"],
        max_positions=raw["max_position_embeddings"],
        num_labels=len(raw.get("id2label", {})) or 6,
    )
    params = convert_hf_xlmr_state_dict(load_state_dict(hf_dir), dims)
    safe = name.replace("/", "_")
    out = os.path.join(out_dir, f"{safe}.npz")
    save_params(out, params)
    tok_src = os.path.join(hf_dir, "tokenizer.json")
    if os.path.exists(tok_src):
        shutil.copy(tok_src, os.path.join(out_dir, f"{safe}.tokenizer.json"))
    return out


def main() -> None:
    from whisper_nemo_tpu.engine.checkpoint import model_cache_dir

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "kind", choices=["whisper", "whisper-pt", "aligner", "punctuation"]
    )
    parser.add_argument(
        "hf_dir",
        help="local HF checkpoint directory (or .pt file for whisper-pt)",
    )
    parser.add_argument(
        "--name", default=None,
        help="model name (whisper: e.g. medium.en; punctuation: hub id)",
    )
    parser.add_argument("--out-dir", default=None)
    args = parser.parse_args()

    out_dir = args.out_dir or model_cache_dir()
    os.makedirs(out_dir, exist_ok=True)

    if args.kind == "whisper":
        if not args.name:
            parser.error("whisper conversion requires --name (e.g. medium.en)")
        out = convert_whisper(args.hf_dir, args.name, out_dir)
    elif args.kind == "whisper-pt":
        if not args.name:
            parser.error("whisper-pt conversion requires --name (e.g. large-v2)")
        out = convert_whisper_pt(args.hf_dir, args.name, out_dir)
    elif args.kind == "aligner":
        out = convert_aligner(args.hf_dir, out_dir)
    else:
        out = convert_punctuation(
            args.hf_dir, out_dir, args.name or "kredor/punctuate-all"
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
