#!/usr/bin/env python
"""Convert a released (ht)demucs checkpoint to the framework's .npz.

Usage:
    python tools/convert_demucs.py 955717e8-8726e21a.th
    python tools/convert_demucs.py htdemucs.th --name htdemucs

The reference's stemming stage runs ``python -m demucs.separate -n
htdemucs --two-stems=vocals`` (/root/reference/diarize.py:98-100), which
resolves to a ``.th`` file holding ``{'klass', 'args', 'kwargs',
'state'}`` (demucs.states.serialize_model) — or a raw ``state_dict``.
This tool re-keys that state dict into the torch-layout param tree
``models/htdemucs.py`` consumes (a pure re-keying: tensor layouts are
preserved verbatim) and writes ``<out>/htdemucs.npz`` plus a
``.cfg.json`` sidecar with the inferred architecture and the training
segment length.

The conversion is STRICT: after re-keying, the key set and every tensor
shape must exactly match the expected htdemucs parameter tree for the
inferred dims — any unconsumed or missing tensor aborts with a listing,
so an architecture mismatch is loud rather than silently wrong.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any, Dict, Tuple

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# torch DConv submodule indices → semantic tree keys (the npz tree
# cannot use the sparse numeric keys 0/1/3/4/6 directly: the loader
# list-ifies contiguous numeric dicts)
_DCONV_RENAME = {"0": "conv1", "1": "norm1", "3": "conv2", "4": "norm2"}


def rekey(torch_key: str) -> str:
    """torch state-dict name → '/'-joined tree path."""
    parts = torch_key.split(".")
    if "dconv" in parts:
        i = parts.index("dconv")
        # encoder.N.dconv.layers.D.<idx>.<param>
        idx = parts[i + 3]
        if idx == "6":
            parts = parts[: i + 3] + ["scale"]  # 6.scale → scale
        else:
            parts = (
                parts[: i + 3] + [_DCONV_RENAME[idx]] + parts[i + 4 :]
            )
    return "/".join(parts)


def convert_state_dict(
    sd: Dict[str, Any],
) -> Tuple[Dict[str, np.ndarray], "HTDemucsDims"]:
    """torch state dict → (flat '/'-keyed float32 tree, inferred dims).

    Raises ValueError listing unconsumed/missing/mis-shaped tensors.
    """
    from whisper_nemo_tpu.engine.checkpoint import flatten_tree
    from whisper_nemo_tpu.models.htdemucs import (
        infer_dims,
        init_htdemucs_params,
    )

    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    dims = infer_dims(sd)

    flat = {rekey(k): v for k, v in sd.items()}

    import jax

    expected = {
        k: v.shape
        for k, v in flatten_tree(
            init_htdemucs_params(jax.random.PRNGKey(0), dims)
        ).items()
    }
    got = {k: v.shape for k, v in flat.items()}
    missing = sorted(set(expected) - set(got))
    extra = sorted(set(got) - set(expected))
    bad = sorted(
        k for k in set(got) & set(expected) if got[k] != expected[k]
    )
    if missing or extra or bad:
        raise ValueError(
            "state dict does not match the htdemucs architecture for "
            f"inferred dims {dims}:\n"
            f"  missing ({len(missing)}): {missing[:8]}\n"
            f"  unconsumed ({len(extra)}): {extra[:8]}\n"
            f"  shape mismatches ({len(bad)}): "
            f"{[(k, got[k], expected[k]) for k in bad[:8]]}"
        )
    return flat, dims


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("th_path", help="path to the demucs .th checkpoint")
    ap.add_argument("--name", default="htdemucs")
    ap.add_argument("--out-dir", default=None, help="override WNT_MODEL_DIR")
    args = ap.parse_args()

    import torch

    from whisper_nemo_tpu.engine.checkpoint import model_cache_dir

    blob = torch.load(args.th_path, map_location="cpu", weights_only=False)
    segment = None
    if isinstance(blob, dict) and "state" in blob:
        kwargs = blob.get("kwargs") or {}
        if "segment" in kwargs:
            segment = float(kwargs["segment"])
        sd = blob["state"]
    else:
        sd = blob
    sd = {k: v.float().numpy() for k, v in sd.items()}

    flat, dims = convert_state_dict(sd)

    out_dir = args.out_dir or model_cache_dir()
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{args.name}.npz")
    np.savez(out, **flat)
    cfg = {
        "sources": list(dims.sources),
        "channels": dims.channels,
        "depth": dims.depth,
        "nfft": dims.nfft,
        "bottom_channels": dims.bottom_channels,
        "t_layers": dims.t_layers,
        "segment": segment or dims.segment,
    }
    with open(os.path.join(out_dir, f"{args.name}.cfg.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    print(f"wrote {out} ({len(flat)} tensors) + sidecar; dims: {cfg}")


if __name__ == "__main__":
    main()
