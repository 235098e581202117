#!/usr/bin/env python
"""Convert NeMo .nemo archives to the framework's .npz param trees.

Usage:
    python tools/convert_nemo.py vad vad_multilingual_marblenet.nemo
    python tools/convert_nemo.py titanet titanet_large.nemo
    python tools/convert_nemo.py msdd diar_msdd_telephonic.nemo

The reference pipeline downloads these three archives through NeMo's
``NeuralDiarizer`` (/root/reference/diarize.py:19). Outputs land in
``WNT_MODEL_DIR`` (default ~/.cache/whisper_nemo_tpu) as ``<name>.npz``
plus — for the conv models — a ``<name>.cfg.json`` sidecar holding the
Jasper block configuration; ``diarize.pipeline.NeuralDiarizer`` detects
the sidecar and runs the converted weights through
``models/conv_asr.py`` instead of the random-init architectures.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("kind", choices=["vad", "titanet", "msdd"])
    ap.add_argument("nemo_path", help="path to the .nemo archive")
    ap.add_argument(
        "--name",
        default=None,
        help="output checkpoint name (default: archive basename)",
    )
    ap.add_argument("--out-dir", default=None, help="override WNT_MODEL_DIR")
    args = ap.parse_args()

    from whisper_nemo_tpu.engine.checkpoint import (
        model_cache_dir,
        save_params,
    )
    from whisper_nemo_tpu.engine import nemo_weights as nw

    out_dir = args.out_dir or model_cache_dir()
    os.makedirs(out_dir, exist_ok=True)
    name = args.name or os.path.splitext(os.path.basename(args.nemo_path))[0]

    config, sd = nw.extract_nemo(args.nemo_path)
    if args.kind == "vad":
        _, params, meta = nw.convert_marblenet(config, sd)
    elif args.kind == "titanet":
        _, params, meta = nw.convert_titanet(config, sd)
    else:
        params, meta, unmapped = nw.convert_msdd(config, sd)
        if unmapped:
            print(f"warning: {len(unmapped)} unmapped tensors "
                  f"(see log): {unmapped[:5]}", file=sys.stderr)

    out = os.path.join(out_dir, f"{name}.npz")
    save_params(out, params)
    if meta.get("blocks"):
        with open(os.path.join(out_dir, f"{name}.cfg.json"), "w") as f:
            json.dump(meta, f, indent=1)
    print(out)


if __name__ == "__main__":
    main()
