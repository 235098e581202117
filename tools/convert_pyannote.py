#!/usr/bin/env python
"""Convert a pyannote segmentation checkpoint to this framework's npz.

Usage:
    python tools/convert_pyannote.py /path/to/pytorch_model.bin \
        [--name pyannote_segmentation] [--out-dir DIR]

Accepts ``pyannote/segmentation-3.0``-style torch/lightning checkpoints
(PyanNet: SincNet → BiLSTM → linear → powerset classifier). The output
lands in ``WNT_MODEL_DIR`` as ``<name>.npz``; the diarizer picks it up
as a neural VAD when no NeMo MarbleNet checkpoint is installed.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt_path", help="pytorch_model.bin / .ckpt path")
    ap.add_argument("--name", default="pyannote_segmentation")
    ap.add_argument("--out-dir", default=None, help="override WNT_MODEL_DIR")
    args = ap.parse_args()

    from whisper_nemo_tpu.engine.checkpoint import (
        model_cache_dir,
        save_params,
    )
    from whisper_nemo_tpu.engine.pyannote_weights import (
        convert_pyannet,
        extract_pyannote,
    )

    out_dir = args.out_dir or model_cache_dir()
    os.makedirs(out_dir, exist_ok=True)
    params = convert_pyannet(extract_pyannote(args.ckpt_path))
    out = os.path.join(out_dir, f"{args.name}.npz")
    save_params(out, params)
    print(out)


if __name__ == "__main__":
    main()
