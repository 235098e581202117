#!/usr/bin/env python
"""Score a hypothesis RTTM against a reference RTTM (DER).

Usage:
    python tools/score_der.py reference.rttm hypothesis.rttm \
        [--collar 0.25] [--score-overlap]

Prints one JSON line with der/missed/false_alarm/confusion, matching
the reference stack's scoring knobs (collar=0.25, ignore_overlap=True —
reference telephonic.yaml:20-21).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_turns(path: str):
    from whisper_nemo_tpu.diarize import read_speaker_timestamps

    return [
        (start_ms / 1000.0, end_ms / 1000.0, spk)
        for start_ms, end_ms, spk in read_speaker_timestamps(path)
    ]


def main() -> None:
    from whisper_nemo_tpu.diarize.metrics import diarization_error_rate

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("reference", help="reference RTTM")
    parser.add_argument("hypothesis", help="hypothesis RTTM")
    parser.add_argument("--collar", type=float, default=0.25)
    parser.add_argument(
        "--score-overlap",
        action="store_true",
        help="score overlapped-speech regions (default: ignored, like "
        "the reference config)",
    )
    args = parser.parse_args()

    result = diarization_error_rate(
        load_turns(args.reference),
        load_turns(args.hypothesis),
        collar=args.collar,
        ignore_overlap=not args.score_overlap,
    )
    print(json.dumps({k: round(v, 4) for k, v in result.items()}))


if __name__ == "__main__":
    main()
