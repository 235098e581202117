#!/usr/bin/env python
"""Diarization child-process entry (argv-compatible with the reference
nemo_process.py): decode audio to 16 kHz mono, write the handoff wav,
run the diarizer, leave pred_rttms/mono_file.rttm for the parent."""

import argparse
import os

from whisper_nemo_tpu.audio import decode_audio, write_wav
from whisper_nemo_tpu.config import create_config
from whisper_nemo_tpu.diarize import NeuralDiarizer

parser = argparse.ArgumentParser()
parser.add_argument(
    "-a", "--audio", help="name of the target audio file", required=True
)
parser.add_argument(
    "--device",
    dest="device",
    default="auto",
    help="'auto' picks the TPU when present; 'cpu' forces host execution",
)
parser.add_argument(
    "--domain",
    dest="domain",
    default="telephonic",
    choices=["telephonic", "meeting", "general"],
)
args = parser.parse_args()

if args.device == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

audio = decode_audio(args.audio)
ROOT = os.getcwd()
temp_path = os.path.join(ROOT, "temp_outputs")
os.makedirs(temp_path, exist_ok=True)
write_wav(os.path.join(temp_path, "mono_file.wav"), audio)

diarizer = NeuralDiarizer(cfg=create_config(temp_path, args.domain)).to(
    args.device
)
diarizer.diarize()
