#!/usr/bin/env python
"""Sequential diarized-transcription CLI (argv-compatible with the
reference diarize.py; runs the TPU-native pipeline)."""

from whisper_nemo_tpu.cli.flow import build_arg_parser, run_sequential

if __name__ == "__main__":
    run_sequential(build_arg_parser(parallel=False).parse_args())
