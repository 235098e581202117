#!/usr/bin/env python
"""Branch-parallel diarized-transcription CLI (argv-compatible with the
reference diarize_parallel.py; ASR and diarization run concurrently)."""

from whisper_nemo_tpu.cli.flow import build_arg_parser, run_parallel

if __name__ == "__main__":
    run_parallel(build_arg_parser(parallel=True).parse_args())
