"""Shared stage implementations for the diarization CLIs.

The sequential flow mirrors the reference CLI stage-for-stage
(diarize.py:93-261): optional source separation → Whisper ASR → forced
alignment → mono handoff → diarization → word/speaker merge →
punctuation realignment → sentence grouping → txt/SRT writers →
cleanup. ``diarize_parallel`` runs the diarization branch concurrently
(reference diarize_parallel.py:117-120 uses a child process; here the
branch can also run in-process on a separate thread/mesh — see
``parallel.branch``).
"""

from __future__ import annotations

import argparse
import logging
import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from .. import asr as fw
from ..align import (
    generate_emissions,
    get_alignments,
    get_spans,
    load_alignment_model,
    postprocess_results,
    preprocess_text,
)
from ..audio import write_wav
from ..config import create_config
from ..post import (
    apply_punctuation_labels,
    get_realigned_ws_mapping_with_punctuation,
    get_sentences_speaker_mapping,
    get_speaker_aware_transcript,
    get_words_speaker_mapping,
    write_srt,
)
from ..text import langs_to_iso, process_language_arg, punct_model_langs
from ..text.tokenizer import find_numeral_symbol_tokens
from ..utils import cleanup, get_logger
from ..utils.logging import stage_timer

logger = get_logger(__name__)

# per-device reduced-precision compute (reference diarize.py:36); on
# TPU int8 weight-only decode measured fastest (8.63 -> 8.14 ms/step,
# asr 5.8 -> 5.6 s/h vs bf16) with parity-tested token agreement
mtypes = {"cpu": "int8", "cuda": "float16", "tpu": "int8", "auto": "default"}


def build_arg_parser(parallel: bool = False) -> argparse.ArgumentParser:
    """The reference CLI's exact flag surface (diarize.py:39-92;
    divergent defaults of the parallel variant at diarize_parallel.py:62,70)."""
    from ..text import whisper_langs

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-a", "--audio", help="name of the target audio file", required=True
    )
    parser.add_argument(
        "--no-stem",
        action="store_false",
        dest="stemming",
        default=True,
        help="Disables source separation. "
        "This helps with long files that don't contain a lot of music.",
    )
    parser.add_argument(
        "--suppress_numerals",
        action="store_true",
        dest="suppress_numerals",
        default=False,
        help="Suppresses Numerical Digits. "
        "This helps the diarization accuracy but converts all digits into "
        "written text.",
    )
    parser.add_argument(
        "--whisper-model",
        dest="model_name",
        default="large-v2" if parallel else "medium.en",
        help="name of the Whisper model to use",
    )
    parser.add_argument(
        "--batch-size",
        type=int,
        dest="batch_size",
        default=4 if parallel else 8,
        help="Batch size for batched inference, reduce if you run out of "
        "memory, set to 0 for original whisper longform inference",
    )
    parser.add_argument(
        "--language",
        type=str,
        default=None,
        choices=whisper_langs,
        help="Language spoken in the audio, specify None to perform "
        "language detection",
    )
    parser.add_argument(
        "--device",
        dest="device",
        default="auto",
        help="'auto' picks the TPU when present; 'cpu' forces host execution",
    )
    parser.add_argument(
        "--mesh",
        dest="mesh",
        default=None,
        help="device mesh for the ASR branch, e.g. 'dp=4,tp=2' "
        "('dp' = all-device data parallelism; defaults to the WNT_MESH "
        "environment variable; unset = single device)",
    )
    parser.add_argument(
        "--domain",
        dest="domain",
        default="telephonic",
        choices=["telephonic", "meeting", "general"],
        help="diarizer domain preset (the reference hardcodes telephonic)",
    )
    parser.add_argument(
        "--num-speakers",
        type=int,
        dest="num_speakers",
        default=None,
        help="force an exact speaker count (default: estimate)",
    )
    parser.add_argument(
        "--max-speakers",
        type=int,
        dest="max_speakers",
        default=None,
        help="cap the estimated speaker count",
    )
    if parallel:
        parser.add_argument(
            "--subprocess-diarization",
            action="store_true",
            dest="subprocess_diarization",
            default=False,
            help="run the diarization branch in a child OS process "
            "(the reference's isolation mechanism) instead of an "
            "in-process thread",
        )
    return parser


def maybe_separate_vocals(audio_path: str, stemming: bool, device: str,
                          temp_dir: str = "temp_outputs") -> str:
    """Demucs vocal isolation with the reference's graceful fallback
    (diarize.py:95-116): on any failure, continue with the original
    audio and warn."""
    if not stemming:
        return audio_path
    try:
        from ..models.htdemucs import separate_vocals

        return separate_vocals(audio_path, temp_dir, device)
    except Exception as exc:  # missing weights / unimplemented / OOM
        logging.warning(
            "Source splitting failed, using original audio file. "
            "Use --no-stem argument to disable it. (%s)", exc,
        )
        return audio_path


@dataclass
class AsrResult:
    full_transcript: str
    language: str
    audio: np.ndarray
    segments: Optional[list] = None  # timed segments (batched path)


def run_asr(
    vocal_target: str,
    model_name: str,
    batch_size: int,
    language: Optional[str],
    suppress_numerals: bool,
    device: str,
    mesh=None,
) -> AsrResult:
    """Whisper stage (reference diarize.py:119-151). ``mesh`` routes
    the engine onto a device mesh (a Mesh, a 'dp=4,tp=2' spec string,
    or None to read WNT_MESH): params get TP placements and the window
    batch shards over dp."""
    compute = mtypes.get(device, "default")
    model = fw.WhisperModel(
        model_name, device=device, compute_type=compute, mesh=mesh
    )
    pipeline = fw.BatchedInferencePipeline(model)
    audio = fw.decode_audio(vocal_target)
    suppress = (
        find_numeral_symbol_tokens(model.hf_tokenizer)
        if suppress_numerals
        else [-1]
    )
    if batch_size > 0:
        segments, info = pipeline.transcribe(
            audio, language, suppress_tokens=suppress, batch_size=batch_size
        )
        segments = list(segments)
        timed = [
            {"start": s.start, "end": s.end, "text": s.text}
            for s in segments
        ]
    else:
        segments, info = model.transcribe(
            audio, language, suppress_tokens=suppress, vad_filter=True
        )
        segments = list(segments)
        # the engine restores sequential-path segment times from the
        # VAD-concatenated audio back to the original recording
        # (transcribe.py time_map), so the per-segment alignment fast
        # path stays available here too
        timed = [
            {"start": s.start, "end": s.end, "text": s.text}
            for s in segments
        ]
    text = "".join(s.text for s in segments)
    return AsrResult(text, info.language, audio, timed)


def run_alignment(
    audio: np.ndarray,
    full_transcript: str,
    language: str,
    batch_size: int,
    device: str,
    timed_segments: Optional[list] = None,
) -> List[dict]:
    """Forced-alignment stage (reference diarize.py:153-184).

    With timed ASR segments available, each segment aligns against its
    own audio span (batched bucketed Viterbi — Σtᵢ·lᵢ instead of T·L);
    otherwise the whole transcript aligns globally.
    """
    if not full_transcript.strip():
        logging.warning("empty transcript; skipping forced alignment")
        return []
    model, tokenizer = load_alignment_model(
        device, dtype="bfloat16" if device != "cpu" else None
    )
    iso = langs_to_iso.get(language, "eng")
    if timed_segments:
        from ..align.segmented import align_segments

        return align_segments(
            model,
            tokenizer,
            audio,
            timed_segments,
            language=iso,
            batch_size=max(batch_size, 1),
        )
    emissions, stride = generate_emissions(
        model, audio, batch_size=max(batch_size, 1)
    )
    tokens_starred, text_starred = preprocess_text(
        full_transcript, romanize=True, language=iso
    )
    segments, scores, blank = get_alignments(emissions, tokens_starred, tokenizer)
    spans = get_spans(tokens_starred, segments, blank)
    return postprocess_results(text_starred, spans, stride, scores)


def run_diarization(
    audio: np.ndarray,
    temp_path: str,
    domain: str = "telephonic",
    num_speakers: Optional[int] = None,
    max_speakers: Optional[int] = None,
) -> List[List[int]]:
    """Diarization branch (reference diarize.py:186-216): mono wav
    handoff, NeuralDiarizer, RTTM parse back. The optional speaker-count
    knobs expose the pyannote-path contract (main.py:144-161) on the
    CLI."""
    from ..diarize import NeuralDiarizer, read_speaker_timestamps
    from ..diarize.rttm import write_rttm

    os.makedirs(temp_path, exist_ok=True)
    write_wav(os.path.join(temp_path, "mono_file.wav"), audio)
    diarizer = NeuralDiarizer(cfg=create_config(temp_path, domain))
    if num_speakers is None and max_speakers is None:
        diarizer.diarize()
    else:
        turns = diarizer.diarize_waveform(
            audio, num_speakers=num_speakers, max_speakers=max_speakers
        )
        out_dir = os.path.join(temp_path, "pred_rttms")
        os.makedirs(out_dir, exist_ok=True)
        write_rttm(os.path.join(out_dir, "mono_file.rttm"), turns)
    rttm = os.path.join(temp_path, "pred_rttms", "mono_file.rttm")
    return read_speaker_timestamps(rttm)


def maybe_restore_punctuation(wsm: List[dict], language: str) -> List[dict]:
    """Punctuation stage with the reference's language gate
    (diarize.py:220-250)."""
    if language not in punct_model_langs:
        logging.warning(
            f"Punctuation restoration is not available for {language} "
            "language. Using the original punctuation."
        )
        return wsm
    try:
        from ..models.punctuation import PunctuationModel

        model = PunctuationModel(model="kredor/punctuate-all")
        words = [w["word"] for w in wsm]
        labeled = model.predict(words, chunk_size=230)
        return apply_punctuation_labels(wsm, labeled)
    except Exception as exc:
        logging.warning("Punctuation restoration unavailable (%s)", exc)
        return wsm


def write_outputs(ssm: List[dict], audio_path: str) -> None:
    """txt + SRT next to the input (reference diarize.py:255-259)."""
    base = os.path.splitext(audio_path)[0]
    with open(f"{base}.txt", "w", encoding="utf-8-sig") as f:
        get_speaker_aware_transcript(ssm, f)
    with open(f"{base}.srt", "w", encoding="utf-8-sig") as srt:
        write_srt(ssm, srt)


def _apply_device_choice(device: str) -> None:
    """Honor --device before any JAX backend initializes. 'cpu' forces
    host execution (the CI-parity path); 'auto'/'tpu' use the platform
    JAX selected (the axon/TPU plugin when present)."""
    if device == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            logger.warning("could not force CPU platform (backend already up)")


def run_sequential(args) -> None:
    """The full sequential CLI flow (reference diarize.py)."""
    _apply_device_choice(args.device)
    language = process_language_arg(args.language, args.model_name)
    temp_path = os.path.join(os.getcwd(), "temp_outputs")

    vocal_target = maybe_separate_vocals(
        args.audio, args.stemming, args.device, temp_path
    )

    with stage_timer("asr", logger):
        asr = run_asr(
            vocal_target,
            args.model_name,
            args.batch_size,
            language,
            args.suppress_numerals,
            args.device,
            mesh=getattr(args, "mesh", None),
        )
    with stage_timer("alignment", logger):
        word_timestamps = run_alignment(
            asr.audio, asr.full_transcript, asr.language,
            args.batch_size, args.device, timed_segments=asr.segments,
        )
    with stage_timer("diarization", logger):
        speaker_ts = run_diarization(
            asr.audio, temp_path, args.domain,
            num_speakers=getattr(args, "num_speakers", None),
            max_speakers=getattr(args, "max_speakers", None),
        )

    _merge_and_write(word_timestamps, speaker_ts, asr.language, args.audio)
    cleanup(temp_path)


def _merge_and_write(word_timestamps, speaker_ts, language, audio_path):
    if not speaker_ts:
        speaker_ts = [[0, int(1e10), 0]]  # silence-only: single speaker
    wsm = get_words_speaker_mapping(word_timestamps, speaker_ts, "start")
    wsm = maybe_restore_punctuation(wsm, language)
    wsm = get_realigned_ws_mapping_with_punctuation(wsm)
    ssm = get_sentences_speaker_mapping(wsm, speaker_ts)
    write_outputs(ssm, audio_path)


def run_parallel(args) -> None:
    """The branch-parallel CLI flow (reference diarize_parallel.py):
    the diarization branch runs concurrently with ASR+alignment.

    In-process mode maps the two branches onto DISJOINT device core
    groups (SURVEY P1, the TPU-native replacement for the reference's
    child process): ``parallel.branch.run_branches`` splits the devices
    75/25, the ASR branch builds its engine mesh over the large group
    and the diarization branch pins its computations to the small one
    via a thread-local default device, so the branches' XLA executions
    overlap on separate cores. On a single-device host both branches
    share the chip (the reference's single-GPU degradation)."""
    _apply_device_choice(args.device)
    language = process_language_arg(args.language, args.model_name)
    temp_path = os.path.join(os.getcwd(), "temp_outputs")
    vocal_target = maybe_separate_vocals(
        args.audio, args.stemming, args.device, temp_path
    )

    audio = fw.decode_audio(vocal_target)
    diar_result: dict = {}

    use_subprocess = getattr(args, "subprocess_diarization", False)
    if use_subprocess:
        # the reference's exact isolation mechanism
        # (diarize_parallel.py:117-120): a child OS process runs the
        # diarization branch; join checks the return code and surfaces
        # the child's stderr
        import subprocess
        import sys

        child = subprocess.Popen(
            [
                sys.executable,
                os.path.join(os.path.dirname(__file__), "..", "..",
                             "nemo_process.py"),
                "-a", vocal_target,
                "--device", args.device,
                "--domain", args.domain,
            ],
            stderr=subprocess.PIPE,
        )
        with stage_timer("asr", logger):
            asr = run_asr(
                vocal_target, args.model_name, args.batch_size,
                language, args.suppress_numerals, args.device,
                mesh=getattr(args, "mesh", None),
            )
        with stage_timer("alignment", logger):
            word_timestamps = run_alignment(
                audio, asr.full_transcript, asr.language,
                args.batch_size, args.device, timed_segments=asr.segments,
            )
        _, stderr = child.communicate()
        if child.returncode != 0:
            raise RuntimeError(
                "Diarization branch (child process) failed:\n"
                + stderr.decode(errors="replace")
            )
        from ..diarize import read_speaker_timestamps

        diar_result["speaker_ts"] = read_speaker_timestamps(
            os.path.join(temp_path, "pred_rttms", "mono_file.rttm")
        )
        _merge_and_write(
            word_timestamps, diar_result["speaker_ts"],
            asr.language, args.audio,
        )
        cleanup(temp_path)
        return

    # in-process: disjoint core groups via parallel.branch (P1); the
    # first error re-raises at the join, mirroring the reference's
    # rc!=0 assert (diarize_parallel.py:191-196)
    import jax

    from ..parallel.branch import asr_and_diarization
    from ..parallel.mesh import mesh_from_spec

    def asr_branch(devices):
        with jax.default_device(devices[0]):
            mesh_spec = getattr(args, "mesh", None) or os.environ.get(
                "WNT_MESH", ""
            )
            if mesh_spec and not isinstance(mesh_spec, str):
                mesh = mesh_spec  # already a Mesh (programmatic callers)
            elif mesh_spec:
                mesh = mesh_from_spec(mesh_spec, devices)
            elif len(devices) > 1:
                mesh = mesh_from_spec("dp", devices)
            else:
                mesh = False  # single committed device, no mesh overhead
            with stage_timer("asr", logger):
                asr = run_asr(
                    vocal_target, args.model_name, args.batch_size,
                    language, args.suppress_numerals, args.device,
                    mesh=mesh,
                )
            with stage_timer("alignment", logger):
                word_timestamps = run_alignment(
                    audio, asr.full_transcript, asr.language,
                    args.batch_size, args.device,
                    timed_segments=asr.segments,
                )
            return asr, word_timestamps

    def diar_branch(devices):
        # thread-local default device pins the whole diarization
        # stack's uncommitted arrays/computations to this core group
        with jax.default_device(devices[0]):
            with stage_timer("diarization", logger):
                return run_diarization(
                    audio, temp_path, args.domain,
                    num_speakers=getattr(args, "num_speakers", None),
                    max_speakers=getattr(args, "max_speakers", None),
                )

    (asr, word_timestamps), speaker_ts = asr_and_diarization(
        asr_branch, diar_branch
    )

    _merge_and_write(word_timestamps, speaker_ts, asr.language, args.audio)
    cleanup(temp_path)
