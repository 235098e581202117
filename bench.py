#!/usr/bin/env python
"""End-to-end benchmark: diarized transcription RTF on one TPU chip.

Measures the full pipeline (BASELINE.json metric: "end-to-end
audio-min/s per chip (RTF)") on tiled fixture audio: batched Whisper
ASR (medium.en-scale, bf16) → forced alignment (MMS-300M-scale wav2vec2
emissions + Viterbi) → diarization (MarbleNet-scale VAD path,
TitaNet-large-scale multiscale embeddings, NME-SC clustering).
Checkpoints are random-initialized (zero-egress environment) but every
stage runs at production model scale; decoding is forced to 64-96
tokens per 30 s window so the decode loop does real-transcript work
rather than exiting on an early EOT.

Modes (VERDICT r1 #2/#3):
    python bench.py                     # 3600 s end-to-end + MFU
    python bench.py --seconds 300       # the r1 configuration
    python bench.py --mode sequential   # serving's window-serial path
    python bench.py --model large-v3 --demucs --domain meeting
                                        # BASELINE config 3

Prints ONE JSON line:
  {"metric": "end_to_end_rtf", "value": N, "unit": "x_realtime",
   "vs_baseline": N / 40}
vs_baseline is against the BASELINE.json north-star of 40x real time
for 1 h of audio. Detail (per-stage seconds, ASR analytic FLOPs,
TFLOP/s, MFU vs the chip's bf16 peak) goes to stderr.
"""

import argparse
import json
import sys
import time

import numpy as np


NORTH_STAR_RTF = 40.0

# bf16 peak TFLOP/s per chip by TPU generation (public spec sheets);
# keys are matched as substrings of the lowercased, space-stripped
# device_kind ("TPU v5 lite" → "tpuv5lite")
PEAK_TFLOPS = {
    "v4": 275.0,
    "v5e": 197.0,
    "v5lite": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,
}


def whisper_asr_flops(
    dims, n_windows: int, tokens_per_window: float, frames: int = 1500
) -> float:
    """Analytic forward FLOPs for the batched ASR stage (matmuls only;
    2 FLOPs per MAC). Encoder: conv stem + per-layer attention/MLP at
    ``frames`` positions. Decoder: KV-cached steps (self-attn over the
    running context, cross-attn over ``frames``) + per-window cross-KV
    prefill + logits."""
    d = dims.n_audio_state
    dt = dims.n_text_state
    v = dims.n_vocab
    t = frames

    conv = 2 * (2 * t) * 3 * dims.n_mels * d + 2 * t * 3 * d * d
    enc_layer = 24 * t * d * d + 4 * t * t * d
    enc = conv + dims.n_audio_layer * enc_layer

    n_tok = tokens_per_window
    # average self-attention context length ~ prompt + n_tok/2
    l_avg = 4 + n_tok / 2
    dec_step = (
        8 * dt * dt          # self qkvo
        + 4 * l_avg * dt     # self attention
        + 4 * dt * dt        # cross q,o
        + 4 * t * dt         # cross attention
        + 16 * dt * dt       # mlp
    )
    dec = dims.n_text_layer * (
        n_tok * dec_step + 4 * t * dt * dt  # cross-KV prefill
    ) + n_tok * 2 * dt * v
    return n_windows * (enc + dec)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seconds", type=int, default=3600)
    ap.add_argument(
        "--mode",
        choices=[
            "e2e", "parallel", "sequential", "serving", "streaming",
            "handler",
        ],
        default="e2e",
        help="e2e: batched ASR + align + diarize; parallel: the "
        "branch-parallel flow (diarization concurrent with "
        "ASR+alignment via parallel.branch, BASELINE config 4 / "
        "diarize_parallel.py — wall-clock RTF, not stage sum); "
        "sequential: the window-serial timestamped decode path; "
        "serving: the WindowScheduler exactly as the handler runs it "
        "(timestamped, serving batch, first-request vs steady-state "
        "latency); streaming: real-time chunked feed, word-commit "
        "latency; handler: the serverless handler(job) end-to-end — "
        "download skipped, ASR + diarization + merge + response "
        "build, plus concurrent-job scaling",
    )
    ap.add_argument(
        "--runs", type=int, default=3,
        help="measured runs after the compile warm-up (best reported; "
        "3 because the 1-core host adds multi-second noise to the "
        "align/cluster stage tails)",
    )
    ap.add_argument(
        "--batch-size", type=int, default=32,
        help="ASR decode windows per batch (e2e mode); 32 measured "
        "best per-window decode cost (0.33 ms/step/window vs 0.44 at "
        "16) with the flash-decode kernel",
    )
    ap.add_argument(
        "--beam", type=int, default=1,
        help="beam size for the ASR decode (e2e mode); 1 = greedy",
    )
    ap.add_argument(
        "--compute-type", default="int8",
        choices=["bfloat16", "float16", "float32", "int8"],
        help="ASR weight/compute type; int8 (default) = weight-only "
        "quantized linears — the reference's per-device reduced-"
        "precision mtypes choice (diarize.py:36: int8 on CPU, fp16 on "
        "CUDA) mapped to this chip, and the fastest measured config "
        "(decode 8.63 -> 8.14 ms/step; asr 5.8 -> 5.6 s at the hour "
        "workload vs bf16)",
    )
    ap.add_argument(
        "--kv-bits", type=int, default=8, choices=[4, 8],
        help="cross-attention KV storage width; 4 packs two values per "
        "byte (ops/cross_decode.py), halving the decode loop's "
        "dominant HBM stream again",
    )
    ap.add_argument(
        "--model", default="medium.en",
        help="whisper model name (BASELINE config 2 uses medium.en, "
        "config 3 large-v3)",
    )
    ap.add_argument(
        "--domain", default="telephonic",
        choices=["telephonic", "meeting", "general"],
        help="diarizer domain preset (e2e/parallel modes)",
    )
    ap.add_argument(
        "--demucs", action="store_true",
        help="run htdemucs vocal separation as a pre-stage at "
        "production scale (BASELINE config 3; random-init params in "
        "the zero-egress environment — the stage cost is real, the "
        "separated stems are discarded and the pipeline consumes the "
        "original 16 kHz audio)",
    )
    ap.add_argument(
        "--demucs-batch", type=int, default=8,
        help="7.8 s separation windows per device dispatch",
    )
    ap.add_argument(
        "--tokens-per-window", type=int, default=0,
        help="force exactly N decoded tokens per 30 s window (e2e/"
        "parallel/handler modes; 0 = the default 64-96 band that "
        "brackets real speech at ~2.5-3 tokens/s). The headline's "
        "sensitivity knob: sweep 64/128/224 to see RTF vs transcript "
        "density — 224 is Whisper's hard per-window ceiling, i.e. "
        "wall-to-wall dense speech (VERDICT r4 weak #1)",
    )
    ap.add_argument(
        "--refresh", type=float, default=1.0,
        help="streaming mode: min seconds of new audio between decode "
        "refreshes (commit latency floors at ~agreement*refresh-chunk)",
    )
    ap.add_argument(
        "--agreement", type=int, default=2,
        help="streaming mode: LocalAgreement window (2 = published "
        "default; 1 commits every refresh immediately)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    audio_seconds = args.seconds
    t_setup = time.time()

    from whisper_nemo_tpu.audio import decode_audio
    from whisper_nemo_tpu.engine.transcribe import WhisperEngine

    fixture = "/root/reference/tests/assets/test.opus"
    base = decode_audio(fixture)
    reps = int(np.ceil(audio_seconds * 16000 / len(base)))
    audio = np.tile(base, reps)[: audio_seconds * 16000]

    # open the device transfer path once (first D2H pays ~50 s of
    # connection setup on the axon tunnel; not a property of the model)
    np.asarray(jnp.zeros((1,)) + 1)
    device = jax.devices()[0]
    dev_kind = getattr(device, "device_kind", "unknown")
    peak = None
    for key, val in PEAK_TFLOPS.items():
        if key in str(dev_kind).lower().replace(" ", ""):
            peak = val

    def log(msg):
        print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
              flush=True)

    log(f"device {dev_kind} (bf16 peak {peak} TFLOP/s)"
        if peak else f"device {dev_kind} (peak unknown)")

    if args.mode == "handler":
        # the handler loads its own model stack (load_models); building
        # the bench engine too would double the HBM footprint
        run_handler_bench(args, audio, audio_seconds, args.runs, log)
        return

    engine = WhisperEngine(
        args.model, compute_type=args.compute_type, kv_bits=args.kv_bits
    )

    # single-mode runs unload on exit so one long-lived process can
    # measure several modes back-to-back (tools/bench_session.py)
    # without accumulating ~1-2 GB of dead weights per mode in HBM
    if args.mode == "sequential":
        try:
            run_sequential_bench(engine, audio, audio_seconds, args.runs, log)
        finally:
            engine.unload()
        return
    if args.mode == "serving":
        try:
            run_serving_bench(engine, audio, audio_seconds, args.runs, log)
        finally:
            engine.unload()
        return
    if args.mode == "streaming":
        try:
            run_streaming_bench(
                engine, audio, log,
                min_refresh_s=args.refresh, agreement_n=args.agreement,
            )
        finally:
            engine.unload()
        return

    from whisper_nemo_tpu.align import load_alignment_model
    from whisper_nemo_tpu.config import create_config
    from whisper_nemo_tpu.diarize.pipeline import NeuralDiarizer

    aligner, align_tok = load_alignment_model("auto", dtype="bfloat16")

    import tempfile

    tmp = tempfile.mkdtemp(prefix="wnt_bench_")
    diarizer = NeuralDiarizer(
        create_config(tmp, domain=args.domain), force_large_models=True
    )

    demucs_stage = None
    if args.demucs:
        # production-scale htdemucs (random init — zero egress), applied
        # at the model's native 44.1 kHz on the same audio duration;
        # vocals-only selection keeps HBM bounded, the stereo mix is
        # uploaded once and reused across warmup + measured runs
        from whisper_nemo_tpu.models.htdemucs import (
            HTDemucsDims,
            apply_segments,
            init_htdemucs_params,
        )

        ddims = HTDemucsDims()
        dparams = init_htdemucs_params(jax.random.PRNGKey(0), ddims)
        base44 = decode_audio(fixture, sampling_rate=ddims.samplerate)
        reps44 = int(np.ceil(audio_seconds * ddims.samplerate / len(base44)))
        audio44 = np.tile(base44, reps44)[: audio_seconds * ddims.samplerate]
        stereo44 = jnp.asarray(np.stack([audio44] * ddims.audio_channels))
        del base44, audio44
        vocals_i = ddims.sources.index("vocals")

        from whisper_nemo_tpu.ops.resample import resample_poly

        def demucs_stage(tag, timings):
            # full device-resident handoff: stems never leave HBM —
            # mono-mix + 44.1k→16k polyphase resample on device yields
            # the waveform the downstream stages consume (downloading
            # the stereo stems costs 30-50 s/h on the ~35 MB/s tunnel)
            t0 = time.time()
            vocals = apply_segments(
                dparams, stereo44, ddims,
                batch_size=args.demucs_batch,
                source_indices=(vocals_i,),
                device_out=True,
            )
            v16 = resample_poly(
                vocals[0].mean(axis=0), ddims.samplerate, 16000
            )
            v16.block_until_ready()
            timings["demucs"] = time.time() - t0
            log(
                f"{tag} demucs {timings['demucs']:.1f}s "
                f"({v16.shape[-1] / 16000:.0f}s separated, 16 kHz mono "
                f"on device)"
            )
            del vocals, v16

    # ~150 wpm synthetic transcript for the alignment stage (the ASR
    # text is unusable with random weights; the aligner cost depends on
    # per-segment frame x label counts, which this matches). One timed
    # segment per 25 s span, like the batched ASR path produces. A
    # --tokens-per-window sweep scales the word rate proportionally
    # (the 64-96 default band centers on ~80 tok/window ≈ 150 wpm), so
    # the align stage sees the same density the decode stage pays for.
    wpm = int(150 * (args.tokens_per_window or 80) / 80)
    words = ("hello world this is a benchmark transcript " * 250).split()
    transcript_words = (
        words * (audio_seconds * wpm // 60 // len(words) + 1)
    )[: audio_seconds * wpm // 60]
    seg_len_s = 25
    wps = len(transcript_words) / audio_seconds
    timed_segments = []
    for s in range(0, audio_seconds, seg_len_s):
        w0, w1 = int(s * wps), int((s + seg_len_s) * wps)
        timed_segments.append(
            {
                "start": float(s),
                "end": float(min(s + seg_len_s, audio_seconds)),
                "text": " ".join(transcript_words[w0:w1]),
            }
        )

    def asr_stage(tag, timings):
        t0 = time.time()
        # 64..96 generated tokens per 30 s window brackets real speech
        # density (~2.5-3 tokens/s); random weights never emit EOT, so
        # without the cap every window would decode to the 224 ceiling,
        # overcounting decode work ~2.3x vs. real transcripts
        # on the Pallas kernel path (real TPU) beam lanes SHARE their
        # window's cross-KV (ops/cross_decode.py i//beam index map), so
        # HBM cost per window matches greedy and the window batch stays
        # full; the CPU einsum path replicates KV per lane (~75 MB per
        # lane at medium.en), so there the product shrinks to the
        # greedy batch
        import jax as _jax

        if _jax.devices()[0].platform in ("tpu", "axon"):
            window_batch = args.batch_size
        else:
            window_batch = max(1, args.batch_size // args.beam)
        tpw = args.tokens_per_window
        segments, info = engine.transcribe_batched(
            audio,
            language="en",
            batch_size=window_batch,
            min_new_tokens=tpw or 64,
            max_new_tokens=tpw or 96,
            beam_size=args.beam,
        )
        timings["asr"] = time.time() - t0
        log(f"{tag} asr {timings['asr']:.1f}s ({len(segments)} segments)")
        return segments

    def align_stage(tag, timings):
        t0 = time.time()
        from whisper_nemo_tpu.align.segmented import align_segments

        word_ts = align_segments(
            aligner, align_tok, audio, timed_segments,
            language="eng", batch_size=8,
        )
        timings["align"] = time.time() - t0
        log(f"{tag} align {timings['align']:.1f}s ({len(word_ts)} words)")
        return word_ts

    def diarize_stage(tag, timings):
        t0 = time.time()
        turns = diarizer.diarize_waveform(audio)
        timings["diarize"] = time.time() - t0
        log(f"{tag} diarize {timings['diarize']:.1f}s ({len(turns)} turns)")
        return turns

    def run_once(tag):
        timings = {}
        if args.mode == "parallel":
            # the branch-parallel flow (diarize_parallel.py / BASELINE
            # config 4): diarization concurrent with ASR+alignment via
            # parallel.branch; on one chip both branches share the
            # device (the reference's single-GPU degradation) and the
            # win is host/device overlap. RTF uses WALL time. Stemming
            # runs before the fork, exactly like the reference
            # (diarize_parallel.py: demucs precedes the Popen).
            from whisper_nemo_tpu.parallel.branch import (
                asr_and_diarization,
            )

            t_wall = time.time()
            if demucs_stage is not None:
                demucs_stage(tag, timings)

            def asr_branch(devices):
                segments = asr_stage(tag, timings)
                word_ts = align_stage(tag, timings)
                return segments, word_ts

            def diar_branch(devices):
                return diarize_stage(tag, timings)

            (segments, word_ts), turns = asr_and_diarization(
                asr_branch, diar_branch
            )
            timings["wall"] = time.time() - t_wall
            log(f"{tag} wall {timings['wall']:.1f}s (branch-parallel)")
        else:
            if demucs_stage is not None:
                demucs_stage(tag, timings)
            segments = asr_stage(tag, timings)
            word_ts = align_stage(tag, timings)
            turns = diarize_stage(tag, timings)
        return timings, len(segments), len(word_ts), len(turns)

    # warm-up run compiles every jitted stage; the measured runs reflect
    # steady-state serving (compiles are cached across requests). Host
    # CPU contention on this box adds multi-second noise to stage
    # wall-clock, so the best of the measured runs is reported.
    log("warm-up run (compiles)")
    run_once("warmup")

    def cost(t):
        # parallel mode: wall time IS the metric (stages overlap)
        return t["wall"] if "wall" in t else sum(t.values())

    timings, n_segs, n_words, n_turns = run_once("measured-1")
    for i in range(args.runs - 1):
        timings2, *_ = run_once(f"measured-{i + 2}")
        if cost(timings2) < cost(timings):
            timings = timings2

    total = cost(timings)
    rtf = audio_seconds / total

    n_windows = int(np.ceil(audio_seconds / 30))
    flops = whisper_asr_flops(
        engine.dims, n_windows, float(args.tokens_per_window or 80)
    )
    tflops_s = flops / timings["asr"] / 1e12
    mfu = tflops_s / peak if peak else None

    result = {
        "metric": "end_to_end_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / NORTH_STAR_RTF, 3),
    }
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "detail": {
                    "audio_seconds": audio_seconds,
                    "device": str(dev_kind),
                    "stage_seconds": {
                        k: round(v, 2) for k, v in timings.items()
                    },
                    "segments": n_segs,
                    "aligned_words": n_words,
                    "speaker_turns": n_turns,
                    "tokens_per_window": args.tokens_per_window or "64-96",
                    "asr_analytic_tflops": round(flops / 1e12, 1),
                    "asr_tflops_per_s": round(tflops_s, 2),
                    "asr_mfu_vs_bf16_peak": (
                        round(mfu, 4) if mfu is not None else None
                    ),
                    "setup_seconds": round(time.time() - t_setup - total, 1),
                }
            }
        ),
        file=sys.stderr,
    )
    engine.unload()


def run_handler_bench(args, audio, audio_seconds, runs, log):
    """The serverless handler benched at the job scope (VERDICT r4
    weak #4): ``handler(job)`` end-to-end — request validation, ASR via
    the shared WindowScheduler, diarization, overlap merge, smoothing,
    readable-transcript build, statistics — everything the reference's
    request-scoped ``processing_time`` covers (main.py:361-486) except
    the network download, which is stubbed with a local-file link.
    Reports the job-level RTF on the full duration, then the
    concurrency story: one 600 s job solo vs four submitted together
    (jobs share the scheduler's decode batches; diarization runs in
    executor threads)."""
    import os
    import tempfile

    os.environ["WNT_SERVING_MODEL"] = args.model
    import asyncio

    import importlib

    # the module, not the re-exported handler() function that
    # serving/__init__ shadows the submodule name with
    H = importlib.import_module("whisper_nemo_tpu.serving.handler")
    # if an earlier step in a long-lived session already imported the
    # serving package, the module-level default (the reference's
    # large-v2, handler.py:34) was baked before the env var above was
    # set — pin the bench's model explicitly (the r5 session-2 handler
    # measurement silently ran large-v2 this way)
    H.WHISPER_MODEL_NAME = args.model
    from whisper_nemo_tpu.audio.wav import write_wav
    from whisper_nemo_tpu.serving.scheduler import WindowScheduler

    H.load_models(warm=False)
    # rebuild the scheduler with the bench's forced decode density
    # (random weights never emit EOT; without the cap every window
    # decodes to the 224 ceiling — same reasoning as asr_stage)
    tpw = args.tokens_per_window
    H.window_scheduler.shutdown()
    H.window_scheduler = WindowScheduler(
        H.whisper_model.engine,
        batch_size=int(os.environ.get("WNT_SERVING_BATCH", "16")),
        without_timestamps=False,
        min_new_tokens=tpw or 64,
        max_new_tokens=tpw or 96,
    )
    H.warmup()

    tmp = tempfile.mkdtemp(prefix="wnt_handler_bench_")
    files = {"full.wav": os.path.join(tmp, "full.wav")}
    write_wav(files["full.wav"], audio)
    short_seconds = min(600, audio_seconds)
    files["short.wav"] = os.path.join(tmp, "short.wav")
    write_wav(files["short.wav"], audio[: short_seconds * 16000])

    async def fake_download(url: str) -> str:
        # fresh hard link per job: the handler unlinks its temp file
        # in its finally block (main.py contract), and concurrent jobs
        # must not delete each other's input
        name = url.rsplit("/", 1)[-1]
        path = os.path.join(
            tmp, f"job{os.urandom(4).hex()}_{name}"
        )
        os.link(files[name], path)
        return path

    H.download_audio_file = fake_download

    def job(name):
        return {
            "id": "bench",
            "input": {
                "audio_url": f"https://bench.local/{name}",
                "language": "en",
            },
        }

    async def run_jobs(names):
        t0 = time.time()
        results = await asyncio.gather(*(H.handler(job(n)) for n in names))
        wall = time.time() - t0
        for r in results:
            assert r.get("success"), r.get("error")
        return wall, results

    def run_jobs_sync(names):
        out = asyncio.run(run_jobs(names))
        # each job leaves hour-scale device intermediates (align
        # trellis chunks, diarizer embeddings) behind reference
        # cycles; without a forced collection the second 1 h job OOMs
        # HBM (RESOURCE_EXHAUSTED — the CLAUDE.md gen-2 GC failure
        # mode, reproduced in the first r5 bench session)
        import gc

        gc.collect()
        if os.environ.get("WNT_HANDLER_DEBUG"):
            # the axon backend exposes no memory_stats; live_arrays()
            # still sees every device buffer this process holds —
            # shapes name the owner of whatever survives the per-job
            # collection
            import jax

            arrs = jax.live_arrays()
            total = sum(a.nbytes for a in arrs)
            top = sorted(arrs, key=lambda a: -a.nbytes)[:10]
            log(
                f"live device arrays after gc: {len(arrs)} "
                f"({total / 1e9:.2f} GB); top: "
                + ", ".join(
                    f"{tuple(a.shape)}/{a.dtype.name}/"
                    f"{a.nbytes / 1e6:.0f}MB"
                    for a in top
                )
            )
        return out

    try:
        log("warmup job (compiles diarizer at job shapes)")
        wall, _ = run_jobs_sync(["full.wav"])
        log(f"warmup handler job {wall:.1f}s")

        best = None
        for i in range(runs):
            wall, results = run_jobs_sync(["full.wav"])
            log(
                f"measured-{i + 1} handler job {wall:.1f}s "
                f"(processing_time {results[0]['processing_time']:.1f}s, "
                f"{results[0]['statistiques'].get('nombre_segments')} "
                f"segments)"
            )
            best = wall if best is None else min(best, wall)
        rtf = audio_seconds / best

        # concurrency: one short job solo, then four together
        solo, _ = run_jobs_sync(["short.wav"])
        log(f"short job solo {solo:.1f}s ({short_seconds}s audio)")
        concurrent_wall, results4 = run_jobs_sync(["short.wav"] * 4)
        agg_rtf = 4 * short_seconds / concurrent_wall
        log(
            f"4 concurrent short jobs wall {concurrent_wall:.1f}s "
            f"(aggregate {agg_rtf:.0f}x vs solo "
            f"{short_seconds / solo:.0f}x; per-job processing_time "
            f"{[round(r['processing_time'], 1) for r in results4]})"
        )

        print(
            json.dumps(
                {
                    "metric": "handler_job_rtf",
                    "value": round(rtf, 2),
                    "unit": "x_realtime",
                    "vs_baseline": round(rtf / NORTH_STAR_RTF, 3),
                }
            )
        )
        print(
            json.dumps(
                {
                    "detail": {
                        "mode": "handler",
                        "audio_seconds": audio_seconds,
                        "job_wall_s": round(best, 2),
                        "short_job_solo_s": round(solo, 2),
                        "concurrent4_wall_s": round(concurrent_wall, 2),
                        "concurrent4_aggregate_rtf": round(agg_rtf, 1),
                    }
                }
            ),
            file=sys.stderr,
        )
    finally:
        # release the handler's module-global model stack even on
        # failure — the first r5 session leaked it after an OOM and
        # every later step in the long-lived process failed on the
        # pinned HBM
        H.window_scheduler.shutdown()
        H.whisper_model.engine.unload()
        H.whisper_model = None
        H.diarization_pipeline = None
        H.window_scheduler = None


def run_sequential_bench(engine, audio, audio_seconds, runs, log):
    """RTF of the window-serial timestamped decode path — the one the
    openai-whisper facade and serving use (reference main.py:381-391
    semantics). Reported as its own metric line."""
    def run_once(tag):
        t0 = time.time()
        # without_timestamps: random weights emit garbage timestamps
        # whose seek rule could advance 10 ms/window; the per-window
        # compute (encode + 64-96 decode steps + host sync) is the
        # same, and the window count stays ceil(T/30)
        segments, info = engine.transcribe_sequential(
            audio,
            language="en",
            condition_on_previous_text=True,
            temperatures=(0.0,),  # random weights would always fall back
            without_timestamps=True,
            min_new_tokens=64,
            max_new_tokens=96,
        )
        dt = time.time() - t0
        log(f"{tag} sequential asr {dt:.1f}s ({len(segments)} segments)")
        return dt

    log("warm-up run (compiles)")
    run_once("warmup")
    best = min(run_once(f"measured-{i + 1}") for i in range(runs))
    rtf = audio_seconds / best
    print(
        json.dumps(
            {
                "metric": "sequential_asr_rtf",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / NORTH_STAR_RTF, 3),
            }
        )
    )


def run_serving_bench(engine, audio, audio_seconds, runs, log):
    """The WindowScheduler configured exactly as serving runs it
    (handler.py: without_timestamps=False, WNT_SERVING_BATCH default
    16): reports the served RTF plus first-request and steady-state
    single-window latency after warmup (VERDICT r2 weak #2 — the
    timestamp-grammar decode had no on-chip number)."""
    import os

    import numpy as np

    from whisper_nemo_tpu.serving.scheduler import WindowScheduler

    batch = int(os.environ.get("WNT_SERVING_BATCH", "16"))
    sched = WindowScheduler(
        engine,
        batch_size=batch,
        without_timestamps=False,
        min_new_tokens=64,
        max_new_tokens=96,
    )
    try:
        # warmup: the handler's fail-fast compile pass (handler.warmup)
        # — every bucket shape, so the latency probe below measures the
        # bucket-1 decode and the hour runs never compile inline
        t0 = time.time()
        sched.warmup()
        sched.transcribe(np.zeros(16000, np.float32), "en")
        log(f"warmup (compiles) {time.time() - t0:.1f}s")

        # single-window request latency: first vs steady state
        req = audio[: 30 * 16000]
        lat = []
        for i in range(4):
            t0 = time.time()
            sched.transcribe(req, "en")
            lat.append(time.time() - t0)
        log(
            f"single-window latency: first {lat[0] * 1e3:.0f} ms, "
            f"steady {min(lat[1:]) * 1e3:.0f} ms"
        )

        best = np.inf
        for i in range(runs):
            t0 = time.time()
            segments = sched.transcribe(audio, "en")
            dt = time.time() - t0
            log(f"measured-{i + 1} serving {dt:.1f}s ({len(segments)} segments)")
            best = min(best, dt)
        rtf = audio_seconds / best
        print(
            json.dumps(
                {
                    "metric": "serving_rtf",
                    "value": round(rtf, 2),
                    "unit": "x_realtime",
                    "vs_baseline": round(rtf / NORTH_STAR_RTF, 3),
                }
            )
        )
        print(
            json.dumps(
                {
                    "detail": {
                        "mode": "serving",
                        "batch": batch,
                        "without_timestamps": False,
                        "first_request_latency_ms": round(lat[0] * 1e3),
                        "steady_request_latency_ms": round(
                            min(lat[1:]) * 1e3
                        ),
                    }
                }
            ),
            file=sys.stderr,
        )
    finally:
        sched.shutdown()


def run_streaming_bench(
    engine, audio, log, feed_chunk_s=0.5,
    min_refresh_s=1.0, agreement_n=2,
):
    """Real-time streaming simulation (engine/streaming.py): audio is
    fed in ``feed_chunk_s`` chunks at real time (sleeping out the
    remainder of each chunk after processing); reports p50/p95
    word-commit latency = wall-clock at commit − the word's end time in
    the stream, plus the processing duty cycle. Capped at 120 s of
    audio — the simulation runs in real time by construction.

    Zero-egress note: every refresh pays the REAL device decode on the
    current buffer (the measured cost), but the hypothesis handed to
    the LocalAgreement-2 policy is a deterministic 2-words/s transcript
    anchored to stream time — random-init weights re-transcribe a
    growing buffer to a *different* garbage string each refresh, so no
    two hypotheses would ever agree and nothing would commit. With
    stable hypotheses the commit path runs its true mechanics
    (agreement, frontier, trimming) at true refresh cost."""
    import numpy as np

    from whisper_nemo_tpu.engine.streaming import StreamingTranscriber

    audio = audio[: 120 * 16000]
    chunk = int(feed_chunk_s * 16000)
    wps = 2.0  # synthetic stable transcript rate

    class _Seg:
        __slots__ = ("start", "end", "text")

        def __init__(self, s, e, t):
            self.start, self.end, self.text = s, e, t

    holder = []

    def bench_transcribe(buffer):
        # the real decode at the real buffer shape (result discarded)
        engine.transcribe_sequential(
            buffer,
            language="en",
            temperatures=(0.0,),
            condition_on_previous_text=False,
            without_timestamps=True,
            min_new_tokens=48,
            max_new_tokens=72,
        )
        offset = holder[0]._buffer_offset if holder else 0.0
        dur = len(buffer) / 16000.0
        first = int(np.ceil(offset * wps))
        last = int(np.floor((offset + dur) * wps))
        return [
            _Seg(i / wps - offset, (i + 1) / wps - offset, f"word{i}")
            for i in range(first, last)
        ]

    log(
        f"streaming policy: refresh {min_refresh_s} s, "
        f"LocalAgreement-{agreement_n}"
    )
    # warmup: compile the refresh decode outside the timed stream
    st = StreamingTranscriber(
        transcribe_fn=bench_transcribe,
        min_refresh_s=min_refresh_s, agreement_n=agreement_n,
    )
    holder.append(st)
    st.push(np.zeros(3 * 16000, np.float32))
    st.flush()

    st = StreamingTranscriber(
        transcribe_fn=bench_transcribe,
        min_refresh_s=min_refresh_s, agreement_n=agreement_n,
    )
    holder[0] = st
    t_start = time.time()
    busy = 0.0
    latencies = []
    refresh_ms = []
    for pos in range(0, len(audio), chunk):
        stream_t = pos / 16000.0
        # real-time pacing: wait until the chunk "arrives"
        wait = t_start + stream_t - time.time()
        if wait > 0:
            time.sleep(wait)
        t0 = time.time()
        words = st.push(audio[pos : pos + chunk])
        dt = time.time() - t0
        busy += dt
        if dt > 0.05:  # a refresh (not a buffer-only push)
            refresh_ms.append(dt * 1e3)
        now = time.time() - t_start
        latencies.extend(now - w.end for w in words)
    words = st.flush()
    now = time.time() - t_start
    latencies.extend(now - w.end for w in words)

    lat = np.asarray(latencies)
    p50 = float(np.percentile(lat, 50)) if len(lat) else float("nan")
    p95 = float(np.percentile(lat, 95)) if len(lat) else float("nan")
    log(
        f"streaming: {len(lat)} words committed, p50 {p50:.2f}s "
        f"p95 {p95:.2f}s, duty cycle {busy / now:.2%}, refresh p50 "
        f"{np.percentile(refresh_ms, 50):.0f} ms"
        if refresh_ms
        else f"streaming: {len(lat)} words committed"
    )
    print(
        json.dumps(
            {
                "metric": "streaming_word_commit_latency_p50",
                "value": round(p50, 2),
                "unit": "seconds",
                "vs_baseline": None,
            }
        )
    )
    print(
        json.dumps(
            {
                "detail": {
                    "mode": "streaming",
                    "min_refresh_s": min_refresh_s,
                    "agreement_n": agreement_n,
                    "audio_seconds": len(audio) / 16000.0,
                    "words_committed": int(len(lat)),
                    "p50_s": round(p50, 2),
                    "p95_s": round(p95, 2),
                    "duty_cycle": round(busy / now, 4),
                    "refresh_p50_ms": (
                        round(float(np.percentile(refresh_ms, 50)))
                        if refresh_ms
                        else None
                    ),
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
