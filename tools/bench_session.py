#!/usr/bin/env python
"""Run every outstanding TPU measurement in ONE long-lived process.

The axon tunnel's per-process connection setup grows with session
churn (~50 s fresh → 15+ min after many short TPU processes —
.claude/skills/verify/SKILL.md), so all chip measurements batch into
a single process: the encoder int8-variant decision bench first, then
the bench.py modes back-to-back via argv.

Run:  timeout 10800 python tools/bench_session.py [step ...]
Steps (default: all, in this order):
  encoder    full-encoder bf16 / int8-dequant / int8-MXU comparison
  serving    WindowScheduler as served (now with bucketed padding)
  streaming  real-time chunked feed, word-commit latency
  e2e        1 h end-to-end, int8 (the headline configuration)
  beam       1 h end-to-end, beam-5 int8 (faster-whisper's default)
  e2e4h      4 h end-to-end, int8 (chunked over-clustering at scale)
"""

import sys
import time
import traceback

sys.path.insert(0, ".")

import bench


def _run_mode(argv):
    sys.argv = ["bench.py"] + argv
    bench.main()


def _release_device_memory():
    """Free HBM between steps. The engines/aligner/diarizer trees hold
    reference cycles, so their multi-GB device buffers otherwise wait
    for a gen-2 GC that may never run inside one long process — the
    first session OOM'd (RESOURCE_EXHAUSTED on a scalar transfer) by
    step 5."""
    import gc

    from whisper_nemo_tpu.audio.devcache import clear_cache

    clear_cache()
    gc.collect()
    try:
        import jax

        # drop compiled executables too: their program allocations
        # survive engine.unload(), and a heavy step's cache (e.g.
        # config3's large-v3 + demucs + meeting-diarizer programs)
        # left the r5 session-3 handler step with too little HBM for
        # its second job (RESOURCE_EXHAUSTED) even though every array
        # was reclaimed
        jax.clear_caches()

        stats = jax.local_devices()[0].memory_stats()
        if stats:
            used = stats.get("bytes_in_use", 0) / 1e9
            print(f"[session] HBM in use after gc: {used:.2f} GB",
                  file=sys.stderr, flush=True)
    except Exception:
        pass


def smoke():
    """Real-chip smokes of the non-default decode paths at tiny dims
    (verify skill: CPU tests don't execute the Pallas kernel) plus the
    graft entry fn the driver compile-checks."""
    import numpy as np

    import jax

    from whisper_nemo_tpu.engine.transcribe import WhisperEngine
    from whisper_nemo_tpu.models.whisper import WhisperDims, init_whisper_params
    from whisper_nemo_tpu.text.tokenizer import WhisperTokenizer

    dims = WhisperDims(
        n_audio_ctx=1500, n_audio_layer=2, n_text_layer=2,
        n_audio_state=128, n_text_state=128, n_audio_head=4, n_text_head=4,
        n_vocab=51865, n_text_ctx=448,
    )
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(45 * 16000) * 0.2).astype(np.float32)
    for ct in ("bfloat16", "int8"):
        params = init_whisper_params(jax.random.PRNGKey(0), dims)
        eng = WhisperEngine(
            "tiny", compute_type=ct, params=params, dims=dims,
            tokenizer=WhisperTokenizer.byte_fallback(),
        )
        for beam in (1, 3):
            segs, _ = eng.transcribe_batched(
                audio, language="en", batch_size=2, beam_size=beam,
                max_new_tokens=16,
            )
            print(f"smoke {ct} beam={beam}: {len(segs)} segments",
                  file=sys.stderr, flush=True)
        eng.unload()

    # r4 paths: int8 self-KV cache and the cache_len>128 prefix
    # buckets, on the real chip (CPU tests cover numerics; this
    # executes the int8 DMA layout + lax.switch on TPU)
    import os

    os.environ["WNT_SELF_KV_INT8"] = "1"
    try:
        params = init_whisper_params(jax.random.PRNGKey(0), dims)
        eng = WhisperEngine(
            "tiny", compute_type="int8", params=params, dims=dims,
            tokenizer=WhisperTokenizer.byte_fallback(),
        )
        assert eng.self_kv_int8
        for beam in (1, 3):
            segs, _ = eng.transcribe_batched(
                audio, language="en", batch_size=2, beam_size=beam,
                min_new_tokens=132, max_new_tokens=140,  # crosses 128
            )
            print(
                f"smoke int8-self-kv + prefix-buckets beam={beam}: "
                f"{len(segs)} segments", file=sys.stderr, flush=True,
            )
        eng.unload()
    finally:
        os.environ.pop("WNT_SELF_KV_INT8", None)

    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    print(f"smoke entry(): {getattr(out, 'shape', type(out))}",
          file=sys.stderr, flush=True)


def streaming_sweep():
    """VERDICT r3 ask #5: refresh/agreement policy sweep on chip —
    p50/p95 word-commit latency vs duty cycle at refresh {0.5, 1, 2} s
    (LocalAgreement-2) plus the latency-optimal agreement_n=1 point."""
    import numpy as np

    import bench as bench_mod
    from whisper_nemo_tpu.audio import decode_audio
    from whisper_nemo_tpu.engine.transcribe import WhisperEngine

    base = decode_audio("/root/reference/tests/assets/test.opus")
    reps = int(np.ceil(120 * 16000 / len(base)))
    audio = np.tile(base, reps)[: 120 * 16000]

    def log(msg):
        print(f"[sweep {time.strftime('%H:%M:%S')}] {msg}",
              file=sys.stderr, flush=True)

    engine = WhisperEngine("medium.en", compute_type="int8")
    try:
        for refresh, agreement in (
            (2.0, 2), (1.0, 2), (0.5, 2), (1.0, 1),
        ):
            log(f"--- refresh={refresh}s agreement={agreement} ---")
            bench_mod.run_streaming_bench(
                engine, audio, log,
                min_refresh_s=refresh, agreement_n=agreement,
            )
    finally:
        engine.unload()


def _run_tool(mod_name, argv):
    mod = __import__(f"tools.{mod_name}", fromlist=["main"])
    sys.argv = [f"{mod_name}.py"] + argv
    mod.main()


STEPS = {
    "smoke": smoke,
    # r4 levers: int8 self-KV ms/step A/B at the bench config, and the
    # prefix-bucket A/B at a cache_len=256 long-decode config
    "selfkv": lambda: _run_tool(
        "bench_beam_step",
        ["--variants", "prodgreedy,prodgreedyq,prodbeam,prodbeamq"],
    ),
    "buckets": lambda: _run_tool(
        "bench_beam_step",
        ["--steps", "220", "--variants",
         "prodgreedy,prodgreedy_nobuckets,prodbeam,prodbeam_nobuckets"],
    ),
    "sweep": streaming_sweep,
    # r4: ancestry-selection formulation A/B ("einsum" dot-generals vs
    # "masked" unrolled where-selects) + isolation vs the nogather
    # floor — attributes the beam step's ancestry overhead
    "ancsel": lambda: _run_tool(
        "bench_beam_step",
        ["--variants",
         "prodbeam,prodbeam_masked,nogather,ancattn,ancattn_masked"],
    ),
    # r4: the Pallas ancestry-selection kernel vs the einsum form and
    # the no-selection floor, at the bench config and the long-decode
    # (cache_len 256) config
    "anckernel": lambda: _run_tool(
        "bench_beam_step",
        ["--variants", "prodbeam,prodbeam_kernel,nogather,prodgreedy"],
    ),
    "anckernel220": lambda: _run_tool(
        "bench_beam_step",
        ["--steps", "220",
         "--variants", "prodbeam,prodbeam_kernel,nogather"],
    ),
    # hour beam-5 e2e with the kernel selection (compare 'beam')
    "beam_kernel": lambda: _env_run(
        {"WNT_ANC_SELECT": "kernel"},
        ["--compute-type", "int8", "--beam", "5"],
    ),
    "gather": lambda: _run_tool(
        "bench_beam_gather",
        ["--variants", "pallas_t,pallas_t5d,pallas_flat"],
    ),
    "beamstep": lambda: _run_tool(
        "bench_beam_step",
        ["--variants", "prodgreedy,prodbeam,full,pallas,inplace,nogather"]
    ),
    "encoder": lambda: __import__(
        "tools.bench_encoder_int8", fromlist=["bench_full_encoder"]
    ).bench_full_encoder(32, 5),
    "serving": lambda: _run_mode(["--mode", "serving"]),
    "streaming": lambda: _run_mode(["--mode", "streaming"]),
    "e2e": lambda: _run_mode(["--compute-type", "int8"]),
    "e2e_selfkv": lambda: _env_run(
        {"WNT_SELF_KV_INT8": "1"}, ["--compute-type", "int8"]
    ),
    "beam": lambda: _run_mode(["--compute-type", "int8", "--beam", "5"]),
    # r4: branch-parallel flow (BASELINE config 4 / diarize_parallel.py)
    # at the hour scale — diarization concurrent with ASR+alignment,
    # wall-clock RTF
    "parallel": lambda: _run_mode(
        ["--mode", "parallel", "--compute-type", "int8"]
    ),
    # BASELINE config 3: large-v3 + htdemucs vocal separation + the
    # meeting diarizer preset (demucs smoked at 300 s first — the
    # production-scale separator has never run on this chip)
    "config3_smoke": lambda: _run_mode(
        ["--seconds", "300", "--model", "large-v3", "--demucs",
         "--domain", "meeting", "--compute-type", "int8", "--runs", "2"]
    ),
    "config3": lambda: _run_mode(
        ["--model", "large-v3", "--demucs", "--domain", "meeting",
         "--compute-type", "int8", "--runs", "2"]
    ),
    # r5: attribute config 3's diarize stage (18.1 s at the meeting
    # preset vs 1.9 s telephonic at the hour — which mark grows:
    # vad / embed / affinity / cluster / msdd?)
    "config3_debug": lambda: _debug_timing_run(
        ["--model", "large-v3", "--demucs", "--domain", "meeting",
         "--compute-type", "int8", "--runs", "1"]
    ),
    "e2e4h": lambda: _run_mode(
        ["--seconds", "14400", "--compute-type", "int8", "--runs", "2"]
    ),
    # r5: the window-serial path's number was an r2 vintage (121.5x);
    # refresh it on current code
    "sequential": lambda: _run_mode(["--mode", "sequential"]),
    # r5: handler(job)-scoped serving benchmark (VERDICT r4 weak #4) —
    # ASR via scheduler + diarization + merge + response build, then
    # 4 concurrent jobs
    "handler": lambda: _run_mode(["--mode", "handler"]),
    # r5: the handler OOMs on the job AFTER warmup (sessions 1/3/4)
    # while session 2 ran three 1 h jobs — this dumps live device
    # arrays (count/GB/top shapes) after each job's gc to name the
    # per-job survivor
    "handler_debug": lambda: _env_run(
        {"WNT_HANDLER_DEBUG": "1"}, ["--mode", "handler"]
    ),
    # r5: wav2vec2 conv-frontend attribution (VERDICT r4 weak #3) —
    # conv vs frame+GEMM formulation + encoder/head split on chip
    "emissions": lambda: _run_tool("bench_emissions", []),
    # r5: hour e2e with the GEMM frontend routed in (A/B vs "e2e")
    "e2e_gemm": lambda: _env_run(
        {"WNT_W2V2_FRONTEND": "gemm"}, ["--compute-type", "int8"]
    ),
    # r5: decode-density sweep (VERDICT r4 weak #1) — hour-scale RTF at
    # forced 64/128/224 tokens/window; 224 is the per-window ceiling
    # (wall-to-wall dense speech)
    "density64": lambda: _run_mode(
        ["--compute-type", "int8", "--tokens-per-window", "64",
         "--runs", "2"]
    ),
    "density128": lambda: _run_mode(
        ["--compute-type", "int8", "--tokens-per-window", "128",
         "--runs", "2"]
    ),
    "density224": lambda: _run_mode(
        ["--compute-type", "int8", "--tokens-per-window", "224",
         "--runs", "2"]
    ),
    # VERDICT r3 weak #7: blame the ~20% superlinear 4 h diarize
    # residual with per-stage timing marks
    "e2e4h_debug": lambda: _debug_timing_run(
        ["--seconds", "14400", "--compute-type", "int8", "--runs", "1"]
    ),
    # r4: 1 h with per-stage align marks (emissions-wait / items /
    # viterbi / post) — attributes the align stage after the wav2vec2
    # flash-attention routing
    "e2e_debug": lambda: _debug_timing_run(
        ["--compute-type", "int8", "--runs", "1"]
    ),
}


def _env_run(env, argv):
    import os

    for k, v in env.items():
        os.environ[k] = v
    try:
        _run_mode(argv)
    finally:
        for k in env:
            os.environ.pop(k, None)


def _debug_timing_run(argv):
    _env_run({"WNT_DEBUG_TIMING": "1"}, argv)


def main():
    names = sys.argv[1:] or list(STEPS)
    for name in names:
        print(f"\n===== step {name} @ {time.strftime('%H:%M:%S')} =====",
              file=sys.stderr, flush=True)
        t0 = time.time()
        try:
            STEPS[name]()
        except Exception:
            traceback.print_exc()
            print(f"===== step {name} FAILED =====", file=sys.stderr,
                  flush=True)
        _release_device_memory()
        print(f"===== step {name} done in {time.time() - t0:.0f}s =====",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
