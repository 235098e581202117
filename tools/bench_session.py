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

    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    print(f"smoke entry(): {getattr(out, 'shape', type(out))}",
          file=sys.stderr, flush=True)


def _run_tool(mod_name, argv):
    mod = __import__(f"tools.{mod_name}", fromlist=["main"])
    sys.argv = [f"{mod_name}.py"] + argv
    mod.main()


STEPS = {
    "smoke": smoke,
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
    "beam": lambda: _run_mode(["--compute-type", "int8", "--beam", "5"]),
    "e2e4h": lambda: _run_mode(
        ["--seconds", "14400", "--compute-type", "int8", "--runs", "2"]
    ),
}


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
