#!/usr/bin/env python
"""Decode-step microbenchmark: per-step latency by compute/KV type.

Times the full greedy decode loop (prefill + 96 forced generation
steps) on the real chip for each (weight compute type, cross-KV bits)
variant in ONE process (the axon tunnel's per-process setup cost grows
with session churn — batch all chip measurements), and reports
ms/step. This is the tool behind the ROADMAP's decode-lever ledger:
the decode loop is HBM-bandwidth-bound, so step latency should track
the per-step byte stream (weights + cross-KV + self-cache).

Usage:  python tools/bench_decode_step.py [--batch 32] [--steps 96]
        [--model medium.en]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--model", default="medium.en")
    ap.add_argument(
        "--variants",
        default="bfloat16:8,int8:8,int8:4,bfloat16:4",
        help="comma list of compute_type:kv_bits",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from whisper_nemo_tpu.engine.transcribe import WhisperEngine

    def log(msg):
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
              flush=True)

    np.asarray(jnp.zeros((1,)) + 1)  # open the tunnel transfer path
    log(f"device {jax.devices()[0].device_kind}")

    results = {}
    for spec in args.variants.split(","):
        ct, bits = spec.split(":")
        engine = WhisperEngine(args.model, compute_type=ct,
                               kv_bits=int(bits))
        dims = engine.dims
        rng = np.random.default_rng(0)
        feats = jnp.asarray(
            rng.standard_normal(
                (args.batch, dims.n_audio_ctx, dims.n_audio_state)
            ).astype(np.float32)
        ).astype(engine.dtype)

        no_suppress = np.zeros(dims.n_vocab, np.float32)

        def run():
            t0 = time.time()
            out = engine._decode_batch(
                feats, "en", no_suppress,
                True, 0.0,
                min_new_tokens=args.steps,
                max_new_tokens=args.steps,
                sync=False,
            )
            jax.block_until_ready(out[0])
            return time.time() - t0

        run()  # compile
        best = min(run() for _ in range(3))
        ms_step = best / args.steps * 1e3
        log(
            f"{spec}: {best:.3f}s for {args.steps} steps at batch "
            f"{args.batch} -> {ms_step:.2f} ms/step "
            f"({ms_step / args.batch * 1e3:.0f} us/step/window)"
        )
        results[spec] = round(ms_step, 2)
        del engine, feats

    print(json.dumps({"ms_per_step": results, "batch": args.batch,
                      "steps": args.steps, "model": args.model}))


if __name__ == "__main__":
    main()
