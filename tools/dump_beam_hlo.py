#!/usr/bin/env python
"""Dump the TPU-optimized HLO around the beam-cache permute.

The in-loop permute costs ~24 ms/step while the isolated kernel runs
~11.3 ms (tools/bench_beam_step.py vs tools/bench_beam_gather.py), and
the in-place aliased variant times identically to the fresh-output one
— suggesting XLA materializes an extra full K+V round-trip (defensive
copy around the aliased custom call, or a fusion re-materialization).
This tool compiles the production beam loop and prints every copy /
custom-call / big-buffer line in the optimized module so the overhead
can be attributed instead of guessed.

Usage: python tools/dump_beam_hlo.py [--batch 32] [--beam 5]
       [--steps 96] [--model medium.en] [--min-mb 16]
"""

import argparse
import collections
import re
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--model", default="medium.en")
    ap.add_argument("--compute-type", default="int8")
    ap.add_argument("--min-mb", type=float, default=16.0)
    ap.add_argument("--out", default="/tmp/beam_hlo.txt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from whisper_nemo_tpu.engine.decode import DecodeOptions, beam_decode
    from whisper_nemo_tpu.engine.transcribe import WhisperEngine

    engine = WhisperEngine(args.model, compute_type=args.compute_type)
    dims = engine.dims
    rng = np.random.default_rng(0)
    b, k, steps = args.batch, args.beam, args.steps
    feats = jnp.asarray(
        rng.standard_normal(
            (b, dims.n_audio_ctx, dims.n_audio_state)
        ).astype(np.float32)
    ).astype(engine.dtype)
    sot_seq = engine.tokenizer.sot_sequence(
        None, "transcribe", without_timestamps=True
    )
    prompt = jnp.tile(jnp.asarray(sot_seq, jnp.int32)[None], (b, 1))
    no_suppress = jnp.zeros((dims.n_vocab,), jnp.float32)
    opts = DecodeOptions(
        max_new_tokens=steps, min_new_tokens=steps,
        eot=engine.tokenizer.eot, sot=engine.tokenizer.sot,
        no_speech=engine.tokenizer.layout.nospeech,
        no_timestamps=engine.tokenizer.layout.notimestamps,
        timestamp_begin=engine.tokenizer.layout.timestamp_begin,
    )

    fn = jax.jit(
        lambda p, f: beam_decode(
            p, f, prompt, no_suppress, dims, opts,
            n_prompt=prompt.shape[1], beam_size=k, dtype=engine.dtype,
            kv_int8=engine.kv_int8, kv_bits=engine.kv_bits,
        )[0]
    )
    lowered = fn.lower(engine._params_stacked, feats)
    compiled = lowered.compile()
    text = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(text)
    print(f"optimized HLO -> {args.out} ({len(text)/1e6:.1f} MB)",
          file=sys.stderr)

    # ---- attribute big buffers: every op whose output is >= min-mb ----
    def shape_bytes(shape: str) -> int:
        m = re.match(r"(\w+)\[([\d,]*)\]", shape)
        if not m:
            return 0
        dt, dims_s = m.groups()
        sizes = {
            "f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
            "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "s64": 8,
        }
        n = 1
        for d in dims_s.split(","):
            if d:
                n *= int(d)
        return n * sizes.get(dt, 4)

    min_bytes = args.min_mb * 1e6
    counts = collections.Counter()
    print(f"\n==== ops with output >= {args.min_mb} MB ====")
    for line in text.splitlines():
        ls = line.strip()
        m = re.match(r"(%?[\w.-]+) = ([\w<>]+\[[\d,]*\][^ ]*) (\w+)\(", ls)
        if not m:
            continue
        name, shape, op = m.groups()
        nb = shape_bytes(shape)
        if nb >= min_bytes:
            counts[(op, shape)] += 1
    for (op, shape), c in sorted(
        counts.items(), key=lambda kv: -shape_bytes(kv[0][1])
    ):
        print(f"{c:4d} x {op:20s} {shape}")

    print("\n==== copy ops (any size) ====")
    ccount = collections.Counter()
    for line in text.splitlines():
        ls = line.strip()
        m = re.match(r"(%?[\w.-]+) = ([\w<>]+\[[\d,]*\][^ ]*) copy\(", ls)
        if m:
            ccount[m.group(2)] += 1
    for shape, c in sorted(ccount.items(), key=lambda kv: -shape_bytes(kv[0])):
        print(f"{c:4d} x copy {shape}")

    print("\n==== custom-calls ====")
    for line in text.splitlines():
        ls = line.strip()
        if "custom-call" in ls and ("tpu_custom_call" in ls or "Sharding" in ls):
            head = ls.split(" custom-call")[0]
            print(head[:160])


if __name__ == "__main__":
    main()
