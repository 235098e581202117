#!/usr/bin/env python
"""Attribute the aligner-emissions forward (MMS-300M wav2vec2).

The 1 h align stage is emissions-dominated (1.87 s of 2.59 in the
instrumented run). This tool splits one 30 s-window batch forward into
feature-extractor convs / positional conv / transformer encoder /
lm head on the chip, and sweeps the batch size — deciding whether the
next align lever is the conv frontend lowering or encoder batching.

Usage: python tools/bench_emissions.py [--batches 8,16] [--secs 30]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", default="8,16")
    ap.add_argument("--secs", type=int, default=30)
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("WNT_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from whisper_nemo_tpu.align.api import load_alignment_model
    from whisper_nemo_tpu.models.wav2vec2 import (
        _conv_pos_embedding,
        _linear,
        _ln,
        encoder,
        feature_extractor,
        feature_extractor_gemm,
    )

    def log(msg):
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
              flush=True)

    np.asarray(jnp.zeros((1,)) + 1)
    log(f"device {jax.devices()[0].device_kind}")

    model, _tok = load_alignment_model("auto", dtype="bfloat16")
    params, dims, dtype = model.params, model.dims, model.dtype
    t_samples = args.secs * 16000

    # params ride as jit ARGUMENTS (a params-closure would embed 600 MB
    # of constants in the compile request — the axon remote_compile
    # endpoint rejects it with HTTP 413)
    @jax.jit
    def fe(p, wave):
        return feature_extractor(p["fe"], wave.astype(dtype), dims)

    @jax.jit
    def fe_gemm(p, wave):
        return feature_extractor_gemm(p["fe"], wave.astype(dtype), dims)

    @jax.jit
    def enc_from_feats(p, feats):
        return encoder(p["enc"], feats, dims)

    @jax.jit
    def head(p, hidden):
        return jnp.dot(
            hidden, p["lm_head"]["w"].astype(hidden.dtype),
            preferred_element_type=jnp.float32,
        )

    @jax.jit
    def full(p, wave):
        h = encoder(
            p["enc"], feature_extractor(
                p["fe"], wave.astype(dtype), dims
            ), dims,
        )
        return jnp.dot(
            h, p["lm_head"]["w"].astype(h.dtype),
            preferred_element_type=jnp.float32,
        )

    def best_of(fn, *xs, n=3):
        jax.block_until_ready(fn(params, *xs))
        best = None
        for _ in range(n):
            t0 = time.time()
            jax.block_until_ready(fn(params, *xs))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best * 1e3

    rng = np.random.default_rng(0)
    results = {}
    for b in [int(x) for x in args.batches.split(",")]:
        wave = jnp.asarray(
            rng.standard_normal((b, t_samples)).astype(np.float32)
        )
        feats = fe(params, wave)
        ms_fe = best_of(fe, wave)
        ms_fe_gemm = best_of(fe_gemm, wave)
        # exactness guard: the GEMM frames must hold the conv's values
        np.testing.assert_allclose(
            np.asarray(fe_gemm(params, wave), np.float32),
            np.asarray(feats, np.float32),
            atol=5e-2 if dtype != np.float32 else 1e-4,
        )
        ms_enc = best_of(enc_from_feats, feats)
        hidden = enc_from_feats(params, feats)
        ms_head = best_of(head, hidden)
        ms_full = best_of(full, wave)
        t_frames = feats.shape[1]
        # analytic transformer FLOPs (matmuls) for MFU context
        d, L, ff = dims.hidden_size, dims.num_layers, dims.intermediate_size
        flops = 2 * b * t_frames * L * (4 * d * d + 2 * d * ff) + (
            4 * b * t_frames * t_frames * d * L  # attention qk+av
        )
        tflops = flops / 1e12 / (ms_enc / 1e3)
        log(
            f"B{b}: fe {ms_fe:.1f} ms  fe_gemm {ms_fe_gemm:.1f} ms  "
            f"enc {ms_enc:.1f} ms "
            f"({tflops:.1f} TFLOP/s) head {ms_head:.1f} ms  "
            f"full {ms_full:.1f} ms  (frames {t_frames})"
        )
        results[f"b{b}"] = {
            "fe_ms": round(ms_fe, 1),
            "fe_gemm_ms": round(ms_fe_gemm, 1),
            "enc_ms": round(ms_enc, 1),
            "head_ms": round(ms_head, 1),
            "full_ms": round(ms_full, 1),
            "enc_tflops": round(tflops, 1),
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
