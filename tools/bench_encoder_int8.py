#!/usr/bin/env python
"""Measure int8 MXU GEMMs against the shipped bf16/int8-dequant paths.

The decode loop is at its DMA floor (docs/ROADMAP.md), so the remaining
ASR MFU headroom is encoder-side: the v5e MXU advertises 2x int8
throughput over bf16 (394 TOPS vs 197 TFLOP/s). The shipped int8
compute type dequantizes weights to bf16 before the dot
(models/whisper.py:_linear), which halves HBM weight bytes but keeps
the MXU in bf16. This tool measures, at medium.en encoder shapes:

  1. bf16 x bf16 dot                     (compute_type=bfloat16)
  2. int8 weight -> bf16 dequant dot     (compute_type=int8, shipped)
  3. w8a8: dynamic per-row activation quant + int8 x int8 -> int32 dot
     (what CTranslate2's int8 GEMM actually does on cuBLASLt/oneDNN)

plus the w8a8 quantization error, to decide whether to wire a
compute_type that routes encoder linears onto the int8 MXU path.

Run:  python tools/bench_encoder_int8.py [--rows 12000] [--iters 30]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, x, iters):
    out = fn(x)
    np.asarray(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    np.asarray(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / iters


def w8a8_linear(x, w_q, w_scale):
    """Dynamic per-row symmetric activation quant + int8 MXU dot."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s_x = jnp.maximum(amax / 127.0, 1e-8)
    x_q = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * s_x * w_scale).astype(x.dtype)


def bench_full_encoder(batch, iters):
    """The decisive number: the full medium.en encode() in ONE jit call
    (amortizes the ~1.3 ms per-dispatch floor the isolated GEMMs hit),
    bf16 vs shipped int8-dequant vs int8-MXU."""
    from whisper_nemo_tpu.engine.checkpoint import resolve_model
    from whisper_nemo_tpu.engine.quantize import quantize_whisper_params
    from whisper_nemo_tpu.models.whisper import encode

    params, dims = resolve_model("medium.en")
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params,
    )
    mel = jax.random.normal(
        jax.random.PRNGKey(1), (batch, dims.n_mels, 3000), jnp.float32
    )
    variants = {
        "bf16": params,
        "int8-dequant": quantize_whisper_params(params, encoder_mxu=False),
        "int8-mxu": quantize_whisper_params(params, encoder_mxu=True),
    }
    # analytic encoder matmul FLOPs (bench.py whisper_asr_flops, enc part)
    d, t = dims.n_audio_state, 1500
    conv = 2 * (2 * t) * 3 * dims.n_mels * d + 2 * t * 3 * d * d
    flops = batch * (conv + dims.n_audio_layer * (24 * t * d * d + 4 * t * t * d))
    print(f"full encoder medium.en B{batch}  {flops / 1e12:.2f} TFLOP/call",
          file=sys.stderr)
    # params must be jit ARGUMENTS: closing over them bakes ~GB of
    # constants into the HLO, which the axon remote-compile endpoint
    # rejects with HTTP 413
    fn = jax.jit(lambda p, mel: encode(p, mel, dims, dtype=jnp.bfloat16))
    for name, p in variants.items():
        out = fn(p, mel)
        np.asarray(out[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(p, mel)
        np.asarray(out[0, 0, 0])
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name:14s} {dt * 1e3:8.1f} ms  "
              f"{flops / dt / 1e12:7.1f} TFLOP/s "
              f"({flops / dt / 1e12 / 197:.1%} of bf16 peak)", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=12000,
                    help="GEMM rows (8 windows x 1500 frames)")
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--full", action="store_true",
                    help="bench the full medium.en encoder forward instead")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    if args.full:
        bench_full_encoder(args.batch, max(3, args.iters // 6))
        return

    m, d = args.rows, args.d
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    dev = jax.devices()[0]
    print(f"device {dev.device_kind}", file=sys.stderr)

    for n in (d, 4 * d):
        x = jax.random.normal(kx, (m, d), jnp.bfloat16)
        w = jax.random.normal(kw, (d, n), jnp.float32)
        absmax = jnp.abs(w).max(axis=0)
        scale = jnp.maximum(absmax / 127.0, 1e-8)
        w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        w_bf = w.astype(jnp.bfloat16)
        flops = 2.0 * m * d * n

        bf16 = jax.jit(lambda x, w=w_bf: jnp.dot(
            x, w, preferred_element_type=jnp.float32).astype(x.dtype))
        deq = jax.jit(lambda x, w=w_q, s=scale: (jnp.dot(
            x, w.astype(x.dtype), preferred_element_type=jnp.float32
        ) * s).astype(x.dtype))
        mxu = jax.jit(lambda x, w=w_q, s=scale: w8a8_linear(x, w, s))

        ref = np.asarray(jnp.dot(x.astype(jnp.float32), w))
        got = np.asarray(mxu(x)).astype(np.float32)
        rel = np.abs(got - ref).max() / np.abs(ref).max()

        print(f"[{m}x{d}]@[{d}x{n}]  ({flops / 1e12:.3f} TFLOP/call)",
              file=sys.stderr)
        for name, fn in (("bf16", bf16), ("int8-dequant", deq),
                         ("w8a8-mxu", mxu)):
            dt = timeit(fn, x, args.iters)
            print(f"  {name:14s} {dt * 1e3:8.3f} ms  "
                  f"{flops / dt / 1e12:7.1f} TFLOP/s", file=sys.stderr)
        print(f"  w8a8 max rel err vs f32: {rel:.4f}", file=sys.stderr)


if __name__ == "__main__":
    main()
