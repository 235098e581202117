#!/usr/bin/env python
"""Cross-decode kernel micro-bench: int8 vs int4 x nibble-unpack impl.

Isolates the decode loop's dominant HBM stream — the fused cross-KV
block DMA in ops/cross_decode.cross_attention_decode_layered — at
medium.en decode shapes (L=24, B=32, H=16, D=64, T=1500) and times a
24-layer x N-step scan for:

  int8            — the r3 speed default (~3.1 MB/program DMA)
  int4 / andf     — half the bytes, shift-free AND+convert unpack
  int4 / i32      — half the bytes, widening unpack (r3: VPU-bound)

If int4/i8 lands near the measured 2.75 ms/step DMA floor it becomes
the new speed default; if it stays VPU-bound the negative result goes
to docs/ROADMAP.md and int4 remains a memory lever.

Run:  python tools/bench_kernel_int4.py [--batch 32] [--steps 24]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--seq", type=int, default=1500)
    ap.add_argument("--steps", type=int, default=24,
                    help="decode steps per timed call (layer scan each)")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from whisper_nemo_tpu.ops import cross_decode as cd

    np.asarray(jnp.zeros((1,)) + 1)
    print(f"device {jax.devices()[0].device_kind}", file=sys.stderr)

    L, B, H, D, T = (args.layers, args.batch, args.heads, args.dim,
                     args.seq)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, 1, H, D), jnp.bfloat16)

    # timing only cares about shapes/dtypes — synthesize the quantized
    # layouts directly on device (a real bf16 K/V source plus both
    # quantized copies would overflow the 16 GB HBM)
    kp = T + (-T % 128)
    scale = jnp.ones((L, H, D), jnp.float32) * 0.01

    def rand_i8(shape):
        return jax.random.randint(key, shape, -127, 128, jnp.int8)

    kv8 = {
        "kv_dec": rand_i8((L, B, H, 2 * D, kp)),
        "k_dec_scale": scale, "v_dec_scale": scale, "k_len": T,
    }
    kv4 = {
        "kv_dec": rand_i8((L, B, H, D, kp)),
        "k_dec_scale": scale, "v_dec_scale": scale, "k_len": T,
    }

    def steps_fn(k_len, bits):
        # kv_dec/scales are ARGUMENTS, not closure constants — captured
        # constants get serialized into the HLO (2.4 GB, minutes of
        # lowering)
        @jax.jit
        def run(q, kv_dec, k_scale, v_scale):
            def layer(qq, l):
                out = cd.cross_attention_decode_layered(
                    qq, kv_dec, k_scale[l], v_scale[l],
                    jnp.asarray(l, jnp.int32), k_len, bits=bits,
                )
                # couple the carry to the output so steps serialize
                return qq + out.astype(qq.dtype) * 1e-3, None

            def step(carry, _):
                o, _ = jax.lax.scan(
                    layer, carry, jnp.arange(kv_dec.shape[0])
                )
                return o, None

            out, _ = jax.lax.scan(step, q, None, length=args.steps)
            return out
        return run

    for name, kv, bits, impl in (
        ("int8", kv8, 8, "andf"),
        ("int4 / andf unpack", kv4, 4, "andf"),
        ("int4 / i32 unpack", kv4, 4, "i32"),
    ):
        cd._NIBBLE_IMPL = impl
        jax.clear_caches()
        kv_dev = kv
        fn = steps_fn(kv_dev["k_len"], bits)
        fargs = (q, kv_dev["kv_dec"], kv_dev["k_dec_scale"],
                 kv_dev["v_dec_scale"])
        out = fn(*fargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*fargs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters / args.steps
        stream_gb = kv_dev["kv_dec"].size / 1e9
        print(f"{name:<20s} {dt * 1e3:7.3f} ms/step  "
              f"({stream_gb:.2f} GB KV stream -> "
              f"{stream_gb / dt:6.0f} GB/s effective)")
        del kv_dev, fn


if __name__ == "__main__":
    main()
