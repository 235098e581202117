#!/usr/bin/env python
"""Sweep encoder self-attention implementations on the real chip.

The medium.en encoder's B=32, H=16, T=1500, D=64 self-attention is 83%
of the pipeline's analytic FLOPs territory (the encoder overall), and
the r2 measurement that put the XLA einsum path 2x ahead of the Pallas
flash kernel used the kernel's DEFAULT block sizes (128/128/128,
block_b=1). This sweeps BlockSizes and (if available) splash attention
to find the real winner before re-pointing ops/attention.py.

Run:  python tools/bench_encoder_attn.py [--batch 32] [--iters 20]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, q, k, v, iters=20):
    """Chain the output into the next call's query (defeats any
    remote-execution result reuse for identical args) and synchronize
    with a scalar device_get (block_until_ready alone measured
    impossible >10 PFLOP/s on the axon tunnel)."""
    out = fn(q, k, v)
    np.asarray(out[0, 0, 0, 0])
    cur = q
    t0 = time.perf_counter()
    for _ in range(iters):
        cur = fn(cur, k, v)
    np.asarray(cur[0, 0, 0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--seq", type=int, default=1500)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    b, h, t, d = args.batch, args.heads, args.seq, args.dim
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    # [B, T, H, D] like models/whisper.py
    q = jax.random.normal(kq, (b, t, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, t, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, t, h, d), jnp.bfloat16)

    flops = 4.0 * b * h * t * t * d  # qk + wv, 2 FLOPs/MAC each
    dev = jax.devices()[0]
    print(f"device {dev.device_kind}  shape B{b} H{h} T{t} D{d}  "
          f"{flops / 1e12:.3f} TFLOP/call", file=sys.stderr)

    def report(name, dt):
        print(f"{name:<44s} {dt * 1e3:8.2f} ms  "
              f"{flops / dt / 1e12:6.1f} TFLOP/s")

    from whisper_nemo_tpu.ops import attention as A

    xla = jax.jit(lambda q, k, v: A._xla_attention(q, k, v))
    report("xla einsum (current default)", timeit(xla, q, k, v, iters=args.iters))

    flash_def = jax.jit(lambda q, k, v: A._flash_attention(q, k, v))
    try:
        report("flash default blocks (128/128/128 b1)",
               timeit(flash_def, q, k, v, iters=args.iters))
    except Exception as e:
        print(f"flash default: FAILED {type(e).__name__}: {e}")

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    t_pad = -t % 512
    tp = t + t_pad

    def flash_with(bq, bkm, bk, bb):
        bs = BlockSizes(block_q=bq, block_k_major=bkm, block_k=bk,
                        block_b=bb)

        @jax.jit
        def f(q, k, v):
            def to_bhsd(x):
                return jnp.pad(
                    x, ((0, 0), (0, t_pad), (0, 0), (0, 0))
                ).swapaxes(1, 2)
            seg = jnp.pad(jnp.ones((b, t), jnp.int32), ((0, 0), (0, t_pad)))
            out = flash_attention(
                to_bhsd(q), to_bhsd(k), to_bhsd(v),
                segment_ids=SegmentIds(q=seg, kv=seg),
                causal=False, sm_scale=float(d) ** -0.5, block_sizes=bs,
            )
            return out.swapaxes(1, 2)[:, :t]
        return f

    for bq in (256, 512, 768, 1536):
        for bk in (512, 768, 1536):
            if bq > tp or bk > tp:
                continue
            for bb in (1, 2):
                name = f"flash q{bq} k{bk} b{bb}"
                try:
                    dt = timeit(flash_with(bq, bk, bk, bb), q, k, v,
                                iters=args.iters)
                    report(name, dt)
                except Exception as e:
                    print(f"{name:<44s} FAILED {type(e).__name__}")

    # splash attention (newer kernel), if this jax ships it
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sak,
            splash_attention_mask as sam,
        )

        def splash_with(bq, bkv, bkvc):
            mask = sam.FullMask(_shape=(tp, tp))
            mq = sam.MultiHeadMask(masks=tuple(mask for _ in range(h)))
            block_sizes = sak.BlockSizes(
                block_q=bq, block_kv=bkv, block_kv_compute=bkvc,
            )
            kernel = sak.make_splash_mha(
                mask=mq, head_shards=1, q_seq_shards=1,
                block_sizes=block_sizes,
            )

            @jax.jit
            def f(q, k, v):
                def to_hsd(x):  # [B,T,H,D] -> [B,H,T',D]
                    return jnp.pad(
                        x, ((0, 0), (0, t_pad), (0, 0), (0, 0))
                    ).swapaxes(1, 2)
                seg = jnp.pad(jnp.ones((t,), jnp.int32), ((0, t_pad),))
                segs = sak.SegmentIds(q=seg, kv=seg)
                qp = to_hsd(q) * (float(d) ** -0.5)
                out = jax.vmap(
                    lambda qq, kk, vv: kernel(qq, kk, vv, segment_ids=segs)
                )(qp, to_hsd(k), to_hsd(v))
                return out.swapaxes(1, 2)[:, :t]
            return f

        for bq in (512, 768, 1536):
            for bkv in (512, 768, 1536):
                name = f"splash q{bq} kv{bkv}"
                try:
                    dt = timeit(splash_with(bq, bkv, min(bkv, 512)), q, k, v,
                                iters=args.iters)
                    report(name, dt)
                except Exception as e:
                    print(f"{name:<44s} FAILED {type(e).__name__}: {e}")
    except ImportError:
        print("splash attention: not available in this jax", file=sys.stderr)


if __name__ == "__main__":
    main()
