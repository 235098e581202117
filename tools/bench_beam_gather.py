#!/usr/bin/env python
"""Beam cache-reindex layout bench: which gather formulation is fast?

tools/bench_beam_step.py measured the per-step beam reorder of the
self-attention KV cache at ~42 ms/step (medium, b32·k5, cache
[24, 160, 128, 16, 64] bf16 ×2) — an order of magnitude above the
~4 GB read+write it moves. This tool times candidate formulations and
layouts of the same permutation in isolation on the chip:

  take_l24    x[:, idx] on [L, BK, S, H, D]            (shipped form)
  take_bk     x[idx] on [BK, L, S, H, D]               (lane-major)
  take_flat   x[:, idx] on [L, BK, S*H*D]              (flattened minor)
  take_bkflat x[idx] on [BK, L*S*H*D]                  (one row = 6 MB)
  along6      grouped take_along_axis on [L, B, K, S, H, D]
  onehot16    grouped one-hot dot, bf16 accumulation
  permlayer   lax.map of per-layer gathers over L

Each variant runs inside one jit as a fori_loop of chained
gather→gather (output feeds the next input, permutation rotates per
iteration, so nothing folds away); reported ms is per single gather of
K+V. All chip measurements in ONE process (CLAUDE.md).

Usage: python tools/bench_beam_gather.py [--windows 32] [--beam 5]
       [--layers 24] [--cache 128] [--heads 16] [--dim 64]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--windows", type=int, default=32)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--cache", type=int, default=128)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument(
        "--variants",
        default="take_l24,take_bk,take_flat,take_bkflat,along6,"
        "onehot16,permlayer",
    )
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("WNT_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import functools

    import jax.numpy as jnp
    import numpy as np

    def log(msg):
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
              flush=True)

    np.asarray(jnp.zeros((1,)) + 1)
    log(f"device {jax.devices()[0].device_kind}")

    b, k, l, s, h, d = (args.windows, args.beam, args.layers,
                        args.cache, args.heads, args.dim)
    bk = b * k
    iters = args.iters
    rng = np.random.default_rng(0)
    base = rng.standard_normal((l, bk, s, h, d)).astype(np.float32)
    # a realistic per-row source-beam draw, rotated every iteration
    src0 = rng.integers(0, k, size=(b, k)).astype(np.int32)  # [B, K]

    def rot(src, i):
        return (src + i) % k

    def run_variant(name):
        if name == "take_l24":
            x0 = jnp.asarray(base).astype(jnp.bfloat16)

            def g(x, src):
                idx = (jnp.arange(b)[:, None] * k + src).reshape(bk)
                return x[:, idx]
        elif name == "take_bk":
            x0 = jnp.asarray(
                base.transpose(1, 0, 2, 3, 4)
            ).astype(jnp.bfloat16)

            def g(x, src):
                idx = (jnp.arange(b)[:, None] * k + src).reshape(bk)
                return x[idx]
        elif name == "take_flat":
            x0 = jnp.asarray(
                base.reshape(l, bk, s * h * d)
            ).astype(jnp.bfloat16)

            def g(x, src):
                idx = (jnp.arange(b)[:, None] * k + src).reshape(bk)
                return x[:, idx]
        elif name == "take_bkflat":
            x0 = jnp.asarray(
                base.transpose(1, 0, 2, 3, 4).reshape(bk, l * s * h * d)
            ).astype(jnp.bfloat16)

            def g(x, src):
                idx = (jnp.arange(b)[:, None] * k + src).reshape(bk)
                return x[idx]
        elif name == "along6":
            x0 = jnp.asarray(
                base.reshape(l, b, k, s, h, d)
            ).astype(jnp.bfloat16)

            def g(x, src):
                idx = src[None, :, :, None, None, None]
                return jnp.take_along_axis(x, idx, axis=2)
        elif name == "onehot16":
            x0 = jnp.asarray(
                base.reshape(l, b, k, s * h * d)
            ).astype(jnp.bfloat16)

            def g(x, src):
                oh = jax.nn.one_hot(src, k, dtype=jnp.bfloat16)
                y = jnp.einsum(
                    "bij,lbjm->lbim", oh, x,
                    preferred_element_type=jnp.bfloat16,
                )
                return y
        elif name == "permlayer":
            x0 = jnp.asarray(base).astype(jnp.bfloat16)

            def g(x, src):
                idx = (jnp.arange(b)[:, None] * k + src).reshape(bk)
                return jax.lax.map(lambda xl: xl[idx], x)
        elif name in ("pallas_flat", "pallas_hd"):
            # same kernel on arrays CREATED with lane-packed minors:
            # isolates the [., H=16, D=64] half-empty-lane-tile cost
            from whisper_nemo_tpu.ops.beam_permute import (
                beam_permute_cache,
            )

            shape = (
                (l, bk, (s * h * d) // 128, 128)
                if name == "pallas_flat"
                else (l, bk, s, h * d)
            )
            x0 = jnp.asarray(base.reshape(shape)).astype(jnp.bfloat16)

            def g(x, src):
                idx = (jnp.arange(b)[:, None] * k + src).reshape(bk)
                k2, _v2 = beam_permute_cache(x, x, idx)
                return k2
        elif name in ("pallas_t", "pallas_t5d"):
            # the SHIPPED transposed cache shape [L, BK, H, D, S]:
            # pallas_t uses the production path (rows flattened to a
            # (H*D*S/128, 128) minor inside beam_permute_cache);
            # pallas_t5d forces the raw 5-D blocks to isolate the
            # sub-block DMA cost the flatten removes
            from whisper_nemo_tpu.ops.beam_permute import (
                beam_permute_cache,
            )

            x0 = jnp.asarray(
                base.transpose(0, 1, 3, 4, 2)
            ).astype(jnp.bfloat16)  # [L, BK, H, D, S]
            flat = name == "pallas_t"

            def g(x, src):
                idx = (jnp.arange(b)[:, None] * k + src).reshape(bk)
                k2, _v2 = beam_permute_cache(x, x, idx, flatten=flat)
                return k2
        elif name == "pallas":
            # the block-DMA permute kernel moves K AND V per call, so
            # its number is directly the per-step cost (not x2)
            from whisper_nemo_tpu.ops.beam_permute import (
                beam_permute_cache,
            )

            x0 = jnp.asarray(base).astype(jnp.bfloat16)

            def g(x, src):
                idx = (jnp.arange(b)[:, None] * k + src).reshape(bk)
                k2, _v2 = beam_permute_cache(x, x, idx)
                # the unused V output is still written by the kernel
                # (pallas_call is opaque to DCE), so k2 alone carries
                # the full K+V cost
                return k2
        else:
            raise SystemExit(f"unknown variant {name}")

        @jax.jit
        def loop(x, src):
            def body(i, x):
                return g(x, rot(src, i))

            return jax.lax.fori_loop(0, iters, body, x)

        src = jnp.asarray(src0)
        out = loop(x0, src)
        jax.block_until_ready(out)
        best = None
        for _ in range(3):
            t0 = time.time()
            out = loop(x0, src)
            jax.block_until_ready(out)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        # one iteration = one full gather of one array; the shipped loop
        # gathers K AND V, so the per-step cost is 2x this number
        return best / iters * 1e3

    results = {}
    for name in args.variants.split(","):
        try:
            ms = run_variant(name)
        except Exception as exc:  # noqa: BLE001 - report and continue
            log(f"{name}: FAILED {type(exc).__name__}: {exc}")
            results[name] = None
            continue
        log(f"{name}: {ms:.2f} ms per K-gather (x2 for K+V)")
        results[name] = round(ms, 3)

    print(json.dumps({
        "ms_per_gather_one_array": results,
        "shape": [l, bk, s, h, d], "iters": iters,
    }))


if __name__ == "__main__":
    main()
