#!/usr/bin/env python
"""Isolate the beam-ancestry self-attention kernel's cost.

The in-loop measurement (tools/bench_beam_step.py anckernel) put the
kernel-path beam step at ~42 ms vs the einsum path's 23.9 — flat in
cache length AND in in-kernel op count, so the overhead is NOT body
compute. This tool separates the suspects:

  iso_kernel   24 layered kernel calls on a device-resident cache,
               OUTSIDE any while loop (pure kernel + dispatch cost)
  iso_xla      the same attention via attention_kt_ancestry, isolated
  iso_plain    attention_kt (no selection), isolated — the floor
  loop_kernel  the same 24 calls inside a lax.fori_loop with the cache
               as carry (the decode loop's structure: carry layouts,
               aliasing, per-step DUS write)
  loop_xla     ditto for the einsum path

Each mode reports ms per simulated decode step (24 layer calls + one
DUS cache write per layer in loop modes).

Usage: python tools/bench_self_kernel.py [--batch 32] [--beam 5]
       [--heads 16] [--dim 64] [--layers 24] [--cache 128] [--steps 24]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--cache", type=int, default=128)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument(
        "--variants",
        default="iso_plain,iso_xla,iso_kernel,loop_xla,loop_kernel",
    )
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("WNT_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import functools

    import jax.numpy as jnp
    import numpy as np

    from whisper_nemo_tpu.ops.attention import (
        attention_kt,
        attention_kt_ancestry,
    )
    from whisper_nemo_tpu.ops.self_decode import (
        self_attention_decode_ancestry_layered,
    )

    def log(msg):
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
              flush=True)

    np.asarray(jnp.zeros((1,)) + 1)
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    log(f"device {jax.devices()[0].device_kind}")

    b, k, h, d, L, s = (args.batch, args.beam, args.heads, args.dim,
                        args.layers, args.cache)
    bk = b * k
    rng = np.random.default_rng(0)
    q = jnp.asarray(
        rng.standard_normal((bk, 1, h, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    kf = jnp.asarray(
        rng.standard_normal((L, bk, h, d, s)).astype(np.float32)
    ).astype(jnp.bfloat16)
    vf = jnp.asarray(
        rng.standard_normal((L, bk, h, d, s)).astype(np.float32)
    ).astype(jnp.bfloat16)
    anc = jnp.asarray(rng.integers(0, k, (b, k, s)), jnp.int32)
    mask = jnp.where(
        jnp.arange(s)[None, None, None, :] < s - 4, 0.0, -jnp.inf
    ).astype(jnp.float32)
    new_kv = jnp.asarray(
        rng.standard_normal((bk, h, d, 1)).astype(np.float32)
    ).astype(jnp.bfloat16)
    interpret = not on_tpu

    def layer_slice(x_full, li):
        return jax.lax.dynamic_slice(
            x_full, (li, 0, 0, 0, 0), (1,) + x_full.shape[1:]
        )[0]

    @jax.jit
    def iso_kernel(q, kf, vf, anc):
        outs = []
        for li in range(L):
            outs.append(self_attention_decode_ancestry_layered(
                q, kf, vf, anc, mask, jnp.int32(li), beam=k,
                interpret=interpret,
            ))
        return sum(o.astype(jnp.float32).sum() for o in outs)

    @jax.jit
    def iso_xla(q, kf, vf, anc):
        outs = []
        for li in range(L):
            k_l, v_l = layer_slice(kf, li), layer_slice(vf, li)
            outs.append(attention_kt_ancestry(q, k_l, v_l, anc, mask))
        return sum(o.astype(jnp.float32).sum() for o in outs)

    @jax.jit
    def iso_plain(q, kf, vf, anc):
        outs = []
        for li in range(L):
            k_l, v_l = layer_slice(kf, li), layer_slice(vf, li)
            outs.append(attention_kt(q, k_l, v_l, mask))
        return sum(o.astype(jnp.float32).sum() for o in outs)

    def make_loop(attend):
        @jax.jit
        def run(q, kf, vf, anc):
            def body(step, carry):
                kf, vf, acc = carry
                pos = step % s

                def layer(li, inner):
                    kf, vf, acc = inner
                    kf = jax.lax.dynamic_update_slice(
                        kf, new_kv[None], (li, 0, 0, 0, pos)
                    )
                    vf = jax.lax.dynamic_update_slice(
                        vf, new_kv[None], (li, 0, 0, 0, pos)
                    )
                    out = attend(q, kf, vf, anc, li)
                    return (kf, vf, acc + out.astype(jnp.float32).sum())

                return jax.lax.fori_loop(0, L, layer, (kf, vf, acc))

            _, _, acc = jax.lax.fori_loop(
                0, args.steps, body, (kf, vf, jnp.float32(0))
            )
            return acc
        return run

    loop_kernel = make_loop(
        lambda q, kf, vf, anc, li: self_attention_decode_ancestry_layered(
            q, kf, vf, anc, mask, li, beam=k, interpret=interpret
        )
    )
    loop_xla = make_loop(
        lambda q, kf, vf, anc, li: attention_kt_ancestry(
            q, layer_slice(kf, li), layer_slice(vf, li), anc, mask
        )
    )
    loop_plain = make_loop(
        lambda q, kf, vf, anc, li: attention_kt(
            q, layer_slice(kf, li), layer_slice(vf, li), mask
        )
    )

    fns = {
        "iso_kernel": (iso_kernel, 1),
        "iso_xla": (iso_xla, 1),
        "iso_plain": (iso_plain, 1),
        "loop_kernel": (loop_kernel, args.steps),
        "loop_xla": (loop_xla, args.steps),
        "loop_plain": (loop_plain, args.steps),
    }
    import json

    results = {}
    for name in args.variants.split(","):
        fn, steps = fns[name]
        t0 = time.time()
        jax.block_until_ready(fn(q, kf, vf, anc))
        compile_s = time.time() - t0
        best = None
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(fn(q, kf, vf, anc))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        ms = best / steps * 1e3
        log(f"{name}: {ms:.2f} ms/step ({L} layer calls; compile "
            f"{compile_s:.0f}s)")
        results[name] = round(ms, 2)
    print(json.dumps({"ms_per_step": results, "batch": b, "beam": k,
                      "cache": s, "layers": L}))


if __name__ == "__main__":
    main()
