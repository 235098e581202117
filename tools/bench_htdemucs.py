#!/usr/bin/env python
"""On-chip attribution of the htdemucs separation forward.

One long-lived TPU process (verify skill: the tunnel's per-process
setup cost grows with churn). Times cumulative stage prefixes of
htdemucs_forward at the production window batch, so differences
attribute the cost to spec / encoders / transformer / decoders /
ispec, then the same full forward with bf16 params+activations
(f32 stat normalization retained by the forward's own casts).

Run:  timeout 3600 python tools/bench_htdemucs.py [--batch 8] [--runs 3]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from whisper_nemo_tpu.models.htdemucs import (
        HTDemucsDims,
        _cross_transformer,
        _hdec_freq,
        _hdec_time,
        _henc_freq,
        _henc_time,
        _ispec,
        _magnitude_cac,
        _mask_cac,
        _spec,
        htdemucs_forward,
        init_htdemucs_params,
    )
    from whisper_nemo_tpu.models.htdemucs import _conv1d

    dims = HTDemucsDims()
    params = init_htdemucs_params(jax.random.PRNGKey(0), dims)
    seg = int(dims.segment * dims.samplerate)
    rng = np.random.default_rng(0)
    mix = jnp.asarray(
        rng.standard_normal((args.batch, dims.audio_channels, seg)).astype(
            np.float32
        )
        * 0.2
    )
    print(f"[demucs-bench] warmup transfer", flush=True)
    np.asarray(jnp.zeros((1,)) + 1)

    def stage_prefix(upto):
        """Forward prefix: 0=spec+norm, 1=+encoders, 2=+transformer,
        3=+decoders, 4=full (mask+ispec+time add)."""

        def fn(params, mix):
            length = mix.shape[-1]
            z = _spec(mix, dims)
            mag = _magnitude_cac(z)
            x = mag
            b, _, fq, t = x.shape
            mean = x.mean(axis=(1, 2, 3), keepdims=True)
            std = x.std(axis=(1, 2, 3), keepdims=True)
            x = (x - mean) / (1e-5 + std)
            xt = mix
            meant = xt.mean(axis=(1, 2), keepdims=True)
            stdt = xt.std(axis=(1, 2), keepdims=True)
            xt = (xt - meant) / (1e-5 + stdt)
            if upto == 0:
                return x.sum() + xt.sum()
            saved, saved_t, lengths_t = [], [], []
            for idx in range(dims.depth):
                lengths_t.append(xt.shape[-1])
                xt = _henc_time(params["tencoder"][idx], xt, dims)
                saved_t.append(xt)
                x = _henc_freq(params["encoder"][idx], x, dims)
                if idx == 0:
                    emb = (
                        params["freq_emb"]["embedding"]["weight"]
                        * dims.emb_scale
                    )
                    x = x + dims.freq_emb_scale * emb.T[None, :, :, None]
                saved.append(x)
            if upto == 1:
                return x.sum() + xt.sum()
            bb, cc, ff, tt = x.shape
            x = _conv1d(
                params["channel_upsampler"], x.reshape(bb, cc, ff * tt)
            )
            x = x.reshape(bb, -1, ff, tt)
            xt = _conv1d(params["channel_upsampler_t"], xt)
            x, xt = _cross_transformer(
                params["crosstransformer"], x, xt, dims
            )
            bb, cc, ff, tt = x.shape
            x = _conv1d(
                params["channel_downsampler"], x.reshape(bb, cc, ff * tt)
            )
            x = x.reshape(bb, -1, ff, tt)
            xt = _conv1d(params["channel_downsampler_t"], xt)
            if upto == 2:
                return x.sum() + xt.sum()
            for idx in range(dims.depth):
                last = idx == dims.depth - 1
                x = _hdec_freq(
                    params["decoder"][idx], x, saved.pop(), dims, last
                )
                xt = _hdec_time(
                    params["tdecoder"][idx], xt, saved_t.pop(),
                    lengths_t.pop(), dims, last,
                )
            if upto == 3:
                return x.sum() + xt.sum()
            n_src = len(dims.sources)
            x = x.reshape(b, n_src, -1, fq, t)
            x = x * std[:, None] + mean[:, None]
            zout = _mask_cac(x)
            spec_out = _ispec(zout, dims, length)
            xt = xt.reshape(b, n_src, dims.audio_channels, length)
            xt = xt * stdt[:, None] + meant[:, None]
            return (spec_out + xt).sum()

        return jax.jit(fn)

    names = ["spec+norm", "+encoders", "+transformer", "+decoders", "full"]
    cum = []
    for upto, name in enumerate(names):
        fn = stage_prefix(upto)
        t0 = time.time()
        fn(params, mix).block_until_ready()
        compile_s = time.time() - t0
        ts = []
        for _ in range(args.runs):
            t0 = time.time()
            fn(params, mix).block_until_ready()
            ts.append(time.time() - t0)
        best = min(ts)
        cum.append(best)
        print(
            f"[demucs-bench] prefix {name:13s} {best*1e3:8.1f} ms "
            f"(compile {compile_s:.1f}s)",
            flush=True,
        )
    stage = [cum[0]] + [cum[i] - cum[i - 1] for i in range(1, len(cum))]
    for name, s in zip(names, stage):
        print(f"[demucs-bench] stage  {name:13s} {s*1e3:8.1f} ms", flush=True)

    # full production forward (the real entry, not the prefix replica)
    full = jax.jit(lambda p, m: htdemucs_forward(p, m, dims))
    full(params, mix).block_until_ready()
    ts = []
    for _ in range(args.runs):
        t0 = time.time()
        full(params, mix).block_until_ready()
        ts.append(time.time() - t0)
    f32_ms = min(ts) * 1e3
    rt = args.batch * dims.segment / (f32_ms / 1e3)
    print(
        f"[demucs-bench] htdemucs_forward f32 B{args.batch}: "
        f"{f32_ms:.1f} ms ({rt:.1f}x realtime)",
        flush=True,
    )

    # bf16 params + input
    bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        params,
    )
    out32 = np.asarray(full(params, mix), np.float32)
    t0 = time.time()
    out16 = full(bf16, mix.astype(jnp.bfloat16))
    out16.block_until_ready()
    compile_s = time.time() - t0
    ts = []
    for _ in range(args.runs):
        t0 = time.time()
        full(bf16, mix.astype(jnp.bfloat16)).block_until_ready()
        ts.append(time.time() - t0)
    bf16_ms = min(ts) * 1e3
    rt16 = args.batch * dims.segment / (bf16_ms / 1e3)
    err = np.abs(np.asarray(out16, np.float32) - out32)
    rel = err.max() / (np.abs(out32).max() + 1e-9)
    print(
        f"[demucs-bench] htdemucs_forward bf16 B{args.batch}: "
        f"{bf16_ms:.1f} ms ({rt16:.1f}x realtime, compile {compile_s:.1f}s, "
        f"max rel err vs f32 {rel:.3e})",
        flush=True,
    )


if __name__ == "__main__":
    main()
