#!/usr/bin/env python
"""Beam-decode step ablation bench: where do the beam-vs-greedy ms go?

The e2e bench measures beam-5 ASR at ~5x the greedy stage cost even
though beam lanes share their window's cross-KV inside the decode
kernel (BASELINE.md r3). This tool decomposes the per-step beam cost on
the real chip by timing a local copy of the beam loop with individual
beam mechanisms ablated (timing-only — ablated variants are numerically
wrong on purpose):

  full      the loop as shipped (sanity: should match prod beam_decode)
  onehot    cache reindex as a grouped one-hot matmul ([B,K,K] einsum)
            instead of an XLA gather (the T5X/flaxformer TPU trick)
  nogather  skip the self-KV cache reindex entirely        (floor probe)
  argmaxk   top-k via k successive argmax+mask passes instead of
            lax.top_k over [B, K*V]
  nosoftmax score steps with raw logits (skips log_softmax)
  floor     nogather + argmaxk + nosoftmax: decode_step cost alone

All chip measurements run in ONE process (axon tunnel setup cost grows
with session churn — CLAUDE.md).

Usage: python tools/bench_beam_step.py [--batch 32] [--beam 5]
       [--steps 96] [--compute-type int8] [--model medium.en]
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--model", default="medium.en")
    ap.add_argument("--compute-type", default="int8")
    ap.add_argument(
        "--variants",
        default="prodgreedy,prodbeam,full,onehot,nogather,argmaxk,"
        "nosoftmax,floor",
    )
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("WNT_BENCH_CPU"):  # debug runs off-chip
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from whisper_nemo_tpu.engine.decode import (
        DecodeOptions,
        beam_decode,
        greedy_decode,
    )
    from whisper_nemo_tpu.engine.transcribe import WhisperEngine
    from whisper_nemo_tpu.models.whisper import _vocab_logits
    from whisper_nemo_tpu.models.whisper_stacked import (
        cross_attention_kv_stacked,
        decode_step_stacked,
        init_stacked_cache,
        prefill_cache_stacked,
        quantize_cross_kv_decode_layout,
        quantize_cross_kv_stacked,
    )

    def log(msg):
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
              flush=True)

    np.asarray(jnp.zeros((1,)) + 1)  # open the tunnel transfer path
    log(f"device {jax.devices()[0].device_kind}")

    engine = WhisperEngine(args.model, compute_type=args.compute_type)
    dims = engine.dims
    rng = np.random.default_rng(0)
    b, k, steps = args.batch, args.beam, args.steps
    bk = b * k
    feats = jnp.asarray(
        rng.standard_normal(
            (b, dims.n_audio_ctx, dims.n_audio_state)
        ).astype(np.float32)
    ).astype(engine.dtype)
    sot_seq = engine.tokenizer.sot_sequence(None, "transcribe",
                                            without_timestamps=True)
    n_prompt = len(sot_seq)
    prompt = jnp.tile(jnp.asarray(sot_seq, jnp.int32)[None], (b, 1))
    no_suppress = jnp.zeros((dims.n_vocab,), jnp.float32)
    opts = DecodeOptions(
        max_new_tokens=steps, min_new_tokens=steps,
        eot=engine.tokenizer.eot, sot=engine.tokenizer.sot,
        no_speech=engine.tokenizer.layout.nospeech,
        no_timestamps=engine.tokenizer.layout.notimestamps,
        timestamp_begin=engine.tokenizer.layout.timestamp_begin,
    )
    params = engine._params_stacked
    dtype = engine.dtype
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")

    # ----- the local ablation loop (mirrors decode.beam_decode) -----

    @functools.partial(
        jax.jit,
        static_argnames=("gather", "topk", "softmax"),
    )
    def beam_loop(params, feats, prompt, gather="take", topk="lax",
                  softmax=True):
        max_len = n_prompt + opts.max_new_tokens
        cache_len = min(dims.n_text_ctx, -(-max_len // 128) * 128)
        base_kv = cross_attention_kv_stacked(params, feats, dims)
        if on_tpu:
            base_kv = quantize_cross_kv_decode_layout(base_kv, bits=8)
        else:
            base_kv = quantize_cross_kv_stacked(base_kv, bits=8)

        cache_b = init_stacked_cache(b, dims, dtype, cache_len=cache_len)
        x_pf, cache_b = prefill_cache_stacked(
            params, prompt, cache_b, base_kv, dims, dtype
        )
        dec = params["decoder"]
        first_hid = jnp.repeat(x_pf[:, -1, :], k, axis=0)
        cache = jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, k, axis=1), cache_b
        )
        if "kv_dec" in base_kv:
            cross_kv = {**base_kv, "_beam": k}
        else:
            cross_kv = {
                name: (
                    x
                    if name.endswith("_scale") or name.startswith("_")
                    else jnp.repeat(x, k, axis=1)
                )
                for name, x in base_kv.items()
            }

        tokens = jnp.zeros((bk, max_len), jnp.int32)
        tokens = jax.lax.dynamic_update_slice(
            tokens, jnp.repeat(prompt, k, axis=0), (0, 0)
        )
        beam_scores = jnp.tile(
            jnp.where(jnp.arange(k) == 0, 0.0, -jnp.inf)[None, :], (b, 1)
        )

        def cond(state):
            pos, *_ = state
            return pos < max_len

        def body(state):
            (pos, tokens, cache, finished, beam_scores, hid) = state
            logits = _vocab_logits(dec, hid).astype(jnp.float32)
            filt = logits + no_suppress[None, :]
            ids = jnp.arange(filt.shape[1])[None, :]
            filt = jnp.where(
                ids >= opts.timestamp_begin, -jnp.inf, filt
            )
            below = (pos - n_prompt) < opts.min_new_tokens
            filt = jnp.where(
                below, filt.at[:, opts.eot].set(-jnp.inf), filt
            )
            if softmax:
                logprobs = jax.nn.log_softmax(filt, axis=-1)
            else:
                logprobs = filt
            v = logprobs.shape[1]
            eot_only = jnp.full((v,), -jnp.inf).at[opts.eot].set(0.0)
            logprobs = jnp.where(
                finished[:, None], eot_only[None, :], logprobs
            )

            if topk == "lax":
                cand = (
                    beam_scores.reshape(bk)[:, None] + logprobs
                ).reshape(b, k * v)
                top_scores, top_idx = jax.lax.top_k(cand, k)
                src_beam = top_idx // v
                new_tok = (top_idx % v).astype(jnp.int32)
            elif topk == "argmaxk":
                cand = (
                    beam_scores.reshape(bk)[:, None] + logprobs
                ).reshape(b, k * v)
                scores, idxs = [], []
                c = cand
                for _ in range(k):
                    i = jnp.argmax(c, axis=1)
                    scores.append(jnp.take_along_axis(
                        c, i[:, None], axis=1)[:, 0])
                    idxs.append(i)
                    c = c.at[jnp.arange(b), i].set(-jnp.inf)
                top_scores = jnp.stack(scores, axis=1)
                top_idx = jnp.stack(idxs, axis=1)
                src_beam = top_idx // v
                new_tok = (top_idx % v).astype(jnp.int32)
            else:  # "none": each beam continues itself (greedy per lane)
                new_tok = jnp.argmax(logprobs, axis=1).astype(
                    jnp.int32).reshape(b, k)
                top_scores = beam_scores + jnp.max(
                    logprobs, axis=1).reshape(b, k)
                src_beam = jnp.tile(jnp.arange(k)[None, :], (b, 1))

            gather_idx = (
                jnp.arange(b)[:, None] * k + src_beam
            ).reshape(bk)

            tokens = tokens[gather_idx]
            tokens = tokens.at[jnp.arange(bk), pos].set(
                new_tok.reshape(bk))
            if gather == "take":
                cache = {
                    "k": cache["k"][:, gather_idx],
                    "v": cache["v"][:, gather_idx],
                }
            elif gather == "pallas":
                from whisper_nemo_tpu.ops.beam_permute import (
                    beam_permute_cache,
                )

                k2, v2 = beam_permute_cache(
                    cache["k"], cache["v"], gather_idx
                )
                cache = {"k": k2, "v": v2}
            elif gather == "inplace":
                from whisper_nemo_tpu.ops.beam_permute import (
                    beam_permute_cache_inplace,
                )

                k2, v2 = beam_permute_cache_inplace(
                    cache["k"], cache["v"], src_beam, beam=k
                )
                cache = {"k": k2, "v": v2}
            elif gather == "onehotfull":
                # XLA's chosen loop layout keeps beam rows on the LANE
                # axis (dump_beam_hlo.py: cache layout {1,3,2,4,0}), so
                # a row permutation is a lane shuffle = one [BK, BK]
                # one-hot matmul on the MXU, in XLA's own layout (the
                # Pallas kernel instead forces default layout and pays
                # 6 transposing copies/step)
                oh = (
                    jnp.arange(bk)[:, None] == gather_idx[None, :]
                ).astype(cache["k"].dtype)

                def reindex(c):
                    return jnp.einsum(
                        "lihds,ij->ljhds", c, oh,
                        preferred_element_type=jnp.float32,
                    ).astype(c.dtype)

                cache = {"k": reindex(cache["k"]),
                         "v": reindex(cache["v"])}
            elif gather == "onehot":
                # grouped one-hot matmul: contraction only within each
                # row's k beams ([B, Knew, Kold] x [L, B, Kold, S*H*D])
                oh = jax.nn.one_hot(src_beam, k, dtype=cache["k"].dtype)

                def reindex(c):
                    l, _, s, h, d = c.shape
                    cg = c.reshape(l, b, k, s * h * d)
                    out = jnp.einsum(
                        "bij,lbjm->lbim", oh, cg,
                        preferred_element_type=jnp.float32,
                    ).astype(c.dtype)
                    return out.reshape(l, bk, s, h, d)

                cache = {"k": reindex(cache["k"]),
                         "v": reindex(cache["v"])}
            # "none": skip the reindex (timing floor, numerics wrong)
            # "anc": no reindex either, but run the ancestry-selection
            # attention with an identity lane map — isolates
            # attention_kt_ancestry's cost over attention_kt (the
            # contraction/K-wide-logits delta), with zero permute work
            finished = finished[gather_idx] | (
                new_tok.reshape(bk) == opts.eot
            )
            step_kwargs = {}
            if gather in ("anc", "anc_masked"):
                step_kwargs["anc"] = jnp.broadcast_to(
                    jnp.arange(k, dtype=jnp.int32)[None, :, None],
                    (b, k, cache["k"].shape[-1]),
                )
                if gather == "anc_masked":
                    step_kwargs["anc_select"] = "masked"
            next_hid, cache = decode_step_stacked(
                params, new_tok.reshape(bk), pos, cache, cross_kv,
                dims, dtype, return_hidden=True, **step_kwargs,
            )
            return (pos + 1, tokens, cache, finished, top_scores,
                    next_hid)

        init = (
            jnp.int32(n_prompt), tokens, cache,
            jnp.zeros((bk,), bool), beam_scores, first_hid,
        )
        (_, tokens, _, _, beam_scores, _) = jax.lax.while_loop(
            cond, body, init
        )
        return tokens, beam_scores

    # ----- timing harness -----

    def time_fn(fn):
        out = fn()
        jax.block_until_ready(out)
        best = None
        for _ in range(3):
            t0 = time.time()
            out = fn()
            jax.block_until_ready(out)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    variants = args.variants.split(",")
    results = {}
    for name in variants:
        if name in (
            "prodbeam", "prodbeamq", "prodbeam_nobuckets",
            "prodbeam_masked", "prodbeam_kernel",
        ):
            prod_opts = opts
            if name == "prodbeam_nobuckets":
                import dataclasses

                prod_opts = dataclasses.replace(
                    opts, self_prefix_buckets=False
                )
            elif name in ("prodbeam_masked", "prodbeam_kernel"):
                import dataclasses

                prod_opts = dataclasses.replace(
                    opts, anc_select=name.split("_")[1]
                )
            fn = lambda prod_opts=prod_opts, q=(name == "prodbeamq"): (
                beam_decode(
                    params, feats, prompt, no_suppress, dims, prod_opts,
                    n_prompt=n_prompt, beam_size=k, dtype=dtype,
                    kv_int8=engine.kv_int8, kv_bits=engine.kv_bits,
                    self_kv_int8=q,
                )[0]
            )
        elif name in ("prodgreedy", "prodgreedyq", "prodgreedy_nobuckets"):
            prod_opts = opts
            if name == "prodgreedy_nobuckets":
                import dataclasses

                prod_opts = dataclasses.replace(
                    opts, self_prefix_buckets=False
                )
            fn = lambda prod_opts=prod_opts, q=(name == "prodgreedyq"): (
                greedy_decode(
                    params, feats, prompt, no_suppress, dims, prod_opts,
                    n_prompt=n_prompt, dtype=dtype,
                    kv_int8=engine.kv_int8, kv_bits=engine.kv_bits,
                    self_kv_int8=q,
                )[0]
            )
        else:
            cfg = {
                "full": ("take", "lax", True),
                "pallas": ("pallas", "lax", True),
                "inplace": ("inplace", "lax", True),
                "onehotfull": ("onehotfull", "lax", True),
                "onehot": ("onehot", "lax", True),
                "nogather": ("none", "lax", True),
                "ancattn": ("anc", "lax", True),
                "ancattn_masked": ("anc_masked", "lax", True),
                "argmaxk": ("take", "argmaxk", True),
                "nosoftmax": ("take", "lax", False),
                "floor": ("none", "argmaxk", False),
            }[name]
            fn = lambda cfg=cfg: beam_loop(
                params, feats, prompt, gather=cfg[0], topk=cfg[1],
                softmax=cfg[2],
            )[0]
        t0 = time.time()
        best = time_fn(fn)
        ms = best / steps * 1e3
        log(f"{name}: {best:.3f}s ({ms:.2f} ms/step; compile+first "
            f"{time.time() - t0 - 3 * best:.0f}s)")
        results[name] = round(ms, 2)

    print(json.dumps({
        "ms_per_step": results, "batch": b, "beam": k, "steps": steps,
        "model": args.model, "compute_type": args.compute_type,
    }))


if __name__ == "__main__":
    main()
