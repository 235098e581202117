"""Jitted autoregressive decode loops for Whisper.

The engine half of what CTranslate2 provided to the reference (SURVEY
D3/D8): a batched greedy/sampled decode with KV cache, whisper's logit
rules (suppress lists, blank suppression, timestamp grammar), no-speech
probability, and average log-probability — all inside a single
``lax.while_loop`` so one XLA compilation serves a whole batch of 30 s
windows and exits as soon as every sequence has emitted EOT.

Static shapes: the token buffer is [B, max_len]; finished lanes keep
writing EOT. Temperature > 0 switches argmax to categorical sampling
(used by the quality-gated temperature fallback, reference
main.py:381-391 semantics).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.whisper import (
    WhisperDims,
    cross_attention_kv,
    decode_step,
    init_kv_cache,
    quantize_cross_kv,
)


@dataclass(frozen=True)
class DecodeOptions:
    """Static decode configuration (hashable: participates in jit keys)."""

    max_new_tokens: int = 224
    min_new_tokens: int = 0  # EOT suppressed below this generated count
    suppress_blank: bool = True
    without_timestamps: bool = True
    temperature: float = 0.0
    # token-id layout needed inside the loop
    eot: int = 50257
    sot: int = 50258
    no_speech: int = 50362
    no_timestamps: int = 50363
    timestamp_begin: int = 50364
    max_initial_timestamp_index: int = 50  # 1.0 s, whisper default
    blank_token: int = 220  # " " for the standard GPT-2 vocab
    # lax.switch prefix restriction of decode self-attention at
    # cache_len > 128 (whisper_stacked._self_attention_prefix); static
    # so one process can retrace both settings for on-chip A/B.
    # Measured negative on chip (greedy 8.38→12.87 ms/step at 220
    # steps: switch dispatch outweighs the prefix DMA saving), so off
    # unless WNT_SELF_PREFIX_BUCKETS=1.
    self_prefix_buckets: bool = False
    # beam ancestry-selection formulation: "einsum" | "masked" (both
    # ops.attention.attention_kt_ancestry) | "kernel" (the Pallas
    # VMEM-resident selection, ops/self_decode.py — interpret-mode off
    # TPU). All exact; static for on-chip A/B (WNT_ANC_SELECT).
    anc_select: str = "einsum"


def build_suppress_mask(
    vocab_size: int, suppress_tokens: Sequence[int]
) -> np.ndarray:
    """[-inf at suppressed ids] additive fp32 mask of shape [V].

    Callers resolve the user-facing option (including the ``-1`` →
    non-speech-list expansion of the reference's default,
    diarize.py:126-130 / main.py:381-391) with
    ``text.tokenizer.get_suppressed_tokens`` first; out-of-range ids
    are ignored here.
    """
    mask = np.zeros((vocab_size,), np.float32)
    for t in suppress_tokens:
        if 0 <= t < vocab_size:
            mask[t] = -np.inf
    return mask


def _apply_timestamp_rules(
    logits, tokens, pos, n_prompt, opts: DecodeOptions
):
    """Whisper's timestamp grammar as logit masking (batched).

    - timestamps come in pairs (start/end); after a lone timestamp the
      next token must be a timestamp or EOT is handled by pairing rules
    - timestamps are non-decreasing
    - at the first step only timestamps are allowed (bounded by
      max_initial_timestamp)
    - if the total timestamp probability beats the best text token, a
      timestamp must be sampled
    """
    b, v = logits.shape
    ts_begin = opts.timestamp_begin

    # <|notimestamps|> never appears in timestamped generation
    # (openai-whisper's ApplyTimestampRules suppresses it first)
    logits = logits.at[:, opts.no_timestamps].set(-jnp.inf)

    last = tokens[jnp.arange(b), jnp.maximum(pos - 1, 0)]
    penult = tokens[jnp.arange(b), jnp.maximum(pos - 2, 0)]
    step = pos - n_prompt  # tokens generated so far

    last_was_ts = (last >= ts_begin) & (step >= 1)
    penult_was_ts = (penult >= ts_begin) & (step >= 2)

    ids = jnp.arange(v)[None, :]
    is_ts = ids >= ts_begin
    is_text = ids < opts.eot

    # pairing rules
    suppress_ts = last_was_ts & penult_was_ts
    suppress_text = last_was_ts & ~penult_was_ts
    logits = jnp.where(
        (suppress_ts[:, None] & is_ts) | (suppress_text[:, None] & is_text),
        -jnp.inf,
        logits,
    )

    # monotonicity: timestamps must not rewind below the latest seen
    token_hist = jnp.where(
        jnp.arange(tokens.shape[1])[None, :] < pos, tokens, 0
    )
    max_ts = jnp.max(
        jnp.where(token_hist >= ts_begin, token_hist, ts_begin - 1), axis=1
    )
    ts_floor = jnp.where(last_was_ts & ~penult_was_ts, max_ts, max_ts + 1)
    logits = jnp.where(
        is_ts & (ids < ts_floor[:, None]), -jnp.inf, logits
    )

    # first generated token must be a timestamp within the initial bound
    first = step == 0
    init_cap = ts_begin + opts.max_initial_timestamp_index
    logits = jnp.where(
        first[..., None] & (~is_ts | (ids > init_cap)), -jnp.inf, logits
    )

    # if P(timestamp) > max P(text token): force a timestamp
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_logprob = jax.nn.logsumexp(
        jnp.where(is_ts, logprobs, -jnp.inf), axis=-1
    )
    max_text_logprob = jnp.max(
        jnp.where(is_ts, -jnp.inf, logprobs), axis=-1
    )
    force_ts = ts_logprob > max_text_logprob
    logits = jnp.where(force_ts[:, None] & ~is_ts, -jnp.inf, logits)
    return logits


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims", "opts", "n_prompt", "dtype", "kv_int8", "kv_bits",
        "self_kv_int8",
    ),
)
def greedy_decode(
    params,
    audio_features: jnp.ndarray,  # [B, n_audio_ctx, D]
    prompt: jnp.ndarray,  # [B, n_prompt] int32
    suppress_mask: jnp.ndarray,  # [V] additive fp32
    dims: WhisperDims,
    opts: DecodeOptions,
    n_prompt: int,
    rng: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
    prompt_valid: Optional[jnp.ndarray] = None,  # [B, n_prompt] bool
    kv_int8: bool = False,
    kv_bits: int = 8,
    self_kv_int8: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched decode. Returns (tokens [B, L], lengths [B],
    sum_logprob [B], no_speech_prob [B]).

    ``tokens`` contains the prompt followed by generated tokens; length
    counts only generated tokens up to (and excluding) EOT.
    ``prompt_valid`` marks real prompt positions when the prompt is
    left-padded to a fixed size (conditioning on previous text keeps
    one compiled shape that way); padded positions are masked out of
    attention.
    """
    b = audio_features.shape[0]
    max_len = n_prompt + opts.max_new_tokens
    audio = audio_features.astype(dtype)
    # layer-stacked params (engine pre-stacks them) compile one scan
    # body instead of n_text_layer unrolled layer graphs
    stacked = "blocks_stacked" in params["decoder"]
    cache_len = min(dims.n_text_ctx, -(-max_len // 128) * 128)
    if stacked:
        from ..models.whisper_stacked import (
            cross_attention_kv_stacked,
            cross_kv_decode_layout_fused,
            decode_step_stacked,
            init_stacked_cache,
            quantize_cross_kv_stacked,
        )

        if kv_int8 and jax.devices()[0].platform in ("tpu", "axon"):
            # the Pallas flash-decode layout needs a real TPU; the
            # CPU/interpret path keeps the einsum-friendly layout
            # (interpret-mode Pallas inside the decode loop is ~100x
            # slower than the einsum on CPU). Projection + quantization
            # run fused per layer chunk — materializing every layer's
            # f32 K/V at once OOMs at large-v3 batch 32
            cross_kv = cross_kv_decode_layout_fused(
                params, audio, dims, bits=kv_bits
            )
        else:
            cross_kv = cross_attention_kv_stacked(params, audio, dims)
            if kv_int8:
                cross_kv = quantize_cross_kv_stacked(
                    cross_kv, bits=kv_bits
                )
        cache = init_stacked_cache(
            b, dims, dtype, cache_len=cache_len,
            self_kv_int8=self_kv_int8,
        )
        step_fn = decode_step_stacked
    else:
        cross_kv = cross_attention_kv(params, audio, dims)
        if kv_int8:
            # halve the decode loop's dominant HBM stream (the full
            # encoder K/V is read every step)
            cross_kv = quantize_cross_kv(cross_kv)
        cache = init_kv_cache(b, dims, dtype, cache_len=cache_len)
        step_fn = decode_step

    tokens = jnp.zeros((b, max_len), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt.astype(jnp.int32), (0, 0))

    if prompt_valid is None:
        kv_valid = None
        pos_offset = None
    else:
        kv_valid = jnp.concatenate(
            [
                prompt_valid.astype(bool),
                jnp.ones((b, cache_len - n_prompt), bool),
            ],
            axis=1,
        )
        # left-pad count per row shifts the learned-position lookup
        pos_offset = jnp.sum(
            ~prompt_valid.astype(bool), axis=1
        ).astype(jnp.int32)

    if rng is None:
        rng = jax.random.PRNGKey(0)

    # prefill: all prompt positions in one teacher-forced pass (batched
    # matmuls instead of n_prompt sequential loop steps)
    from ..models.whisper import _vocab_logits, prefill_cache

    if stacked:
        from ..models.whisper_stacked import prefill_cache_stacked

        x_pf, cache = prefill_cache_stacked(
            params, tokens[:, :n_prompt], cache, cross_kv, dims, dtype,
            kv_valid=kv_valid, pos_offset=pos_offset,
        )
    else:
        x_pf, cache = prefill_cache(
            params, tokens[:, :n_prompt], cache, cross_kv, dims, dtype,
            kv_valid=kv_valid, pos_offset=pos_offset,
        )
    dec = params["decoder"]
    # carry the final-norm hidden state, not the [B, V] logits: the
    # vocab projection happens at the top of each body so the big
    # logits buffer never sits in the while-loop carry (the carried
    # copy measured ~1 ms/step at medium/batch-32)
    first_hid = x_pf[:, -1, :]

    # no-speech prob: read at the SOT step's output
    sot_index = jnp.argmax((prompt == opts.sot).astype(jnp.int32), axis=1)
    x_sot = x_pf[jnp.arange(b), sot_index]
    no_speech_prob = jax.nn.softmax(
        _vocab_logits(dec, x_sot).astype(jnp.float32), axis=-1
    )[:, opts.no_speech]

    def cond(state):
        pos, _, _, finished, *_ = state
        return (pos < max_len) & ~jnp.all(finished)

    def body(state):
        (pos, tokens, cache, finished, sum_logprob, length, hid, rng) = state
        # ``hid`` is the final-norm hidden state predicting the token
        # at ``pos``; project to the vocabulary here
        logits = _vocab_logits(dec, hid).astype(jnp.float32)
        filt = logits + suppress_mask[None, :]
        if opts.min_new_tokens > 0:
            below_min = (pos - n_prompt) < opts.min_new_tokens
            filt = jnp.where(
                below_min,
                filt.at[:, opts.eot].set(-jnp.inf),
                filt,
            )
        if opts.suppress_blank:
            first_step = pos == n_prompt
            blank_mask = (
                jnp.zeros_like(filt)
                .at[:, opts.blank_token]
                .set(-jnp.inf)
                .at[:, opts.eot]
                .set(-jnp.inf)
            )
            filt = jnp.where(first_step, filt + blank_mask, filt)
        if not opts.without_timestamps:
            filt = _apply_timestamp_rules(filt, tokens, pos, n_prompt, opts)
        else:
            ids = jnp.arange(filt.shape[1])[None, :]
            filt = jnp.where(ids >= opts.timestamp_begin, -jnp.inf, filt)
            filt = filt.at[:, opts.no_timestamps].add(-jnp.inf)

        if opts.temperature > 0:
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(
                sub, filt / opts.temperature, axis=-1
            )
        else:
            nxt = jnp.argmax(filt, axis=-1)

        logprobs = jax.nn.log_softmax(filt, axis=-1)
        step_logprob = logprobs[jnp.arange(b), nxt]

        nxt = jnp.where(finished, opts.eot, nxt).astype(jnp.int32)

        newly_finished = (nxt == opts.eot) & ~finished
        active = ~finished & (nxt != opts.eot)
        sum_logprob = sum_logprob + jnp.where(~finished, step_logprob, 0.0)
        length = length + active.astype(jnp.int32)
        finished = finished | newly_finished

        tokens = tokens.at[jnp.arange(b), pos].set(nxt)
        extra = (
            {"prefix_buckets": opts.self_prefix_buckets} if stacked else {}
        )
        next_hid, cache = step_fn(
            params, nxt, pos, cache, cross_kv, dims, dtype,
            kv_valid=kv_valid, pos_offset=pos_offset, return_hidden=True,
            **extra,
        )  # hidden predicting pos + 1
        return (
            pos + 1, tokens, cache, finished, sum_logprob, length,
            next_hid, rng,
        )

    init = (
        jnp.int32(n_prompt),
        tokens,
        cache,
        jnp.zeros((b,), bool),
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b,), jnp.int32),
        first_hid,
        rng,
    )
    (_, tokens, _, _, sum_logprob, length, _, _) = jax.lax.while_loop(
        cond, body, init
    )
    return tokens, length, sum_logprob, no_speech_prob


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims", "opts", "n_prompt", "beam_size", "dtype", "kv_int8",
        "kv_bits", "self_kv_int8",
    ),
)
def beam_decode(
    params,
    audio_features: jnp.ndarray,  # [B, n_audio_ctx, D]
    prompt: jnp.ndarray,  # [B, n_prompt] int32
    suppress_mask: jnp.ndarray,  # [V] additive fp32
    dims: WhisperDims,
    opts: DecodeOptions,
    n_prompt: int,
    beam_size: int = 5,
    length_penalty: float = 1.0,
    dtype=jnp.float32,
    kv_int8: bool = False,
    kv_bits: int = 8,
    prompt_valid: Optional[jnp.ndarray] = None,  # [B, n_prompt] bool
    self_kv_int8: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched beam search (the faster-whisper/CT2 default decode mode,
    beam_size=5). Returns (tokens [B, L], lengths [B], sum_logprob [B],
    no_speech_prob [B]) for the best hypothesis per batch row.

    Beams live as an extra leading factor in the batch axis (B·K); the
    KV cache is gathered along that axis on every reindex. Finished
    beams hold their score and keep emitting EOT. Final selection uses
    GNMT-style length normalization score = logprob / len^alpha.
    ``prompt_valid`` supports the left-padded conditioning prefix (same
    masking + position-offset scheme as the greedy loop).

    The prompt phase prefills once per batch row (teacher-forced pass
    at width B — all k beams are identical until generation starts) and
    the filled cache expands to B·K, so the while_loop runs only
    generation steps.
    """
    b = audio_features.shape[0]
    k = beam_size
    bk = b * k
    max_len = n_prompt + opts.max_new_tokens
    audio = audio_features.astype(dtype)

    # expand each batch row into k identical beams
    def expand(x):
        return jnp.repeat(x, k, axis=0)

    # layer-stacked params compile one scan body instead of
    # n_text_layer unrolled layer graphs (same speedup as the greedy
    # loop; the stacked cache carries layers on a leading axis, so beam
    # reindexing gathers along axis 1 instead of axis 0)
    stacked = "blocks_stacked" in params["decoder"]
    cache_len = min(dims.n_text_ctx, -(-max_len // 128) * 128)
    if stacked:
        from ..models.whisper_stacked import (
            cross_attention_kv_stacked,
            cross_kv_decode_layout_fused,
            decode_step_stacked,
            init_stacked_cache,
            prefill_cache_stacked,
            quantize_cross_kv_stacked,
        )

        if kv_int8 and jax.devices()[0].platform in ("tpu", "axon"):
            # fused per-layer-chunk projection+quantization (see the
            # greedy path: the all-layers f32 K/V OOMs at large-v3 b32)
            base_kv = cross_kv_decode_layout_fused(
                params, audio, dims, bits=kv_bits
            )
        else:
            base_kv = cross_attention_kv_stacked(params, audio, dims)
            if kv_int8:
                base_kv = quantize_cross_kv_stacked(
                    base_kv, bits=kv_bits
                )
        step_fn = decode_step_stacked

        def expand_cache(c):
            return jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, k, axis=1), c
            )

        # the stacked path never reorders the cache: the classic
        # per-step KV-cache permute (CT2's batch_reorder) costs a full
        # K+V HBM round-trip PLUS an XLA copy back into the fixed
        # while-carry buffers — ~24 ms of a 36 ms step at medium/b32·k5
        # in every formulation tried (XLA gather, Pallas block DMA,
        # aliased in-place Pallas, full one-hot MXU matmul;
        # tools/bench_beam_step.py). Instead each row keeps writing its
        # own lane and a [B, K, S] ancestry map records which window
        # lane owns each history position; self-attention selects lanes
        # with an exact one-hot contraction
        # (ops.attention.attention_kt_ancestry, anc= below).
        gather_cache = None

        def expand_cross(ckv):
            if "kv_dec" in ckv:
                # decode-layout KV (the Pallas kernel path): beams
                # SHARE their window's K/V via the kernel's i//beam
                # index map instead of replicating it — the CT2-style
                # repeat would multiply the decode loop's dominant HBM
                # stream (and residency) by beam_size
                return {**ckv, "_beam": k}
            out = {}
            for name, x in ckv.items():
                # per-layer scales ([L, H, D]) have no batch axis;
                # "_"-prefixed entries are static metadata (_k_len)
                out[name] = (
                    x
                    if name.endswith("_scale") or name.startswith("_")
                    else jnp.repeat(x, k, axis=1)
                )
            return out
    else:
        base_kv = cross_attention_kv(params, audio, dims)
        if kv_int8:
            base_kv = quantize_cross_kv(base_kv)
        step_fn = decode_step

        def expand_cache(c):
            return [
                {"k": expand(kv["k"]), "v": expand(kv["v"])} for kv in c
            ]

        def gather_cache(c, idx, src):
            del src
            return [
                {"k": kv["k"][idx], "v": kv["v"][idx]} for kv in c
            ]

        def expand_cross(ckv):
            return [
                {
                    name: (
                        x if name.endswith("_scale") else expand(x)
                    )
                    for name, x in layer_kv.items()
                }
                for layer_kv in ckv
            ]

    if prompt_valid is None:
        kv_valid_b = pos_offset_b = None
        kv_valid = pos_offset = None
    else:
        pv = prompt_valid.astype(bool)
        kv_valid_b = jnp.concatenate(
            [pv, jnp.ones((b, cache_len - n_prompt), bool)], axis=1
        )
        pos_offset_b = jnp.sum(~pv, axis=1).astype(jnp.int32)
        kv_valid = expand(kv_valid_b)
        pos_offset = expand(pos_offset_b)

    # prefill: the prompt phase is identical across a row's k beams, so
    # it runs ONCE per batch row as a teacher-forced pass (B-sized),
    # then the filled cache expands to B·K — instead of n_prompt
    # sequential B·K-wide loop steps
    from ..models.whisper import _vocab_logits, prefill_cache

    if stacked:
        cache_b = init_stacked_cache(
            b, dims, dtype, cache_len=cache_len,
            self_kv_int8=self_kv_int8,
        )
        x_pf, cache_b = prefill_cache_stacked(
            params, prompt.astype(jnp.int32), cache_b, base_kv, dims,
            dtype, kv_valid=kv_valid_b, pos_offset=pos_offset_b,
        )
    else:
        cache_b = init_kv_cache(b, dims, dtype, cache_len=cache_len)
        x_pf, cache_b = prefill_cache(
            params, prompt.astype(jnp.int32), cache_b, base_kv, dims,
            dtype, kv_valid=kv_valid_b, pos_offset=pos_offset_b,
        )
    dec = params["decoder"]
    # hidden-state carry (see greedy_decode): [BK, D] instead of the
    # [BK, V] logits in the while carry
    first_hid = expand(x_pf[:, -1, :])  # predicts the token at n_prompt

    sot_index = jnp.argmax((prompt == opts.sot).astype(jnp.int32), axis=1)
    x_sot = x_pf[jnp.arange(b), sot_index]
    no_speech_prob = jax.nn.softmax(
        _vocab_logits(dec, x_sot).astype(jnp.float32), axis=-1
    )[:, opts.no_speech]  # [B]

    cache = expand_cache(cache_b)
    cross_kv = expand_cross(base_kv)

    tokens = jnp.zeros((bk, max_len), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(
        tokens, expand(prompt.astype(jnp.int32)), (0, 0)
    )

    # only beam 0 starts alive; the rest start at -inf so the first
    # expansion fans out from a single hypothesis
    beam_scores = jnp.tile(
        jnp.where(jnp.arange(k) == 0, 0.0, -jnp.inf)[None, :], (b, 1)
    )  # [B, K]

    def cond(state):
        pos, _, _, finished, *_ = state
        return (pos < max_len) & ~jnp.all(finished)

    def body(state):
        (pos, tokens, cache, finished, beam_scores, hid, anc) = state
        # ``hid`` predicts the token at ``pos``; project here
        logits = _vocab_logits(dec, hid).astype(jnp.float32)
        filt = logits + suppress_mask[None, :]
        if opts.suppress_blank:
            first_step = pos == n_prompt
            filt = jnp.where(
                first_step,
                filt.at[:, opts.blank_token].set(-jnp.inf)
                .at[:, opts.eot].set(-jnp.inf),
                filt,
            )
        if opts.min_new_tokens > 0:
            below = (pos - n_prompt) < opts.min_new_tokens
            filt = jnp.where(below, filt.at[:, opts.eot].set(-jnp.inf), filt)
        if not opts.without_timestamps:
            filt = _apply_timestamp_rules(filt, tokens, pos, n_prompt, opts)
        else:
            ids = jnp.arange(filt.shape[1])[None, :]
            filt = jnp.where(ids >= opts.timestamp_begin, -jnp.inf, filt)
            filt = filt.at[:, opts.no_timestamps].add(-jnp.inf)

        logprobs = jax.nn.log_softmax(filt, axis=-1)  # [BK, V]
        v = logprobs.shape[1]

        # finished beams: only EOT continues them, at zero added cost
        eot_only = jnp.full((v,), -jnp.inf).at[opts.eot].set(0.0)
        logprobs = jnp.where(finished[:, None], eot_only[None, :], logprobs)

        cand = (
            beam_scores.reshape(bk)[:, None] + logprobs
        ).reshape(b, k * v)
        top_scores, top_idx = jax.lax.top_k(cand, k)  # [B, K]
        src_beam = top_idx // v  # [B, K] beam each winner came from
        new_tok = (top_idx % v).astype(jnp.int32)

        gather_idx = (
            jnp.arange(b)[:, None] * k + src_beam
        ).reshape(bk)  # [BK] source row per new beam

        tokens = tokens[gather_idx]
        tokens = tokens.at[jnp.arange(bk), pos].set(new_tok.reshape(bk))
        if stacked:
            # new beam j inherits its source's lane ancestry; the token
            # about to be written at ``pos`` lives in j's own lane
            anc = jnp.take_along_axis(anc, src_beam[:, :, None], axis=1)
            anc = anc.at[:, :, pos].set(
                jnp.broadcast_to(
                    jnp.arange(k, dtype=anc.dtype)[None], (b, k)
                )
            )
            step_kwargs = {"anc": anc, "anc_select": opts.anc_select}
        else:
            cache = gather_cache(cache, gather_idx, src_beam)
            step_kwargs = {}
        finished = finished[gather_idx] | (
            new_tok.reshape(bk) == opts.eot
        )
        if stacked:
            step_kwargs["prefix_buckets"] = opts.self_prefix_buckets
        next_hid, cache = step_fn(
            params, new_tok.reshape(bk), pos, cache, cross_kv, dims,
            dtype, kv_valid=kv_valid, pos_offset=pos_offset,
            return_hidden=True, **step_kwargs,
        )  # hidden predicting pos + 1
        return (
            pos + 1, tokens, cache, finished, top_scores, next_hid, anc
        )

    if stacked:
        # every lane starts owning its own (prompt-identical) history
        anc0 = jnp.tile(
            jnp.arange(k, dtype=jnp.int32)[None, :, None],
            (b, 1, cache_len),
        )
    else:
        anc0 = jnp.zeros((0,), jnp.int32)  # unused carry placeholder
    init = (
        jnp.int32(n_prompt),
        tokens,
        cache,
        jnp.zeros((bk,), bool),
        beam_scores,
        first_hid,
        anc0,
    )
    (_, tokens, _, finished, beam_scores, _, _) = jax.lax.while_loop(
        cond, body, init
    )

    # hypothesis lengths: generated tokens before the first EOT
    gen = tokens[:, n_prompt:]
    is_eot = gen == opts.eot
    any_eot = is_eot.any(axis=1)
    first_eot = jnp.argmax(is_eot, axis=1)
    lengths = jnp.where(any_eot, first_eot, gen.shape[1]).astype(jnp.int32)

    norm = jnp.maximum(lengths.reshape(b, k) + 1, 1).astype(jnp.float32)
    final_scores = beam_scores / (norm**length_penalty)
    best = jnp.argmax(final_scores, axis=1)  # [B]
    pick = jnp.arange(b) * k + best

    return (
        tokens[pick],
        lengths[pick],
        beam_scores.reshape(bk)[pick],
        no_speech_prob,  # [B]: identical across a row's beams
    )


def detect_language(
    params,
    audio_features: jnp.ndarray,  # [B, n_audio_ctx, D]
    dims: WhisperDims,
    sot: int,
    language_start: int,
    n_languages: int,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single forward step from SOT; returns (lang_index [B], probs
    [B, n_languages]) over the language-token block."""
    b = audio_features.shape[0]
    cross_kv = cross_attention_kv(params, audio_features.astype(dtype), dims)
    cache = init_kv_cache(b, dims, dtype)
    logits, _ = decode_step(
        params,
        jnp.full((b,), sot, jnp.int32),
        jnp.int32(0),
        cache,
        cross_kv,
        dims,
        dtype,
    )
    lang_logits = jax.lax.dynamic_slice_in_dim(
        logits, language_start, n_languages, axis=1
    )
    probs = jax.nn.softmax(lang_logits, axis=-1)
    return jnp.argmax(probs, axis=-1), probs
