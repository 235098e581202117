"""Whisper encoder-decoder as pure-functional JAX.

This is the core model the reference runs through CTranslate2
(faster-whisper, SURVEY D3) and openai-whisper (D8). Parameters live in
nested dict pytrees; every forward is a pure function of (params, inputs)
so it composes with jit/pjit/scan. Design notes:

- attention is einsum-based over [batch, time, heads, head_dim]; XLA maps
  the contractions straight onto the MXU. Computation runs in a
  configurable ``dtype`` (bf16 on TPU) with fp32 logits.
- the decoder supports two modes: teacher-forced full-sequence forward
  (tests/scoring) and single-step with a preallocated KV cache whose
  sequence axis is static, for use inside lax.scan/while_loop decode
  loops (no dynamic shapes under jit).
- cross-attention K/V are computed once per audio segment and reused for
  every decode step.

Weight-shape conventions follow the converter in
``engine/weights.py`` which maps HF ``WhisperForConditionalGeneration``
checkpoints into this tree.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class WhisperDims:
    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4

    @property
    def head_dim(self) -> int:
        return self.n_audio_state // self.n_audio_head


# Standard model family dims (public openai-whisper model card values).
WHISPER_DIMS: Dict[str, WhisperDims] = {
    "tiny": WhisperDims(80, 1500, 384, 6, 4, 51865, 448, 384, 6, 4),
    "tiny.en": WhisperDims(80, 1500, 384, 6, 4, 51864, 448, 384, 6, 4),
    "base": WhisperDims(80, 1500, 512, 8, 6, 51865, 448, 512, 8, 6),
    "base.en": WhisperDims(80, 1500, 512, 8, 6, 51864, 448, 512, 8, 6),
    "small": WhisperDims(80, 1500, 768, 12, 12, 51865, 448, 768, 12, 12),
    "small.en": WhisperDims(80, 1500, 768, 12, 12, 51864, 448, 768, 12, 12),
    "medium": WhisperDims(80, 1500, 1024, 16, 24, 51865, 448, 1024, 16, 24),
    "medium.en": WhisperDims(80, 1500, 1024, 16, 24, 51864, 448, 1024, 16, 24),
    "large-v1": WhisperDims(80, 1500, 1280, 20, 32, 51865, 448, 1280, 20, 32),
    "large-v2": WhisperDims(80, 1500, 1280, 20, 32, 51865, 448, 1280, 20, 32),
    "large-v3": WhisperDims(128, 1500, 1280, 20, 32, 51866, 448, 1280, 20, 32),
    "large": WhisperDims(128, 1500, 1280, 20, 32, 51866, 448, 1280, 20, 32),
    "large-v3-turbo": WhisperDims(128, 1500, 1280, 20, 32, 51866, 448, 1280, 20, 4),
    "turbo": WhisperDims(128, 1500, 1280, 20, 32, 51866, 448, 1280, 20, 4),
}


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Sinusoidal position encoding (whisper's exact formulation)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(
        -log_timescale_increment * np.arange(channels // 2)
    )
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate(
        [np.sin(scaled_time), np.cos(scaled_time)], axis=1
    ).astype(np.float32)


# ---------------------------------------------------------------------------
# initialization
# ---------------------------------------------------------------------------


def _linear_init(key, d_in, d_out, bias=True):
    scale = 1.0 / np.sqrt(d_in)
    p = {
        "w": jax.random.uniform(
            key, (d_in, d_out), jnp.float32, -scale, scale
        )
    }
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _ln_init(d):
    return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def _attn_init(key, d, bias_kv=False):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "q": _linear_init(k1, d, d),
        "k": _linear_init(k2, d, d, bias=bias_kv),
        "v": _linear_init(k3, d, d),
        "o": _linear_init(k4, d, d),
    }


def _block_init(key, d, cross: bool):
    keys = jax.random.split(key, 5)
    p = {
        "ln1": _ln_init(d),
        "attn": _attn_init(keys[0], d),
        "ln2": _ln_init(d),
        "mlp_in": _linear_init(keys[1], d, 4 * d),
        "mlp_out": _linear_init(keys[2], 4 * d, d),
    }
    if cross:
        p["ln_cross"] = _ln_init(d)
        p["cross_attn"] = _attn_init(keys[3], d)
    return p


def init_whisper_params(key, dims: WhisperDims) -> Params:
    keys = jax.random.split(key, dims.n_audio_layer + dims.n_text_layer + 4)
    d_a, d_t = dims.n_audio_state, dims.n_text_state
    encoder = {
        "conv1": {
            "w": jax.random.normal(keys[0], (3, dims.n_mels, d_a)) * 0.02,
            "b": jnp.zeros((d_a,)),
        },
        "conv2": {
            "w": jax.random.normal(keys[1], (3, d_a, d_a)) * 0.02,
            "b": jnp.zeros((d_a,)),
        },
        "pos": jnp.asarray(sinusoids(dims.n_audio_ctx, d_a)),
        "blocks": [
            _block_init(keys[2 + i], d_a, cross=False)
            for i in range(dims.n_audio_layer)
        ],
        "ln_post": _ln_init(d_a),
    }
    off = 2 + dims.n_audio_layer
    decoder = {
        "tok_emb": jax.random.normal(keys[off], (dims.n_vocab, d_t)) * 0.02,
        "pos_emb": jax.random.normal(keys[off + 1], (dims.n_text_ctx, d_t))
        * 0.01,
        "blocks": [
            _block_init(keys[off + 2 + i], d_t, cross=True)
            for i in range(dims.n_text_layer)
        ],
        "ln": _ln_init(d_t),
    }
    return {"encoder": encoder, "decoder": decoder}


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------


def _layer_norm(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["g"] + p["b"]).astype(x.dtype)


def _w8a8_dot(x, w_q, w_scale):
    """Dynamic per-row activation quant + int8×int8 MXU dot.

    The int8 analogue CTranslate2 actually computes (its int8 GEMMs
    quantize activations per row at runtime); on the v5e the MXU's int8
    throughput is 2× bf16, so this is the compute-bound encoder's
    fastest linear. Weights per-output-channel int8, activations
    per-row symmetric int8, dequant in the fp32 epilogue."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s_x = jnp.maximum(amax / 127.0, 1e-8)
    x_q = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * s_x * w_scale


def _linear(p, x):
    if "w_qm" in p:
        # int8 MXU path (encoder): both operands int8 on the systolic array
        y = _w8a8_dot(x, p["w_qm"], p["scale"])
    elif "w_q" in p:
        # weight-only int8: dequantization fuses into the matmul epilogue
        y = jnp.dot(
            x, p["w_q"].astype(x.dtype), preferred_element_type=jnp.float32
        ) * p["scale"]
    else:
        y = jnp.dot(
            x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32
        )
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def _split_heads(x, n_head):
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head)


def _attention(q, k, v, mask=None):
    """[B, Tq, H, Dh] x [B, Tk, H, Dh] -> [B, Tq, H, Dh].

    Routed through ops.attention: Pallas flash kernel on TPU for the
    unmasked encoder case, fp32-softmax einsum elsewhere."""
    from ..ops.attention import multihead_attention

    return multihead_attention(q, k, v, mask)


def _self_attn(p, x, n_head, mask=None):
    b, t, d = x.shape
    q = _split_heads(_linear(p["q"], x), n_head)
    k = _split_heads(_linear(p["k"], x), n_head)
    v = _split_heads(_linear(p["v"], x), n_head)
    out = _attention(q, k, v, mask).reshape(b, t, d)
    return _linear(p["o"], out)


def _mlp(p_in, p_out, x):
    return _linear(p_out, jax.nn.gelu(_linear(p_in, x), approximate=False))


def _vocab_logits(dec, x):
    """Hidden states → fp32 vocab logits; uses the int8 output
    projection when present (engine/quantize.py), else tied embeddings."""
    if "out_proj_q" in dec:
        q = dec["out_proj_q"]
        return (
            jnp.dot(
                x, q["w_q"].astype(x.dtype),
                preferred_element_type=jnp.float32,
            )
            * q["scale"]
        ).astype(jnp.float32)
    return jnp.dot(
        x, dec["tok_emb"].T.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _conv1d(p, x, stride):
    """[B, T, C_in] -> [B, T', C_out]; weights [k, C_in, C_out]."""
    return (
        jax.lax.conv_general_dilated(
            x,
            p["w"].astype(x.dtype),
            window_strides=(stride,),
            padding=((1, 1),),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + p["b"]
    )


def encode(
    params: Params,
    mel: jnp.ndarray,
    dims: WhisperDims,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Mel [B, n_mels, 2*n_audio_ctx] -> audio features [B, n_audio_ctx, D]."""
    enc = params["encoder"]
    x = mel.swapaxes(-1, -2).astype(dtype)  # [B, T, n_mels]
    x = jax.nn.gelu(_conv1d(enc["conv1"], x, 1), approximate=False)
    x = jax.nn.gelu(_conv1d(enc["conv2"], x, 2), approximate=False)
    x = x + enc["pos"][: x.shape[1]].astype(dtype)
    for blk in enc["blocks"]:
        x = x + _self_attn(
            blk["attn"], _layer_norm(blk["ln1"], x), dims.n_audio_head
        )
        x = x + _mlp(blk["mlp_in"], blk["mlp_out"], _layer_norm(blk["ln2"], x))
    return _layer_norm(enc["ln_post"], x)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _cross_attn_kv(params: Params, audio: jnp.ndarray, dims: WhisperDims):
    """Precompute per-layer cross-attention K/V for an audio segment."""
    kvs = []
    for blk in params["decoder"]["blocks"]:
        k = _split_heads(_linear(blk["cross_attn"]["k"], audio), dims.n_text_head)
        v = _split_heads(_linear(blk["cross_attn"]["v"], audio), dims.n_text_head)
        kvs.append({"k": k, "v": v})
    return kvs


def quantize_cross_kv(cross_kv: list) -> list:
    """int8-quantize precomputed cross-attention K/V.

    The decode loop reads the full encoder K/V every step (for medium at
    batch 16 that is ~2.3 GB/step in bf16 — the dominant HBM traffic);
    int8 storage halves it. Scales are per (head, channel); the K scale
    folds into Q before the score matmul and the V scale applies after
    the weighted sum, so dequantization adds no matmuls.
    """
    out = []
    for kv in cross_kv:
        q_entries = {}
        for name in ("k", "v"):
            x = kv[name].astype(jnp.float32)  # [B, T, H, D]
            amax = jnp.max(jnp.abs(x), axis=(0, 1))  # [H, D]
            scale = jnp.where(amax > 0, amax / 127.0, 1.0)
            q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
            q_entries[f"{name}_q"] = q
            q_entries[f"{name}_scale"] = scale.astype(jnp.float32)
        out.append(q_entries)
    return out


def _cross_attention_step(blk, x, ckv, n_head):
    """Single-query cross-attention supporting int8-quantized K/V."""
    b = x.shape[0]
    q = _split_heads(_linear(blk["cross_attn"]["q"], x), n_head)
    if "k_q" in ckv:
        scale = q.shape[-1] ** -0.5
        q_scaled = q * (ckv["k_scale"][None, None] * scale).astype(q.dtype)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk",
            q_scaled,
            ckv["k_q"].astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
        weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        attn = jnp.einsum(
            "bhqk,bkhd->bqhd", weights, ckv["v_q"].astype(q.dtype)
        ) * ckv["v_scale"][None, None].astype(q.dtype)
    else:
        attn = _attention(q, ckv["k"], ckv["v"])
    return _linear(blk["cross_attn"]["o"], attn.reshape(b, 1, -1))


def decoder_forward(
    params: Params,
    tokens: jnp.ndarray,
    audio: jnp.ndarray,
    dims: WhisperDims,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Teacher-forced decoder: tokens [B, S] -> fp32 logits [B, S, V]."""
    dec = params["decoder"]
    b, s = tokens.shape
    x = (
        dec["tok_emb"][tokens] + dec["pos_emb"][:s][None, :, :]
    ).astype(dtype)
    audio = audio.astype(dtype)
    causal = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)
    kvs = _cross_attn_kv(params, audio, dims)
    for blk, kv in zip(dec["blocks"], kvs):
        x = x + _self_attn(
            blk["attn"], _layer_norm(blk["ln1"], x), dims.n_text_head,
            mask=causal,
        )
        xq = _layer_norm(blk["ln_cross"], x)
        q = _split_heads(
            _linear(blk["cross_attn"]["q"], xq), dims.n_text_head
        )
        attn_out = _attention(q, kv["k"], kv["v"]).reshape(b, -1, x.shape[-1])
        x = x + _linear(blk["cross_attn"]["o"], attn_out)
        x = x + _mlp(blk["mlp_in"], blk["mlp_out"], _layer_norm(blk["ln2"], x))
    x = _layer_norm(dec["ln"], x)
    return _vocab_logits(dec, x)


# -- incremental decoding with a static-shape KV cache ----------------------


def init_kv_cache(
    batch: int, dims: WhisperDims, dtype=jnp.float32,
    cache_len: Optional[int] = None,
) -> list:
    """Preallocated self-attention cache: per layer K/V of
    [B, cache_len, H, Dh] (static shapes for jit).

    ``cache_len`` defaults to the full text context; decode loops that
    know their prompt+generation budget pass a tighter length — per-step
    attention cost scales with it."""
    h = dims.n_text_head
    hd = dims.n_text_state // h
    t = cache_len or dims.n_text_ctx
    return [
        {
            "k": jnp.zeros((batch, t, h, hd), dtype),
            "v": jnp.zeros((batch, t, h, hd), dtype),
        }
        for _ in range(dims.n_text_layer)
    ]


def decode_step(
    params: Params,
    token: jnp.ndarray,  # [B] current token ids
    pos: jnp.ndarray,  # scalar int32 position
    cache: list,
    cross_kv: list,
    dims: WhisperDims,
    dtype=jnp.float32,
    kv_valid: Optional[jnp.ndarray] = None,  # [B, n_text_ctx] bool
    pos_offset: Optional[jnp.ndarray] = None,  # [B] int32
    return_hidden: bool = False,
) -> Tuple[jnp.ndarray, list]:
    """One decode step: returns fp32 logits [B, V] and the updated cache.

    With ``return_hidden`` the final-norm hidden state [B, D] comes back
    instead of logits — decode loops carry that (D ≪ V floats) and
    project to the vocabulary at the start of the next loop body, so
    the [B, V] buffer never enters the while-loop carry.

    The cache sequence axis is static (n_text_ctx); the attention mask
    hides positions > ``pos`` and, when ``kv_valid`` is given, positions
    marked invalid (used for left-padded fixed-size prompts).
    ``pos_offset`` shifts the *learned position* lookup per batch row so
    left-padding doesn't displace real tokens' positions (cache indices
    stay physical; attention itself is position-agnostic). Designed to
    be the body of lax.scan / while_loop decode loops.
    """
    dec = params["decoder"]
    b = token.shape[0]
    cache_len = cache[0]["k"].shape[1]
    if pos_offset is None:
        pos_emb = dec["pos_emb"][pos]
    else:
        logical = jnp.maximum(pos - pos_offset, 0)  # [B]
        pos_emb = dec["pos_emb"][logical]
    x = (dec["tok_emb"][token] + pos_emb).astype(dtype)[:, None, :]

    positions = jnp.arange(cache_len)
    visible = positions <= pos
    if kv_valid is not None:
        visible = visible[None, :] & kv_valid
        mask = jnp.where(visible, 0.0, -jnp.inf).astype(jnp.float32)[
            :, None, None, :
        ]  # [B,1,1,T]
    else:
        mask = jnp.where(visible, 0.0, -jnp.inf).astype(jnp.float32)[
            None, None, None, :
        ]  # [1,1,1,T]

    new_cache = []
    for blk, kv, ckv in zip(dec["blocks"], cache, cross_kv):
        xn = _layer_norm(blk["ln1"], x)
        q = _split_heads(_linear(blk["attn"]["q"], xn), dims.n_text_head)
        k_new = _split_heads(_linear(blk["attn"]["k"], xn), dims.n_text_head)
        v_new = _split_heads(_linear(blk["attn"]["v"], xn), dims.n_text_head)
        k_cache = jax.lax.dynamic_update_slice(
            kv["k"], k_new.astype(kv["k"].dtype), (0, pos, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            kv["v"], v_new.astype(kv["v"].dtype), (0, pos, 0, 0)
        )
        new_cache.append({"k": k_cache, "v": v_cache})
        attn = _attention(q, k_cache, v_cache, mask).reshape(b, 1, -1)
        x = x + _linear(blk["attn"]["o"], attn)

        xq = _layer_norm(blk["ln_cross"], x)
        x = x + _cross_attention_step(blk, xq, ckv, dims.n_text_head)
        x = x + _mlp(blk["mlp_in"], blk["mlp_out"], _layer_norm(blk["ln2"], x))

    x = _layer_norm(dec["ln"], x)
    if return_hidden:
        return x[:, 0, :], new_cache
    logits = _vocab_logits(dec, x[:, 0, :])
    return logits.astype(jnp.float32), new_cache


def cross_attention_kv(params, audio, dims):
    """Public alias for precomputing cross-attention K/V per segment."""
    return _cross_attn_kv(params, audio, dims)


def prefill_cache(
    params: Params,
    prompt: jnp.ndarray,  # [B, P] int32
    cache: list,
    cross_kv: list,
    dims: WhisperDims,
    dtype=jnp.float32,
    kv_valid: Optional[jnp.ndarray] = None,  # [B, cache_len] bool
    pos_offset: Optional[jnp.ndarray] = None,  # [B] int32
) -> Tuple[jnp.ndarray, list]:
    """Process all prompt tokens in one teacher-forced pass.

    Fills the KV cache at positions [0, P) and returns the final-norm
    hidden states [B, P, D] (callers project the positions they need:
    last position → first generation logits, SOT position → no-speech
    probability) — replacing P sequential decode_step calls with
    batched matmuls. Supports the left-padded conditioning layout via
    ``kv_valid`` / ``pos_offset`` exactly like decode_step.
    """
    dec = params["decoder"]
    b, p_len = prompt.shape
    cache_len = cache[0]["k"].shape[1]

    positions = jnp.arange(p_len)
    if pos_offset is None:
        pos_emb = dec["pos_emb"][:p_len][None]
    else:
        logical = jnp.maximum(
            positions[None, :] - pos_offset[:, None], 0
        )  # [B, P]
        pos_emb = dec["pos_emb"][logical]
    x = (dec["tok_emb"][prompt] + pos_emb).astype(dtype)  # [B, P, D]

    # causal mask over the prompt, respecting conditioning validity
    causal = positions[None, :] <= positions[:, None]  # [P, P]
    if kv_valid is None:
        mask = jnp.where(causal, 0.0, -jnp.inf).astype(jnp.float32)[
            None, None, :, :
        ]
    else:
        valid = kv_valid[:, :p_len]  # [B, P]
        visible = causal[None] & valid[:, None, :]
        mask = jnp.where(visible, 0.0, -jnp.inf).astype(jnp.float32)[
            :, None, :, :
        ]

    new_cache = []
    for blk, kv, ckv in zip(dec["blocks"], cache, cross_kv):
        xn = _layer_norm(blk["ln1"], x)
        q = _split_heads(_linear(blk["attn"]["q"], xn), dims.n_text_head)
        k_new = _split_heads(_linear(blk["attn"]["k"], xn), dims.n_text_head)
        v_new = _split_heads(_linear(blk["attn"]["v"], xn), dims.n_text_head)
        k_cache = jax.lax.dynamic_update_slice(
            kv["k"], k_new.astype(kv["k"].dtype), (0, 0, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            kv["v"], v_new.astype(kv["v"].dtype), (0, 0, 0, 0)
        )
        new_cache.append({"k": k_cache, "v": v_cache})
        attn = _attention(q, k_new, v_new, mask).reshape(b, p_len, -1)
        x = x + _linear(blk["attn"]["o"], attn)

        xq = _layer_norm(blk["ln_cross"], x)
        if "k_q" in ckv:
            qc = _split_heads(
                _linear(blk["cross_attn"]["q"], xq), dims.n_text_head
            )
            scale = qc.shape[-1] ** -0.5
            qs = qc * (ckv["k_scale"][None, None] * scale).astype(qc.dtype)
            logits_c = jnp.einsum(
                "bqhd,bkhd->bhqk", qs, ckv["k_q"].astype(qc.dtype),
                preferred_element_type=jnp.float32,
            )
            w = jax.nn.softmax(logits_c, axis=-1).astype(qc.dtype)
            cross = jnp.einsum(
                "bhqk,bkhd->bqhd", w, ckv["v_q"].astype(qc.dtype)
            ) * ckv["v_scale"][None, None].astype(qc.dtype)
        else:
            qc = _split_heads(
                _linear(blk["cross_attn"]["q"], xq), dims.n_text_head
            )
            cross = _attention(qc, ckv["k"], ckv["v"])
        x = x + _linear(blk["cross_attn"]["o"], cross.reshape(b, p_len, -1))
        x = x + _mlp(blk["mlp_in"], blk["mlp_out"], _layer_norm(blk["ln2"], x))

    x = _layer_norm(dec["ln"], x)
    return x, new_cache
