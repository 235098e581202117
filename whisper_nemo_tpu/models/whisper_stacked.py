"""Layer-stacked decoder: scan over layers for fast compilation.

The canonical decoder (models/whisper.py) unrolls its layers in the
trace, so XLA compiles 24 copies of the layer graph (~minutes for
medium on the remote-compile path). Here the per-layer parameter blocks
stack along a leading axis and a single ``lax.scan`` body serves every
layer: one layer graph to compile, identical numerics. The stacked form
is derived from the canonical tree (``stack_decoder_blocks``) so
checkpoints and parity tests stay in one layout.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import attention_kt, attention_kt_ancestry
from .whisper import (
    WhisperDims,
    _layer_norm,
    _linear,
    _mlp,
    _split_heads,
    _attention,
    _vocab_logits,
)


def stack_decoder_blocks(params: Dict[str, Any]) -> Dict[str, Any]:
    """Per-layer decoder block dicts → one dict with [n_layers]-leading
    leaves (plus the unstacked embeddings/final norm)."""
    blocks = params["decoder"]["blocks"]
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *blocks
    )
    out = dict(params["decoder"])
    out["blocks_stacked"] = stacked
    out.pop("blocks")
    return {"encoder": params["encoder"], "decoder": out}


def stack_cross_kv(cross_kv: List[dict]) -> dict:
    """List of per-layer cross-KV dicts → stacked leading axis."""
    return jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *cross_kv)


def _proj_layers(p: Dict[str, Any], audio: jnp.ndarray, h: int, hd: int):
    """[B, T, D] audio × layer-stacked projection params (leading axis
    = however many layers the caller stacked) → [l, B, T, H, Dh]."""
    b, t, _ = audio.shape
    if "w_qm" in p:
        # int8×int8 MXU einsum: activations quantized per (b, t)
        # row at runtime (models.whisper._w8a8_dot, batched over
        # the stacked layer axis)
        x32 = audio.astype(jnp.float32)
        amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
        s_x = jnp.maximum(amax / 127.0, 1e-8)
        x_q = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
        y = jnp.einsum(
            "btd,lde->lbte", x_q, p["w_qm"],
            preferred_element_type=jnp.int32,
        )
        y = (
            y.astype(jnp.float32)
            * s_x[None]
            * p["scale"][:, None, None, :]
        ).astype(audio.dtype)
    elif "w_q" in p:  # int8 weight-quantized linears
        y = jnp.einsum(
            "btd,lde->lbte", audio, p["w_q"].astype(audio.dtype),
            preferred_element_type=jnp.float32,
        ).astype(audio.dtype) * p["scale"][:, None, None, :].astype(
            audio.dtype
        )
    else:
        y = jnp.einsum(
            "btd,lde->lbte", audio, p["w"].astype(audio.dtype),
            preferred_element_type=jnp.float32,
        ).astype(audio.dtype)
    if "b" in p:
        y = y + p["b"][:, None, None, :]
    return y.reshape(-1, b, t, h, hd)


def cross_attention_kv_stacked(
    params: Dict[str, Any], audio: jnp.ndarray, dims: WhisperDims
) -> dict:
    """Cross-attention K/V for all layers in one einsum each:
    [L, B, T, H, Dh] stacked arrays."""
    ca = params["decoder"]["blocks_stacked"]["cross_attn"]
    h = dims.n_text_head
    hd = dims.n_text_state // h
    return {
        "k": _proj_layers(ca["k"], audio, h, hd),
        "v": _proj_layers(ca["v"], audio, h, hd),
    }


def cross_kv_decode_layout_fused(
    params: Dict[str, Any],
    audio: jnp.ndarray,
    dims: WhisperDims,
    bits: int = 8,
    layer_chunk: int = 8,
) -> dict:
    """Cross-KV projection fused with decode-layout quantization,
    ``layer_chunk`` layers at a time under ``lax.map``.

    Numerically identical to ``cross_attention_kv_stacked`` →
    ``quantize_cross_kv_decode_layout`` (the int8 scales are per
    (layer, head, channel), so per-chunk quantization sees exactly the
    same reduction), but the peak f32 K/V temporaries shrink from
    [L, B, T, H, D] to [chunk, B, T, H, D]: the two-step form OOM'd the
    16 GB chip at large-v3 b32 (two 7.3 GB f32 intermediates + the
    1.8 GB int8 output > HBM) while the production buffers themselves
    fit comfortably."""
    from ..ops.cross_decode import pack_int4

    ca = params["decoder"]["blocks_stacked"]["cross_attn"]
    b, t, _ = audio.shape
    h = dims.n_text_head
    hd = dims.n_text_state // h
    n_layers = dims.n_text_layer
    chunk = max(
        d for d in range(1, min(layer_chunk, n_layers) + 1)
        if n_layers % d == 0
    )
    n_chunks = n_layers // chunk
    ca_chunked = jax.tree_util.tree_map(
        lambda x: x.reshape((n_chunks, chunk) + x.shape[1:]), ca
    )
    t_pad = -t % 128
    qmax = 127.0 if bits == 8 else 7.0

    def quant(x):  # [chunk, B, T, H, Dh] → decode layout + scales
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=(1, 2))  # [chunk, H, Dh]
        scale = jnp.where(amax > 0, amax / qmax, 1.0)
        q = jnp.clip(
            jnp.round(xf / scale[:, None, None]), -qmax, qmax
        ).astype(jnp.int8)
        q = jnp.pad(
            q.transpose(0, 1, 3, 4, 2), ((0, 0),) * 4 + ((0, t_pad),)
        )
        if bits == 4:
            q = pack_int4(q, axis=3)
        return q, scale.astype(jnp.float32)

    def body(p_chunk):
        k_q, k_scale = quant(_proj_layers(p_chunk["k"], audio, h, hd))
        v_q, v_scale = quant(_proj_layers(p_chunk["v"], audio, h, hd))
        return jnp.concatenate([k_q, v_q], axis=3), k_scale, v_scale

    kv_dec, k_scale, v_scale = jax.lax.map(body, ca_chunked)

    def merge(x):  # [n_chunks, chunk, ...] → [L, ...]
        return x.reshape((n_layers,) + x.shape[2:])

    return {
        "kv_dec": merge(kv_dec),
        "k_dec_scale": merge(k_scale),
        "v_dec_scale": merge(v_scale),
        "_k_len": t,
        "_bits": bits,
    }


def quantize_cross_kv_decode_layout(cross_kv: dict, bits: int = 8) -> dict:
    """int8/int4 quantization of stacked cross-KV into the
    decode-friendly layout consumed by the Pallas flash-decode kernel
    (ops/cross_decode.py); ``_k_len`` records the real (unpadded)
    audio-position count and ``_bits`` the storage width — both are
    trace-time constants excluded from the layer scan."""
    from ..ops.cross_decode import quantize_cross_kv_decode

    out = quantize_cross_kv_decode(cross_kv["k"], cross_kv["v"], bits=bits)
    return {
        "kv_dec": out["kv_dec"],
        "k_dec_scale": out["k_dec_scale"],
        "v_dec_scale": out["v_dec_scale"],
        "_k_len": out["k_len"],
        "_bits": bits,
    }


def quantize_cross_kv_stacked(cross_kv: dict, bits: int = 8) -> dict:
    """int8 quantization of stacked cross-KV (per layer/head/channel
    scales; same scheme as models.whisper.quantize_cross_kv).

    ``bits=4`` stores unpacked int8 values clipped to [-7, 7] with
    ``amax/7`` scales — the same numerics as the packed decode layout,
    so the CPU einsum path reproduces the TPU int4 kernel's
    quantization error without Pallas."""
    qmax = 127.0 if bits == 8 else 7.0
    out = {}
    for name in ("k", "v"):
        x = cross_kv[name].astype(jnp.float32)  # [L, B, T, H, D]
        amax = jnp.max(jnp.abs(x), axis=(1, 2))  # [L, H, D]
        scale = jnp.where(amax > 0, amax / qmax, 1.0)
        q = jnp.clip(
            jnp.round(x / scale[:, None, None]), -qmax, qmax
        ).astype(jnp.int8)
        out[f"{name}_q"] = q
        out[f"{name}_scale"] = scale.astype(jnp.float32)
    return out


def quantize_kv_t(x_t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-position int8 quantization of transposed K/V values:
    [..., D, P] → (int8 [..., D, P], fp32 scale [..., P]) with
    amax/127 over D. The decode self-cache is the last bf16 stream in
    the decode loop (weights and cross-KV are already int8); storing
    it int8 halves that HBM read. Scales fold OUTSIDE the cache reads
    (K's scale multiplies the logits column, V's folds into the
    attention weights — ops.attention.attention_kt), so no kernel work
    is needed."""
    amax = jnp.max(jnp.abs(x_t.astype(jnp.float32)), axis=-2)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(
        jnp.round(x_t.astype(jnp.float32) / scale[..., None, :]),
        -127, 127,
    ).astype(jnp.int8)
    return q, scale


def init_stacked_cache(
    batch: int, dims: WhisperDims, dtype=jnp.float32,
    cache_len: Optional[int] = None, self_kv_int8: bool = False,
) -> dict:
    """Self-attention cache in TRANSPOSED layout [L, B, H, D, S]:
    positions ride the 128-lane axis (cache_len is a 128-multiple) and
    D=64 fills sublanes exactly — the natural [..., S, H, D] layout
    leaves half of every lane tile empty, which measured 2× on both
    attention DMA and the beam reorder (tools/bench_beam_gather.py).
    Consumed by ops.attention.attention_kt; beam search permutes it
    with ops.beam_permute.beam_permute_cache block DMAs."""
    h = dims.n_text_head
    hd = dims.n_text_state // h
    t = cache_len or dims.n_text_ctx
    if self_kv_int8:
        # int8 values + per-position fp32 scales (quantize_kv_t); the
        # presence of the scale leaves switches the decode/prefill
        # write and read paths to the quantized scheme
        return {
            "k": jnp.zeros((dims.n_text_layer, batch, h, hd, t), jnp.int8),
            "v": jnp.zeros((dims.n_text_layer, batch, h, hd, t), jnp.int8),
            "k_scale": jnp.ones((dims.n_text_layer, batch, h, t), jnp.float32),
            "v_scale": jnp.ones((dims.n_text_layer, batch, h, t), jnp.float32),
        }
    return {
        "k": jnp.zeros((dims.n_text_layer, batch, h, hd, t), dtype),
        "v": jnp.zeros((dims.n_text_layer, batch, h, hd, t), dtype),
    }


def prefill_cache_stacked(
    params: Dict[str, Any],
    prompt: jnp.ndarray,  # [B, P]
    cache: dict,
    cross_kv: dict,
    dims: WhisperDims,
    dtype=jnp.float32,
    kv_valid: Optional[jnp.ndarray] = None,
    pos_offset: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict]:
    """Stacked-layer analogue of models.whisper.prefill_cache."""
    dec = params["decoder"]
    b, p_len = prompt.shape
    positions = jnp.arange(p_len)
    if pos_offset is None:
        pos_emb = dec["pos_emb"][:p_len][None]
    else:
        logical = jnp.maximum(positions[None, :] - pos_offset[:, None], 0)
        pos_emb = dec["pos_emb"][logical]
    x = (dec["tok_emb"][prompt] + pos_emb).astype(dtype)

    causal = positions[None, :] <= positions[:, None]
    if kv_valid is None:
        mask = jnp.where(causal, 0.0, -jnp.inf).astype(jnp.float32)[
            None, None, :, :
        ]
    else:
        valid = kv_valid[:, :p_len]
        visible = causal[None] & valid[:, None, :]
        mask = jnp.where(visible, 0.0, -jnp.inf).astype(jnp.float32)[
            :, None, :, :
        ]

    quantized = "k_q" in cross_kv
    dec_quant = "kv_dec" in cross_kv
    cross_len = cross_kv.get("_k_len")
    kv_bits = cross_kv.get("_bits", 8)
    scanned_kv = {
        k: v for k, v in cross_kv.items() if not k.startswith("_")
    }

    self_q = "k_scale" in cache

    def layer(x, scanned):
        blk, c, ckv = scanned
        c = dict(c)
        xn = _layer_norm(blk["ln1"], x)
        q = _split_heads(_linear(blk["attn"]["q"], xn), dims.n_text_head)
        k_new = _split_heads(_linear(blk["attn"]["k"], xn), dims.n_text_head)
        v_new = _split_heads(_linear(blk["attn"]["v"], xn), dims.n_text_head)
        # cache is [B, H, D, S] (positions on lanes — see
        # init_stacked_cache); prompt K/V transpose in on write; int8
        # caches quantize the prompt block per position
        for name, new in (("k", k_new), ("v", v_new)):
            new_t = new.transpose(0, 2, 3, 1)  # [B, H, D, P]
            if self_q:
                new_t, sc = quantize_kv_t(new_t)
                c[f"{name}_scale"] = jax.lax.dynamic_update_slice(
                    c[f"{name}_scale"], sc, (0, 0, 0)
                )
            c[name] = jax.lax.dynamic_update_slice(
                c[name], new_t.astype(c[name].dtype), (0, 0, 0, 0)
            )
        # prefill attention runs on the in-flight float K/V (the cache
        # write is for the decode loop; quantizing the prompt's own
        # teacher-forced pass would only add error for zero DMA win)
        attn = _attention(q, k_new, v_new, mask).reshape(b, p_len, -1)
        x = x + _linear(blk["attn"]["o"], attn)

        xq = _layer_norm(blk["ln_cross"], x)
        qc = _split_heads(
            _linear(blk["cross_attn"]["q"], xq), dims.n_text_head
        )
        if dec_quant:
            cross = _cross_prefill_declayout(qc, ckv, cross_len, kv_bits)
        elif quantized:
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
            cross = _attention(qc, ckv["k"], ckv["v"])
        x = x + _linear(blk["cross_attn"]["o"], cross.reshape(b, p_len, -1))
        x = x + _mlp(blk["mlp_in"], blk["mlp_out"], _layer_norm(blk["ln2"], x))
        return x, c

    x, new_cache = jax.lax.scan(
        layer, x, (dec["blocks_stacked"], cache, scanned_kv)
    )
    x = _layer_norm(dec["ln"], x)
    return x, new_cache


def _cross_prefill_declayout(qc, ckv, cross_len: int, bits: int = 8):
    """Prefill cross-attention over the fused decode-layout KV
    (ops/cross_decode.py): one [B, H, 2D, Kp] array, rows 0:D = K,
    rows D:2D = V transposed. Runs once per decode, so the
    dequantizing einsum's lowering cost is immaterial here; the step
    loop uses the Pallas kernel instead."""
    kv = ckv["kv_dec"]
    half = kv.shape[2] // 2
    k_dec, vt_dec = kv[:, :, :half], kv[:, :, half:]
    if bits == 4:
        from ..ops.cross_decode import unpack_int4

        k_dec = unpack_int4(k_dec, axis=2)   # [B, H, D, Kp]
        vt_dec = unpack_int4(vt_dec, axis=2)
    b, p_len = qc.shape[0], qc.shape[1]
    scale = qc.shape[-1] ** -0.5
    qs = qc * (ckv["k_dec_scale"][None, None] * scale).astype(qc.dtype)
    logits = jnp.einsum(
        "bqhd,bhdt->bhqt", qs, k_dec.astype(qc.dtype),
        preferred_element_type=jnp.float32,
    )
    kp = logits.shape[-1]
    if kp > cross_len:
        pos = jnp.arange(kp)
        logits = jnp.where(
            (pos < cross_len)[None, None, None, :], logits, -jnp.inf
        )
    w = jax.nn.softmax(logits, axis=-1).astype(qc.dtype)
    cross = jnp.einsum(
        "bhqt,bhdt->bqhd", w, vt_dec.astype(qc.dtype)
    ) * ckv["v_dec_scale"][None, None].astype(qc.dtype)
    return cross


def _self_attention_prefix(
    q, k_l, v_l, mask, anc, pos, k_scale=None, v_scale=None,
    enable=True, anc_select="einsum",
):
    """Self-attention over the cache restricted to the 128-position
    block prefix that contains ``pos``.

    The decode loop's static shapes force every step to touch the full
    [.., S] cache window even though only positions ≤ pos are live; at
    cache_len > 128 a ``lax.switch`` over 128-aligned prefix lengths
    cuts both the cache DMA and the ancestry contraction's [.., S]
    intermediates to the live prefix (128 is the TPU lane tile — finer
    buckets save nothing). At cache_len == 128 (the bench/serving
    shapes, max_new ≤ 124) this is the identity. Exact: the mask
    already zeroed every position beyond ``pos``, so dropping masked
    columns leaves the softmax unchanged. Measured NEGATIVE on chip
    (2026-08-19, medium.en b32 int8 at 220 steps / cache_len 256:
    greedy 8.38→12.87 ms/step, beam 48.77→50.30 — the per-step
    ``lax.switch`` dispatch costs more than the prefix DMA saves), so
    the production default is OFF; ``WNT_SELF_PREFIX_BUCKETS=1``
    re-enables it for A/B.
    """
    s = k_l.shape[-1]
    buckets = list(range(128, s, 128)) + [s]
    if len(buckets) == 1 or not enable:
        if anc is None:
            return attention_kt(q, k_l, v_l, mask, k_scale, v_scale)
        return attention_kt_ancestry(
            q, k_l, v_l, anc, mask, k_scale, v_scale,
            select=anc_select,
        )

    def make(blen):
        def branch(q, k_l, v_l, mask):
            kb, vb, mb = (
                k_l[..., :blen], v_l[..., :blen], mask[..., :blen]
            )
            ks = None if k_scale is None else k_scale[..., :blen]
            vs = None if v_scale is None else v_scale[..., :blen]
            if anc is None:
                return attention_kt(q, kb, vb, mb, ks, vs)
            return attention_kt_ancestry(
                q, kb, vb, anc[..., :blen], mb, ks, vs,
                select=anc_select,
            )

        return branch

    idx = jnp.minimum(pos // 128, len(buckets) - 1)
    return jax.lax.switch(
        idx, [make(blen) for blen in buckets], q, k_l, v_l, mask
    )


def decode_step_stacked(
    params: Dict[str, Any],  # stacked form (stack_decoder_blocks output)
    token: jnp.ndarray,  # [B]
    pos: jnp.ndarray,  # scalar int32
    cache: dict,  # stacked cache
    cross_kv: dict,  # stacked cross-KV
    dims: WhisperDims,
    dtype=jnp.float32,
    kv_valid: Optional[jnp.ndarray] = None,
    pos_offset: Optional[jnp.ndarray] = None,
    return_hidden: bool = False,
    anc: Optional[jnp.ndarray] = None,
    prefix_buckets: bool = False,
    anc_select: str = "einsum",
) -> Tuple[jnp.ndarray, dict]:
    """Numerically identical to models.whisper.decode_step, with the
    layer loop as a lax.scan over stacked params. ``return_hidden``
    returns the final-norm hidden [B, D] instead of vocab logits (the
    loop-carry shrinking contract of models.whisper.decode_step).

    ``anc`` ([B, K, S] int in [0, K), with B*K == token batch) switches
    self-attention to beam-ancestry selection over the unreordered
    cache (ops.attention.attention_kt_ancestry) — beam search passes it
    instead of reordering the cache every step."""
    dec = params["decoder"]
    b = token.shape[0]
    cache_len = cache["k"].shape[-1]  # [L, B, H, D, S]: positions last
    if pos_offset is None:
        pos_emb = dec["pos_emb"][pos]
    else:
        pos_emb = dec["pos_emb"][jnp.maximum(pos - pos_offset, 0)]
    x = (dec["tok_emb"][token] + pos_emb).astype(dtype)[:, None, :]

    positions = jnp.arange(cache_len)
    visible = positions <= pos
    if kv_valid is not None:
        visible = visible[None, :] & kv_valid
        mask = jnp.where(visible, 0.0, -jnp.inf).astype(jnp.float32)[
            :, None, None, :
        ]
    else:
        mask = jnp.where(visible, 0.0, -jnp.inf).astype(jnp.float32)[
            None, None, None, :
        ]

    quantized = "k_q" in cross_kv
    dec_quant = "kv_dec" in cross_kv
    cross_len = cross_kv.get("_k_len")
    kv_bits = cross_kv.get("_bits", 8)
    # beam lanes share their window's K/V inside the kernel (beam
    # search sets this instead of replicating the decode-layout KV)
    kv_beam = cross_kv.get("_beam", 1)
    scanned_kv = {
        k: v for k, v in cross_kv.items() if not k.startswith("_")
    }
    if dec_quant:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
        # the big stacked K/V are NOT scanned: the Pallas kernel
        # indexes the layer itself (scalar prefetch), and the
        # self-attention cache stays a scan carry updated in place —
        # both avoid full-buffer copies every layer step (profiled at
        # ~5 ms of a 9 ms step at batch 16)
        kv_dec_full = scanned_kv.pop("kv_dec")

        from ..ops.cross_decode import cross_attention_decode_layered

        self_q = "k_scale" in cache
        use_anc_kernel = (
            anc is not None
            and anc_select == "kernel"
            and not self_q
            and not (prefix_buckets and cache_len > 128)
        )

        def layer(carry, scanned):
            x, c = carry
            blk, ckv, li = scanned
            c = dict(c)
            xn = _layer_norm(blk["ln1"], x)
            q = _split_heads(
                _linear(blk["attn"]["q"], xn), dims.n_text_head
            )
            k_new = _split_heads(
                _linear(blk["attn"]["k"], xn), dims.n_text_head
            )
            v_new = _split_heads(
                _linear(blk["attn"]["v"], xn), dims.n_text_head
            )
            # cache is [L, B, H, D, S] (positions on lanes); the new
            # token's K/V transpose in on write (int8 caches quantize
            # per position here, scales stored alongside)
            for name, new in (("k", k_new), ("v", v_new)):
                new_t = new.transpose(0, 2, 3, 1)  # [B, H, D, 1]
                if self_q:
                    new_t, sc = quantize_kv_t(new_t)
                    c[f"{name}_scale"] = jax.lax.dynamic_update_slice(
                        c[f"{name}_scale"], sc[None], (li, 0, 0, pos)
                    )
                c[name] = jax.lax.dynamic_update_slice(
                    c[name], new_t.astype(c[name].dtype)[None],
                    (li, 0, 0, 0, pos),
                )

            def _layer_slice(x_full):
                return jax.lax.dynamic_slice(
                    x_full, (li,) + (0,) * (x_full.ndim - 1),
                    (1,) + x_full.shape[1:],
                )[0]

            if use_anc_kernel:
                # the Pallas ancestry kernel indexes the layer itself
                # (scalar prefetch) — no per-layer [BK, H, D, S] slice
                # ever materializes, and the whole K×K lane selection
                # runs in VMEM (ops/self_decode.py; the XLA einsum
                # selection measured +12.4 ms/step at medium/b32·k5)
                from ..ops.self_decode import (
                    self_attention_decode_ancestry_layered,
                )

                attn = self_attention_decode_ancestry_layered(
                    q, c["k"], c["v"], anc, mask, li,
                    beam=anc.shape[1], interpret=interpret,
                )
            else:
                k_l, v_l = _layer_slice(c["k"]), _layer_slice(c["v"])
                k_sc = _layer_slice(c["k_scale"]) if self_q else None
                v_sc = _layer_slice(c["v_scale"]) if self_q else None
                attn = _self_attention_prefix(
                    q, k_l, v_l, mask, anc, pos, k_sc, v_sc,
                    enable=prefix_buckets, anc_select=anc_select,
                )
            attn = attn.reshape(b, 1, -1)
            x = x + _linear(blk["attn"]["o"], attn)

            xq = _layer_norm(blk["ln_cross"], x)
            qc = _split_heads(
                _linear(blk["cross_attn"]["q"], xq), dims.n_text_head
            )
            cross = cross_attention_decode_layered(
                qc, kv_dec_full, ckv["k_dec_scale"],
                ckv["v_dec_scale"], li, cross_len, bits=kv_bits,
                beam=kv_beam, interpret=interpret,
            ).astype(qc.dtype)
            x = x + _linear(blk["cross_attn"]["o"], cross.reshape(b, 1, -1))
            x = x + _mlp(
                blk["mlp_in"], blk["mlp_out"], _layer_norm(blk["ln2"], x)
            )
            return (x, c), None

        (x, new_cache), _ = jax.lax.scan(
            layer,
            (x, cache),
            (
                dec["blocks_stacked"],
                scanned_kv,
                jnp.arange(
                    dec["blocks_stacked"]["ln1"]["g"].shape[0],
                    dtype=jnp.int32,
                ),
            ),
        )
        x = _layer_norm(dec["ln"], x)
        if return_hidden:
            return x[:, 0, :], new_cache
        logits = _vocab_logits(dec, x[:, 0, :])
        return logits.astype(jnp.float32), new_cache

    self_q = "k_scale" in cache
    use_anc_kernel = (
        anc is not None
        and anc_select == "kernel"
        and not self_q
        and not (prefix_buckets and cache_len > 128)
    )
    interp_anc = jax.devices()[0].platform not in ("tpu", "axon")

    def layer(x, scanned):
        blk, c, ckv = scanned
        c = dict(c)
        xn = _layer_norm(blk["ln1"], x)
        q = _split_heads(_linear(blk["attn"]["q"], xn), dims.n_text_head)
        k_new = _split_heads(_linear(blk["attn"]["k"], xn), dims.n_text_head)
        v_new = _split_heads(_linear(blk["attn"]["v"], xn), dims.n_text_head)
        for name, new in (("k", k_new), ("v", v_new)):
            new_t = new.transpose(0, 2, 3, 1)  # [B, H, D, 1]
            if self_q:
                new_t, sc = quantize_kv_t(new_t)
                c[f"{name}_scale"] = jax.lax.dynamic_update_slice(
                    c[f"{name}_scale"], sc, (0, 0, pos)
                )
            c[name] = jax.lax.dynamic_update_slice(
                c[name], new_t.astype(c[name].dtype), (0, 0, 0, pos)
            )
        if use_anc_kernel:
            from ..ops.self_decode import self_attention_decode_ancestry

            attn = self_attention_decode_ancestry(
                q, c["k"], c["v"], anc, mask,
                beam=anc.shape[1], interpret=interp_anc,
            )
        else:
            attn = _self_attention_prefix(
                q, c["k"], c["v"], mask, anc, pos,
                c["k_scale"] if self_q else None,
                c["v_scale"] if self_q else None,
                enable=prefix_buckets, anc_select=anc_select,
            )
        attn = attn.reshape(b, 1, -1)
        x = x + _linear(blk["attn"]["o"], attn)

        xq = _layer_norm(blk["ln_cross"], x)
        qc = _split_heads(
            _linear(blk["cross_attn"]["q"], xq), dims.n_text_head
        )
        if quantized:
            scale = qc.shape[-1] ** -0.5
            qs = qc * (ckv["k_scale"][None, None] * scale).astype(qc.dtype)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", qs, ckv["k_q"].astype(qc.dtype),
                preferred_element_type=jnp.float32,
            )
            w = jax.nn.softmax(logits, axis=-1).astype(qc.dtype)
            cross = jnp.einsum(
                "bhqk,bkhd->bqhd", w, ckv["v_q"].astype(qc.dtype)
            ) * ckv["v_scale"][None, None].astype(qc.dtype)
        else:
            cross = _attention(qc, ckv["k"], ckv["v"])
        x = x + _linear(blk["cross_attn"]["o"], cross.reshape(b, 1, -1))
        x = x + _mlp(blk["mlp_in"], blk["mlp_out"], _layer_norm(blk["ln2"], x))
        return x, c

    x, new_cache = jax.lax.scan(
        layer, x, (dec["blocks_stacked"], cache, scanned_kv)
    )
    x = _layer_norm(dec["ln"], x)
    if return_hidden:
        return x[:, 0, :], new_cache
    logits = _vocab_logits(dec, x[:, 0, :])
    return logits.astype(jnp.float32), new_cache
