"""Weight-only int8 quantization for inference.

The TPU analogue of CTranslate2's int8 compute type (reference
``mtypes``, diarize.py:36): linear weights are stored per-output-channel
symmetric int8 and dequantized inside the matmul epilogue
(``(x @ w_i8) · scale``), cutting HBM weight traffic 4× — the decode
loop is bandwidth-bound, so step latency follows. Activations stay
bf16/fp32; embeddings stay dense (single-row gathers are cheap).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp



@jax.jit
def _quantize_linear_jit(w: jnp.ndarray):
    absmax = jnp.abs(w).max(axis=0)
    scale = absmax / 127.0
    scale_safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(w / scale_safe), -127, 127).astype(jnp.int8)
    return q, scale_safe.astype(jnp.float32)


def quantize_linear(w) -> Dict[str, Any]:
    """[in, out] float → int8 weights + per-out-channel f32 scales.

    The arithmetic runs on the accelerator: host-numpy quantization of
    medium.en's ~750M weight elements costs minutes on this box's
    single contended core (measured 13+ min during an r3 bench setup),
    vs seconds of device math after the one-time f32 upload. Device
    arrays convert in place — no host round-trip.
    """
    q, scale = _quantize_linear_jit(jnp.asarray(w, jnp.float32))
    return {"w_q": q, "scale": scale}


def _quantize_linear_dict(p: Dict[str, Any], mxu: bool = False) -> Dict[str, Any]:
    out = quantize_linear(p["w"])
    if mxu:
        # key rename routes models/whisper.py:_linear onto the
        # int8×int8 MXU dot (w8a8) instead of the dequant-then-bf16 dot
        out = {"w_qm": out.pop("w_q"), "scale": out["scale"]}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _quantize_block(
    block: Dict[str, Any], mxu: bool = False, mxu_pairs: tuple = ()
) -> Dict[str, Any]:
    """``mxu`` marks every linear for the int8-MXU path; ``mxu_pairs``
    marks selected (attn_key, proj) pairs only — e.g. the decoder's
    cross-attention k/v, which run once per window at prefill (a
    compute-bound [B·1500, D] GEMM) and never inside the DMA-bound
    step loop."""
    out = dict(block)
    for attn_key in ("attn", "cross_attn"):
        if attn_key in block:
            out[attn_key] = {
                k: _quantize_linear_dict(
                    v, mxu or (attn_key, k) in mxu_pairs
                )
                for k, v in block[attn_key].items()
            }
    for mlp_key in ("mlp_in", "mlp_out"):
        if mlp_key in block:
            out[mlp_key] = _quantize_linear_dict(block[mlp_key], mxu)
    return out


def quantize_whisper_params(
    params: Dict[str, Any], encoder_mxu: bool = None
) -> Dict[str, Any]:
    """int8-quantize every transformer linear plus the vocabulary output
    projection (stored separately; the token-embedding gather stays
    dense).

    ``encoder_mxu`` routes the encoder's linears through the int8×int8
    MXU dot with dynamic per-row activation quantization — the compute
    CTranslate2's int8 GEMMs actually run (reference diarize.py:36
    ``mtypes``). The decoder keeps weight-only dequant: its loop is at
    the cross-KV DMA floor (docs/ROADMAP.md), so per-step activation
    quantization would add VPU work for no bandwidth win.

    Default (``encoder_mxu=None``) reads ``WNT_INT8_ENCODER_MXU``,
    default OFF: measured on the v5 lite chip (tools/bench_encoder_int8
    --full, B32 medium.en), the full-encoder forward runs 480.5 ms
    w8a8 vs 451.9 ms weight-only dequant vs 457.6 ms bf16 — the
    encoder already sits at ~40% MFU and the per-linear activation
    quantization (an f32 VPU pass over [B, 1500, D] per GEMM) costs
    more than the int8 MXU dot saves, even though the isolated
    [12000,1024]x[1024,4096] GEMM measures 17% faster w8a8. Kept for
    hardware generations where the int8:bf16 MXU ratio is larger.
    """
    if encoder_mxu is None:
        import os

        encoder_mxu = os.environ.get("WNT_INT8_ENCODER_MXU", "0") == "1"
    enc = dict(params["encoder"])
    enc["blocks"] = [
        _quantize_block(b, mxu=encoder_mxu)
        for b in params["encoder"]["blocks"]
    ]
    dec = dict(params["decoder"])
    # cross k/v linears only run at per-window prefill (compute-bound),
    # so they ride the MXU path with the encoder; everything the step
    # loop touches stays weight-only dequant
    dec_pairs = (("cross_attn", "k"), ("cross_attn", "v")) if encoder_mxu else ()
    dec["blocks"] = [
        _quantize_block(b, mxu_pairs=dec_pairs)
        for b in params["decoder"]["blocks"]
    ]
    # output projection: tok_emb.T as int8 [D, V] (transpose on device)
    tok = jnp.asarray(params["decoder"]["tok_emb"], jnp.float32)
    dec["out_proj_q"] = quantize_linear(tok.T)
    return {"encoder": enc, "decoder": dec}
