"""TitaNet-style speaker-embedding model in pure-functional JAX.

The speaker-embedding extractor of the reference's diarization stack
(SURVEY D5b: ``titanet_large``, multiscale windows). Architecture
follows TitaNet: prologue conv → mega-blocks of time-channel separable
convs with squeeze-excite and residuals → epilogue conv → attentive
statistics pooling → linear projection to the embedding space.

Variable-length windows are handled with a frame mask: pooling
statistics are computed over valid frames only, so one padded batch
serves every multiscale window length (static shapes for jit).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class TitaNetDims:
    n_mels: int = 80
    filters: Sequence[int] = (1024, 1024, 1024, 1024, 3072)
    kernels: Sequence[int] = (3, 7, 11, 15, 1)
    repeat: int = 3
    se_reduction: int = 16
    attn_hidden: int = 128
    emb_dim: int = 192


def _conv(p, x, kernel: int, groups: int = 1):
    pad = kernel // 2
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1,),
        padding=((pad, pad),) if kernel > 1 else "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y * p["bn_g"] + p["bn_b"]


def _sep_conv_block(p, x, kernel: int):
    """Depthwise + pointwise with folded BN."""
    y = _conv(p["dw"], x, kernel, groups=x.shape[-1])
    return _conv(p["pw"], y, 1)


def _squeeze_excite(p, x, mask):
    """Global (masked) average pooling → bottleneck MLP → channel gate."""
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    mean = (x * mask).sum(axis=1, keepdims=True) / denom  # [B,1,C]
    h = jax.nn.relu(
        jnp.dot(mean, p["w1"].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype) + p["b1"]
    )
    gate = jax.nn.sigmoid(
        jnp.dot(h, p["w2"].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype) + p["b2"]
    )
    return x * gate


def encoder(params: Params, feats: jnp.ndarray, mask: jnp.ndarray,
            dims: TitaNetDims) -> jnp.ndarray:
    """[B, T, n_mels], [B, T, 1] mask → [B, T, filters[-1]]."""
    # re-mask after every conv stack: 'same'-padded convs spill nonzero
    # activations into the padded tail, and without masking the next
    # layer's receptive field would read different values than an
    # unpadded input — breaking length invariance of the embeddings.
    x = jax.nn.relu(_sep_conv_block(params["prologue"], feats, dims.kernels[0]))
    x = x * mask
    for bi, block in enumerate(params["blocks"]):
        residual = _conv(block["res"], x, 1)
        y = x
        for layer in block["layers"]:
            y = jax.nn.relu(_sep_conv_block(layer, y, dims.kernels[bi + 1]))
            y = y * mask
        y = _squeeze_excite(block["se"], y, mask)
        x = jax.nn.relu(y + residual)
    x = jax.nn.relu(_conv(params["epilogue"], x, dims.kernels[-1]))
    return x * mask


def attentive_stats_pool(p, x, mask):
    """Attention-weighted mean+std pooling over valid frames.

    [B, T, C] → [B, 2C]."""
    h = jnp.tanh(
        jnp.dot(x, p["w1"].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype) + p["b1"]
    )
    scores = jnp.dot(
        h, p["w2"].astype(x.dtype), preferred_element_type=jnp.float32
    ) + p["b2"]  # [B, T, C] per-channel attention (TitaNet style)
    scores = jnp.where(mask > 0, scores, -jnp.inf)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=1).astype(x.dtype)
    mean = (attn * x).sum(axis=1)
    var = (attn * (x - mean[:, None, :]) ** 2).sum(axis=1)
    std = jnp.sqrt(jnp.maximum(var, 1e-8))
    return jnp.concatenate([mean, std], axis=-1)


def embed(
    params: Params,
    feats: jnp.ndarray,  # [B, T, n_mels]
    lengths: jnp.ndarray,  # [B] valid frame counts
    dims: TitaNetDims,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Speaker embeddings [B, emb_dim] for masked variable-length windows."""
    feats = feats.astype(dtype)
    t = feats.shape[1]
    mask = (
        jnp.arange(t)[None, :, None] < lengths[:, None, None]
    ).astype(feats.dtype)
    x = encoder(params, feats * mask, mask, dims)
    pooled = attentive_stats_pool(params["pool"], x, mask)
    emb = jnp.dot(
        pooled, params["emb"]["w"].astype(pooled.dtype),
        preferred_element_type=jnp.float32,
    ) + params["emb"]["b"]
    return emb.astype(jnp.float32)


def init_titanet_params(key, dims: TitaNetDims) -> Params:
    keys = iter(
        jax.random.split(
            key, 16 + len(dims.filters) * (dims.repeat + 3) * 4
        )
    )

    def conv(c_in, c_out, k, groups=1):
        return {
            "w": jax.random.normal(next(keys), (k, c_in // groups, c_out))
            / np.sqrt(k * c_in / groups),
            "bn_g": jnp.ones((c_out,)),
            "bn_b": jnp.zeros((c_out,)),
        }

    def sep(c_in, c_out, k):
        return {
            "dw": conv(c_in, c_in, k, groups=c_in),
            "pw": conv(c_in, c_out, 1),
        }

    c = dims.filters[0]
    prologue = sep(dims.n_mels, c, dims.kernels[0])
    blocks = []
    for bi, c_out in enumerate(dims.filters[1:-1], start=1):
        layers = []
        c_in = c
        for _ in range(dims.repeat):
            layers.append(sep(c_in, c_out, dims.kernels[bi]))
            c_in = c_out
        se = {
            "w1": jax.random.normal(
                next(keys), (c_out, c_out // dims.se_reduction)
            ) / np.sqrt(c_out),
            "b1": jnp.zeros((c_out // dims.se_reduction,)),
            "w2": jax.random.normal(
                next(keys), (c_out // dims.se_reduction, c_out)
            ) / np.sqrt(c_out // dims.se_reduction),
            "b2": jnp.zeros((c_out,)),
        }
        blocks.append({"layers": layers, "se": se, "res": conv(c, c_out, 1)})
        c = c_out
    epilogue = conv(c, dims.filters[-1], dims.kernels[-1])
    c = dims.filters[-1]
    pool = {
        "w1": jax.random.normal(next(keys), (c, dims.attn_hidden))
        / np.sqrt(c),
        "b1": jnp.zeros((dims.attn_hidden,)),
        "w2": jax.random.normal(next(keys), (dims.attn_hidden, c))
        / np.sqrt(dims.attn_hidden),
        "b2": jnp.zeros((c,)),
    }
    emb = {
        "w": jax.random.normal(next(keys), (2 * c, dims.emb_dim))
        / np.sqrt(2 * c),
        "b": jnp.zeros((dims.emb_dim,)),
    }
    return {
        "prologue": prologue,
        "blocks": blocks,
        "epilogue": epilogue,
        "pool": pool,
        "emb": emb,
    }
