"""ECAPA-TDNN speaker embeddings in pure-functional JAX.

The alternative speaker-embedding backbone the reference's config
documents next to titanet_large (telephonic.yaml:41 — ``titanet_large,
ecapa_tdnn or speakerverification_speakernet``). Architecture: prologue
conv → three SE-Res2Blocks at dilations 2/3/4 → multi-layer feature
aggregation (concat + 1×1 conv) → context-aware attentive statistics
pooling → linear embedding. Variable-length windows use the same frame
mask discipline as TitaNet (re-masked after every conv stack).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class EcapaDims:
    n_mels: int = 80
    channels: int = 512
    res2net_scale: int = 8
    se_reduction: int = 8
    dilations: Sequence[int] = (2, 3, 4)
    agg_channels: int = 1536
    attn_hidden: int = 128
    emb_dim: int = 192


def _conv1d(p, x, dilation: int = 1):
    """[B, T, C] 'same' conv with folded BN."""
    k = p["w"].shape[0]
    pad = (k - 1) * dilation // 2
    return (
        jax.lax.conv_general_dilated(
            x,
            p["w"].astype(x.dtype),
            window_strides=(1,),
            padding=((pad, pad),),
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        * p["bn_g"]
        + p["bn_b"]
    )


def _res2net(p, x, dilation: int, scale: int):
    """Hierarchical multi-scale conv: split channels into ``scale``
    groups; each group's conv sees the previous group's output."""
    groups = jnp.split(x, scale, axis=-1)
    outs = [groups[0]]
    prev = groups[0]
    for i in range(1, scale):
        prev = jax.nn.relu(_conv1d(p["convs"][i - 1], groups[i] + prev, dilation))
        outs.append(prev)
    return jnp.concatenate(outs, axis=-1)


def _se(p, x, mask):
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    mean = (x * mask).sum(axis=1, keepdims=True) / denom
    h = jax.nn.relu(mean @ p["w1"] + p["b1"])
    gate = jax.nn.sigmoid(h @ p["w2"] + p["b2"])
    return x * gate


def _se_res2block(p, x, mask, dilation: int, scale: int):
    y = jax.nn.relu(_conv1d(p["in"], x)) * mask
    y = _res2net(p["res2"], y, dilation, scale) * mask
    y = jax.nn.relu(_conv1d(p["out"], y)) * mask
    y = _se(p["se"], y, mask)
    return (x + y) * mask


def embed(
    params: Params,
    feats: jnp.ndarray,  # [B, T, n_mels]
    lengths: jnp.ndarray,  # [B]
    dims: EcapaDims,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Speaker embeddings [B, emb_dim]."""
    feats = feats.astype(dtype)
    t = feats.shape[1]
    mask = (
        jnp.arange(t)[None, :, None] < lengths[:, None, None]
    ).astype(feats.dtype)

    x = jax.nn.relu(_conv1d(params["prologue"], feats * mask)) * mask
    block_outs = []
    for p_block, dil in zip(params["blocks"], dims.dilations):
        x = _se_res2block(p_block, x, mask, dil, dims.res2net_scale)
        block_outs.append(x)
    agg = jnp.concatenate(block_outs, axis=-1)
    agg = jax.nn.relu(_conv1d(params["agg"], agg)) * mask

    # context-aware attentive stats: attention input = frame features
    # concatenated with the utterance mean/std (broadcast over time)
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    mu = (agg * mask).sum(axis=1, keepdims=True) / denom
    var = (((agg - mu) * mask) ** 2).sum(axis=1, keepdims=True) / denom
    sd = jnp.sqrt(jnp.maximum(var, 1e-8))
    ctx = jnp.concatenate(
        [agg, jnp.broadcast_to(mu, agg.shape), jnp.broadcast_to(sd, agg.shape)],
        axis=-1,
    )
    h = jnp.tanh(ctx @ params["attn"]["w1"] + params["attn"]["b1"])
    scores = h @ params["attn"]["w2"] + params["attn"]["b2"]  # [B, T, C]
    scores = jnp.where(mask > 0, scores, -jnp.inf)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=1).astype(agg.dtype)
    mean = (attn * agg).sum(axis=1)
    std = jnp.sqrt(
        jnp.maximum((attn * (agg - mean[:, None, :]) ** 2).sum(axis=1), 1e-8)
    )
    pooled = jnp.concatenate([mean, std], axis=-1)
    emb = pooled @ params["emb"]["w"] + params["emb"]["b"]
    return emb.astype(jnp.float32)


def init_ecapa_params(key, dims: EcapaDims) -> Params:
    keys = iter(
        jax.random.split(key, 16 + len(dims.dilations) * (dims.res2net_scale + 8))
    )
    c = dims.channels

    def conv(k, c_in, c_out):
        return {
            "w": jax.random.normal(next(keys), (k, c_in, c_out))
            / np.sqrt(k * c_in),
            "bn_g": jnp.ones((c_out,)),
            "bn_b": jnp.zeros((c_out,)),
        }

    def lin(c_in, c_out):
        return (
            jax.random.normal(next(keys), (c_in, c_out)) / np.sqrt(c_in),
            jnp.zeros((c_out,)),
        )

    group = c // dims.res2net_scale
    blocks = []
    for _ in dims.dilations:
        w1, b1 = lin(c, c // dims.se_reduction)
        w2, b2 = lin(c // dims.se_reduction, c)
        blocks.append(
            {
                "in": conv(1, c, c),
                "res2": {
                    "convs": [
                        conv(3, group, group)
                        for _ in range(dims.res2net_scale - 1)
                    ]
                },
                "out": conv(1, c, c),
                "se": {"w1": w1, "b1": b1, "w2": w2, "b2": b2},
            }
        )
    aw1, ab1 = lin(3 * dims.agg_channels, dims.attn_hidden)
    aw2, ab2 = lin(dims.attn_hidden, dims.agg_channels)
    ew, eb = lin(2 * dims.agg_channels, dims.emb_dim)
    return {
        "prologue": conv(5, dims.n_mels, c),
        "blocks": blocks,
        "agg": conv(1, len(dims.dilations) * c, dims.agg_channels),
        "attn": {"w1": aw1, "b1": ab1, "w2": aw2, "b2": ab2},
        "emb": {"w": ew, "b": eb},
    }
