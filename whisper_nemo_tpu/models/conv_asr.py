"""Config-driven NeMo-style ConvASR encoder/decoders in functional JAX.

The reference's diarization models (``vad_multilingual_marblenet``,
``titanet_large`` — pulled through
``nemo.collections.asr.models.msdd_models.NeuralDiarizer``,
/root/reference/diarize.py:19) are QuartzNet/Jasper-family conv nets
whose exact layer stack is described by the ``encoder.jasper`` block
list inside each ``.nemo`` archive's ``model_config.yaml``. This module
evaluates that block list directly, so weights converted by
``engine/nemo_weights.py`` run bit-for-bit the architecture they were
trained with — unlike ``models/marblenet.py`` / ``models/titanet.py``,
which are fixed-shape re-implementations used for random-init tests.

TPU notes: every conv is an NWC ``lax.conv_general_dilated`` (time
convs map to the MXU after im2col), batch norm is folded into a
per-channel scale/shift at conversion time (inference only), and
variable-length windows use a frame mask with re-masking after every
block so padded batches stay length-invariant.

Param layout (all folded-BN, matching engine/nemo_weights.py output):
  conv unit:   {"w": [k, c_in/groups, c_out], "g": [c_out], "b": [c_out]}
  SE unit:     {"w1": [c, c/r], "b1"?, "w2": [c/r, c], "b2"?}
  block:       {"layers": [{"dw"?: conv, "pw": conv}...], "se"?, "res"?: conv}
  vad head:    {"w": [c, n_classes], "b": [n_classes]}
  pool:        {"attn1": conv-unit-with-bn, "attn2": {"w","b"},
                "emb_bn": {"g","b"}, "emb": {"w","b"}}
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class JasperBlockCfg:
    """One entry of the .nemo ``encoder.jasper`` list."""

    filters: int
    repeat: int = 1
    kernel: int = 1
    dilation: int = 1
    separable: bool = False
    residual: bool = False
    se: bool = False
    se_reduction: int = 8


def _conv1d(unit: Params, x: jnp.ndarray, kernel: int, dilation: int = 1,
            groups: int = 1) -> jnp.ndarray:
    """'same'-padded NWC conv with folded-BN scale/shift."""
    pad = dilation * (kernel - 1) // 2
    y = jax.lax.conv_general_dilated(
        x,
        unit["w"].astype(x.dtype),
        window_strides=(1,),
        padding=((pad, pad),) if kernel > 1 else "VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y * unit["g"] + unit["b"]


def _conv_layer(layer: Params, x: jnp.ndarray, cfg: JasperBlockCfg):
    """Separable (depthwise+pointwise) or plain conv, cfg-selected."""
    if "dw" in layer:
        x = _conv1d(layer["dw"], x, cfg.kernel, cfg.dilation,
                    groups=x.shape[-1])
        return _conv1d(layer["pw"], x, 1)
    return _conv1d(layer["pw"], x, cfg.kernel, cfg.dilation)


def _squeeze_excite(se: Params, x: jnp.ndarray, mask: jnp.ndarray):
    """Masked global average pool → bottleneck MLP → sigmoid channel gate."""
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    pooled = (x * mask).sum(axis=1, keepdims=True) / denom  # [B, 1, C]
    h = jnp.dot(pooled, se["w1"].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    if "b1" in se:
        h = h + se["b1"]
    h = jax.nn.relu(h)
    g = jnp.dot(h, se["w2"].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    if "b2" in se:
        g = g + se["b2"]
    return x * jax.nn.sigmoid(g)


def encode(
    params: Params,
    cfgs: Sequence[JasperBlockCfg],
    feats: jnp.ndarray,  # [B, T, n_mels]
    mask: jnp.ndarray,  # [B, T, 1] 1.0 on valid frames
) -> jnp.ndarray:
    """Jasper block stack: [B, T, n_mels] → [B, T, filters[-1]].

    Mirrors NeMo's JasperBlock forward: repeat× (conv → BN → ReLU),
    last repeat without the activation, optional squeeze-excite, then
    residual add (1×1 conv + BN projection) and the block activation.
    Activations re-mask so 'same' padding can't leak into pooled stats.
    """
    x = feats * mask
    for cfg, block in zip(cfgs, params["blocks"]):
        y = x
        layers = block["layers"]
        for layer in layers[:-1]:
            y = jax.nn.relu(_conv_layer(layer, y, cfg)) * mask
        y = _conv_layer(layers[-1], y, cfg)
        if "se" in block:
            y = _squeeze_excite(block["se"], y * mask, mask)
        if "res" in block:
            y = y + _conv1d(block["res"], x, 1)
        x = jax.nn.relu(y) * mask
    return x


def vad_logits(
    params: Params,
    cfgs: Sequence[JasperBlockCfg],
    feats: jnp.ndarray,  # [B, T, n_mels]
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Frame-classification head: [B, T, n_mels] → [B, T, n_classes].

    NeMo's frame-VAD decoder is a single 1×1 conv over the encoder
    output (``decoder.decoder_layers.0`` in vad_multilingual_marblenet).
    """
    if mask is None:
        mask = jnp.ones((*feats.shape[:2], 1), feats.dtype)
    x = encode(params, cfgs, feats, mask)
    head = params["head"]
    return (
        jnp.dot(x, head["w"].astype(x.dtype),
                preferred_element_type=jnp.float32) + head["b"]
    ).astype(jnp.float32)


def speech_probs(params, cfgs, feats, mask=None):
    """[B, T, n_mels] → [B, T] per-frame speech probability."""
    return jax.nn.softmax(vad_logits(params, cfgs, feats, mask), axis=-1)[
        ..., 1
    ]


def _masked_mean_std(x: jnp.ndarray, mask: jnp.ndarray):
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    mean = (x * mask).sum(axis=1, keepdims=True) / denom
    var = ((x - mean) ** 2 * mask).sum(axis=1, keepdims=True) / denom
    return mean, jnp.sqrt(jnp.maximum(var, 1e-10))


def attentive_pool(pool: Params, x: jnp.ndarray, mask: jnp.ndarray):
    """NeMo TitaNet attentive statistics pooling: [B, T, C] → [B, 2C].

    Global-context variant: the attention TDNN sees [x, mean, std]
    (3C channels); conv → ReLU → BN → tanh → 1×1 conv → per-channel
    masked softmax over time → attention-weighted mean/std.
    """
    mean, std = _masked_mean_std(x, mask)
    t = x.shape[1]
    ctx = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)],
        axis=-1,
    )
    # TDNN conv (kernel 1) keeps its own bias "cb": the ReLU between the
    # conv and the batch norm blocks folding the bias into the BN shift.
    a = jnp.dot(ctx, pool["attn1"]["w"][0].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    a = a + pool["attn1"]["cb"]
    a = jax.nn.relu(a)
    a = a * pool["attn1"]["g"] + pool["attn1"]["b"]
    a = jnp.tanh(a)
    a = jnp.dot(a, pool["attn2"]["w"].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    a = a + pool["attn2"]["b"]  # [B, T, C]
    a = jnp.where(mask > 0, a, -jnp.inf)
    attn = jax.nn.softmax(a.astype(jnp.float32), axis=1).astype(x.dtype)
    mu = (attn * x).sum(axis=1)
    var = (attn * x**2).sum(axis=1) - mu**2
    sg = jnp.sqrt(jnp.maximum(var, 1e-10))
    return jnp.concatenate([mu, sg], axis=-1)


def speaker_embed(
    params: Params,
    cfgs: Sequence[JasperBlockCfg],
    feats: jnp.ndarray,  # [B, T, n_mels]
    lengths: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """TitaNet embedding path: encoder → attentive pool → BN → linear.

    Matches NeMo's SpeakerDecoder up to (not including) the training
    classification head; embeddings are the ``emb_layers`` output.
    """
    t = feats.shape[1]
    mask = (jnp.arange(t)[None, :, None] < lengths[:, None, None]).astype(
        feats.dtype
    )
    x = encode(params, cfgs, feats, mask)
    pooled = attentive_pool(params["pool"], x, mask)
    pooled = pooled * params["pool"]["emb_bn"]["g"] + params["pool"][
        "emb_bn"
    ]["b"]
    emb = jnp.dot(
        pooled, params["pool"]["emb"]["w"].astype(pooled.dtype),
        preferred_element_type=jnp.float32,
    )
    if "b" in params["pool"]["emb"]:
        emb = emb + params["pool"]["emb"]["b"]
    return emb.astype(jnp.float32)


def init_conv_asr_params(
    key,
    cfgs: Sequence[JasperBlockCfg],
    n_mels: int,
    n_classes: int = 0,
    emb_dim: int = 0,
    attn_hidden: int = 128,
) -> Params:
    """Random params matching the converter's layout (tests only)."""
    keys = jax.random.split(key, 4 * sum(c.repeat + 2 for c in cfgs) + 8)
    ki = iter(range(len(keys)))

    def conv(c_in, c_out, k, groups=1):
        return {
            "w": jax.random.normal(keys[next(ki)], (k, c_in // groups, c_out))
            / np.sqrt(k * c_in / groups),
            "g": jnp.ones((c_out,)),
            "b": jnp.zeros((c_out,)),
        }

    blocks = []
    c = n_mels
    for cfg in cfgs:
        layers = []
        c_in = c
        for _ in range(cfg.repeat):
            if cfg.separable:
                layers.append(
                    {"dw": conv(c_in, c_in, cfg.kernel, groups=c_in),
                     "pw": conv(c_in, cfg.filters, 1)}
                )
            else:
                layers.append({"pw": conv(c_in, cfg.filters, cfg.kernel)})
            c_in = cfg.filters
        block: Params = {"layers": layers}
        if cfg.se:
            r = max(1, cfg.filters // cfg.se_reduction)
            block["se"] = {
                "w1": jax.random.normal(keys[next(ki)], (cfg.filters, r))
                / np.sqrt(cfg.filters),
                "w2": jax.random.normal(keys[next(ki)], (r, cfg.filters))
                / np.sqrt(r),
            }
        if cfg.residual:
            block["res"] = conv(c, cfg.filters, 1)
        blocks.append(block)
        c = cfg.filters
    params: Params = {"blocks": blocks}
    if n_classes:
        params["head"] = {
            "w": jax.random.normal(keys[next(ki)], (c, n_classes))
            / np.sqrt(c),
            "b": jnp.zeros((n_classes,)),
        }
    if emb_dim:
        a1 = conv(3 * c, attn_hidden, 1)
        a1["cb"] = jnp.zeros((attn_hidden,))
        params["pool"] = {
            "attn1": a1,
            "attn2": {
                "w": jax.random.normal(keys[next(ki)], (attn_hidden, c))
                / np.sqrt(attn_hidden),
                "b": jnp.zeros((c,)),
            },
            "emb_bn": {"g": jnp.ones((2 * c,)), "b": jnp.zeros((2 * c,))},
            "emb": {
                "w": jax.random.normal(keys[next(ki)], (2 * c, emb_dim))
                / np.sqrt(2 * c),
                "b": jnp.zeros((emb_dim,)),
            },
        }
    return params
