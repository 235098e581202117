"""MarbleNet-style frame VAD in pure-functional JAX.

The neural VAD of the reference's diarization stack (SURVEY D5a:
``vad_multilingual_marblenet``, 0.15 s window / 0.01 s shift frame
posteriors). Architecture: small 1-D time-channel separable conv net
(prologue conv → N separable blocks → epilogue → per-frame 2-class
head). Emits per-10 ms-frame speech probabilities over the whole
utterance in one pass — the sliding-window contract collapses to the
receptive field of the convs, which is cheaper on TPU than re-running a
window per shift and numerically equivalent at the binarization stage.

Frame probabilities feed the same hysteresis binarization
(``vad.binarize``) the config's onset/offset/pad parameters drive.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class MarbleNetDims:
    n_mels: int = 64
    filters: Sequence[int] = (128, 64, 64, 64)
    kernels: Sequence[int] = (11, 13, 15, 17)
    repeat: int = 2
    head_hidden: int = 128


def _sep_conv(p, x, kernel: int):
    """Depthwise (time) + pointwise (channel) separable conv, 'same'."""
    pad = kernel // 2
    depth = jax.lax.conv_general_dilated(
        x,
        p["dw"].astype(x.dtype),  # [k, 1, C] with feature_group_count=C
        window_strides=(1,),
        padding=((pad, pad),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1],
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    point = jax.lax.conv_general_dilated(
        depth,
        p["pw"].astype(x.dtype),  # [1, C, C_out]
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # folded batch-norm (inference): scale/shift per channel
    return point * p["bn_g"] + p["bn_b"]


def frame_logits(params: Params, feats: jnp.ndarray, dims: MarbleNetDims):
    """[B, T, n_mels] log-mel features → [B, T, 2] frame logits."""
    x = feats
    x = jax.nn.relu(_sep_conv(params["prologue"], x, dims.kernels[0]))
    for bi, block in enumerate(params["blocks"]):
        residual = x
        for layer in block["layers"]:
            x = jax.nn.relu(_sep_conv(layer, x, dims.kernels[bi + 1]))
        if residual.shape[-1] == x.shape[-1]:
            x = x + residual
    x = jax.nn.relu(_sep_conv(params["epilogue"], x, dims.kernels[-1]))
    h = jnp.dot(
        x, params["head"]["w1"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    ) + params["head"]["b1"]
    h = jax.nn.relu(h)
    return (
        jnp.dot(
            h, params["head"]["w2"].astype(h.dtype),
            preferred_element_type=jnp.float32,
        )
        + params["head"]["b2"]
    ).astype(jnp.float32)


def speech_probs(params: Params, feats: jnp.ndarray, dims: MarbleNetDims):
    """[B, T, n_mels] → [B, T] per-frame speech probability."""
    logits = frame_logits(params, feats, dims)
    return jax.nn.softmax(logits, axis=-1)[..., 1]


def init_marblenet_params(key, dims: MarbleNetDims) -> Params:
    keys = iter(jax.random.split(key, 4 + len(dims.filters) * dims.repeat * 2))

    def sep(c_in, c_out, k):
        return {
            "dw": jax.random.normal(next(keys), (k, 1, c_in)) / np.sqrt(k),
            "pw": jax.random.normal(next(keys), (1, c_in, c_out))
            / np.sqrt(c_in),
            "bn_g": jnp.ones((c_out,)),
            "bn_b": jnp.zeros((c_out,)),
        }

    c = dims.filters[0]
    prologue = sep(dims.n_mels, c, dims.kernels[0])
    blocks = []
    for bi, c_out in enumerate(dims.filters[1:], start=1):
        layers = []
        c_in = c
        for _ in range(dims.repeat):
            layers.append(sep(c_in, c_out, dims.kernels[bi]))
            c_in = c_out
        blocks.append({"layers": layers})
        c = c_out
    epilogue = sep(c, c, dims.kernels[-1])
    head = {
        "w1": jax.random.normal(next(keys), (c, dims.head_hidden))
        / np.sqrt(c),
        "b1": jnp.zeros((dims.head_hidden,)),
        "w2": jax.random.normal(next(keys), (dims.head_hidden, 2))
        / np.sqrt(dims.head_hidden),
        "b2": jnp.zeros((2,)),
    }
    return {
        "prologue": prologue,
        "blocks": blocks,
        "epilogue": epilogue,
        "head": head,
    }
