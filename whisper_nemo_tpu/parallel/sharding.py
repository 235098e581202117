"""Sharding specifications for the model parameter trees.

Tensor-parallel layout for Whisper (megatron-style): attention QKV and
MLP-in shard their output feature dim over ``tp`` (head-parallel), the
attention output projection and MLP-out shard their input dim, so each
block needs exactly one all-reduce per sublayer — inserted by XLA from
these annotations, riding ICI. Embeddings, layer norms, convs and
biases on reduced dims stay replicated. The batch axis of activations
shards over ``dp``.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.whisper import WhisperDims


def _attn_specs(tp: str):
    return {
        "q": {"w": P(None, tp), "b": P(tp)},
        "k": {"w": P(None, tp)},  # k has no bias in whisper
        "v": {"w": P(None, tp), "b": P(tp)},
        "o": {"w": P(tp, None), "b": P(None)},
    }


def _block_specs(tp: str, cross: bool):
    spec = {
        "ln1": {"g": P(None), "b": P(None)},
        "attn": _attn_specs(tp),
        "ln2": {"g": P(None), "b": P(None)},
        "mlp_in": {"w": P(None, tp), "b": P(tp)},
        "mlp_out": {"w": P(tp, None), "b": P(None)},
    }
    if cross:
        spec["ln_cross"] = {"g": P(None), "b": P(None)}
        spec["cross_attn"] = _attn_specs(tp)
    return spec


def whisper_param_specs(dims: WhisperDims, tp: str = "tp") -> Any:
    """PartitionSpec tree matching ``init_whisper_params``' layout."""
    # k bias: our attn dict has no 'b' for k — spec mirrors exactly
    encoder = {
        # the two prologue convs are tiny; replicate to avoid resharding
        # between conv output and the first attention block
        "conv1": {"w": P(None, None, None), "b": P(None)},
        "conv2": {"w": P(None, None, None), "b": P(None)},
        "pos": P(None, None),
        "blocks": [
            _block_specs(tp, cross=False) for _ in range(dims.n_audio_layer)
        ],
        "ln_post": {"g": P(None), "b": P(None)},
    }
    decoder = {
        "tok_emb": P(None, None),
        "pos_emb": P(None, None),
        "blocks": [
            _block_specs(tp, cross=True) for _ in range(dims.n_text_layer)
        ],
        "ln": {"g": P(None), "b": P(None)},
    }
    return {"encoder": encoder, "decoder": decoder}


def shard_whisper_params(params: Any, mesh: Mesh, dims: WhisperDims) -> Any:
    """Place a param tree onto the mesh with TP shardings.

    The spec tree leads the tree_map (with PartitionSpec as its leaf
    type) because PartitionSpec is itself a tuple and would otherwise be
    flattened as a pytree.
    """
    specs = whisper_param_specs(dims)
    return jax.tree_util.tree_map(
        lambda s, x: jax.device_put(x, NamedSharding(mesh, s)),
        specs,
        params,
        is_leaf=lambda x: isinstance(x, P),
    )
