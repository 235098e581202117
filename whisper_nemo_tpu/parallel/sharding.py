"""Sharding specifications for the model parameter trees.

Tensor-parallel layout for Whisper (megatron-style): attention QKV and
MLP-in shard their output feature dim over ``tp`` (head-parallel), the
attention output projection and MLP-out shard their input dim, so each
block needs exactly one all-reduce per sublayer — inserted by XLA from
these annotations, riding ICI. Embeddings, layer norms, convs and
biases on reduced dims stay replicated. The batch axis of activations
shards over ``dp``.

Specs are derived from the parameter tree's key paths, so one rule set
covers every layout the engine actually runs: the canonical float tree,
the int8 weight-quantized tree (``w_q``/``w_qm`` + per-out-channel
``scale``), and the layer-stacked decoder (``blocks_stacked`` leaves
carry a leading [L] axis that stays replicated — the decode scan walks
it locally on every chip).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# leaves belonging to these projection dicts shard their OUTPUT feature
# dim over tp (column-parallel)...
_COL_PARALLEL = ("q", "k", "v", "mlp_in")
# ...and these shard their INPUT dim (row-parallel): one psum per
# sublayer closes the pair
_ROW_PARALLEL = ("o", "mlp_out")
_WEIGHT_LEAVES = ("w", "w_q", "w_qm")


def _path_names(path) -> list:
    names = []
    for entry in path:
        key = getattr(entry, "key", None)
        if key is not None:
            names.append(key)
    return names


def _spec_for(path, leaf, tp: Optional[str]) -> P:
    """PartitionSpec for one parameter leaf, by its key path."""
    names = _path_names(path)
    if tp is None or not names:
        return P()
    leaf_name = names[-1]
    parent = names[-2] if len(names) >= 2 else None
    stacked = "blocks_stacked" in names
    prefix = (None,) if stacked else ()

    if parent in _COL_PARALLEL:
        if leaf_name in _WEIGHT_LEAVES:
            return P(*prefix, None, tp)
        if leaf_name in ("b", "scale"):
            return P(*prefix, tp)
    elif parent in _ROW_PARALLEL:
        if leaf_name in _WEIGHT_LEAVES:
            return P(*prefix, tp, None)
        return P()  # bias/scale live on the replicated output dim
    return P()  # embeddings, norms, convs, out_proj, metadata


def whisper_param_specs(
    params: Any, dims=None, tp: Optional[str] = "tp"
) -> Any:
    """PartitionSpec tree matching ``params``' exact layout (float,
    int8-quantized, stacked, or any mix). ``dims`` is accepted for
    backward compatibility and unused — the tree's own key paths carry
    everything the rules need. ``tp=None`` replicates every leaf."""
    del dims
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(path, leaf, tp), params
    )


def shard_whisper_params(
    params: Any, mesh: Mesh, dims=None, tp: str = "tp"
) -> Any:
    """Place a param tree onto the mesh with TP shardings.

    Works for the canonical float tree, the int8-quantized tree and the
    layer-stacked decoder tree. When the mesh has no ``tp`` axis (or
    tp=1), every leaf is replicated across the mesh — the dp-sharded
    batch then runs fully data-parallel with zero collectives."""
    has_tp = tp in mesh.axis_names and mesh.shape[tp] > 1
    specs = whisper_param_specs(params, tp=tp if has_tp else None)
    return jax.tree_util.tree_map(
        lambda s, x: jax.device_put(x, NamedSharding(mesh, s)),
        specs,
        params,
        is_leaf=lambda x: isinstance(x, P),
    )
