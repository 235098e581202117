"""Param-tree persistence and model resolution.

Converted checkpoints are stored as a flat ``.npz`` (path-joined keys),
cheap to mmap and free of framework dependencies. ``resolve_model``
implements the reference's model-by-name contract (diarize.py:121,
main.py:110): a name maps to a local checkpoint directory (via
``WNT_MODEL_DIR`` or ``~/.cache/whisper_nemo_tpu``); when no checkpoint
exists the model is deterministically random-initialized — the
zero-egress fallback that keeps every pipeline runnable end-to-end.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.whisper import WHISPER_DIMS, WhisperDims, init_whisper_params
from ..utils import get_logger

logger = get_logger(__name__)

_SEP = "/"


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(flatten_tree(v, f"{prefix}{_SEP}{k}" if prefix else k))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(flatten_tree(v, f"{prefix}{_SEP}{i}"))
    else:
        flat[prefix] = np.asarray(tree)
    return flat


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for path, value in flat.items():
        keys = path.split(_SEP)
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return jnp.asarray(node)
        if node and all(re.fullmatch(r"\d+", k) for k in node):
            return [listify(node[str(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params(path: str, params: Any) -> None:
    np.savez(path, **flatten_tree(params))


def load_params(path: str) -> Any:
    with np.load(path) as data:
        return unflatten_tree({k: data[k] for k in data.files})


def model_cache_dir() -> str:
    return os.environ.get(
        "WNT_MODEL_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "whisper_nemo_tpu"),
    )


def resolve_model(name: str) -> Tuple[Any, WhisperDims]:
    """Model name or path → (params, dims).

    Resolution order: explicit ``.npz`` path → ``<cache>/<name>.npz`` →
    deterministic random init (logged loudly).
    """
    if name.endswith(".npz") and os.path.exists(name):
        dims = WHISPER_DIMS.get(
            os.path.splitext(os.path.basename(name))[0], WHISPER_DIMS["tiny"]
        )
        return load_params(name), dims

    if name not in WHISPER_DIMS:
        raise ValueError(
            f"unknown whisper model {name!r}; expected one of"
            f" {sorted(WHISPER_DIMS)} or a .npz checkpoint path"
        )
    dims = WHISPER_DIMS[name]
    ckpt = os.path.join(model_cache_dir(), f"{name}.npz")
    if os.path.exists(ckpt):
        logger.info("loading %s from %s", name, ckpt)
        return load_params(ckpt), dims

    logger.warning(
        "no checkpoint found for %s (looked in %s); using deterministic "
        "random initialization — transcriptions will be meaningless until "
        "converted weights are installed",
        name,
        model_cache_dir(),
    )
    return init_whisper_params(jax.random.PRNGKey(0), dims), dims
