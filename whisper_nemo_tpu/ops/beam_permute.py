"""Pallas block-DMA permute for beam-search KV-cache reindexing.

Beam search reorders the self-attention KV cache every step: new beam
``i`` inherits the history of source beam ``src(i)``. XLA lowers the
``cache[:, idx]`` gather at ~100-200 GB/s effective on the v5e —
42 ms/step at medium/b32·k5, 4x the rest of the step combined
(tools/bench_beam_step.py, tools/bench_beam_gather.py: every XLA
formulation — axis permutations, flattened minors, grouped
take_along_axis, one-hot matmuls — lands in the 10-14.5 ms band per
1 GB array).

A permutation of rows needs no compute at all: this kernel drives one
block DMA per (beam row, layer group) with the SOURCE row supplied by
a scalar-prefetch index map, so the copy runs at the DMA engine's
block-copy speed like the fused cross-KV stream (~680 GB/s,
ops/cross_decode.py). K and V ride the same grid so each program
moves both blocks.

Reference contract: CT2's beam reorder (``batch_reorder`` of cached
self-attention keys/values) — the faster-whisper beam_size>1 path this
replaces (SURVEY D3).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_BYTES = 1 << 20  # ~1 MB per block: 4 blocks x2 buffers < VMEM


def _layer_group(l: int, row_bytes: int) -> int:
    """Largest divisor of ``l`` whose block stays within the VMEM
    budget (falls back to 1: a single layer-row per block)."""
    g = 1
    for cand in range(1, l + 1):
        if l % cand == 0 and cand * row_bytes <= _BLOCK_BYTES:
            g = cand
    return g


@functools.partial(jax.jit, static_argnames=("interpret",))
def beam_permute_cache(
    k: jnp.ndarray,  # [L, BK, ...]
    v: jnp.ndarray,  # [L, BK, ...] (same shape as k)
    idx: jnp.ndarray,  # [BK] int32: output row j <- input row idx[j]
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (k[:, idx], v[:, idx]) as block DMAs. Any rank >= 3 with
    leading (layers, beam-rows) axes."""
    l, bk = k.shape[:2]
    rest = k.shape[2:]
    row_bytes = int(
        functools.reduce(lambda a, b: a * b, rest, 1)
    ) * k.dtype.itemsize
    g = _layer_group(l, row_bytes)
    zeros = (0,) * len(rest)

    def kernel(idx_ref, k_in, v_in, k_out, v_out):
        del idx_ref
        k_out[...] = k_in[...]
        v_out[...] = v_in[...]

    block = (g, 1) + rest

    def in_map(j, lg, idx_ref):
        return (lg, idx_ref[j]) + zeros

    def out_map(j, lg, idx_ref):
        del idx_ref
        return (lg, j) + zeros

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bk, l // g),
        in_specs=[
            pl.BlockSpec(block, in_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, in_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(block, out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, out_map, memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * (k.size + v.size) * k.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx.astype(jnp.int32), k, v)
