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


@functools.partial(jax.jit, static_argnames=("interpret", "flatten"))
def beam_permute_cache(
    k: jnp.ndarray,  # [L, BK, ...]
    v: jnp.ndarray,  # [L, BK, ...] (same shape as k)
    idx: jnp.ndarray,  # [BK] int32: output row j <- input row idx[j]
    interpret: bool = False,
    flatten: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (k[:, idx], v[:, idx]) as block DMAs. Any rank >= 3 with
    leading (layers, beam-rows) axes."""
    l, bk = k.shape[:2]
    orig_shape = k.shape
    total = int(functools.reduce(lambda a, b: a * b, k.shape[2:], 1))
    if flatten and total % 128 == 0:
        # flatten the row to a lane-packed 2-D minor: Mosaic drives the
        # (rows, 128) block as one large DMA — ~2x faster than the same
        # bytes presented as [H, D, S] sub-blocks (tools/
        # bench_beam_gather.py: pallas_flat vs pallas_t). The row-major
        # [H, D, S] -> [H*D*S/128, 128] reshape is layout-preserving,
        # so both reshapes are free.
        k = k.reshape(l, bk, total // 128, 128)
        v = v.reshape(l, bk, total // 128, 128)
    rest = k.shape[2:]
    row_bytes = total * k.dtype.itemsize
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
    k2, v2 = pl.pallas_call(
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
    return k2.reshape(orig_shape), v2.reshape(orig_shape)


@functools.partial(
    jax.jit, static_argnames=("beam", "interpret"), donate_argnums=(0, 1)
)
def beam_permute_cache_inplace(
    k: jnp.ndarray,  # [L, BK, ...] current cache (DONATED)
    v: jnp.ndarray,  # [L, BK, ...] (DONATED)
    src: jnp.ndarray,  # [B, beam] int32: new lane j <- window lane src[w, j]
    beam: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """In-place beam reorder: permutes each window's ``beam`` cache
    lanes within the SAME buffers via ``input_output_aliases``.

    Inside a ``lax.while_loop`` decode body, a permute that returns
    fresh buffers forces XLA to copy the result back into the
    loop-carry buffers every step (carry slots have fixed buffers, and
    the permute's input IS the carry buffer) — a second full K+V HBM
    round-trip that doubled the in-loop cost of ``beam_permute_cache``
    (tools/bench_beam_step.py: prodbeam-minus-nogather ~24 ms vs the
    isolated kernel's ~11.3 at medium/b32·k5).

    Beam reindexing only ever moves rows WITHIN a window's ``beam``
    lanes, so a block covering all of one window's lanes reads and
    writes only its own rows: program (w, lg) loads the window's lanes
    to VMEM, shuffles them there with the prefetched source map, and
    stores over the same HBM region. Reads and writes of distinct
    programs touch disjoint rows, and a program's input DMA completes
    before its output DMA issues, so aliasing is safe — including
    gather repeats (several new lanes sharing one source lane).
    """
    l, bk = k.shape[:2]
    if bk % beam != 0:
        raise ValueError(f"rows {bk} not a multiple of beam {beam}")
    orig_shape = k.shape
    total = int(functools.reduce(lambda a, b: a * b, k.shape[2:], 1))
    if total % 128 == 0:
        # lane-packed 2-D minor (see beam_permute_cache)
        k = k.reshape(l, bk, total // 128, 128)
        v = v.reshape(l, bk, total // 128, 128)
    rest = k.shape[2:]
    row_bytes = total * k.dtype.itemsize
    g = _layer_group(l, beam * row_bytes)
    zeros = (0,) * len(rest)
    kv = k.reshape((l, bk // beam, beam) + rest)
    vv = v.reshape((l, bk // beam, beam) + rest)

    def kernel(src_ref, k_in, v_in, k_out, v_out):
        # block is (g, 1, beam) + rest: dim 1 is the singleton window
        w = pl.program_id(0)
        for j in range(beam):
            s = src_ref[w, j]
            k_out[:, 0, j] = k_in[:, 0, s]
            v_out[:, 0, j] = v_in[:, 0, s]

    block = (g, 1, beam) + rest

    def bmap(w, lg, src_ref):
        del src_ref
        return (lg, w, 0) + zeros

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bk // beam, l // g),
        in_specs=[
            pl.BlockSpec(block, bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, bmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(block, bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, bmap, memory_space=pltpu.VMEM),
        ],
    )
    k2, v2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(kv.shape, kv.dtype),
            jax.ShapeDtypeStruct(vv.shape, vv.dtype),
        ),
        # alias indices count ALL flattened inputs INCLUDING the
        # scalar-prefetch operand (jax pallas_call docstring: "indices
        # in the flattened inputs"): src=0, k=1, v=2
        input_output_aliases={1: 0, 2: 1},
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * (k.size + v.size) * k.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(src.astype(jnp.int32), kv, vv)
    return k2.reshape(orig_shape), v2.reshape(orig_shape)
