"""Pallas TPU kernel for the CTC Viterbi forward sweep.

The XLA ``lax.scan`` version pays per-iteration loop overhead
(~50-250 µs on this platform), which dominates hour-scale lattices
(T ≈ 180k steps). This kernel runs the whole max-plus recurrence as ONE
Pallas program: the [1, L] state vector lives in a VMEM scratch that
persists across the sequential time-block grid, each block's emission
rows stream through VMEM, and backpointers stream out to HBM as int8.
State shifts are lane rolls; tie-breaking matches ``jnp.argmax`` (first
maximum wins) so results are bit-identical to the scan version.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ctc import NEG_INF

_BT = 256  # time rows per grid step


_CHUNK = 32  # rows per aligned int8 store (int8 sublane tile)


def _viterbi_block_kernel(
    e_ref, skip_ref, alpha_out_ref, bp_ref, alpha_ref, *, t_total
):
    """One grid step: consume ``_BT`` emission rows, update the
    persistent alpha, emit backpointers; the final grid step publishes
    alpha to the output.

    Rows are processed in 32-row chunks: rows within a chunk are
    statically unrolled (Mosaic requires provably aligned dynamic
    stores, so backpointers accumulate in registers and store as one
    aligned [32, L] int8 block).

    e_ref:        [BT, L] state emissions for rows t_blk*BT .. +BT
    skip_ref:     [1, L] float32 (0 where skip allowed, NEG_INF else)
    alpha_out_ref:[1, L] final alpha out
    bp_ref:       [BT, L] int8 backpointers out
    alpha_ref:    [1, L] persistent state scratch
    """
    t_blk = pl.program_id(0)
    n_blk = pl.num_programs(0)

    @pl.when(t_blk == 0)
    def _init():
        # alpha0: states 0 and 1 start from row 0's emissions
        lane0 = jax.lax.broadcasted_iota(jnp.int32, alpha_ref.shape, 1)
        alpha_ref[:] = jnp.where(lane0 < 2, e_ref[0:1, :], NEG_INF)

    lane = jax.lax.broadcasted_iota(jnp.int32, alpha_ref.shape, 1)
    skip_mask = skip_ref[:]

    def chunk(c, _):
        base = pl.multiple_of(c * _CHUNK, _CHUNK)
        e_chunk = e_ref[pl.ds(base, _CHUNK), :]  # aligned load
        bp_rows = []
        for i in range(_CHUNK):  # static unroll
            global_t = t_blk * _BT + base + i
            is_transition = (global_t > 0) & (global_t < t_total)

            alpha = alpha_ref[:]
            prev = jnp.where(
                lane >= 1, pltpu.roll(alpha, shift=1, axis=1), NEG_INF
            )
            skip = jnp.where(
                lane >= 2, pltpu.roll(alpha, shift=2, axis=1), NEG_INF
            )
            skip = skip + skip_mask  # NEG_INF where skip not allowed

            best = alpha
            bp = jnp.zeros(alpha.shape, jnp.int32)
            bp = jnp.where(prev > best, 1, bp)
            best = jnp.maximum(prev, best)
            bp = jnp.where(skip > best, 2, bp)
            best = jnp.maximum(skip, best)

            new_alpha = e_chunk[i : i + 1, :] + best
            alpha_ref[:] = jnp.where(is_transition, new_alpha, alpha)
            bp_rows.append(
                jnp.where(is_transition, bp, 0).astype(jnp.int8)
            )
        bp_ref[pl.ds(base, _CHUNK), :] = jnp.concatenate(bp_rows, axis=0)
        return 0

    jax.lax.fori_loop(0, _BT // _CHUNK, chunk, 0)

    @pl.when(t_blk == n_blk - 1)
    def _publish():
        alpha_out_ref[:] = alpha_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def viterbi_forward_pallas(
    state_emissions: jnp.ndarray,  # [T, L] float32
    allow_skip: jnp.ndarray,  # [L] bool
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (final alpha [L], backpointers [T-1, L] int8), matching
    ``ops.ctc._viterbi_forward_states`` exactly."""
    t_total, l_orig = state_emissions.shape
    l_pad = -l_orig % 128
    t_pad = -t_total % _BT
    e = jnp.pad(
        state_emissions.astype(jnp.float32),
        ((0, t_pad), (0, l_pad)),
        constant_values=NEG_INF,
    )
    skip_mask = jnp.where(
        jnp.pad(allow_skip, (0, l_pad), constant_values=False),
        0.0,
        NEG_INF,
    )[None, :].astype(jnp.float32)
    l_total = l_orig + l_pad
    n_blocks = e.shape[0] // _BT

    alpha, bps = pl.pallas_call(
        functools.partial(_viterbi_block_kernel, t_total=t_total),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((_BT, l_total), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_total), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, l_total), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BT, l_total), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, l_total), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * _BT, l_total), jnp.int8),
        ),
        scratch_shapes=[pltpu.VMEM((1, l_total), jnp.float32)],
        interpret=interpret,
    )(e, skip_mask)
    # the transition into time t is recorded at raw row t; row 0 only
    # seeds alpha, so drop it and trim time/lane padding
    return alpha[0, :l_orig], bps[1:t_total, :l_orig]
