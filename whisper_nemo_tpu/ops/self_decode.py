"""Pallas kernel for beam-ancestry decode self-attention.

Beam search here never reorders the self-KV cache: each beam row
writes its own lane and a [B, K, S] ancestry map records which lane
owns each history position (engine/decode.py beam_decode). The XLA
formulation of that selection (ops/attention.attention_kt_ancestry)
costs +12.4 ms/step over the no-selection floor at medium/b32·k5 —
measured on chip 2026-08-19 (tools/bench_beam_step.py: nogather 12.22,
ancattn 24.58 ms/step; an element-wise "masked" reformulation measured
WORSE at 34.5) — because every intermediate ([BK, H, K, S] logits,
one-hot selects, scattered weights) is materialized through HBM
between XLA ops.

This kernel runs the whole selection in VMEM: one program per audio
window holds the window's K lanes of K and V for every head
(~2.6 MB at medium/k5/S128), computes all K×K lane scores with ONE
MXU dot per head over a lane-concatenated [D, K·S] view, selects with
static lane-slice ``where``s against the ancestry row, softmaxes, and
contracts the scattered weights against the same concatenated V in a
second dot — the cache is read from HBM exactly once and nothing
[.., S]-sized ever leaves VMEM.

Numerically equivalent (f32 logits/softmax, bf16 AV — same as
attention_kt_ancestry's einsum path) to attention over the explicitly
beam-gathered cache; parity pinned in tests/test_self_decode.py.

Reference contract: the CT2/faster-whisper beam decoder's
``batch_reorder`` + standard self-attention (D3); this is the
TPU-native replacement for both.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * 3.4e38  # finite "-inf" (ops/attention.py)


def _ancestry_head(q_h, k_rows, v_rows, sel, m_row, kk: int):
    """One head's ancestry attention, fully in VMEM/registers.

    q_h [K, D] bf16 (softmax scale pre-folded); k_rows/v_rows: lists of
    K [D, S] bf16 slices (one per source lane); sel [K, S] int32
    ancestry row; m_row [1, S] f32 additive mask (0 / -inf).
    Returns [K, D] f32.
    """
    k_cat = jnp.concatenate(k_rows, axis=-1)  # [D, K·S]
    lg_all = jnp.dot(
        q_h, k_cat, preferred_element_type=jnp.float32
    )  # [K_j, K·S]: query lane j vs source lane i at lanes i·S + s
    s = sel.shape[-1]
    lg = jnp.where(sel == 0, lg_all[:, :s], 0.0)
    for i in range(1, kk):
        lg = lg + jnp.where(
            sel == i, lg_all[:, i * s:(i + 1) * s], 0.0
        )
    lg = jnp.where(m_row >= 0.0, lg, _MASK_VALUE)  # [K, S]
    w = jax.nn.softmax(lg, axis=-1)  # f32
    # scatter each lane's weights back onto its source rows, then one
    # lane-axis contraction against the concatenated V
    w_all = jnp.concatenate(
        [jnp.where(sel == i, w, 0.0) for i in range(kk)], axis=-1
    ).astype(jnp.bfloat16)  # [K_j, K·S]
    v_cat = jnp.concatenate(v_rows, axis=-1)  # [D, K·S]
    return jax.lax.dot_general(
        w_all, v_cat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [K_j, D]


def _kernel(q_ref, k_ref, v_ref, anc_ref, m_ref, out_ref, *, kk: int):
    """One window: q [1, H, K, D], k/v [1, K, H, D, S], anc [1, K, S],
    mask [1, S] -> out [1, H, K, D] f32."""
    h = q_ref.shape[1]
    sel = anc_ref[0]  # [K, S] int32
    m_row = m_ref[0][None, :]  # [1, S] f32
    for head in range(h):
        q_h = q_ref[0, head].astype(jnp.bfloat16)  # [K, D]
        k_rows = [
            k_ref[0, i, head].astype(jnp.bfloat16) for i in range(kk)
        ]
        v_rows = [
            v_ref[0, i, head].astype(jnp.bfloat16) for i in range(kk)
        ]
        out_ref[0, head] = _ancestry_head(
            q_h, k_rows, v_rows, sel, m_row, kk
        )


def _layered_kernel(
    l_ref, q_ref, k_ref, v_ref, anc_ref, m_ref, out_ref, *, kk: int
):
    # the layer index only drives the k/v index maps (scalar
    # prefetch); the DMA'd blocks have the same [1, K, H, D, S] shape
    # as the per-layer form
    _kernel(q_ref, k_ref, v_ref, anc_ref, m_ref, out_ref, kk=kk)


def _prep(q, anc, mask, kk):
    """Shared query/mask preparation: fold the softmax scale into q,
    reduce the decode-step mask to one [B_m, S] row per window."""
    bk, tq, h, d = q.shape
    b = bk // kk
    s = anc.shape[-1]
    qs = (q[:, 0] * (d ** -0.5)).astype(jnp.bfloat16)
    qs = qs.reshape(b, kk, h, d).transpose(0, 2, 1, 3)  # [B, H, K, D]
    # mask [1|BK, 1, 1, S] -> [1|B, S] (a window's K lanes share it:
    # beam_decode expands kv_valid per window)
    m = mask.reshape(-1, s).astype(jnp.float32)
    if m.shape[0] > 1:
        m = m.reshape(b, kk, s)[:, 0]
    return qs, m, b, h, d, s


@functools.partial(jax.jit, static_argnames=("beam", "interpret"))
def self_attention_decode_ancestry(
    q: jnp.ndarray,  # [B·beam, 1, H, D]
    k_t: jnp.ndarray,  # [B·beam, H, D, S] bf16 cache (positions on lanes)
    v_t: jnp.ndarray,  # [B·beam, H, D, S]
    anc: jnp.ndarray,  # [B, beam, S] int32
    mask: jnp.ndarray,  # [1|B·beam, 1, 1, S] f32 additive (0 / -inf)
    beam: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Ancestry-selected decode self-attention -> [B·beam, 1, H, D].

    Drop-in replacement for ``attention_kt_ancestry`` on TPU (the
    per-layer-scanned cache form; see
    :func:`self_attention_decode_ancestry_layered` for the stacked
    carry form)."""
    qs, m, b, h, d, s = _prep(q, anc, mask, beam)
    m_rows = m.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, kk=beam),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, h, beam, d), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, beam, h, d, s), lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, beam, h, d, s), lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, beam, s), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s),
                (lambda i: (i, 0)) if m_rows > 1 else (lambda i: (0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, beam, d), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, beam, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * beam * beam * h * d * s * 2,
            bytes_accessed=k_t.size * 2 * 2 + q.size * 2,
            transcendentals=b * beam * h * s,
        ),
        interpret=interpret,
    )(
        qs,
        k_t.reshape(b, beam, h, d, s),
        v_t.reshape(b, beam, h, d, s),
        anc,
        m,
    )

    return (
        out.transpose(0, 2, 1, 3).reshape(b * beam, 1, h, d)
    ).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("beam", "interpret"))
def self_attention_decode_ancestry_layered(
    q: jnp.ndarray,  # [B·beam, 1, H, D]
    k_full: jnp.ndarray,  # [L, B·beam, H, D, S] — the FULL stacked cache
    v_full: jnp.ndarray,  # [L, B·beam, H, D, S]
    anc: jnp.ndarray,  # [B, beam, S] int32
    mask: jnp.ndarray,  # [1|B·beam, 1, 1, S] f32
    layer: jnp.ndarray,  # scalar int32
    beam: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """As :func:`self_attention_decode_ancestry` but indexing the layer
    INSIDE the kernel via scalar prefetch, so the stacked scan passes
    its whole cache carry and no per-layer [BK, H, D, S] slice is ever
    materialized by XLA (same trick as
    ops/cross_decode.cross_attention_decode_layered)."""
    qs, m, b, h, d, s = _prep(q, anc, mask, beam)
    m_rows = m.shape[0]
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, h, beam, d), lambda i, l: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, beam, h, d, s), lambda i, l: (l[0], i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, beam, h, d, s), lambda i, l: (l[0], i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, beam, s), lambda i, l: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s),
                (lambda i, l: (i, 0)) if m_rows > 1
                else (lambda i, l: (0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, beam, d), lambda i, l: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    out = pl.pallas_call(
        functools.partial(_layered_kernel, kk=beam),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, beam, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * beam * beam * h * d * s * 2,
            bytes_accessed=(
                2 * k_full.size // k_full.shape[0] * 2 + q.size * 2
            ),
            transcendentals=b * beam * h * s,
        ),
        interpret=interpret,
    )(lidx, qs, k_full, v_full, anc, m)

    return (
        out.transpose(0, 2, 1, 3).reshape(b * beam, 1, h, d)
    ).astype(q.dtype)
