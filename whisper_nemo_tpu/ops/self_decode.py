"""Pallas kernel for beam-ancestry decode self-attention.

**MEASURED NEGATIVE at production shapes — kept as the ledger
artifact** (docs/ROADMAP.md; gated behind
``DecodeOptions.anc_select="kernel"``).

Beam search here never reorders the self-KV cache: each beam row
writes its own lane and a [B, K, S] ancestry map records which lane
owns each history position (engine/decode.py beam_decode). The XLA
formulation of that selection (ops/attention.attention_kt_ancestry)
costs +11.6 ms/step over the no-selection floor at medium/b32·k5
(nogather 12.2, prodbeam 23.9 — tools/bench_beam_step.py), so this
kernel was built to run the whole selection in VMEM: one program per
audio window holds the window's K lanes of K and V for every head
(~2.6 MB at medium/k5/S128), computes all K×K lane scores with
head-batched MXU dots over a lane-concatenated [D, K·S] view, selects
with static lane-slice ``where``s against the ancestry row, and
contracts the scattered weights against the same concatenated V — the
cache is read from HBM exactly once and nothing [.., S]-sized leaves
VMEM.

On chip it measured **42–43 ms/step** (flat in cache length AND in
in-kernel op count). Attribution (tools/bench_self_kernel.py): the
decode loop's while-carry cache lives with beam rows on the 128-LANE
axis — XLA's layout choice, which lowers its decode attention to
lane-parallel VPU code — and a Pallas custom call REQUIRES the
default (positions-minor) layout, forcing a lane-crossing relayout of
the 2 GB cache (~26 ms/step): even plain no-selection attention
isolated behind a default-layout boundary costs 29.1 ms/step vs ~3
inside the loop. The einsum formulation composes with XLA's chosen
layout and is the measured optimum of five formulations. This kernel
does win at cache_len 256 (44.2 vs einsum 48.8 ms/step) — long-decode
shapes the production pipeline does not use.

Numerically equivalent (f32 logits/softmax, bf16 AV — same as
attention_kt_ancestry's einsum path) to attention over the explicitly
beam-gathered cache; parity pinned in tests/test_self_decode.py.

Reference contract: the CT2/faster-whisper beam decoder's
``batch_reorder`` + standard self-attention (D3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * 3.4e38  # finite "-inf" (ops/attention.py)


def _kernel(q_ref, k_ref, v_ref, anc_ref, m_ref, out_ref, *, kk: int):
    """One window: q [1, H, K, D], k/v [1, K, H, D, S], anc [1, K, S],
    mask [1, S] -> out [1, H, K, D] f32.

    Everything is hoisted out of the head dimension: the first cut of
    this kernel looped 16 heads x ~20 small ops and measured
    instruction-issue-bound at ~56 us/program (43 ms/step at
    medium/b32-k5, nearly flat when the cache doubled — the work per
    op was irrelevant next to issuing ~320 Mosaic ops). This form
    issues ~30: one lane-concat per source lane shared by all heads,
    two head-batched dot_generals, and single fused selects/softmax
    over [H*K, S]."""
    h, d = q_ref.shape[1], q_ref.shape[3]
    s = anc_ref.shape[2]
    sel = anc_ref[0]  # [K, S] int32
    # concat the window's source lanes along lanes, once for all heads
    k_cat = jnp.concatenate(
        [k_ref[0, i].astype(jnp.bfloat16) for i in range(kk)], axis=-1
    )  # [H, D, K·S]
    v_cat = jnp.concatenate(
        [v_ref[0, i].astype(jnp.bfloat16) for i in range(kk)], axis=-1
    )
    q3 = q_ref[0].astype(jnp.bfloat16)  # [H, K, D]
    lg_all = jax.lax.dot_general(
        q3, k_cat, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [H, K_j, K·S]: lane j vs source lane i at lanes i·S + s
    lg_all = lg_all.reshape(h * kk, kk * s)
    sel_h = jnp.tile(sel, (h, 1))  # [H·K, S]
    lg = jnp.where(sel_h == 0, lg_all[:, :s], 0.0)
    for i in range(1, kk):
        lg = lg + jnp.where(sel_h == i, lg_all[:, i * s:(i + 1) * s], 0.0)
    m_row = m_ref[0][None, :]  # [1, S] f32
    lg = jnp.where(m_row >= 0.0, lg, _MASK_VALUE)  # [H·K, S]
    w = jax.nn.softmax(lg, axis=-1)  # f32
    # scatter each lane's weights back onto its source rows, then one
    # lane-axis contraction against the concatenated V
    w_all = jnp.concatenate(
        [jnp.where(sel_h == i, w, 0.0) for i in range(kk)], axis=-1
    ).astype(jnp.bfloat16)  # [H·K, K·S]
    out = jax.lax.dot_general(
        w_all.reshape(h, kk, kk * s), v_cat,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [H, K_j, D]
    out_ref[0] = out


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
