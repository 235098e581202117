"""Pallas flash-decode kernel for Whisper's cross-attention.

Every decode step re-reads the full per-window encoder K/V (1500 audio
positions x 24 layers); at batch 32 that is ~2.4 GB of int8 per step —
the decode loop's dominant HBM stream. XLA lowers the dequantizing
einsum pair to VPU loop fusions that run far above the bandwidth
floor, so this module provides a dedicated kernel. Its layout is the
product of a measured ladder on the v5e (docs/ROADMAP.md):

- a pure-DMA kernel body costs the same as the full attention body —
  the kernel is HBM-bound, body compute hides under the stream;
- TWO block DMAs per program (separate K and V arrays, 1.5 MB each)
  reach only ~460 GB/s; ONE fused 3.1 MB DMA reaches ~680 GB/s — so
  K and V^T are stored INTERLEAVED in a single ``[L, B, H, 2D, Kp]``
  array (sublane rows 0:D are K for the scores contraction over D,
  rows D:2D are V TRANSPOSED so the mix contracts over the lane axis);
- int4 packing halves the stream (2.75 ms/step DMA floor measured)
  but in-kernel nibble unpacking is VPU-bound at ~5 ms/step — slower
  than the int8 stream it saves; int4 therefore remains a MEMORY
  lever (``bits=4`` halves residency), not a speed lever, and int8 is
  the speed default;
- per-channel scales fold into the query (for K) and the output (for
  V), so nothing is ever dequantized in HBM;
- beam-search lanes share their window's block via the ``i // beam``
  index map instead of the CT2-style per-lane replication.

Reference contract: numerically equivalent (to bf16 rounding) to the
quantized einsum path in models/whisper_stacked.py decode_step_stacked
(the faster-whisper/CT2 int8 cross-attention analogue, D3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def pack_int4(q: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Split-half int4 packing along ``axis`` (must be even-sized):
    output byte at index ``i`` holds value ``i`` in its low nibble and
    value ``i + n/2`` in its high nibble, so unpacking is a pair of
    sign-extending shifts plus a concatenate — no interleave/relayout
    on the TPU sublane axis. ``q`` values must be in [-7, 7]."""
    n = q.shape[axis]
    lo = jax.lax.slice_in_dim(q, 0, n // 2, axis=axis).astype(jnp.int32)
    hi = jax.lax.slice_in_dim(q, n // 2, n, axis=axis).astype(jnp.int32)
    return ((lo & 0xF) | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inverse of :func:`pack_int4`: int8 bytes -> int32 values in
    [-7, 7], doubling ``axis``."""
    p = packed.astype(jnp.int32)
    lo = (p << 28) >> 28
    hi = p >> 4  # int8->int32 sign-extends, so this is arithmetic
    return jnp.concatenate([lo, hi], axis=axis)


def quantize_cross_kv_decode(cross_kv_bf16_k, cross_kv_bf16_v, bits=8):
    """[L, B, T, H, D] bf16 K and V -> fused decode-layout dict.

    ``kv_dec`` is one ``[L, B, H, 2D, Kp]`` int8 array: sublane rows
    ``0:D`` hold K (scores contraction over D, audio positions on
    lanes), rows ``D:2D`` hold V TRANSPOSED (the weighted mix then
    contracts over the lane axis) — one contiguous block DMA per
    (layer, batch) program instead of two (measured ~680 vs ~460 GB/s
    effective on the v5e). ``Kp`` pads T to the 128-lane multiple;
    padded positions carry zeros and are masked inside the kernel.

    ``bits=4`` packs each half along D via :func:`pack_int4` (rows
    ``0:D/2`` packed K, ``D/2:D`` packed V^T -> ``[L, B, H, D, Kp]``),
    halving residency; values quantize to [-7, 7] with per-(L, H, D)
    channel scales.
    """
    t = cross_kv_bf16_k.shape[2]
    t_pad = -t % _LANE
    qmax = 127.0 if bits == 8 else 7.0

    def quant(x):  # [L, B, T, H, D]
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=(1, 2))  # [L, H, D]
        scale = jnp.where(amax > 0, amax / qmax, 1.0)
        q = jnp.clip(
            jnp.round(xf / scale[:, None, None]), -qmax, qmax
        ).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    k_q, k_scale = quant(cross_kv_bf16_k)
    v_q, v_scale = quant(cross_kv_bf16_v)
    # both halves to [L, B, H, D, T(+pad)] — V transposed like K
    k_q = jnp.pad(
        k_q.transpose(0, 1, 3, 4, 2), ((0, 0),) * 4 + ((0, t_pad),)
    )
    v_q = jnp.pad(
        v_q.transpose(0, 1, 3, 4, 2), ((0, 0),) * 4 + ((0, t_pad),)
    )
    if bits == 4:
        k_q = pack_int4(k_q, axis=3)   # D -> D/2 byte rows
        v_q = pack_int4(v_q, axis=3)
    return {
        "kv_dec": jnp.concatenate([k_q, v_q], axis=3),
        "k_dec_scale": k_scale,
        "v_dec_scale": v_scale,
        "k_len": t,
        "bits": bits,
    }


# int4 nibble-unpack implementation, swept by tools/bench_kernel_int4.py
# on the v5e (medium.en decode shapes, 24L x 32B grid, ms/step):
#   int8 (no unpack)      4.50   <- the speed default
#   int4 "i32" unpack     4.98   (widen to i32, shift)
#   int4 "andf" unpack    6.55   (AND + i8->bf16 convert + exact
#                                 power-of-two muls; no shifts — Mosaic
#                                 legalizes neither int8 shrsi nor bf16
#                                 compares, so this was the only 8-bit
#                                 formulation available, and the three
#                                 converts per packed byte lose to one
#                                 i32 widen)
# The unpack is VPU-bound in every formulation: halving the DMA bytes
# buys less than the per-element unpack costs, so int4 remains a MEMORY
# lever (bits=4 halves residency), never a speed lever. Read at trace
# time.
_NIBBLE_IMPL = "i32"


def _unpack_nibbles_bf16(p: jnp.ndarray):
    """Packed int8 [R, Kp] -> (lo [R, Kp], hi [R, Kp]) sign-extended
    4-bit values as EXACT bf16 (all magnitudes ≤ 16 are representable)."""
    if _NIBBLE_IMPL == "andf":
        hi = (
            jax.lax.bitwise_and(p, jnp.int8(-16)).astype(jnp.bfloat16)
            * jnp.bfloat16(0.0625)
        )
        u = jax.lax.bitwise_and(p, jnp.int8(0x0F)).astype(jnp.bfloat16)
        # sign-extend without comparing (Mosaic: no bf16 compares):
        # bit 3 set means the nibble is negative, i.e. subtract 16 —
        # and (p & 8) is already 8 exactly when bit 3 is set
        b3 = jax.lax.bitwise_and(p, jnp.int8(0x08)).astype(jnp.bfloat16)
        lo = u - b3 * jnp.bfloat16(2)
        return lo, hi
    p = p.astype(jnp.int32)
    return (
        ((p << 28) >> 28).astype(jnp.bfloat16),
        (p >> 4).astype(jnp.bfloat16),
    )


def _split_unpack_bf16(blk: jnp.ndarray, bits: int):
    """One head's fused block [2D, Kp] int8 (or [D, Kp] packed) ->
    (K [D, Kp], V^T [D, Kp]) in bf16. bits=4 rows expand along axis 0
    (split-half layout of :func:`pack_int4` — a concat, never an
    interleave)."""
    half = blk.shape[0] // 2
    k_half, v_half = blk[:half], blk[half:]
    if bits == 4:
        def up(p):
            lo, hi = _unpack_nibbles_bf16(p)
            return jnp.concatenate([lo, hi], axis=0)
        return up(k_half), up(v_half)
    return k_half.astype(jnp.bfloat16), v_half.astype(jnp.bfloat16)


def _head_attend(q_h, k_h, vt_h, k_len: int):
    """[M, D] queries x K [D, Kp] x V^T [D, Kp] -> [M, D] f32. The mix
    contracts over the LANE axis of both w and V^T (dot_general) —
    V never exists untransposed in VMEM. ``M`` is 1 for greedy decode
    and ``beam`` for beam search (a window's lanes share the head's
    K/V, so they ride ONE dot instead of M serial [1, D] dots — the
    serial form measured compute-bound at beam 5: 28.6 ms/step vs the
    8 ms greedy DMA floor, tools/bench_beam_step.py)."""
    logits = jnp.dot(
        q_h, k_h, preferred_element_type=jnp.float32
    )  # [M, Kp]
    kp = logits.shape[-1]
    if kp > k_len:
        pos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(pos < k_len, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        w, vt_h, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [M, D]


def _kernel(qs_ref, kv_ref, out_ref, *, k_len: int, bits: int = 8):
    """One batch row: qs [H, D] (scales pre-folded), fused KV
    [H, 2D, Kp] s8 (or [H, D, Kp] int4-packed) -> out [H, D] f32.

    Heads unroll statically into per-head 2D contractions — Mosaic's
    dot lowering takes plain 2D shapes, and the softmax is per-head
    anyway. Blocks convert to bf16 per head in-register; the
    dequantized K/V never exists outside VMEM."""
    h = qs_ref.shape[1]
    for i in range(h):
        q_h = qs_ref[0, i][None].astype(jnp.bfloat16)  # [1, D]
        k_h, vt_h = _split_unpack_bf16(kv_ref[0, i], bits)
        out_ref[0, i] = _head_attend(q_h, k_h, vt_h, k_len)[0]


@functools.partial(
    jax.jit, static_argnames=("k_len", "bits", "interpret")
)
def cross_attention_decode(
    q: jnp.ndarray,  # [B, 1, H, D] (pre-softmax-scale query)
    kv_dec: jnp.ndarray,  # [B, H, 2D, Kp] int8 ([B, H, D, Kp] bits=4)
    k_scale: jnp.ndarray,  # [H, D] f32
    v_scale: jnp.ndarray,  # [H, D] f32
    k_len: int,
    bits: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-query-token quantized cross-attention -> [B, 1, H, D]."""
    b, _, h, d = q.shape
    sm_scale = d**-0.5
    # per-channel K scales and the softmax scale fold into the query:
    # logits = sum_d (q_d * scale_d * sm) * k_q_d — no dequantized K/V
    # ever materializes
    qs = (
        q[:, 0].astype(jnp.float32) * (k_scale * sm_scale)[None]
    )  # [B, H, D]

    out = pl.pallas_call(
        functools.partial(_kernel, k_len=k_len, bits=bits),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, h, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, h, kv_dec.shape[-2], kv_dec.shape[-1]),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * d * kv_dec.shape[-1] * 2,
            bytes_accessed=kv_dec.size + 4 * b * h * d * 2,
            transcendentals=b * h * kv_dec.shape[-1],
        ),
        interpret=interpret,
    )(qs, kv_dec)

    out = out * v_scale[None]  # [B, H, D]
    return out[:, None]  # [B, 1, H, D]


@functools.partial(
    jax.jit, static_argnames=("k_len", "bits", "beam", "interpret")
)
def cross_attention_decode_layered(
    q: jnp.ndarray,  # [B·beam, 1, H, D]
    kv_dec: jnp.ndarray,  # [L, B, H, 2D, Kp] int8 — the FULL stack
    k_scale: jnp.ndarray,  # [H, D] f32 (this layer's)
    v_scale: jnp.ndarray,  # [H, D] f32 (this layer's)
    layer: jnp.ndarray,  # scalar int32
    k_len: int,
    bits: int = 8,
    beam: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """As ``cross_attention_decode`` but indexing the layer INSIDE the
    kernel via scalar prefetch: the layer-scan body passes the whole
    stacked KV and the grid DMAs only layer ``layer``'s blocks — the
    per-layer ``dynamic_slice`` copy XLA would otherwise materialize
    cost ~2.5 ms per decode step at batch 16 (profiled).

    ``beam > 1``: the query batch carries ``beam`` hypothesis lanes per
    audio window ([w0·k lanes..] row-major) while KV stays at the WINDOW
    batch — lanes of the same window share one resident VMEM block. The
    CT2-style replicated-KV beam pays ``beam``× the decode loop's
    dominant HBM stream; this shares it.

    The grid is one program per WINDOW (not per lane): all ``beam``
    lanes of a window ride that window's single block DMA. Merging
    multiple windows per program (2× / 4× bigger DMAs) was measured
    FLAT-TO-NEGATIVE (8.63 -> 8.77 ms/step int8-medium-b32: the 3.1 MB
    fused block already saturates the stream, and doubling the
    double-buffered residency hurts pipelining), so ``rows`` stays
    1."""
    bq = q.shape[0]
    _, _, h, d = q.shape
    n_windows = bq // beam
    sm_scale = d**-0.5
    qs = (
        q[:, 0].astype(jnp.float32) * (k_scale * sm_scale)[None]
    )  # [B·beam, H, D]
    # head-major layout: a window's ``beam`` lanes sit contiguously per
    # head so the kernel issues ONE [beam, D] dot per head (the
    # lane-major form ran beam·h serial [1, D] dots per program —
    # compute-bound at beam 5, see _head_attend)
    qs = qs.reshape(n_windows, beam, h, d).transpose(0, 2, 1, 3)
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_windows,),
        in_specs=[
            pl.BlockSpec(
                (1, h, beam, d), lambda i, l: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, h, kv_dec.shape[-2], kv_dec.shape[-1]),
                lambda i, l: (l[0], i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, beam, d), lambda i, l: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    def kernel(l_ref, qs_ref, kv_ref, out_ref):
        # qs block [1, h, beam, d]; kv block [1, 1, h, ...]
        for head in range(h):
            q_h = qs_ref[0, head].astype(jnp.bfloat16)  # [beam, D]
            k_h, vt_h = _split_unpack_bf16(kv_ref[0, 0, head], bits)
            out_ref[0, head] = _head_attend(q_h, k_h, vt_h, k_len)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_windows, h, beam, d), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bq * h * d * kv_dec.shape[-1] * 2,
            bytes_accessed=(
                kv_dec.size // kv_dec.shape[0] + 4 * bq * h * d * 2
            ),
            transcendentals=bq * h * kv_dec.shape[-1],
        ),
        interpret=interpret,
    )(lidx, qs, kv_dec)

    out = (
        out.transpose(0, 2, 1, 3).reshape(bq, h, d) * v_scale[None]
    )  # [B·beam, H, D]
    return out[:, None]  # [B, 1, H, D]
