"""Pallas flash-decode kernel for Whisper's cross-attention.

Every decode step re-reads the full per-window encoder K/V (1500 audio
positions x 24 layers); at batch 16 that is ~1.2 GB of int8 per step —
the decode loop's dominant HBM stream. XLA lowers the dequantizing
einsum pair to VPU loop fusions that run ~5x above the bandwidth floor
(profiled: 0.27 ms per layer-step vs the 0.06 ms DMA floor), so this
module provides a dedicated kernel:

- cross-K/V is stored int8 as ``[B, H, D, K]`` / ``[B, H, K, D]`` —
  lane-major layouts whose per-batch blocks DMA contiguously;
- per-channel scales fold into the query (for K) and the output (for
  V), so nothing is ever dequantized in HBM;
- each grid step loads one batch row's K/V block into VMEM, runs the
  two tiny MXU contractions and an f32 softmax in-register, and writes
  the [H, D] result.

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
    """[L, B, T, H, D] bf16 K and V -> decode-layout quantized dict.

    K is stored ``[L, B, H, D, Kp]`` (scores contraction over D, K on
    lanes); V is stored ``[L, B, H, Kp, D]`` (output contraction over
    K). ``Kp`` pads T to the 128-lane multiple; padded positions carry
    zeros and are masked inside the kernel.

    ``bits=4`` halves the stream again (the CT2-int8 analogue taken one
    step further): values quantize to [-7, 7] with per-(L, H, D)
    channel scales and pack two per byte via :func:`pack_int4` — K
    along D (axis 3 of the decode layout), V along Kp.
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
    # K: [L,B,T,H,D] -> [L,B,H,D,T(+pad)]
    k_q = jnp.pad(
        k_q.transpose(0, 1, 3, 4, 2), ((0, 0),) * 4 + ((0, t_pad),)
    )
    # V: [L,B,T,H,D] -> [L,B,H,T(+pad),D]
    v_q = jnp.pad(
        v_q.transpose(0, 1, 3, 2, 4),
        ((0, 0),) * 3 + ((0, t_pad), (0, 0)),
    )
    if bits == 4:
        k_q = pack_int4(k_q, axis=3)   # D -> D/2 bytes
        v_q = pack_int4(v_q, axis=3)   # Kp -> Kp/2 bytes
    return {
        "k_dec": k_q,
        "k_dec_scale": k_scale,
        "v_dec": v_q,
        "v_dec_scale": v_scale,
        "k_len": t,
        "bits": bits,
    }


def _unpack_bf16(block: jnp.ndarray, bits: int) -> jnp.ndarray:
    """In-register dequant of one head's K or V block to bf16. For
    ``bits=4`` the packed byte rows expand along axis 0 (split-half
    layout of :func:`pack_int4`: low nibbles are the first half, high
    nibbles the second — a concat, never an interleave)."""
    if bits == 4:
        p = block.astype(jnp.int32)
        return jnp.concatenate(
            [(p << 28) >> 28, p >> 4], axis=0
        ).astype(jnp.bfloat16)
    return block.astype(jnp.bfloat16)


def _kernel(qs_ref, kq_ref, vq_ref, out_ref, *, k_len: int, bits: int = 8):
    """One batch row: qs [H, D] (scales pre-folded), K [H, D, Kp] s8
    (or [H, D/2, Kp] int4-packed), V [H, Kp, D] s8 (or [H, Kp/2, D])
    -> out [H, D] f32.

    Heads unroll statically into per-head 2D matmuls — Mosaic's dot
    lowering takes plain 2D contractions, and the softmax is per-head
    anyway. Quantized blocks convert to bf16 per head in-register; the
    dequantized K/V never exists outside VMEM."""
    h = qs_ref.shape[1]
    for i in range(h):
        q_h = qs_ref[0, i][None].astype(jnp.bfloat16)  # [1, D]
        k_h = _unpack_bf16(kq_ref[0, i], bits)  # [D, Kp]
        logits = jnp.dot(
            q_h, k_h, preferred_element_type=jnp.float32
        )  # [1, Kp]
        kp = logits.shape[-1]
        if kp > k_len:
            pos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(pos < k_len, logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        v_h = _unpack_bf16(vq_ref[0, i], bits)  # [Kp, D]
        out_ref[0, i] = jnp.dot(
            w, v_h, preferred_element_type=jnp.float32
        )[0]


@functools.partial(
    jax.jit, static_argnames=("k_len", "bits", "interpret")
)
def cross_attention_decode(
    q: jnp.ndarray,  # [B, 1, H, D] (pre-softmax-scale query)
    k_dec: jnp.ndarray,  # [B, H, D, Kp] int8 (D/2 when bits=4)
    k_scale: jnp.ndarray,  # [H, D] f32
    v_dec: jnp.ndarray,  # [B, H, Kp, D] int8 (Kp/2 when bits=4)
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
                (1, h, k_dec.shape[-2], k_dec.shape[-1]),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, h, v_dec.shape[-2], d),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * d * k_dec.shape[-1] * 2,
            bytes_accessed=k_dec.size + v_dec.size + 4 * b * h * d * 2,
            transcendentals=b * h * k_dec.shape[-1],
        ),
        interpret=interpret,
    )(qs, k_dec, v_dec)

    out = out * v_scale[None]  # [B, H, D]
    return out[:, None]  # [B, 1, H, D]


@functools.partial(
    jax.jit, static_argnames=("k_len", "bits", "beam", "interpret")
)
def cross_attention_decode_layered(
    q: jnp.ndarray,  # [B·beam, 1, H, D]
    k_dec: jnp.ndarray,  # [L, B, H, D, Kp] int8 — the FULL stack
    k_scale: jnp.ndarray,  # [H, D] f32 (this layer's)
    v_dec: jnp.ndarray,  # [L, B, H, Kp, D] int8 — the FULL stack
    v_scale: jnp.ndarray,  # [H, D] f32 (this layer's)
    layer: jnp.ndarray,  # scalar int32
    k_len: int,
    bits: int = 8,
    beam: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """As ``cross_attention_decode`` but indexing the layer INSIDE the
    kernel via scalar prefetch: the layer-scan body passes the whole
    stacked K/V and the grid DMAs only layer ``layer``'s blocks — the
    per-layer ``dynamic_slice`` copy XLA would otherwise materialize
    cost ~2.5 ms per decode step at batch 16 (profiled).

    ``beam > 1``: the query batch carries ``beam`` hypothesis lanes per
    audio window ([w0·k lanes..] row-major) while K/V stay at the WINDOW
    batch — the index map sends lane ``i`` to window block ``i //
    beam``, and consecutive lanes of the same window reuse the resident
    VMEM block (Mosaic skips the DMA when the block index repeats). The
    CT2-style replicated-KV beam pays ``beam``× the decode loop's
    dominant HBM stream; this shares it."""
    bq = q.shape[0]
    _, _, h, d = q.shape
    sm_scale = d**-0.5
    qs = (
        q[:, 0].astype(jnp.float32) * (k_scale * sm_scale)[None]
    )  # [B·beam, H, D]
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bq,),
        in_specs=[
            pl.BlockSpec(
                (1, h, d), lambda i, l: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, h, k_dec.shape[-2], k_dec.shape[-1]),
                lambda i, l: (l[0], i // beam, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, h, v_dec.shape[-2], d),
                lambda i, l: (l[0], i // beam, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, d), lambda i, l: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    def kernel(l_ref, qs_ref, kq_ref, vq_ref, out_ref):
        # blocks arrive [1, 1, h, ...] (layer, batch leading); same
        # per-head 2D matmul body as _kernel
        n_heads = qs_ref.shape[1]
        for i in range(n_heads):
            q_h = qs_ref[0, i][None].astype(jnp.bfloat16)  # [1, D]
            k_h = _unpack_bf16(kq_ref[0, 0, i], bits)  # [D, Kp]
            logits = jnp.dot(
                q_h, k_h, preferred_element_type=jnp.float32
            )
            kp = logits.shape[-1]
            if kp > k_len:
                pos = jax.lax.broadcasted_iota(
                    jnp.int32, logits.shape, 1
                )
                logits = jnp.where(pos < k_len, logits, -jnp.inf)
            w = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
            v_h = _unpack_bf16(vq_ref[0, 0, i], bits)  # [Kp, D]
            out_ref[0, i] = jnp.dot(
                w, v_h, preferred_element_type=jnp.float32
            )[0]

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bq, h, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bq * h * d * k_dec.shape[-1] * 2,
            bytes_accessed=(
                k_dec.size // k_dec.shape[0]
                + v_dec.size // v_dec.shape[0]
                + 4 * bq * h * d * 2
            ),
            transcendentals=bq * h * k_dec.shape[-1],
        ),
        interpret=interpret,
    )(lidx, qs, k_dec, v_dec)

    out = out * v_scale[None]  # [B, H, D]
    return out[:, None]  # [B, 1, H, D]
