"""Multi-head attention with a Pallas flash-attention fast path.

The encoder's self-attention over 1500 mel frames is the one attention
in the pipeline with a real sequence length (decode is one query token
per step). On TPU it routes to the official Pallas flash-attention
kernel (online softmax, no [T, T] scores materialization); elsewhere an
einsum path keeps numerics/tests portable. Whisper's T=1500 isn't a
multiple of the 128-lane block size, so K/V/Q pad to the next multiple
and segment ids mask the padding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_IMPL = "auto"


def set_attention_impl(impl: str) -> None:
    """Global attention implementation: "auto" | "xla" | "flash"."""
    global _IMPL
    if impl not in ("auto", "xla", "flash"):
        raise ValueError(f"unknown attention impl {impl!r}")
    _IMPL = impl


def _resolve_impl() -> str:
    if _IMPL != "auto":
        return _IMPL
    # r3 re-measure (tools/bench_encoder_attn.py, B32 H16 T1500 D64 on
    # the v5 lite): the r2 "flash loses 2x" result was an artifact of
    # the kernel's DEFAULT 128/128/128 block sizes (43.2 ms/call).
    # Tuned blocks win decisively:
    #   xla einsum               15.91 ms   (18.5 TFLOP/s)
    #   flash q768 k1536 b2       9.96 ms   (29.6 TFLOP/s)  <- auto
    #   splash kv1536             9.91 ms   (same; no advantage)
    # CPU (tests) keeps the einsum path — the Pallas kernel doesn't
    # lower there.
    import jax as _jax

    if _jax.devices()[0].platform in ("tpu", "axon"):
        return "flash"
    return "xla"


_MASK_VALUE = -0.7 * 3.4e38  # finite "-inf": avoids NaN from exp(-inf-(-inf))


def _xla_attention(q, k, v, mask=None):
    """[B, Tq, H, D] × [B, Tk, H, D] → [B, Tq, H, D], fp32 softmax.

    ``mask`` is additive 0/-inf; masked positions are REPLACED with a
    large finite negative instead of added, so (a) fully-masked rows
    softmax to uniform rather than NaN and (b) NaN garbage in masked
    keys (e.g. padded conditioning slots) cannot leak through
    ``NaN + -inf``.
    """
    scale = q.shape[-1] ** -0.25
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk",
        q * scale,
        k * scale,
        preferred_element_type=jnp.float32,
    )
    if mask is not None:
        logits = jnp.where(mask >= 0.0, logits, _MASK_VALUE)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
        q.dtype
    )
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def _flash_blocks(tp: int, b: int):
    """Tuned BlockSizes for the padded length ``tp`` / batch ``b``.

    The r3 sweep (tools/bench_encoder_attn.py) found q768/k1536/b2
    fastest at Whisper's T=1500→1536; blocks must divide the padded
    sequence, so other lengths fall back to 512 blocks (the best
    tp-divisor in the sweep family)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    bq = 768 if tp % 768 == 0 else min(512, tp)
    bk = 1536 if tp % 1536 == 0 else min(512, tp)
    bb = 2 if b % 2 == 0 else 1
    return BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=bb)


def _flash_attention(q, k, v):
    """Unmasked self-attention via the Pallas TPU kernel (pads the
    sequence to a 512 multiple — 1536 when that makes the tuned 768/1536
    blocks divide evenly; pad keys are masked by segment ids)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    b, t, h, d = q.shape
    t_pad = -t % 512
    if (t + t_pad) % 1536 and -t % 1536 <= 512:
        t_pad = -t % 1536  # reach the fast 768/1536 block shape
    tp = t + t_pad
    sm_scale = float(d) ** -0.5

    def to_bhsd(x):
        x = jnp.pad(x, ((0, 0), (0, t_pad), (0, 0), (0, 0)))
        return x.swapaxes(1, 2)  # [B, H, T', D]

    qp, kp, vp = to_bhsd(q), to_bhsd(k), to_bhsd(v)
    # segment 1 = real tokens, 0 = padding; cross-segment pairs masked
    seg = jnp.pad(
        jnp.ones((b, t), jnp.int32), ((0, 0), (0, t_pad))
    )
    out = flash_attention(
        qp,
        kp,
        vp,
        segment_ids=SegmentIds(q=seg, kv=seg),
        causal=False,
        sm_scale=sm_scale,
        block_sizes=_flash_blocks(tp, b),
    )
    return out.swapaxes(1, 2)[:, :t]


def attention_kt(q, k_t, v_t, mask=None, k_scale=None, v_scale=None):
    """Decode-step attention over a TRANSPOSED KV cache:
    [B, Tq, H, D] × K^T/V^T [B, H, D, S] → [B, Tq, H, D].

    The decode self-attention cache stores positions on the LANE axis
    ([..., D, S]: D=64 sublanes, S a 128-multiple) — the split
    [..., H=16, D=64] layout leaves half of every 128-lane tile empty,
    which measured 2× on both DMA and gather traffic
    (tools/bench_beam_gather.py). Same conventions as
    ``_xla_attention`` (fp32 softmax, finite mask replacement); the
    softmax scale folds entirely into q (one [B, Tq, H, D]-sized
    multiply) instead of scaling the S-sized cache by d^-0.25.

    ``k_scale``/``v_scale`` ([B, H, S]) dequantize an int8 cache (the
    last bf16 stream of the decode loop stored at half width,
    per-position amax/127 over D): K's scale multiplies the logits
    column, V's folds into the attention weights — both on the SMALL
    [B, H, Tq, S] tensors, never on the cache itself, so XLA converts
    the int8 values post-DMA and the HBM stream halves.
    """
    scale = q.shape[-1] ** -0.5
    if k_scale is None:
        qq = (q * scale).astype(k_t.dtype)
    else:
        qq, k_t = q * scale, k_t.astype(q.dtype)
    logits = jnp.einsum(
        "bqhd,bhds->bhqs", qq, k_t,
        preferred_element_type=jnp.float32,
    )
    if k_scale is not None:
        logits = logits * k_scale[:, :, None, :]
    if mask is not None:
        logits = jnp.where(mask >= 0.0, logits, _MASK_VALUE)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if v_scale is not None:
        weights = weights * v_scale[:, :, None, :]
        v_t = v_t.astype(q.dtype)
    return jnp.einsum("bhqs,bhds->bqhd", weights.astype(q.dtype), v_t)


def attention_kt_ancestry(
    q, k_t, v_t, anc, mask=None, k_scale=None, v_scale=None,
    select="einsum",
):
    """Beam decode-step attention over an UNREORDERED transposed KV
    cache, selecting each history position's true source lane through
    a per-position ancestry map.

    Beam search classically reorders the whole KV cache every step
    (CT2's ``batch_reorder``); inside a ``lax.while_loop`` on TPU that
    costs a full K+V HBM round-trip per step *plus* an XLA copy back
    into the fixed loop-carry buffers (tools/bench_beam_step.py: the
    reorder is ~24 ms of a 36 ms step at medium/b32·k5 in every
    formulation — XLA gather, Pallas block DMA, even an aliased
    in-place kernel, which XLA guards with layout-transposing copies
    because its chosen loop layout keeps beam rows on the lane axis).

    Instead the cache is NEVER reordered: each beam row writes its own
    K/V at its own lane, and ``anc[b, j, p]`` records which of window
    ``b``'s ``K`` lanes wrote position ``p`` of (current) beam ``j``'s
    history. Attention computes logits of every query lane against all
    ``K`` lanes of its window (the cache bytes read are unchanged —
    lanes share the window read; only MXU FLOPs go ×K on a
    memory-bound op) and selects with an exact one-hot contraction:
    zero terms are exact zeros, so the result equals attention over
    the explicitly-gathered cache.

    The cache tensors only ever enter the two einsums attention_kt
    itself uses ("bqhd,bhds->bhqs" / "bhqs,bhds->bqhd", here with
    Tq = K: every row scores ALL K query lanes of its window) — any
    formulation that reshapes the cache slice into a [B, K, ...]
    window view makes XLA relayout the full slice every layer
    (~2 GB/step of transposes at medium/b32·k5, measured 43.6 ms/step
    vs this form; tools/dump_beam_hlo.py). The one-hot selection then
    runs on the SMALL [BK, H, K, S] logits/weights tensors only.

    q: [B*K, Tq=1, H, D]; k_t/v_t: [B*K, H, D, S]; anc: [B, K, S] int
    in [0, K); mask as in ``attention_kt`` ([B*K|1, 1, 1, S]).
    ``k_scale``/``v_scale`` ([B*K, H, S]) dequantize an int8 cache —
    each row's scale applies to that row's logits/weights BEFORE the
    ancestry selection, so the selected value carries its true source
    row's scale (see ``attention_kt``).

    ``select`` picks between two exact formulations of the one-hot
    lane selection (identical results; A/B'd on chip by
    tools/bench_beam_step.py):
      - "einsum": contract the [BK, H, J, S] logits/weights against a
        [B, J, S, I] one-hot with dot-generals (batch dims {b, j, s}).
      - "masked": K unrolled ``where(anc == i, ...)`` selects — pure
        element-wise VPU work with no dot-general batch-dim layout
        constraints; the scatter side folds into K partial AV einsums
        (one per source row) summed in registers.
    """
    b, kk, s = anc.shape
    bk, tq, h, d = q.shape
    scale = d ** -0.5
    # every row of a window carries the window's K query lanes
    if k_scale is None:
        qs = (q * scale).astype(k_t.dtype)
    else:
        qs, k_t = q * scale, k_t.astype(q.dtype)
    q2 = qs.reshape(b, 1, kk, h, d)
    q_all = jnp.broadcast_to(q2, (b, kk, kk, h, d)).reshape(bk, kk, h, d)
    logits_all = jnp.einsum(
        "bqhd,bhds->bhqs", q_all, k_t,
        preferred_element_type=jnp.float32,
    )  # [BK, H, J, S]: row (b, i)'s cache scored by query lane j
    if k_scale is not None:
        logits_all = logits_all * k_scale[:, :, None, :]

    if select == "masked":
        # l5[b, i, h, j, s] = query lane j scored against source row i;
        # pick row anc[b, j, s] per position with unrolled exclusive
        # masks (exact: the discarded terms are never touched, vs the
        # einsum form's multiply-by-exact-zero)
        la = logits_all.reshape(b, kk, h, kk, s)  # [B, I, H, J, S]
        sel = anc[:, None, :, :]  # [B, 1, J, S] vs [B, H, J, S] slices
        logits = jnp.where(sel == 0, la[:, 0], 0.0)
        for i in range(1, kk):
            logits = logits + jnp.where(sel == i, la[:, i], 0.0)
        if mask is not None:
            m = jnp.broadcast_to(mask, (bk, 1, 1, s)).reshape(
                b, kk, s
            )[:, None, :, :]  # [B, 1, J, S]
            logits = jnp.where(m >= 0.0, logits, _MASK_VALUE)
        w = jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1
        )  # [B, H, J, S]
        # scatter = K partial AVs: row i attends with lane j's weights
        # only at positions j sourced from i
        if v_scale is not None:
            vs5 = v_scale.reshape(b, kk, h, s)  # [B, I, H, S]
            v_t = v_t.astype(q.dtype)
        v5 = v_t.reshape(b, kk, h, d, s)  # [B, I, H, D, S]
        out = None
        for i in range(kk):
            w_i = jnp.where(sel == i, w, 0.0)  # [B, H, J, S]
            if v_scale is not None:
                w_i = w_i * vs5[:, i][:, :, None, :]
            part = jnp.einsum(
                "bhjs,bhds->bjhd", w_i.astype(q.dtype), v5[:, i]
            )  # [B, J, H, D]
            out = part if out is None else out + part
        return out.reshape(bk, tq, h, d)

    oh = jax.nn.one_hot(anc, kk, dtype=jnp.float32)  # [B, J, S, I]
    # select each (query lane, position)'s true source row
    l5 = logits_all.reshape(b, kk, h, kk, s)  # [B, I, H, J, S]
    logits = jnp.einsum("bihjs,bjsi->bjhs", l5, oh)
    if mask is not None:
        m = jnp.broadcast_to(mask, (bk, 1, 1, s)).reshape(b, kk, 1, s)
        logits = jnp.where(m >= 0.0, logits, _MASK_VALUE)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)  # [B,J,H,S]
    # scatter weights back onto their source rows, then the plain AV
    w_all = jnp.einsum("bjhs,bjsi->bihjs", w, oh)
    w_all = w_all.reshape(bk, h, kk, s)
    if v_scale is not None:
        w_all = w_all * v_scale[:, :, None, :]
        v_t = v_t.astype(q.dtype)
    out_all = jnp.einsum(
        "bhqs,bhds->bqhd", w_all.astype(q.dtype), v_t
    )  # [BK, J, H, D]
    out = out_all.reshape(b, kk, kk, h, d).sum(axis=1)  # Σ source rows
    return out.reshape(bk, tq, h, d)


def multihead_attention(q, k, v, mask=None, impl: Optional[str] = None):
    """Dispatch between the XLA einsum path and the Pallas kernel.

    ``mask`` forces the XLA path (the flash kernel covers the unmasked
    encoder case; decode-time masking stays in XLA where query length
    is 1 and flash has nothing to win). Cross-attention (q and kv of
    different lengths — e.g. the decode prefill's prompt-vs-audio
    attention) also stays in XLA: the flash wrapper pads q and kv by
    the same q-derived amount, which only lines up for self-attention,
    and at prompt lengths (≤65) flash has nothing to win anyway.
    """
    impl = impl or _resolve_impl()
    if (
        impl == "flash"
        and mask is None
        and q.shape[1] > 1
        and q.shape[1] == k.shape[1]
    ):
        return _flash_attention(q, k, v)
    return _xla_attention(q, k, v, mask)
