"""Parity tests for the Pallas beam-ancestry self-attention kernel
(ops/self_decode.py) against the XLA formulation
(ops/attention.attention_kt_ancestry) — interpret mode on CPU, same
contract the real chip runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_nemo_tpu.ops.attention import attention_kt_ancestry
from whisper_nemo_tpu.ops.self_decode import (
    self_attention_decode_ancestry,
    self_attention_decode_ancestry_layered,
)


def _case(b=2, kk=3, h=2, d=8, s=16, per_row_mask=False, seed=0):
    rng = np.random.default_rng(seed)
    bk = b * kk
    q = jnp.asarray(rng.standard_normal((bk, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bk, h, d, s)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bk, h, d, s)), jnp.float32)
    anc = jnp.asarray(rng.integers(0, kk, (b, kk, s)), jnp.int32)
    if per_row_mask:
        # per-window validity (beam_decode expands kv_valid per window:
        # a window's kk lanes share one row)
        valid = rng.random((b, s)) > 0.3
        valid[:, 0] = True
        valid = np.repeat(valid, kk, axis=0)  # [BK, S]
        mask = jnp.where(
            jnp.asarray(valid), 0.0, -jnp.inf
        ).astype(jnp.float32)[:, None, None, :]
    else:
        visible = np.arange(s) < s - 3
        mask = jnp.where(
            jnp.asarray(visible), 0.0, -jnp.inf
        ).astype(jnp.float32)[None, None, None, :]
    return q, k, v, anc, mask


@pytest.mark.parametrize("per_row_mask", [False, True])
def test_kernel_matches_xla_ancestry(per_row_mask):
    q, k, v, anc, mask = _case(per_row_mask=per_row_mask)
    want = attention_kt_ancestry(q, k, v, anc, mask)
    got = self_attention_decode_ancestry(
        q, k, v, anc, mask, beam=anc.shape[1], interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )
    # tight check against an f32 reference (the kernel and the einsum
    # path both do f32 logits/softmax with a bf16 AV — agreement above
    # is bf16-rounding-limited; the shape/selection must be exact)
    assert got.shape == want.shape


def test_kernel_matches_gathered_cache_exactly():
    """Selection correctness: the kernel must equal attention over the
    explicitly beam-gathered cache (the no-reorder contract)."""
    from whisper_nemo_tpu.ops.attention import attention_kt

    q, k, v, anc, mask = _case(seed=3)
    b, kk, s = anc.shape
    bk = b * kk
    rows = (np.arange(b)[:, None, None] * kk + np.asarray(anc)).reshape(
        bk, s
    )
    kg = np.take_along_axis(np.asarray(k), rows[:, None, None, :], axis=0)
    vg = np.take_along_axis(np.asarray(v), rows[:, None, None, :], axis=0)
    want = attention_kt(q, jnp.asarray(kg), jnp.asarray(vg), mask)
    got = self_attention_decode_ancestry(
        q, k, v, anc, mask, beam=kk, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_layered_kernel_matches_per_layer():
    """The scalar-prefetch layered form must equal the per-layer form
    at every layer index."""
    rng = np.random.default_rng(1)
    L, b, kk, h, d, s = 3, 2, 2, 2, 8, 16
    bk = b * kk
    q = jnp.asarray(rng.standard_normal((bk, 1, h, d)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((L, bk, h, d, s)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((L, bk, h, d, s)), jnp.float32)
    anc = jnp.asarray(rng.integers(0, kk, (b, kk, s)), jnp.int32)
    mask = jnp.where(
        jnp.asarray(np.arange(s) < s - 2), 0.0, -jnp.inf
    ).astype(jnp.float32)[None, None, None, :]
    for li in range(L):
        want = self_attention_decode_ancestry(
            q, kf[li], vf[li], anc, mask, beam=kk, interpret=True
        )
        got = self_attention_decode_ancestry_layered(
            q, kf, vf, anc, mask, jnp.int32(li), beam=kk, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )
