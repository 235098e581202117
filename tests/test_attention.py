"""Dispatch + numerics of ops.attention.multihead_attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_nemo_tpu.ops.attention import (
    _MASK_VALUE,
    _xla_attention,
    multihead_attention,
)


def _qkv(tq, tk, seed=0, b=2, h=4, d=16):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        jax.random.normal(k1, (b, tq, h, d)),
        jax.random.normal(k2, (b, tk, h, d)),
        jax.random.normal(k3, (b, tk, h, d)),
    )


def test_cross_attention_never_routes_to_flash():
    """q/kv length mismatch (decode-prefill cross attention) must take
    the XLA path even with impl="flash": the Pallas wrapper pads q and
    kv by the q-derived amount, which only lines up for self-attention.
    On CPU the kernel would also fail to lower — so this test fails
    loudly if the dispatch regresses."""
    q, k, v = _qkv(tq=5, tk=64)
    out = multihead_attention(q, k, v, impl="flash")
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_single_query_never_routes_to_flash():
    q, k, v = _qkv(tq=1, tk=64, seed=1)
    out = multihead_attention(q, k, v, impl="flash")
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()


def test_mask_forces_xla_and_replaces_logits():
    """Fully-masked rows produce finite output (uniform weights), not
    NaN — the _MASK_VALUE replacement semantics."""
    q, k, v = _qkv(tq=4, tk=4, seed=2)
    mask = jnp.full((1, 1, 4, 4), -jnp.inf)  # everything masked
    out = multihead_attention(q, k, v, mask=mask, impl="flash")
    assert np.isfinite(np.asarray(out)).all()
    assert _MASK_VALUE < -1e37


def test_xla_attention_matches_reference_softmax():
    q, k, v = _qkv(tq=8, tk=8, seed=3)
    out = _xla_attention(q, k, v)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    w = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", w, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_attention_kt_matches_gathered_reference():
    """attention_kt over a transposed cache equals plain softmax
    attention over the untransposed one."""
    from whisper_nemo_tpu.ops.attention import attention_kt

    rng = np.random.default_rng(3)
    b, h, d, s = 4, 2, 8, 16
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, d, s)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, d, s)), jnp.float32)
    out = attention_kt(q, k, v)

    logits = np.einsum(
        "bqhd,bhds->bhqs", np.asarray(q) * d**-0.5, np.asarray(k)
    )
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    want = np.einsum("bhqs,bhds->bqhd", w, np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


@pytest.mark.parametrize("select", ["einsum", "masked"])
@pytest.mark.parametrize("with_mask", [False, True])
def test_attention_kt_ancestry_matches_gathered_cache(with_mask, select):
    """Ancestry selection over an unreordered cache must equal
    attention_kt over the explicitly beam-gathered cache (beam search's
    no-reorder contract, engine/decode.py beam_decode)."""
    from whisper_nemo_tpu.ops.attention import (
        attention_kt,
        attention_kt_ancestry,
    )

    rng = np.random.default_rng(5)
    b, kk, h, d, s = 3, 4, 2, 8, 16
    bk = b * kk
    q = jnp.asarray(rng.standard_normal((bk, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bk, h, d, s)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bk, h, d, s)), jnp.float32)
    anc = rng.integers(0, kk, size=(b, kk, s))
    mask = None
    if with_mask:
        valid = rng.random((bk, s)) > 0.3
        valid[:, 0] = True  # keep at least one visible position
        mask = jnp.where(
            jnp.asarray(valid), 0.0, -jnp.inf
        ).astype(jnp.float32)[:, None, None, :]

    out = attention_kt_ancestry(
        q, k, v, jnp.asarray(anc, jnp.int32), mask, select=select
    )

    # reference: materialize each (window, lane, position)'s true
    # source row and run the plain transposed-cache attention
    rows = (np.arange(b)[:, None, None] * kk + anc).reshape(bk, s)
    kg = np.take_along_axis(
        np.asarray(k), rows[:, None, None, :], axis=0
    )
    vg = np.take_along_axis(
        np.asarray(v), rows[:, None, None, :], axis=0
    )
    want = attention_kt(q, jnp.asarray(kg), jnp.asarray(vg), mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), atol=1e-5
    )


@pytest.mark.parametrize("ancestry", [False, True])
def test_attention_kt_int8_scales_match_dequantized(ancestry):
    """attention_kt / attention_kt_ancestry with an int8 cache +
    per-position scales must equal the same attention over the
    explicitly dequantized cache (the scales fold outside the cache
    reads: K's into the logits column, V's into the weights)."""
    from whisper_nemo_tpu.models.whisper_stacked import quantize_kv_t
    from whisper_nemo_tpu.ops.attention import (
        attention_kt,
        attention_kt_ancestry,
    )

    rng = np.random.default_rng(0)
    b, k, h, d, s = 2, 3, 4, 8, 16
    bk = b * k
    q = jnp.asarray(rng.standard_normal((bk, 1, h, d)), jnp.float32)
    k_t = jnp.asarray(rng.standard_normal((bk, h, d, s)), jnp.float32)
    v_t = jnp.asarray(rng.standard_normal((bk, h, d, s)), jnp.float32)
    mask = jnp.where(
        jnp.arange(s)[None, None, None, :] < 10, 0.0, -jnp.inf
    ).astype(jnp.float32)

    k_q, k_sc = quantize_kv_t(k_t)
    v_q, v_sc = quantize_kv_t(v_t)
    k_deq = k_q.astype(jnp.float32) * k_sc[:, :, None, :]
    v_deq = v_q.astype(jnp.float32) * v_sc[:, :, None, :]

    # the quantization itself is sound: ≤ scale/2 rounding error
    np.testing.assert_allclose(
        np.asarray(k_deq), np.asarray(k_t), atol=float(k_sc.max()) / 1.9
    )

    if ancestry:
        anc = jnp.asarray(rng.integers(0, k, (b, k, s)), jnp.int32)
        got = attention_kt_ancestry(q, k_q, v_q, anc, mask, k_sc, v_sc)
        want = attention_kt_ancestry(q, k_deq, v_deq, anc, mask)
        # the masked formulation is the same selection, element-wise
        got_m = attention_kt_ancestry(
            q, k_q, v_q, anc, mask, k_sc, v_sc, select="masked"
        )
        np.testing.assert_allclose(
            np.asarray(got_m), np.asarray(got), rtol=2e-5, atol=2e-5
        )
    else:
        got = attention_kt(q, k_q, v_q, mask, k_sc, v_sc)
        want = attention_kt(q, k_deq, v_deq, mask)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
