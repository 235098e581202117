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
