"""Parity for the Pallas beam-cache permute (interpret mode on CPU)."""

import numpy as np
import pytest


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize(
    "shape,beam",
    [
        ((4, 6, 16, 2, 8), 3),  # row % 128 == 0: lane-flattened path
        ((3, 10, 8, 4, 16), 5),
        ((1, 4, 32, 1, 8), 2),
        ((2, 6, 5, 3, 8), 3),  # row % 128 != 0: raw-block path
    ],
)
def test_beam_permute_matches_gather(shape, beam, dtype):
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops.beam_permute import beam_permute_cache

    rng = np.random.default_rng(0)
    l, bk, s, h, d = shape
    b = bk // beam
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(
        dtype
    )
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(
        dtype
    )
    # grouped permutation like beam search's: src beam within each row
    src = rng.integers(0, beam, size=(b, beam))
    idx = jnp.asarray(
        (np.arange(b)[:, None] * beam + src).reshape(bk), jnp.int32
    )

    k2, v2 = beam_permute_cache(k, v, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k[:, idx]))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v[:, idx]))

    # the unflattened (raw-block) path must agree too
    k3, v3 = beam_permute_cache(k, v, idx, interpret=True, flatten=False)
    np.testing.assert_array_equal(np.asarray(k3), np.asarray(k[:, idx]))
    np.testing.assert_array_equal(np.asarray(v3), np.asarray(v[:, idx]))


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize(
    "shape,beam",
    [
        ((4, 6, 16, 2, 8), 3),  # row % 128 == 0: lane-flattened path
        ((3, 10, 8, 4, 16), 5),
        ((2, 6, 5, 3, 8), 3),  # row % 128 != 0: raw-block path
    ],
)
def test_beam_permute_inplace_matches_gather(shape, beam, dtype):
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops.beam_permute import (
        beam_permute_cache_inplace,
    )

    rng = np.random.default_rng(1)
    l, bk, s, h, d = shape
    b = bk // beam
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(
        dtype
    )
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(
        dtype
    )
    src = rng.integers(0, beam, size=(b, beam))  # repeats included
    idx = jnp.asarray(
        (np.arange(b)[:, None] * beam + src).reshape(bk), jnp.int32
    )
    want_k, want_v = np.asarray(k[:, idx]), np.asarray(v[:, idx])

    k2, v2 = beam_permute_cache_inplace(
        k, v, jnp.asarray(src, jnp.int32), beam=beam, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(k2), want_k)
    np.testing.assert_array_equal(np.asarray(v2), want_v)


def test_layer_group_divisor():
    from whisper_nemo_tpu.ops.beam_permute import _BLOCK_BYTES, _layer_group

    # 256 KB rows at L=24 -> groups of 4 (1 MB blocks)
    assert _layer_group(24, 256 << 10) == 4
    # a row larger than the budget still yields one row per block
    assert _layer_group(24, 2 * _BLOCK_BYTES) == 1
    assert _layer_group(5, 1) == 5
