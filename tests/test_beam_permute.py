"""Parity for the Pallas beam-cache permute (interpret mode on CPU)."""

import numpy as np
import pytest


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize(
    "shape,beam",
    [((4, 6, 16, 2, 8), 3), ((3, 10, 8, 4, 16), 5), ((1, 4, 32, 1, 8), 2)],
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


def test_layer_group_divisor():
    from whisper_nemo_tpu.ops.beam_permute import _BLOCK_BYTES, _layer_group

    # 256 KB rows at L=24 -> groups of 4 (1 MB blocks)
    assert _layer_group(24, 256 << 10) == 4
    # a row larger than the budget still yields one row per block
    assert _layer_group(24, 2 * _BLOCK_BYTES) == 1
    assert _layer_group(5, 1) == 5
