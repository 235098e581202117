"""Device polyphase resampler (ops/resample.py).

The conv orchestration (dilation/stride/padding/alignment) is pinned
against a direct numpy evaluation of the same polyphase sum, and the
signal contract (an in-band tone survives 44.1k→16k with the right
frequency and amplitude) is checked analytically.
"""

import numpy as np
import pytest


def _resample_ref(x, up, down):
    """Direct zero-insert → convolve → decimate with the same filter."""
    from whisper_nemo_tpu.ops.resample import _design_filter

    h = np.asarray(_design_filter(up, down), np.float64)
    half = (len(h) - 1) // 2
    t = len(x)
    ups = np.zeros((t - 1) * up + 1)
    ups[::up] = x
    full = np.convolve(ups, h)  # h symmetric: convolve == correlate
    out_len = -(-t * up // down)
    idx = np.arange(out_len) * down + half
    full = np.pad(full, (0, max(0, idx.max() + 1 - len(full))))
    return full[idx]


@pytest.mark.parametrize(
    "orig_sr,target_sr",
    [(44100, 16000), (16000, 44100), (48000, 16000), (22050, 16000)],
)
def test_matches_direct_polyphase(orig_sr, target_sr):
    import math

    import jax.numpy as jnp

    from whisper_nemo_tpu.ops.resample import resample_poly

    rng = np.random.default_rng(0)
    x = rng.standard_normal(4410).astype(np.float32)
    got = np.asarray(resample_poly(jnp.asarray(x), orig_sr, target_sr))
    g = math.gcd(orig_sr, target_sr)
    ref = _resample_ref(x, target_sr // g, orig_sr // g)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_tone_survives_44k_to_16k():
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops.resample import resample_poly

    sr, tsr, f = 44100, 16000, 440.0
    t = np.arange(sr) / sr  # 1 s
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    y = np.asarray(resample_poly(jnp.asarray(x), sr, tsr))
    assert y.shape == (16000,)
    ty = np.arange(len(y)) * (1.0 / tsr)
    expect = np.sin(2 * np.pi * f * ty)
    # interior samples (filter edge effects at the boundaries)
    np.testing.assert_allclose(y[500:-500], expect[500:-500], atol=5e-3)


def test_batch_shapes_and_identity():
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops.resample import resample_poly

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 1000)).astype(np.float32)
    y = resample_poly(jnp.asarray(x), 32000, 16000)
    assert y.shape == (2, 3, 500)
    same = resample_poly(jnp.asarray(x), 16000, 16000)
    np.testing.assert_array_equal(np.asarray(same), x)
