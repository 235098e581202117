"""Pallas flash-decode cross-attention (ops/cross_decode.py).

The kernel must match a straight dequantize-softmax-mix reference on
the same quantized values (bf16-rounding tolerance), including the
masking of lane-padded key positions, and the decode-layout path must
leave greedy decode outputs unchanged vs the einsum formulation.
"""

import numpy as np
import pytest


def _quantize_ref(rng, L, B, T, H, D):
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops.cross_decode import quantize_cross_kv_decode

    k = jnp.asarray(
        rng.standard_normal((L, B, T, H, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    v = jnp.asarray(
        rng.standard_normal((L, B, T, H, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    return quantize_cross_kv_decode(k, v)


@pytest.mark.parametrize("T", [200, 128, 77])
def test_kernel_matches_dequantized_reference(T):
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops.cross_decode import cross_attention_decode

    rng = np.random.default_rng(0)
    L, B, H, D = 2, 3, 4, 64
    kv = _quantize_ref(rng, L, B, T, H, D)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))

    out = cross_attention_decode(
        q, kv["kv_dec"][0], kv["k_dec_scale"][0],
        kv["v_dec_scale"][0], kv["k_len"], interpret=True,
    )

    fused = np.asarray(kv["kv_dec"][0], np.float32)  # [B, H, 2D, Kp]
    kq, vqt = fused[:, :, :D], fused[:, :, D:]
    ks = np.asarray(kv["k_dec_scale"][0])
    vs = np.asarray(kv["v_dec_scale"][0])
    qn = np.asarray(q)[:, 0]
    logits = np.einsum("bhd,bhdt->bht", qn * ks[None] * D**-0.5, kq)
    logits[:, :, T:] = -np.inf
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    ref = np.einsum("bht,bhdt->bhd", w, vqt) * vs[None]

    got = np.asarray(out)[:, 0]
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_padded_positions_have_zero_weight():
    """Keys beyond k_len (the lane padding) must not receive softmax
    mass: attention over all-negative V with padding present stays
    strictly negative."""
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops.cross_decode import (
        cross_attention_decode,
        quantize_cross_kv_decode,
    )

    rng = np.random.default_rng(1)
    L, B, T, H, D = 1, 2, 100, 2, 64
    k = jnp.asarray(
        rng.standard_normal((L, B, T, H, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    v = -jnp.abs(
        jnp.asarray(
            rng.standard_normal((L, B, T, H, D)).astype(np.float32)
        )
    ).astype(jnp.bfloat16) - 0.5
    kv = quantize_cross_kv_decode(k, v)
    assert kv["kv_dec"].shape[-1] > T  # padding exists
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))
    out = np.asarray(
        cross_attention_decode(
            q, kv["kv_dec"][0], kv["k_dec_scale"][0],
            kv["v_dec_scale"][0], kv["k_len"], interpret=True,
        )
    )
    assert (out < 0).all()


def test_int4_pack_roundtrip():
    """pack_int4/unpack_int4 are exact inverses on [-7, 7] values,
    along any axis."""
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops.cross_decode import pack_int4, unpack_int4

    rng = np.random.default_rng(3)
    x = jnp.asarray(
        rng.integers(-7, 8, size=(3, 8, 64, 128)), jnp.int8
    )
    for axis in (2, 3):
        packed = pack_int4(x, axis=axis)
        assert packed.shape[axis] == x.shape[axis] // 2
        np.testing.assert_array_equal(
            np.asarray(unpack_int4(packed, axis=axis)), np.asarray(x)
        )


@pytest.mark.parametrize("T", [200, 128])
def test_int4_kernel_matches_dequantized_reference(T):
    """The bits=4 kernel path must match a numpy dequantize-softmax-mix
    on the same unpacked int4 values."""
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops.cross_decode import (
        cross_attention_decode,
        quantize_cross_kv_decode,
        unpack_int4,
    )

    rng = np.random.default_rng(4)
    L, B, H, D = 2, 3, 4, 64
    k = jnp.asarray(
        rng.standard_normal((L, B, T, H, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    v = jnp.asarray(
        rng.standard_normal((L, B, T, H, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    kv = quantize_cross_kv_decode(k, v, bits=4)
    # fused packed layout: rows 0:D/2 = packed K, D/2:D = packed V^T
    assert kv["kv_dec"].shape[-2] == D
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))

    out = cross_attention_decode(
        q, kv["kv_dec"][0], kv["k_dec_scale"][0],
        kv["v_dec_scale"][0], kv["k_len"], bits=4, interpret=True,
    )

    kq = np.asarray(
        unpack_int4(kv["kv_dec"][0][:, :, : D // 2], axis=2), np.float32
    )
    vqt = np.asarray(
        unpack_int4(kv["kv_dec"][0][:, :, D // 2 :], axis=2), np.float32
    )
    ks = np.asarray(kv["k_dec_scale"][0])
    vs = np.asarray(kv["v_dec_scale"][0])
    qn = np.asarray(q)[:, 0]
    logits = np.einsum("bhd,bhdt->bht", qn * ks[None] * D**-0.5, kq)
    logits[:, :, T:] = -np.inf
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    ref = np.einsum("bht,bhdt->bhd", w, vqt) * vs[None]

    got = np.asarray(out)[:, 0]
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_int4_quantization_error_bounded():
    """Dequantized int4 K/V must stay within half a quantization step
    of the source values (per-channel amax/7 scales)."""
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops.cross_decode import (
        quantize_cross_kv_decode,
        unpack_int4,
    )

    rng = np.random.default_rng(5)
    L, B, T, H, D = 2, 2, 128, 4, 64
    k = jnp.asarray(rng.standard_normal((L, B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((L, B, T, H, D)).astype(np.float32))
    kv = quantize_cross_kv_decode(k, v, bits=4)
    # fused K half [L,B,H,D/2,Kp] packed -> dequant -> [L,B,T,H,D]
    kq = np.asarray(
        unpack_int4(kv["kv_dec"][:, :, :, : D // 2], axis=3), np.float32
    )
    ks = np.asarray(kv["k_dec_scale"])  # [L, H, D]
    deq = (kq * ks[:, None, :, :, None]).transpose(0, 1, 4, 2, 3)[:, :, :T]
    err = np.abs(deq - np.asarray(k))
    bound = 0.5 * ks.max(axis=(1, 2))[:, None, None, None, None] + 1e-6
    assert (err <= bound).all()


def test_decode_step_int4_close_to_int8():
    """Full decode_step_stacked with bits=4 stacked-einsum KV stays
    close to the int8 path (same argmax on a random tiny model) — the
    CPU-reproducible stand-in for the TPU packed kernel path."""
    import jax.numpy as jnp

    from whisper_nemo_tpu.engine.transcribe import WhisperEngine
    from whisper_nemo_tpu.models import whisper_stacked as ws

    eng = WhisperEngine("tiny.en", compute_type="bfloat16")
    dims = eng.dims
    rng = np.random.default_rng(6)
    b, t = 2, dims.n_audio_ctx
    audio_feats = jnp.asarray(
        rng.standard_normal((b, t, dims.n_audio_state)).astype(np.float32)
    ).astype(jnp.bfloat16)

    params = eng._params_stacked
    base = ws.cross_attention_kv_stacked(params, audio_feats, dims)
    kv8 = ws.quantize_cross_kv_stacked(base, bits=8)
    kv4 = ws.quantize_cross_kv_stacked(base, bits=4)

    cache = ws.init_stacked_cache(b, dims, jnp.bfloat16, cache_len=128)
    token = jnp.array([5, 7], jnp.int32)
    pos = jnp.array(3, jnp.int32)

    l8, _ = ws.decode_step_stacked(
        params, token, pos, cache, kv8, dims, jnp.bfloat16
    )
    l4, _ = ws.decode_step_stacked(
        params, token, pos, cache, kv4, dims, jnp.bfloat16
    )
    a, c = np.asarray(l8), np.asarray(l4)
    np.testing.assert_array_equal(a.argmax(-1), c.argmax(-1))
    span = np.abs(a).max()
    np.testing.assert_allclose(a, c, atol=0.1 * span)


def test_beam_shared_kv_matches_replicated():
    """cross_attention_decode_layered with beam=2 (lanes share their
    window's K/V via the i//beam index map) must match beam=1 on KV
    explicitly replicated per lane — the memory-free formulation of the
    CT2-style repeat."""
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops.cross_decode import (
        cross_attention_decode_layered,
        quantize_cross_kv_decode,
    )

    rng = np.random.default_rng(7)
    L, W, beam, H, D, T = 2, 2, 2, 4, 64, 200
    k = jnp.asarray(
        rng.standard_normal((L, W, T, H, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    v = jnp.asarray(
        rng.standard_normal((L, W, T, H, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    kv = quantize_cross_kv_decode(k, v)
    # row-major lane order [w0 w0 w1 w1] — jnp.repeat(axis=0) on the
    # window axis, matching decode.py's expand()
    q = jnp.asarray(
        rng.standard_normal((W * beam, 1, H, D)).astype(np.float32)
    )

    shared = cross_attention_decode_layered(
        q, kv["kv_dec"], kv["k_dec_scale"][0],
        kv["v_dec_scale"][0], jnp.int32(0), kv["k_len"],
        beam=beam, interpret=True,
    )
    kv_rep = jnp.repeat(kv["kv_dec"], beam, axis=1)
    replicated = cross_attention_decode_layered(
        q, kv_rep, kv["k_dec_scale"][0],
        kv["v_dec_scale"][0], jnp.int32(0), kv["k_len"],
        interpret=True,
    )
    # the shared path batches a window's lanes into ONE [beam, D] dot
    # per head (tools/bench_beam_step.py: the serial per-lane form was
    # compute-bound); a different dot M-dimension reorders the f32
    # accumulation, so parity is to bf16 rounding, not bitwise
    a, b = np.asarray(shared), np.asarray(replicated)
    span = np.abs(b).max()
    np.testing.assert_allclose(a, b, atol=0.02 * span)


def test_decode_step_beam_shared_kv():
    """decode_step_stacked with _beam=2 metadata (window-batch KV,
    beam-expanded lanes) matches the replicated-KV step lane for lane
    on a random tiny model."""
    import jax.numpy as jnp

    from whisper_nemo_tpu.engine.transcribe import WhisperEngine
    from whisper_nemo_tpu.models import whisper_stacked as ws

    eng = WhisperEngine("tiny.en", compute_type="bfloat16")
    dims = eng.dims
    rng = np.random.default_rng(8)
    w, beam, t = 2, 2, dims.n_audio_ctx
    bk = w * beam
    audio_feats = jnp.asarray(
        rng.standard_normal((w, t, dims.n_audio_state)).astype(np.float32)
    ).astype(jnp.bfloat16)

    params = eng._params_stacked
    base = ws.cross_attention_kv_stacked(params, audio_feats, dims)
    kv_w = ws.quantize_cross_kv_decode_layout(base)
    kv_shared = {**kv_w, "_beam": beam}
    kv_rep = {
        name: (
            x
            if name.endswith("_scale") or name.startswith("_")
            else jnp.repeat(x, beam, axis=1)
        )
        for name, x in kv_w.items()
    }

    cache = ws.init_stacked_cache(bk, dims, jnp.bfloat16, cache_len=128)
    token = jnp.array([5, 7, 11, 13], jnp.int32)
    pos = jnp.array(3, jnp.int32)

    l_shared, _ = ws.decode_step_stacked(
        params, token, pos, cache, kv_shared, dims, jnp.bfloat16
    )
    l_rep, _ = ws.decode_step_stacked(
        params, token, pos, cache, kv_rep, dims, jnp.bfloat16
    )
    np.testing.assert_array_equal(
        np.asarray(l_shared), np.asarray(l_rep)
    )


def test_decode_step_matches_legacy_quantized_einsum():
    """decode_step_stacked over the decode-layout kernel path yields
    (numerically close) logits to the legacy [L,B,T,H,D] einsum path —
    same quantization scheme, different layout/kernel."""
    import jax
    import jax.numpy as jnp

    from whisper_nemo_tpu.engine.transcribe import WhisperEngine
    from whisper_nemo_tpu.models import whisper_stacked as ws

    eng = WhisperEngine("tiny.en", compute_type="bfloat16")
    dims = eng.dims
    rng = np.random.default_rng(2)
    b, t = 2, dims.n_audio_ctx
    audio_feats = jnp.asarray(
        rng.standard_normal((b, t, dims.n_audio_state)).astype(np.float32)
    ).astype(jnp.bfloat16)

    params = eng._params_stacked
    base = ws.cross_attention_kv_stacked(params, audio_feats, dims)
    kv_legacy = ws.quantize_cross_kv_stacked(base)
    kv_dec = ws.quantize_cross_kv_decode_layout(base)

    cache = ws.init_stacked_cache(b, dims, jnp.bfloat16, cache_len=128)
    token = jnp.array([5, 7], jnp.int32)
    pos = jnp.array(3, jnp.int32)

    logits_legacy, _ = ws.decode_step_stacked(
        params, token, pos, cache, kv_legacy, dims, jnp.bfloat16
    )
    logits_dec, _ = ws.decode_step_stacked(
        params, token, pos, cache, kv_dec, dims, jnp.bfloat16
    )
    a, c = np.asarray(logits_legacy), np.asarray(logits_dec)
    # same argmax and close logits (bf16 rounding differs between the
    # einsum and kernel formulations)
    np.testing.assert_array_equal(a.argmax(-1), c.argmax(-1))
    span = np.abs(a).max()
    np.testing.assert_allclose(a, c, atol=0.02 * span)


def test_nibble_unpack_impls_agree():
    """The shift-free nibble unpack (AND + bf16 convert + exact
    power-of-two scaling) must bit-match the int32-shift variant on
    every packed byte value, and both must match unpack_int4."""
    import jax.numpy as jnp

    from whisper_nemo_tpu.ops import cross_decode as cd

    p = jnp.arange(-128, 128, dtype=jnp.int32).astype(jnp.int8)
    p = p.reshape(2, 128)
    saved = cd._NIBBLE_IMPL
    try:
        cd._NIBBLE_IMPL = "andf"
        lo_a, hi_a = cd._unpack_nibbles_bf16(p)
        cd._NIBBLE_IMPL = "i32"
        lo_s, hi_s = cd._unpack_nibbles_bf16(p)
    finally:
        cd._NIBBLE_IMPL = saved
    np.testing.assert_array_equal(
        np.asarray(lo_a, np.float32), np.asarray(lo_s, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(hi_a, np.float32), np.asarray(hi_s, np.float32)
    )
    # and against the public exact-integer unpack (axis-0 concat order)
    ints = np.asarray(cd.unpack_int4(p, axis=0))
    np.testing.assert_array_equal(
        np.concatenate(
            [np.asarray(lo_a, np.int32), np.asarray(hi_a, np.int32)]
        ),
        ints,
    )
