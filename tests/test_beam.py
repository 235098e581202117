import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_nemo_tpu.engine.decode import (
    DecodeOptions,
    beam_decode,
    build_suppress_mask,
    greedy_decode,
)
from whisper_nemo_tpu.models.whisper import WhisperDims, init_whisper_params, encode
from whisper_nemo_tpu.text.tokenizer import WhisperTokenizer


@pytest.fixture(scope="module")
def setup():
    dims = WhisperDims(
        n_audio_ctx=32,
        n_audio_layer=1,
        n_text_layer=1,
        n_audio_state=64,
        n_text_state=64,
        n_audio_head=4,
        n_text_head=4,
        n_vocab=51865,
        n_text_ctx=64,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), dims)
    tok = WhisperTokenizer.byte_fallback()
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 80, 64)), jnp.float32)
    feats = encode(params, mel, dims)
    prompt = jnp.asarray([tok.sot_sequence("en")] * 2, jnp.int32)
    opts = DecodeOptions(
        max_new_tokens=16,
        eot=tok.eot,
        sot=tok.sot,
        no_speech=tok.no_speech,
        no_timestamps=tok.no_timestamps,
        timestamp_begin=tok.timestamp_begin,
    )
    mask = jnp.asarray(build_suppress_mask(dims.n_vocab, []))
    return params, dims, feats, prompt, opts, mask


def test_beam1_matches_greedy(setup):
    params, dims, feats, prompt, opts, mask = setup
    gt, gl, gs, gn = greedy_decode(
        params, feats, prompt, mask, dims, opts, n_prompt=4
    )
    bt, bl, bs, bn = beam_decode(
        params, feats, prompt, mask, dims, opts, n_prompt=4, beam_size=1
    )
    np.testing.assert_array_equal(np.asarray(gl), np.asarray(bl))
    np.testing.assert_array_equal(np.asarray(gt), np.asarray(bt))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(bs), atol=1e-2)


def test_beam_score_not_worse_than_greedy(setup):
    """The best beam hypothesis must score at least as well as greedy
    (same scoring function; beams search a superset)."""
    params, dims, feats, prompt, opts, mask = setup
    _, gl, gs, _ = greedy_decode(
        params, feats, prompt, mask, dims, opts, n_prompt=4
    )
    _, bl, bs, _ = beam_decode(
        params, feats, prompt, mask, dims, opts, n_prompt=4, beam_size=4
    )
    # compare length-normalized scores
    g = np.asarray(gs) / (np.asarray(gl) + 1)
    b = np.asarray(bs) / (np.asarray(bl) + 1)
    assert (b >= g - 1e-3).all()


def test_beam_tokens_shape_and_eot(setup):
    params, dims, feats, prompt, opts, mask = setup
    bt, bl, bs, bn = beam_decode(
        params, feats, prompt, mask, dims, opts, n_prompt=4, beam_size=3
    )
    bt = np.asarray(bt)
    assert bt.shape == (2, 4 + opts.max_new_tokens)
    # prompt preserved in output
    np.testing.assert_array_equal(bt[:, :4], np.asarray(prompt))
    assert (np.asarray(bn) >= 0).all() and (np.asarray(bn) <= 1).all()


def test_beam_stacked_matches_unstacked(setup):
    """Beam on layer-stacked params (the engine's compile-time path)
    must reproduce the canonical per-layer beam exactly."""
    from whisper_nemo_tpu.models.whisper_stacked import stack_decoder_blocks

    params, dims, feats, prompt, opts, mask = setup
    stacked = stack_decoder_blocks(params)
    for kv_int8 in (False, True):
        ut, ul, us, un = beam_decode(
            params, feats, prompt, mask, dims, opts, n_prompt=4,
            beam_size=3, kv_int8=kv_int8,
        )
        st, sl, ss, sn = beam_decode(
            stacked, feats, prompt, mask, dims, opts, n_prompt=4,
            beam_size=3, kv_int8=kv_int8,
        )
        np.testing.assert_array_equal(np.asarray(ut), np.asarray(st))
        np.testing.assert_array_equal(np.asarray(ul), np.asarray(sl))
        np.testing.assert_allclose(
            np.asarray(us), np.asarray(ss), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(un), np.asarray(sn), atol=1e-4
        )


@pytest.mark.parametrize("variant", ["masked", "kernel"])
def test_beam_anc_select_formulations_match(setup, variant):
    """The exact formulations of the ancestry lane selection ("einsum"
    dot-generals, "masked" unrolled where-selects — both
    ops.attention.attention_kt_ancestry — and the Pallas "kernel" of
    ops/self_decode.py, interpret mode here) must produce identical
    beam tokens on the stacked path."""
    import dataclasses

    from whisper_nemo_tpu.models.whisper_stacked import stack_decoder_blocks

    params, dims, feats, prompt, opts, mask = setup
    stacked = stack_decoder_blocks(params)
    et, el, es, _ = beam_decode(
        stacked, feats, prompt, mask, dims, opts, n_prompt=4, beam_size=3
    )
    vopts = dataclasses.replace(opts, anc_select=variant)
    mt, ml, ms, _ = beam_decode(
        stacked, feats, prompt, mask, dims, vopts, n_prompt=4, beam_size=3
    )
    np.testing.assert_array_equal(np.asarray(et), np.asarray(mt))
    np.testing.assert_array_equal(np.asarray(el), np.asarray(ml))
    np.testing.assert_allclose(np.asarray(es), np.asarray(ms), atol=1e-3)


def test_beam_with_conditioning_prefix(setup):
    """Beam + left-padded conditioning: empty prefix must reproduce the
    unconditioned beam on a long token prefix (mask/offset machinery)."""
    params, dims, feats, prompt, opts, mask = setup
    b = int(feats.shape[0])
    bt0, bl0, *_ = beam_decode(
        params, feats, prompt, mask, dims, opts, n_prompt=4, beam_size=3
    )
    # all-invalid 8-slot prefix ahead of the same prompt
    pad = jnp.full((b, 8), 50257, jnp.int32)
    prompt_padded = jnp.concatenate([pad, prompt], axis=1)
    valid = jnp.concatenate(
        [jnp.zeros((b, 8), bool), jnp.ones((b, 4), bool)], axis=1
    )
    bt1, bl1, *_ = beam_decode(
        params, feats, prompt_padded, mask, dims, opts, n_prompt=12,
        beam_size=3, prompt_valid=valid,
    )
    g0 = np.asarray(bt0)[:, 4:10]
    g1 = np.asarray(bt1)[:, 12:18]
    np.testing.assert_array_equal(g0, g1)
