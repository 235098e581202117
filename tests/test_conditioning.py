"""Conditioning-on-previous-text: left-padded fixed prompts must be
numerically equivalent to unpadded prompts (mask + position offset)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_nemo_tpu.engine.transcribe import WhisperEngine
from whisper_nemo_tpu.models.whisper import WhisperDims, init_whisper_params
from whisper_nemo_tpu.text.tokenizer import WhisperTokenizer


@pytest.fixture(scope="module")
def engine():
    dims = WhisperDims(
        n_audio_ctx=1500,
        n_audio_layer=1,
        n_text_layer=1,
        n_audio_state=64,
        n_text_state=64,
        n_audio_head=4,
        n_text_head=4,
        n_vocab=51865,
        n_text_ctx=160,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), dims)
    return WhisperEngine(
        "tiny", params=params, dims=dims,
        tokenizer=WhisperTokenizer.byte_fallback(),
    )


def _feats(engine, seed=0):
    rng = np.random.default_rng(seed)
    audio = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    return engine.encode_windows(engine.mel_window(audio)[None])


def test_empty_conditioning_equals_unconditioned(engine):
    """With an all-invalid prev block, the masked/offset prompt must
    reproduce the plain prompt's decode exactly."""
    from whisper_nemo_tpu.engine.decode import build_suppress_mask

    feats = _feats(engine)
    mask = build_suppress_mask(engine.dims.n_vocab, [])

    t0, l0, s0, _, np0 = engine._decode_batch(
        feats, "en", mask, True, 0.0, min_new_tokens=4,
    )
    gen0 = t0[0, np0 : np0 + l0[0]].tolist()

    t1, l1, s1, _, n_prompt = engine._decode_batch(
        feats, "en", mask, True, 0.0, min_new_tokens=4,
        previous_tokens=[],
    )
    gen1 = t1[0, n_prompt : n_prompt + l1[0]].tolist()

    # the padded graph compiles to a different XLA fusion; with random
    # near-uniform logits a rounding-level tie eventually flips an
    # argmax, so equality is asserted on a long prefix (any masking or
    # position-offset bug diverges at step 0, not step ~100)
    assert gen0[:50] == gen1[:50]
    # per-token average logprob comparable (generation budgets differ:
    # the conditioning block consumes context)
    avg0 = s0[0] / (l0[0] + 1)
    avg1 = s1[0] / (l1[0] + 1)
    assert avg0 == pytest.approx(avg1, rel=0.1)


def test_conditioning_changes_output(engine):
    """Real previous tokens should (generally) influence decoding."""
    from whisper_nemo_tpu.engine.decode import build_suppress_mask

    feats = _feats(engine, seed=1)
    mask = build_suppress_mask(engine.dims.n_vocab, [])
    prev = engine.tokenizer.encode("some previous context here")

    t1, l1, *_ , n1 = engine._decode_batch(
        feats, "en", mask, True, 0.0, min_new_tokens=8,
        previous_tokens=prev,
    )
    assert l1[0] >= 0  # decodes without error; content differs randomly


def test_sequential_with_conditioning_runs(engine):
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(32000) * 0.2).astype(np.float32)
    segments, info = engine.transcribe_sequential(
        audio,
        language="en",
        temperatures=(0.0,),
        condition_on_previous_text=True,
        without_timestamps=True,
    )
    assert info.duration == pytest.approx(2.0)
