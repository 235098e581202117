import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_nemo_tpu.engine.checkpoint import (
    load_params,
    resolve_model,
    save_params,
)
from whisper_nemo_tpu.engine.decode import (
    DecodeOptions,
    build_suppress_mask,
    greedy_decode,
)
from whisper_nemo_tpu.engine.transcribe import (
    WhisperEngine,
    _merge_spans_into_windows,
    _split_on_timestamps,
    compression_ratio,
)
from whisper_nemo_tpu.models.whisper import (
    WhisperDims,
    cross_attention_kv,
    decode_step,
    init_kv_cache,
    init_whisper_params,
)
from whisper_nemo_tpu.text.tokenizer import WhisperTokenizer


@pytest.fixture(scope="module")
def tiny_engine():
    dims = WhisperDims(
        n_mels=80,
        n_audio_ctx=1500,
        n_audio_state=64,
        n_audio_head=4,
        n_audio_layer=1,
        n_vocab=51865,
        n_text_ctx=64,
        n_text_state=64,
        n_text_head=4,
        n_text_layer=1,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), dims)
    tok = WhisperTokenizer.byte_fallback()
    return WhisperEngine("tiny", params=params, dims=dims, tokenizer=tok)


def _decode_manual(params, feats, prompt, suppress_mask, dims, opts):
    """Plain-python greedy decode mirroring the jitted loop's filters."""
    cross_kv = cross_attention_kv(params, feats, dims)
    cache = init_kv_cache(feats.shape[0], dims)
    tokens = list(prompt)
    for pos in range(len(tokens) + opts.max_new_tokens - 1):
        cur = jnp.asarray([tokens[pos]]) if pos < len(tokens) else jnp.asarray([tokens[-1]])
        logits, cache = decode_step(
            params, jnp.asarray([tokens[min(pos, len(tokens) - 1)]]),
            jnp.int32(pos), cache, cross_kv, dims,
        )
        if pos + 1 < len(prompt):
            continue  # still consuming the prompt
        filt = np.asarray(logits[0]) + suppress_mask
        if opts.suppress_blank and pos + 1 == len(prompt):
            filt[opts.blank_token] = -np.inf
            filt[opts.eot] = -np.inf
        filt[opts.timestamp_begin :] = -np.inf
        filt[opts.no_timestamps] = -np.inf
        nxt = int(np.argmax(filt))
        tokens.append(nxt)
        if nxt == opts.eot:
            break
    return tokens


def test_greedy_decode_matches_manual_loop(tiny_engine):
    eng = tiny_engine
    rng = np.random.default_rng(0)
    mel = eng.mel_window(rng.standard_normal(16000).astype(np.float32))
    feats = eng.encode_windows(mel[None])
    prompt = eng.tokenizer.sot_sequence("en", without_timestamps=True)
    mask = build_suppress_mask(eng.dims.n_vocab, [])
    opts = eng._make_opts(without_timestamps=True, max_new_tokens=12)

    tokens, length, sum_lp, no_speech = greedy_decode(
        eng.params,
        feats,
        jnp.asarray([prompt], jnp.int32),
        jnp.asarray(mask),
        eng.dims,
        opts,
        n_prompt=len(prompt),
    )
    jit_tokens = np.asarray(tokens)[0][: len(prompt) + int(length[0]) + 1]

    manual = _decode_manual(eng.params, feats, prompt, mask, eng.dims, opts)
    n = min(len(manual), len(jit_tokens))
    assert list(jit_tokens[:n]) == manual[:n]
    assert 0.0 <= float(no_speech[0]) <= 1.0


def test_suppress_mask_is_respected(tiny_engine):
    eng = tiny_engine
    rng = np.random.default_rng(1)
    mel = eng.mel_window(rng.standard_normal(32000).astype(np.float32))
    feats = eng.encode_windows(mel[None])
    prompt = eng.tokenizer.sot_sequence("en", without_timestamps=True)
    opts = eng._make_opts(without_timestamps=True, max_new_tokens=16)

    # run once unsuppressed, then ban every token that appeared
    mask0 = build_suppress_mask(eng.dims.n_vocab, [])
    tokens, length, *_ = greedy_decode(
        eng.params, feats, jnp.asarray([prompt], jnp.int32),
        jnp.asarray(mask0), eng.dims, opts, n_prompt=len(prompt),
    )
    first = set(np.asarray(tokens)[0][len(prompt) : len(prompt) + int(length[0])].tolist())
    banned = [t for t in first if t != opts.eot]
    if not banned:
        pytest.skip("model emitted only EOT")
    mask1 = build_suppress_mask(eng.dims.n_vocab, banned)
    tokens1, length1, *_ = greedy_decode(
        eng.params, feats, jnp.asarray([prompt], jnp.int32),
        jnp.asarray(mask1), eng.dims, opts, n_prompt=len(prompt),
    )
    got = set(np.asarray(tokens1)[0][len(prompt) : len(prompt) + int(length1[0])].tolist())
    assert not (got & set(banned))


def test_merge_spans_into_windows():
    sr30 = 480000
    spans = [
        {"start": 0, "end": 100000},
        {"start": 120000, "end": 300000},
        {"start": 400000, "end": 700000},
    ]
    windows = _merge_spans_into_windows(spans, sr30)
    # first two merge (extent 300000 < 30s), third is separate
    assert windows[0] == (0, 300000)
    assert windows[1] == (400000, 700000)
    # giant span gets sliced
    giant = [{"start": 0, "end": 1_100_000}]
    w = _merge_spans_into_windows(giant, sr30)
    assert w[0] == (0, 480000)
    assert w[1] == (480000, 960000)
    assert w[2] == (960000, 1_100_000)


def test_split_on_timestamps_basic():
    ts = 50364  # multilingual timestamp_begin
    tokens = [ts + 0, 100, 101, ts + 100, ts + 100, 102, ts + 150]
    segs, consumed = _split_on_timestamps(tokens, ts, 10.0, 30.0, 3000)
    assert len(segs) == 2
    toks0, s0, e0 = segs[0]
    assert toks0 == [100, 101]
    assert s0 == 10.0 and e0 == 12.0  # 100 * 0.02
    toks1, s1, e1 = segs[1]
    assert toks1 == [102]
    assert e1 == 13.0
    assert consumed == 300  # 3.0 s / 0.01


def test_split_on_timestamps_open_segment():
    ts = 50364
    tokens = [ts + 0, 100, 101]
    segs, consumed = _split_on_timestamps(tokens, ts, 0.0, 30.0, 3000)
    assert len(segs) == 1
    assert segs[0][2] == 30.0
    assert consumed == 3000


def test_split_no_timestamps():
    segs, consumed = _split_on_timestamps([5, 6], 50364, 0.0, 30.0, 3000)
    assert segs == [([5, 6], 0.0, 30.0)]
    assert consumed == 3000


def test_compression_ratio():
    assert compression_ratio("") == 0.0
    assert compression_ratio("a" * 1000) > 2.4  # degenerate repetition
    assert compression_ratio("The quick brown fox.") < 2.0


def test_transcribe_batched_contract(tiny_engine):
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(4 * 16000) * 0.2).astype(np.float32)
    segments, info = tiny_engine.transcribe_batched(
        audio, language="en", batch_size=2
    )
    assert info.language == "en"
    assert info.duration == pytest.approx(4.0)
    assert len(segments) >= 1
    for s in segments:
        assert s.end > s.start
        assert isinstance(s.text, str)
        assert 0.0 <= s.no_speech_prob <= 1.0


def test_transcribe_sequential_contract(tiny_engine):
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(2 * 16000) * 0.2).astype(np.float32)
    segments, info = tiny_engine.transcribe_sequential(
        audio, language="en", temperatures=(0.0,), without_timestamps=True
    )
    assert info.duration == pytest.approx(2.0)
    # random weights: either produced segments or skipped as no-speech
    for s in segments:
        assert s.seek >= 0
        assert s.start >= 0.0


def test_detect_language_returns_code(tiny_engine):
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    lang, prob = tiny_engine.detect_language(audio)
    assert isinstance(lang, str) and len(lang) >= 2
    assert 0.0 <= prob <= 1.0


def test_checkpoint_roundtrip(tmp_path):
    dims = WhisperDims(
        n_audio_layer=1, n_text_layer=1, n_audio_state=64, n_text_state=64,
        n_audio_head=4, n_text_head=4, n_vocab=100, n_text_ctx=16,
        n_audio_ctx=32,
    )
    params = init_whisper_params(jax.random.PRNGKey(1), dims)
    path = str(tmp_path / "m.npz")
    save_params(path, params)
    back = load_params(path)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resolve_model_unknown_name():
    with pytest.raises(ValueError):
        resolve_model("definitely-not-a-model")


def test_transcribe_sequential_initial_prompt_and_beam(tiny_engine):
    """initial_prompt conditions the first window (left-padded prefix
    through the prefilled decode) on both greedy and beam paths, with
    and without condition_on_previous_text — the faster-whisper
    contract."""
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(2 * 16000) * 0.2).astype(np.float32)
    for beam in (1, 5):
        for cond in (True, False):
            segments, info = tiny_engine.transcribe_sequential(
                audio, language="en", temperatures=(0.0,),
                without_timestamps=True, beam_size=beam,
                condition_on_previous_text=cond,
                initial_prompt="A phone call.",
            )
            assert info.duration == pytest.approx(2.0)
            for s in segments:
                assert s.start >= 0.0


def test_faster_whisper_api_accepts_path(tmp_path, tiny_engine, monkeypatch):
    """WhisperModel.transcribe takes a file path like upstream
    faster-whisper (not only a waveform)."""
    from whisper_nemo_tpu.asr.faster_whisper_api import WhisperModel
    from whisper_nemo_tpu.audio import write_wav

    rng = np.random.default_rng(6)
    path = str(tmp_path / "a.wav")
    write_wav(path, (rng.standard_normal(16000) * 0.2).astype(np.float32))
    model = WhisperModel.__new__(WhisperModel)
    model.engine = tiny_engine
    segs, info = model.transcribe(path, beam_size=2,
                                  initial_prompt="hello")
    assert info.duration == pytest.approx(1.0, abs=0.05)
    list(segs)
