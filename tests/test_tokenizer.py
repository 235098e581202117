import json

import pytest

from whisper_nemo_tpu.text.tokenizer import (
    ByteLevelBPE,
    SpecialTokenLayout,
    WhisperTokenizer,
    bytes_to_unicode,
    find_numeral_symbol_tokens,
)


def test_bytes_to_unicode_is_reversible():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256


def test_multilingual_layout_standard_ids():
    layout = SpecialTokenLayout(n_base_vocab=50257, n_languages=99)
    assert layout.eot == 50257
    assert layout.sot == 50258
    assert layout.language_start == 50259
    assert layout.translate == 50358
    assert layout.transcribe == 50359
    assert layout.nospeech == 50362
    assert layout.notimestamps == 50363
    assert layout.timestamp_begin == 50364
    assert layout.vocab_size == 51865


def test_english_layout_standard_ids():
    layout = SpecialTokenLayout(n_base_vocab=50256, n_languages=99)
    assert layout.eot == 50256
    assert layout.sot == 50257
    assert layout.timestamp_begin == 50363
    assert layout.vocab_size == 51864


def test_large_v3_layout():
    layout = SpecialTokenLayout(n_base_vocab=50257, n_languages=100)
    assert layout.timestamp_begin == 50365
    assert layout.vocab_size == 51866


def test_byte_fallback_roundtrip():
    tok = WhisperTokenizer.byte_fallback()
    text = "Hello, wörld! 123"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    # specials are filtered out of decode
    assert tok.decode([tok.sot] + ids + [tok.eot]) == text


def test_sot_sequence_multilingual():
    tok = WhisperTokenizer.byte_fallback()
    seq = tok.sot_sequence("en", "transcribe", without_timestamps=True)
    assert seq == [50258, 50259, 50359, 50363]
    seq2 = tok.sot_sequence("fr", "translate", without_timestamps=False)
    assert seq2[0] == 50258
    assert seq2[2] == 50358
    assert len(seq2) == 3


def test_sot_sequence_english_only():
    tok = WhisperTokenizer.byte_fallback(multilingual=False)
    seq = tok.sot_sequence(None, without_timestamps=True)
    assert seq == [50257, 50362]  # sot, notimestamps (en layout)


def test_decode_with_timestamps():
    tok = WhisperTokenizer.byte_fallback()
    ids = [tok.timestamp_begin] + tok.encode("hi") + [tok.timestamp_begin + 50]
    out = tok.decode_with_timestamps(ids)
    assert out == "<|0.00|>hi<|1.00|>"


def test_find_numeral_symbol_tokens_byte_fallback():
    tok = WhisperTokenizer.byte_fallback()
    ids = find_numeral_symbol_tokens(tok)
    assert -1 in ids
    # byte tokens for '0'-'9', '%', '$', '£' bytes must be flagged
    assert ord("0") in ids
    assert ord("%") in ids


def test_bpe_with_tiny_vocab_merges():
    # hand-built vocab: bytes + one merge "he"
    table = bytes_to_unicode()
    vocab = {table[b]: b for b in range(256)}
    vocab["he"] = 256
    bpe = ByteLevelBPE(vocab, [("h", "e")])
    ids = bpe.encode("he")
    assert ids == [256]
    assert bpe.decode(ids) == "he"
    ids2 = bpe.encode("hello")
    assert ids2[0] == 256  # "he" merged, rest single bytes
    assert bpe.decode(ids2) == "hello"


def test_from_dir_loads_assets(tmp_path):
    table = bytes_to_unicode()
    vocab = {table[b]: b for b in range(256)}
    vocab["he"] = 256
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\nh e\n")
    tok = WhisperTokenizer.from_dir(str(tmp_path))
    assert tok.layout.n_base_vocab == 257
    assert tok.encode("he") == [256]
    assert tok.decode([256]) == "he"


def test_non_speech_tokens_nonempty():
    tok = WhisperTokenizer.byte_fallback()
    toks = tok.non_speech_tokens()
    assert len(toks) > 5
    assert all(isinstance(t, int) for t in toks)


def test_from_dir_tokenizer_json(tmp_path):
    table = bytes_to_unicode()
    vocab = {table[b]: b for b in range(256)}
    vocab["he"] = 256
    spec = {
        "model": {"type": "BPE", "vocab": vocab, "merges": ["h e"]},
        "added_tokens": [{"content": "<|endoftext|>"}],
    }
    (tmp_path / "tokenizer.json").write_text(json.dumps(spec))
    tok = WhisperTokenizer.from_dir(str(tmp_path))
    assert tok.encode("he") == [256]
    assert tok.decode([256]) == "he"
    assert tok.layout.n_languages == 99


def _openai_whisper_reference_suppress(tok, suppress_tokens):
    """Independent transcription of openai-whisper's
    ``_get_suppress_tokens`` + ``Tokenizer.non_speech_tokens`` (the
    construction the reference relies on via main.py:381-391 and
    faster-whisper's identical get_suppressed_tokens), used to pin
    ``get_suppressed_tokens`` against the published semantics."""
    # non_speech_tokens
    symbols = list('"#()*+/:;<=>@[\\]^_`{|}~「」『』')
    symbols += (
        "<< >> <<< >>> -- --- -( -[ (' (\" (( )) ((( ))) [[ ]] {{ }} "
        "♪♪ ♪♪♪".split()
    )
    miscellaneous = set("♩♪♫♬♭♮♯")
    assert all(0x2640 <= ord(c) <= 0x267F for c in miscellaneous)
    non_speech = {tok.encode(" -")[0], tok.encode(" '")[0]}
    for symbol in symbols + list(miscellaneous):
        for ids in [tok.encode(symbol), tok.encode(" " + symbol)]:
            if len(ids) == 1 or symbol in miscellaneous:
                non_speech.add(ids[0])
    # _get_suppress_tokens
    if isinstance(suppress_tokens, str):
        suppress_tokens = [int(t) for t in suppress_tokens.split(",")]
    else:
        suppress_tokens = list(suppress_tokens)
    if -1 in suppress_tokens:
        suppress_tokens = [t for t in suppress_tokens if t >= 0]
        suppress_tokens.extend(sorted(non_speech))
    suppress_tokens.extend(
        [
            tok.layout.transcribe,
            tok.layout.translate,
            tok.sot,
            tok.layout.startofprev,
            tok.layout.startoflm,
        ]
    )
    suppress_tokens.append(tok.no_speech)
    return tuple(sorted(set(suppress_tokens)))


def test_default_suppress_expands_minus_one():
    """The reference CLI default ``suppress_tokens=[-1]``
    (diarize.py:126-130) must expand to the non-speech list + specials,
    exactly as openai-whisper/faster-whisper construct it."""
    from whisper_nemo_tpu.text.tokenizer import get_suppressed_tokens

    tok = WhisperTokenizer.byte_fallback()
    got = get_suppressed_tokens(tok, (-1,))
    want = _openai_whisper_reference_suppress(tok, [-1])
    assert got == want
    # the expansion actually contains the non-speech ids and specials
    assert set(tok.non_speech_tokens()) <= set(got)
    for special in (
        tok.sot,
        tok.layout.transcribe,
        tok.layout.translate,
        tok.layout.startofprev,
        tok.layout.startoflm,
        tok.no_speech,
    ):
        assert special in got
    # -1 itself never survives into the mask input
    assert -1 not in got


def test_explicit_suppress_list_keeps_ids_and_adds_specials():
    from whisper_nemo_tpu.text.tokenizer import get_suppressed_tokens

    tok = WhisperTokenizer.byte_fallback()
    got = get_suppressed_tokens(tok, [5, 17])
    want = _openai_whisper_reference_suppress(tok, [5, 17])
    assert got == want
    assert 5 in got and 17 in got
    # no non-speech expansion without -1
    assert not set(tok.non_speech_tokens()) <= set(got)


def test_suppress_string_and_empty_forms():
    from whisper_nemo_tpu.text.tokenizer import get_suppressed_tokens

    tok = WhisperTokenizer.byte_fallback()
    # openai-whisper's default is the string "-1"
    assert get_suppressed_tokens(tok, "-1") == get_suppressed_tokens(
        tok, [-1]
    )
    # empty / None: only the always-suppressed specials
    for empty in ((), None, ""):
        got = get_suppressed_tokens(tok, empty)
        assert got == tuple(
            sorted(
                {
                    tok.layout.transcribe,
                    tok.layout.translate,
                    tok.sot,
                    tok.layout.startofprev,
                    tok.layout.startoflm,
                    tok.no_speech,
                }
            )
        )


def test_non_speech_tokens_word_internal_hyphen_allowed():
    """Bare '-' and ''' (word-internal) stay legal; only the
    space-prefixed word-initial forms are suppressed."""
    tok = WhisperTokenizer.byte_fallback()
    ns = set(tok.non_speech_tokens())
    bare_hyphen = tok.encode("-")
    bare_quote = tok.encode("'")
    if len(bare_hyphen) == 1:
        assert bare_hyphen[0] not in ns
    if len(bare_quote) == 1:
        assert bare_quote[0] not in ns
    assert tok.encode(" -")[0] in ns
    assert tok.encode(" '")[0] in ns
