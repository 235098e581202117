from whisper_nemo_tpu.post import (
    filter_missing_timestamps,
    get_realigned_ws_mapping_with_punctuation,
    get_sentences_speaker_mapping,
    get_word_ts_anchor,
    get_words_speaker_mapping,
)


def wts(items):
    return [{"text": t, "start": s, "end": e} for t, s, e in items]


def test_anchor_options():
    assert get_word_ts_anchor(1.0, 3.0, "start") == 1.0
    assert get_word_ts_anchor(1.0, 3.0, "end") == 3.0
    assert get_word_ts_anchor(1.0, 3.0, "mid") == 2.0


def test_words_speaker_mapping_basic():
    words = wts([("hello", 0.1, 0.4), ("world", 0.5, 0.9), ("bye", 1.2, 1.5)])
    turns = [[0, 1000, 0], [1000, 2000, 1]]
    out = get_words_speaker_mapping(words, turns, "start")
    assert [w["speaker"] for w in out] == [0, 0, 1]
    assert out[0] == {
        "word": "hello",
        "start_time": 100,
        "end_time": 400,
        "speaker": 0,
    }


def test_words_after_final_turn_absorbed_by_last_speaker():
    words = wts([("a", 0.1, 0.2), ("b", 5.0, 5.5), ("c", 9.0, 9.5)])
    turns = [[0, 1000, 0], [1000, 2000, 1]]
    out = get_words_speaker_mapping(words, turns, "start")
    assert [w["speaker"] for w in out] == [0, 1, 1]


def test_words_mapping_skips_intermediate_turns():
    words = wts([("a", 0.0, 0.1), ("b", 3.5, 3.9)])
    turns = [[0, 1000, 0], [1000, 2000, 1], [2000, 3000, 2], [3000, 4000, 3]]
    out = get_words_speaker_mapping(words, turns, "start")
    assert [w["speaker"] for w in out] == [0, 3]


def _wsm(words_speakers):
    # word list with synthetic timings 0.1s apart
    out = []
    for i, (w, s) in enumerate(words_speakers):
        out.append(
            {
                "word": w,
                "start_time": i * 100,
                "end_time": i * 100 + 90,
                "speaker": s,
            }
        )
    return out


def test_realignment_fixes_mid_sentence_flip():
    # Sentence "I am very happy today." has a single-word flip to spk 1;
    # majority speaker 0 holds >= half the words -> whole sentence -> 0.
    wsm = _wsm(
        [
            ("I", 0),
            ("am", 0),
            ("very", 1),
            ("happy", 0),
            ("today.", 0),
            ("Yes.", 1),
        ]
    )
    out = get_realigned_ws_mapping_with_punctuation(wsm)
    assert [w["speaker"] for w in out] == [0, 0, 0, 0, 0, 1]


def test_realignment_preserves_sentence_boundary_change():
    wsm = _wsm([("Hello.", 0), ("Hi.", 1)])
    out = get_realigned_ws_mapping_with_punctuation(wsm)
    assert [w["speaker"] for w in out] == [0, 1]


def test_realignment_does_not_mutate_input():
    wsm = _wsm([("I", 0), ("am", 1), ("here.", 0)])
    before = [w["speaker"] for w in wsm]
    get_realigned_ws_mapping_with_punctuation(wsm)
    assert [w["speaker"] for w in wsm] == before


def test_sentence_grouping_splits_on_speaker_change():
    wsm = _wsm([("Hello", 0), ("there", 0), ("General", 1), ("Kenobi", 1)])
    turns = [[0, 150, 0], [150, 400, 1]]
    sentences = get_sentences_speaker_mapping(wsm, turns)
    assert len(sentences) == 2
    assert sentences[0]["speaker"] == "Speaker 0"
    assert sentences[0]["text"] == "Hello there "
    assert sentences[1]["speaker"] == "Speaker 1"
    assert sentences[1]["text"] == "General Kenobi "
    # first sentence start comes from the first turn, not the first word
    assert sentences[0]["start_time"] == 0


def test_sentence_grouping_splits_on_punkt_break():
    wsm = _wsm([("Hello.", 0), ("How", 0), ("are", 0), ("you", 0)])
    turns = [[0, 400, 0]]
    sentences = get_sentences_speaker_mapping(wsm, turns)
    assert len(sentences) == 2
    assert sentences[0]["text"] == "Hello. "
    assert sentences[1]["text"] == "How are you "


def test_filter_missing_timestamps_fills_gaps():
    words = [
        {"word": "a", "start": 0.0, "end": 1.0},
        {"word": "b", "start": None, "end": None},
        {"word": "c", "start": 2.0, "end": 3.0},
    ]
    out = filter_missing_timestamps(words, final_timestamp=3.0)
    assert len(out) == 3
    assert out[1]["start"] == 1.0
    assert out[1]["end"] == 2.0


def test_filter_missing_timestamps_merges_tailless_words():
    words = [
        {"word": "a", "start": 0.0, "end": 1.0},
        {"word": "b", "start": None, "end": None},
        {"word": "c", "start": None, "end": None},
        {"word": "d", "start": 4.0, "end": 5.0},
    ]
    out = filter_missing_timestamps(words, final_timestamp=5.0)
    # "c" has no timestamp and is merged into "b"
    assert [w["word"] for w in out] == ["a", "b c", "d"]
    assert out[1]["start"] == 1.0
    assert out[1]["end"] == 4.0
