"""Byte-exact golden tests for the output writers.

BASELINE.json asks for "bit-compatible SRT/word-speaker output"; these
pin the full post-processing tail (mapping → realign → sentences →
writers) to exact bytes on a fixed synthetic conversation, so any
formatting regression shows up as a byte diff.
"""

import io

from whisper_nemo_tpu.compat.helpers import (
    get_realigned_ws_mapping_with_punctuation,
    get_sentences_speaker_mapping,
    get_speaker_aware_transcript,
    get_words_speaker_mapping,
    write_srt,
)

WORDS = [
    {"text": "Hello", "start": 0.12, "end": 0.48},
    {"text": "there,", "start": 0.55, "end": 0.91},
    {"text": "how", "start": 1.02, "end": 1.2},
    {"text": "are", "start": 1.25, "end": 1.4},
    {"text": "you?", "start": 1.45, "end": 1.8},
    {"text": "I'm", "start": 2.6, "end": 2.8},
    {"text": "fine.", "start": 2.85, "end": 3.2},
    {"text": "Great", "start": 4.0, "end": 4.3},
    {"text": "to", "start": 4.35, "end": 4.45},
    {"text": "hear.", "start": 4.5, "end": 4.9},
]
TURNS = [[0, 2200, 0], [2200, 3600, 1], [3600, 5000, 0]]

GOLDEN_SRT = (
    # first sentence inherits the first diarization turn's start (0 ms),
    # matching the reference's sentence-grouping seed behavior
    "1\n"
    "00:00:00,000 --> 00:00:01,800\n"
    "Speaker 0: Hello there, how are you?\n"
    "\n"
    "2\n"
    "00:00:02,600 --> 00:00:03,200\n"
    "Speaker 1: I'm fine.\n"
    "\n"
    "3\n"
    "00:00:04,000 --> 00:00:04,900\n"
    "Speaker 0: Great to hear.\n"
    "\n"
)

GOLDEN_TXT = (
    "Speaker 0: Hello there, how are you?  \n"
    "\n"
    "Speaker 1: I'm fine.  \n"
    "\n"
    "Speaker 0: Great to hear.  "
)


def _pipeline_tail():
    wsm = get_words_speaker_mapping(WORDS, TURNS, "start")
    wsm = get_realigned_ws_mapping_with_punctuation(wsm)
    return get_sentences_speaker_mapping(wsm, TURNS)


def test_srt_bytes_golden():
    ssm = _pipeline_tail()
    buf = io.StringIO()
    write_srt(ssm, buf)
    assert buf.getvalue() == GOLDEN_SRT


def test_txt_bytes_golden():
    ssm = _pipeline_tail()
    buf = io.StringIO()
    get_speaker_aware_transcript(ssm, buf)
    assert buf.getvalue() == GOLDEN_TXT


def test_compat_helpers_surface():
    """Every symbol the reference CLI imports resolves here."""
    import whisper_nemo_tpu.compat.helpers as helpers

    for name in (
        "cleanup", "create_config", "find_numeral_symbol_tokens",
        "get_realigned_ws_mapping_with_punctuation",
        "get_sentences_speaker_mapping", "get_speaker_aware_transcript",
        "get_words_speaker_mapping", "langs_to_iso",
        "process_language_arg", "punct_model_langs", "whisper_langs",
        "write_srt", "LANGUAGES", "TO_LANGUAGE_CODE",
        "filter_missing_timestamps", "format_timestamp",
        "get_word_ts_anchor", "sentence_ending_punctuations",
    ):
        assert hasattr(helpers, name), name
