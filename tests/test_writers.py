import io

from whisper_nemo_tpu.post import (
    format_timestamp,
    get_speaker_aware_transcript,
    write_srt,
)


def test_format_timestamp_no_hours():
    assert format_timestamp(0) == "00:00.000"
    assert format_timestamp(61_500) == "01:01.500"


def test_format_timestamp_hours():
    assert format_timestamp(3_600_000) == "01:00:00.000"
    assert format_timestamp(3_600_000, always_include_hours=False) == "01:00:00.000"
    assert format_timestamp(500, always_include_hours=True) == "00:00:00.500"


def test_format_timestamp_comma_marker():
    assert (
        format_timestamp(3_723_456, always_include_hours=True, decimal_marker=",")
        == "01:02:03,456"
    )


def test_write_srt_block_format():
    sentences = [
        {
            "speaker": "Speaker 0",
            "start_time": 0,
            "end_time": 1500,
            "text": "Hello there. ",
        },
        {
            "speaker": "Speaker 1",
            "start_time": 1500,
            "end_time": 3000,
            "text": "General --> Kenobi ",
        },
    ]
    buf = io.StringIO()
    write_srt(sentences, buf)
    out = buf.getvalue()
    assert "1\n00:00:00,000 --> 00:00:01,500\nSpeaker 0: Hello there.\n" in out
    # --> inside cue text is sanitized
    assert "Speaker 1: General -> Kenobi" in out


def test_speaker_aware_transcript_paragraphs():
    sentences = [
        {"speaker": "Speaker 0", "text": "Hi. "},
        {"speaker": "Speaker 0", "text": "More. "},
        {"speaker": "Speaker 1", "text": "Reply. "},
    ]
    buf = io.StringIO()
    get_speaker_aware_transcript(sentences, buf)
    assert buf.getvalue() == "Speaker 0: Hi.  More.  \n\nSpeaker 1: Reply.  "
