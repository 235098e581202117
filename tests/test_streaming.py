"""LocalAgreement-2 streaming transcriber (engine/streaming.py)."""

import numpy as np
import pytest

from whisper_nemo_tpu.engine.streaming import (
    SAMPLE_RATE,
    CommittedWord,
    StreamingTranscriber,
)


class _Seg:
    def __init__(self, start, end, text):
        self.start, self.end, self.text = start, end, text


class _ScriptedASR:
    """Returns the scripted hypothesis for the current buffer length —
    simulates a model whose tail flickers while its prefix stabilizes."""

    def __init__(self, script):
        self.script = script  # {min_seconds: [(start, end, text)]}

    def __call__(self, buffer):
        secs = len(buffer) / SAMPLE_RATE
        best = []
        for t in sorted(self.script):
            if secs >= t:
                best = self.script[t]
        return [_Seg(*s) for s in best]


def _push_seconds(st, seconds):
    return st.push(np.zeros(int(seconds * SAMPLE_RATE), np.float32))


def test_words_commit_only_after_two_agreeing_hypotheses():
    asr = _ScriptedASR({
        1.0: [(0.0, 1.0, "hello wor")],          # tail still flickering
        2.0: [(0.0, 2.0, "hello world how")],    # agrees on "hello"
        3.0: [(0.0, 3.0, "hello world how are")],
    })
    st = StreamingTranscriber(transcribe_fn=asr, min_refresh_s=1.0)

    out1 = _push_seconds(st, 1.0)
    assert out1 == []  # first hypothesis: nothing to agree with

    out2 = _push_seconds(st, 1.0)
    assert [w.word for w in out2] == ["hello"]  # "wor" vs "world" differ

    out3 = _push_seconds(st, 1.0)
    assert [w.word for w in out3] == ["world", "how"]
    assert st.text == "hello world how"

    tail = st.flush()
    assert [w.word for w in tail] == ["are"]
    assert st.text == "hello world how are"


def test_committed_words_never_change_or_duplicate():
    asr = _ScriptedASR({
        1.0: [(0.0, 1.0, "one two")],
        2.0: [(0.0, 2.0, "one two three")],
        3.0: [(0.0, 3.0, "one two three four")],
    })
    st = StreamingTranscriber(transcribe_fn=asr, min_refresh_s=1.0)
    all_words = []
    for _ in range(3):
        all_words.extend(w.word for w in _push_seconds(st, 1.0))
    all_words.extend(w.word for w in st.flush())
    assert all_words == ["one", "two", "three", "four"]
    # monotone, non-overlapping times
    times = [(w.start, w.end) for w in st.committed]
    assert all(a[1] <= b[0] + 1e-6 for a, b in zip(times, times[1:]))


def test_small_chunks_batch_until_min_refresh():
    calls = []

    def asr(buffer):
        calls.append(len(buffer))
        return [_Seg(0.0, len(buffer) / SAMPLE_RATE, "x " * 3)]

    st = StreamingTranscriber(transcribe_fn=asr, min_refresh_s=1.0)
    for _ in range(9):  # 9 × 0.1 s < 1 s → no refresh yet
        assert st.push(np.zeros(1600, np.float32)) == []
    assert calls == []
    st.push(np.zeros(1600, np.float32))  # crosses 1 s
    assert len(calls) == 1


def test_buffer_trims_past_committed_frontier():
    def asr(buffer):
        secs = len(buffer) / SAMPLE_RATE
        words = " ".join(f"w{i}" for i in range(int(secs)))
        return [_Seg(0.0, secs, words)] if words else []

    st = StreamingTranscriber(transcribe_fn=asr, min_refresh_s=1.0)
    for _ in range(40):  # 40 s of audio, 1 s pushes
        _push_seconds(st, 1.0)
    # buffer must stay bounded (static decode shapes)
    assert len(st._buffer) / SAMPLE_RATE <= 29.0
    assert st._buffer_offset > 0.0


def test_streaming_with_real_engine_smoke():
    """End-to-end through a tiny random-weight engine: empty or not,
    it must run without error and keep the committed list consistent."""
    from whisper_nemo_tpu.engine.transcribe import WhisperEngine

    engine = WhisperEngine("tiny.en", compute_type="float32")
    st = StreamingTranscriber(engine, language="en", min_refresh_s=2.0)
    rng = np.random.default_rng(0)
    for _ in range(3):
        st.push((rng.standard_normal(SAMPLE_RATE) * 0.2).astype(np.float32))
    st.flush()
    for w in st.committed:
        assert isinstance(w, CommittedWord)
        assert w.end >= w.start >= 0.0


def test_agreement_n_one_commits_immediately():
    """agreement_n=1 (latency-optimal): every refresh's words commit
    without waiting for a second agreeing hypothesis."""
    asr = _ScriptedASR({
        1.0: [(0.0, 1.0, "hello world")],
        2.0: [(0.0, 2.0, "hello world how")],
    })
    st = StreamingTranscriber(
        transcribe_fn=asr, min_refresh_s=1.0, agreement_n=1
    )
    out1 = _push_seconds(st, 1.0)
    assert [w.word for w in out1] == ["hello", "world"]
    out2 = _push_seconds(st, 1.0)
    assert [w.word for w in out2] == ["how"]
    assert st.text == "hello world how"


def test_agreement_n_three_needs_three_hypotheses():
    """agreement_n=3: a word commits only once THREE consecutive
    hypotheses agree on it."""
    asr = _ScriptedASR({
        1.0: [(0.0, 1.0, "hello wor")],
        2.0: [(0.0, 2.0, "hello world")],
        3.0: [(0.0, 3.0, "hello world how")],
        4.0: [(0.0, 4.0, "hello world how are")],
    })
    st = StreamingTranscriber(
        transcribe_fn=asr, min_refresh_s=1.0, agreement_n=3
    )
    assert _push_seconds(st, 1.0) == []
    assert _push_seconds(st, 1.0) == []  # "wor"/"world" broke the run
    out3 = _push_seconds(st, 1.0)
    assert [w.word for w in out3] == ["hello"]  # 3 consecutive agree
    out4 = _push_seconds(st, 1.0)
    assert [w.word for w in out4] == ["world"]


def test_agreement_n_validation():
    with pytest.raises(ValueError, match="agreement_n"):
        StreamingTranscriber(transcribe_fn=lambda b: [], agreement_n=0)
