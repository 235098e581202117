import numpy as np
import pytest

from whisper_nemo_tpu.align.api import AlignmentTokenizer
from whisper_nemo_tpu.align.segmented import (
    _bucket,
    _prepare_item,
    _trellis_arrays,
    align_segments,
)
from whisper_nemo_tpu.ops.ctc import NEG_INF, add_star_column, forced_align


def test_bucket():
    assert _bucket(100, (128, 256)) == 128
    assert _bucket(128, (128, 256)) == 128
    assert _bucket(129, (128, 256)) == 256
    assert _bucket(9999, (128, 256)) == 256


def test_padded_alignment_matches_unpadded():
    """Bucketing/padding must not change the Viterbi result on the real
    frames: compare against direct forced_align on the exact shapes."""
    tok = AlignmentTokenizer()
    rng = np.random.default_rng(0)
    V = len(tok.vocab) - 1
    T, chars = 60, "hello"
    em = np.full((T, V), np.log(1e-4), np.float32)
    em[:, tok.blank_id] = np.log(0.9)
    labels = np.array([tok.vocab[c] for c in chars], np.int32)
    for i, c in enumerate(chars):
        s = 10 + i * 8
        em[s : s + 8, :] = np.log(1e-4)
        em[s : s + 8, tok.vocab[c]] = np.log(0.9)
    em_star = add_star_column(em, tok.blank_id)

    direct, _ = forced_align(em_star, labels, tok.blank_id)

    em_pad, labels_ext, _ = _prepare_item(em_star, labels, 128, 32)
    sl, sk = _trellis_arrays(labels_ext, tok.blank_id)
    import jax.numpy as jnp

    from whisper_nemo_tpu.align.segmented import _viterbi_batch

    paths = np.asarray(
        _viterbi_batch(
            jnp.asarray(em_pad[None]), jnp.asarray(sl[None]),
            jnp.asarray(sk[None]),
        )
    )[0][:T]
    frame_labels = np.where(paths % 2 == 1, (paths - 1) // 2, -1)
    frame_labels = np.where(frame_labels < len(labels), frame_labels, -1)
    np.testing.assert_array_equal(frame_labels, direct)


class _FakeModel:
    """Emission-level fake so the test controls the acoustics exactly."""


def test_align_segments_end_to_end(monkeypatch):
    tok = AlignmentTokenizer()
    V = len(tok.vocab) - 1
    stride = 20.0  # ms
    T = 500  # 10 s
    em = np.full((T, V), np.log(1e-4), np.float32)
    em[:, tok.blank_id] = np.log(0.9)

    # "hi" at 1.0-1.4s, "yo" at 6.0-6.4s
    plan = [(50, "h"), (60, "i"), (300, "y"), (310, "o")]
    for s, c in plan:
        em[s : s + 10, :] = np.log(1e-4)
        em[s : s + 10, tok.vocab[c]] = np.log(0.9)

    import whisper_nemo_tpu.align.segmented as seg_mod

    monkeypatch.setattr(
        seg_mod,
        "generate_emissions",
        lambda m, a, b, device=False: (em, stride),
    )

    segments = [
        {"start": 0.8, "end": 2.0, "text": "hi"},
        {"start": 5.5, "end": 7.0, "text": "yo"},
    ]
    words = align_segments(None, tok, np.zeros(160000, np.float32), segments)
    assert [w["text"] for w in words] == ["hi", "yo"]
    assert abs(words[0]["start"] - 1.0) < 0.15
    assert abs(words[0]["end"] - 1.4) < 0.15
    assert abs(words[1]["start"] - 6.0) < 0.15
    assert abs(words[1]["end"] - 6.4) < 0.15
    assert all(w["score"] > 0.5 for w in words)


def test_align_segments_chunked_matches_unchunked(monkeypatch):
    """A tiny _GROUP_BYTES_BUDGET forces one-row chunks (with pow-2 row
    padding); results must be identical to the unchunked dispatch —
    the 4 h bench OOM fix must not change any timestamp."""
    tok = AlignmentTokenizer()
    V = len(tok.vocab) - 1
    stride = 20.0
    T = 1500
    rng = np.random.default_rng(7)
    em = np.log(1e-4) * np.ones((T, V), np.float32)
    em[:, tok.blank_id] = np.log(0.9)
    words_plan = [(100 + 180 * i, "hey") for i in range(6)]
    for s, word in words_plan:
        for j, c in enumerate(word):
            f = s + j * 8
            em[f : f + 8, :] = np.log(1e-4)
            em[f : f + 8, tok.vocab[c]] = np.log(0.9)

    import whisper_nemo_tpu.align.segmented as seg_mod

    monkeypatch.setattr(
        seg_mod,
        "generate_emissions",
        lambda m, a, b, device=False: (em, stride),
    )
    segments = [
        {"start": max(0.0, (s - 20) * stride / 1000),
         "end": (s + 40) * stride / 1000, "text": "hey"}
        for s, _ in words_plan
    ]
    audio = np.zeros(int(T * stride / 1000 * 16000), np.float32)

    base = align_segments(None, tok, audio, segments)
    monkeypatch.setattr(seg_mod, "_GROUP_BYTES_BUDGET", 1.0)
    chunked = align_segments(None, tok, audio, segments)

    assert len(base) == len(chunked) == 6
    for a, b in zip(base, chunked):
        assert a == b


def test_label_segments_vectorized_matches_loop():
    """The scatter-reduction span/score computation equals the original
    per-frame loop on CTC-shaped paths (contiguous runs, blank gaps,
    and labels that received no frames)."""
    from whisper_nemo_tpu.align.segmented import _label_segments_from_scores

    rng = np.random.default_rng(11)
    n = 12
    frame_labels = np.full(60, -1, np.int64)
    t = 2
    for i in range(n):
        if i in (3, 7, 8):  # no frames for these labels
            continue
        run = rng.integers(1, 5)
        frame_labels[t : t + run] = i
        t += run + rng.integers(0, 3)  # blank gap
    frame_scores = rng.standard_normal(60) - 1.0
    labels = rng.integers(0, 30, n)

    def loop_reference():
        starts = np.full(n, -1, np.int64)
        ends = np.full(n, -1, np.int64)
        for tt, li in enumerate(frame_labels):
            if li >= 0:
                if starts[li] < 0:
                    starts[li] = tt
                ends[li] = tt + 1
        out, prev_end = [], 0
        for i in range(n):
            s, e = starts[i], ends[i]
            if s < 0:
                s = e = prev_end
            score = (
                float(np.exp(frame_scores[s:e]).mean()) if e > s else 0.0
            )
            out.append(
                {"label": int(labels[i]), "start": int(s),
                 "end": int(e), "score": score}
            )
            prev_end = e
        return out

    got = _label_segments_from_scores(frame_labels, frame_scores, labels)
    ref = loop_reference()
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert g["label"] == r["label"]
        assert g["start"] == r["start"] and g["end"] == r["end"]
        assert abs(g["score"] - r["score"]) < 1e-12


def test_device_blocks_match_prepare_item():
    """_viterbi_group_device's on-device block assembly must reproduce
    _prepare_item's layout exactly, and its returned per-frame scores
    must equal the emissions the host oracle would have read."""
    import jax
    import jax.numpy as jnp

    from whisper_nemo_tpu.align.segmented import (
        _T_BUCKETS,
        _extend_labels,
        _viterbi_batch,
        _viterbi_group_device,
    )
    from whisper_nemo_tpu.ops.ctc import (
        _gather_state_emissions,
    )

    tok = AlignmentTokenizer()
    rng = np.random.default_rng(7)
    V = len(tok.vocab) - 1
    T_full = 700
    em_full = rng.standard_normal((T_full, V)).astype(np.float32)
    em_star = add_star_column(em_full, tok.blank_id)
    v = em_star.shape[1]

    t_b, l_b = 128, 32
    spans = [(0, 100), (50, 178), (600, 700), (650, 700)]
    labels_list = [
        np.asarray(rng.integers(1, V, size=n), np.int32)
        for n in (5, 12, 3, 30)
    ]

    # host oracle blocks
    host_blocks, slabels, skips = [], [], []
    for (t0, t1), labels in zip(spans, labels_list):
        from whisper_nemo_tpu.align.segmented import (
            _prepare_item,
            _trellis_arrays,
        )

        em_blk, labels_ext, _ = _prepare_item(
            em_star[t0:t1], labels, t_b, l_b
        )
        sl, sk = _trellis_arrays(labels_ext, tok.blank_id)
        host_blocks.append(em_blk)
        slabels.append(sl)
        skips.append(sk)

    em_pad = jnp.pad(
        jnp.asarray(em_star), ((0, _T_BUCKETS[-1]), (0, 0)),
        constant_values=np.float32(
            __import__("whisper_nemo_tpu.ops.ctc", fromlist=["NEG_INF"]).NEG_INF
        ),
    )
    t0s = jnp.asarray([s for s, _ in spans], jnp.int32)
    t_effs = jnp.asarray(
        [min(t1 - t0, t_b) for t0, t1 in spans], jnp.int32
    )
    paths_dev, scores_dev = _viterbi_group_device(
        em_pad, t0s, t_effs,
        jnp.asarray(np.stack(slabels)), jnp.asarray(np.stack(skips)),
        t_b=t_b, l_b=l_b,
    )

    # paths must match the host-block viterbi bit-for-bit
    paths_host = np.asarray(
        _viterbi_batch(
            jnp.asarray(np.stack(host_blocks)),
            jnp.asarray(np.stack(slabels)),
            jnp.asarray(np.stack(skips)),
        )
    )
    np.testing.assert_array_equal(np.asarray(paths_dev), paths_host)

    # scores must equal the emissions the host oracle reads
    e_states = jax.vmap(_gather_state_emissions)(
        jnp.asarray(np.stack(host_blocks)), jnp.asarray(np.stack(slabels))
    )
    expected = np.take_along_axis(
        np.asarray(e_states), paths_host[:, :, None], axis=2
    )[..., 0]
    np.testing.assert_allclose(
        np.asarray(scores_dev), expected, rtol=0, atol=0
    )


def test_align_segments_carries_segment_index(monkeypatch):
    """Every word row records which input segment it aligned under,
    even when segments are adjacent (shared margin audio)."""
    tok = AlignmentTokenizer()
    V = len(tok.vocab) - 1
    stride = 20.0
    T = 500
    em = np.full((T, V), np.log(1e-4), np.float32)
    em[:, tok.blank_id] = np.log(0.9)
    plan = [(50, "h"), (60, "i"), (110, "y"), (120, "o")]
    for s, c in plan:
        em[s : s + 10, :] = np.log(1e-4)
        em[s : s + 10, tok.vocab[c]] = np.log(0.9)

    import whisper_nemo_tpu.align.segmented as seg_mod

    monkeypatch.setattr(
        seg_mod,
        "generate_emissions",
        lambda m, a, b, device=False: (em, stride),
    )
    # adjacent segments: "yo" starts 0.2 s after "hi" ends — inside the
    # 0.5 s alignment margin AND inside the old ±0.6 s attachment window
    segments = [
        {"start": 0.9, "end": 2.3, "text": "hi"},
        {"start": 2.1, "end": 2.6, "text": "yo"},
    ]
    words = align_segments(None, tok, np.zeros(160000, np.float32), segments)
    assert [w["text"] for w in words] == ["hi", "yo"]
    assert [w["segment"] for w in words] == [0, 1]


def test_attach_word_timestamps_exact_partition(monkeypatch):
    """faster-whisper contract: each aligned word attaches to exactly
    one segment — the one whose text produced it — even at segment
    boundaries where a time-window filter would attach it to both
    neighbors or to neither (VERDICT r3 weak #6)."""
    from whisper_nemo_tpu.asr import faster_whisper_api as fw_api
    from whisper_nemo_tpu.engine.transcribe import Segment

    segments = [
        Segment(id=0, seek=0, start=0.0, end=2.0, text=" hello there", tokens=[]),
        Segment(id=1, seek=0, start=2.0, end=4.0, text=" world", tokens=[]),
        Segment(id=2, seek=0, start=4.0, end=5.0, text="   ", tokens=[]),  # blank
    ]

    # words straddling the boundary: "there" ends at 2.1 (past its
    # segment), "world" starts at 1.9 (before its own) — both inside
    # the other segment's ±0.6 s window, so the old heuristic
    # double-attached them
    fake_words = [
        {"text": "hello", "start": 0.2, "end": 0.8, "score": 0.9,
         "segment": 0},
        {"text": "there", "start": 1.5, "end": 2.1, "score": 0.8,
         "segment": 0},
        {"text": "world", "start": 1.9, "end": 3.0, "score": 0.7,
         "segment": 1},
    ]

    import whisper_nemo_tpu.align.api as align_api
    import whisper_nemo_tpu.align.segmented as seg_mod

    monkeypatch.setattr(
        align_api, "load_alignment_model",
        lambda dev, dtype=None: (None, None)
    )
    monkeypatch.setattr(
        seg_mod, "align_segments", lambda *a, **k: fake_words
    )

    fw_api._attach_word_timestamps(
        segments, np.zeros(16000, np.float32), "en"
    )

    assert [w.word for w in segments[0].words] == ["hello", "there"]
    assert [w.word for w in segments[1].words] == ["world"]
    assert segments[2].words == []
    # exactly-once: total attached count equals aligned count
    total = sum(len(s.words) for s in segments)
    assert total == len(fake_words)


def test_word_probability_range_and_semantics(monkeypatch):
    """``Word.probability`` is a [0,1] mean CTC posterior (documented
    divergence from faster-whisper's attention-DTW probability —
    VERDICT r4 weak #6); out-of-range aligner scores are clamped."""
    from whisper_nemo_tpu.asr import faster_whisper_api as fw_api
    from whisper_nemo_tpu.engine.transcribe import Segment

    segments = [
        Segment(id=0, seek=0, start=0.0, end=2.0, text=" a b c", tokens=[]),
    ]
    fake_words = [
        {"text": "a", "start": 0.1, "end": 0.4, "score": 0.93, "segment": 0},
        {"text": "b", "start": 0.5, "end": 0.9, "score": 1.0000004,
         "segment": 0},  # fp noise past 1
        {"text": "c", "start": 1.0, "end": 1.4, "score": -1e-9, "segment": 0},
    ]

    import whisper_nemo_tpu.align.api as align_api
    import whisper_nemo_tpu.align.segmented as seg_mod

    monkeypatch.setattr(
        align_api, "load_alignment_model",
        lambda dev, dtype=None: (None, None)
    )
    monkeypatch.setattr(
        seg_mod, "align_segments", lambda *a, **k: fake_words
    )
    fw_api._attach_word_timestamps(
        segments, np.zeros(16000, np.float32), "en"
    )
    probs = [w.probability for w in segments[0].words]
    assert probs[0] == pytest.approx(0.93)
    assert all(0.0 <= p <= 1.0 for p in probs)
    assert probs[1] == 1.0 and probs[2] == 0.0
    assert "CTC posterior" in fw_api.Word.__doc__
