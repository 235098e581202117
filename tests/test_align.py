import numpy as np
import pytest

from whisper_nemo_tpu.align import (
    generate_emissions,
    get_alignments,
    get_spans,
    load_alignment_model,
    postprocess_results,
    preprocess_text,
)
from whisper_nemo_tpu.align.api import AlignmentTokenizer
from whisper_nemo_tpu.align.text import normalize_word
from whisper_nemo_tpu.ops.ctc import add_star_column, forced_align, label_segments


def _brute_force_viterbi(emissions, labels, blank=0):
    """Independent O(T·L) reference DP (numpy, no shortcuts)."""
    T = emissions.shape[0]
    N = len(labels)
    L = 2 * N + 1
    lab = [blank if s % 2 == 0 else labels[(s - 1) // 2] for s in range(L)]
    NEG = -1e30
    alpha = np.full((T, L), NEG)
    back = np.zeros((T, L), np.int64)
    alpha[0, 0] = emissions[0, lab[0]]
    if L > 1:
        alpha[0, 1] = emissions[0, lab[1]]
    for t in range(1, T):
        for s in range(L):
            cands = [alpha[t - 1, s]]
            if s >= 1:
                cands.append(alpha[t - 1, s - 1])
            else:
                cands.append(NEG)
            if s >= 2 and s % 2 == 1 and labels[(s - 1) // 2] != labels[(s - 3) // 2]:
                cands.append(alpha[t - 1, s - 2])
            else:
                cands.append(NEG)
            best = int(np.argmax(cands))
            back[t, s] = best
            alpha[t, s] = emissions[t, lab[s]] + cands[best]
    s = L - 1 if alpha[T - 1, L - 1] >= alpha[T - 1, L - 2] else L - 2
    score = alpha[T - 1, s]
    path = [s]
    for t in range(T - 1, 0, -1):
        s = s - back[t, s]
        path.append(s)
    path = path[::-1]
    frame_labels = np.array(
        [(p - 1) // 2 if p % 2 == 1 else -1 for p in path], np.int32
    )
    return frame_labels, score


def test_viterbi_matches_brute_force():
    rng = np.random.default_rng(0)
    for trial in range(5):
        T, V, N = 40, 6, 5
        emissions = np.log(
            rng.dirichlet(np.ones(V), size=T).astype(np.float32)
        )
        labels = rng.integers(1, V, size=N).astype(np.int32)
        ours_path, ours_score = forced_align(emissions, labels)
        ref_path, ref_score = _brute_force_viterbi(emissions, labels)
        assert ours_score == pytest.approx(ref_score, abs=1e-3)
        np.testing.assert_array_equal(ours_path, ref_path)


def test_viterbi_recovers_planted_alignment():
    # vocab: 0=blank, 1='a', 2='b'; plant 'a' at frames 10-20, 'b' at 30-40
    T, V = 50, 3
    em = np.full((T, V), np.log(0.01), np.float32)
    em[:, 0] = np.log(0.98)
    em[10:20, :] = np.log(0.01)
    em[10:20, 1] = np.log(0.98)
    em[30:40, :] = np.log(0.01)
    em[30:40, 2] = np.log(0.98)
    frame_labels, _ = forced_align(em, np.array([1, 2], np.int32))
    segs = label_segments(frame_labels, em, np.array([1, 2], np.int32))
    assert abs(segs[0]["start"] - 10) <= 1 and abs(segs[0]["end"] - 20) <= 1
    assert abs(segs[1]["start"] - 30) <= 1 and abs(segs[1]["end"] - 40) <= 1
    assert segs[0]["score"] > 0.9


def test_star_column_absorbs_unknown_audio():
    # planted: 'a' 5-10, unknown loud symbol 20-30, 'b' 35-40
    T, V = 45, 4
    em = np.full((T, V), np.log(0.01), np.float32)
    em[:, 0] = np.log(0.97)
    em[5:10, :] = np.log(0.01); em[5:10, 1] = np.log(0.97)
    em[20:30, :] = np.log(0.01); em[20:30, 3] = np.log(0.97)
    em[35:40, :] = np.log(0.01); em[35:40, 2] = np.log(0.97)
    em_star = add_star_column(em)
    star_id = V  # appended column
    labels = np.array([1, star_id, 2], np.int32)
    frame_labels, _ = forced_align(em_star, labels)
    segs = label_segments(frame_labels, em_star, labels)
    assert abs(segs[0]["start"] - 5) <= 1
    assert segs[1]["start"] >= 10 and segs[1]["end"] <= 35
    assert abs(segs[2]["start"] - 35) <= 2


def test_preprocess_text_starring():
    tokens, text = preprocess_text("Hello, wörld!", romanize=True, language="eng")
    assert text == ["<star>", "Hello,", "<star>", "wörld!"]
    assert tokens == ["<star>", "hello", "<star>", "world"]


def test_normalize_word():
    assert normalize_word("Héllo!") == "hello"
    assert normalize_word("DON'T") == "don't"
    assert normalize_word("...") == ""


def test_full_alignment_api_roundtrip():
    """Synthetic emissions spelled from a known transcript must align
    each word close to its planted frames (end-to-end six-function API,
    without the acoustic model)."""
    tok = AlignmentTokenizer()
    transcript = "hi bob"
    tokens_starred, text_starred = preprocess_text(transcript)
    # frames: "hi" chars at 10-14/15-19, "bob" at 30-34/35-39/40-44
    V = len(tok.vocab) - 1
    T = 60
    em = np.full((T, V), np.log(1e-4), np.float32)
    em[:, tok.blank_id] = np.log(0.95)
    plan = [
        (10, 15, "h"), (15, 20, "i"),
        (30, 35, "b"), (35, 40, "o"), (40, 45, "b"),
    ]
    for s, e, c in plan:
        em[s:e, :] = np.log(1e-4)
        em[s:e, tok.vocab[c]] = np.log(0.95)
    segments, scores, blank = get_alignments(em, tokens_starred, tok)
    spans = get_spans(tokens_starred, segments, blank)
    words = postprocess_results(text_starred, spans, stride=1000.0, scores=scores)
    assert [w["text"] for w in words] == ["hi", "bob"]
    assert abs(words[0]["start"] - 10.0) <= 2.0
    assert abs(words[0]["end"] - 20.0) <= 2.0
    assert abs(words[1]["start"] - 30.0) <= 2.0
    assert abs(words[1]["end"] - 45.0) <= 2.0


def test_generate_emissions_shapes():
    model, tok = load_alignment_model("cpu")
    wave = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    emissions, stride = generate_emissions(model, wave, batch_size=2)
    assert emissions.ndim == 2
    assert emissions.shape[1] == len(tok.vocab) - 1
    # log-softmax rows sum to ~1 in prob space
    np.testing.assert_allclose(
        np.exp(emissions[0]).sum(), 1.0, atol=1e-3
    )
    # ~20 ms per frame for wav2vec2 stride 320
    assert 15 < stride < 25
