import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_nemo_tpu.models.punctuation import (
    PUNCT_LABELS,
    PunctuationModel,
    XlmRobertaDims,
    convert_hf_xlmr_state_dict,
    init_xlmr_params,
    token_classifier_logits,
)


def test_xlmr_parity_with_transformers():
    import torch
    from transformers import (
        XLMRobertaConfig,
        XLMRobertaForTokenClassification,
    )

    torch.manual_seed(0)
    cfg = XLMRobertaConfig(
        vocab_size=300,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
        num_labels=6,
        pad_token_id=1,
    )
    model = XLMRobertaForTokenClassification(cfg).eval()
    dims = XlmRobertaDims(
        vocab_size=300, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_positions=64, num_labels=6,
    )
    params = convert_hf_xlmr_state_dict(model.state_dict(), dims)

    rng = np.random.default_rng(0)
    ids = rng.integers(5, 300, size=(2, 10)).astype(np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        theirs = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).logits.numpy()
    ours = np.asarray(
        token_classifier_logits(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask), dims
        )
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_punctuation_model_predict_contract():
    model = PunctuationModel()
    words = ["hello", "world", "how", "are", "you"]
    labeled = model.predict(words, chunk_size=3)
    assert len(labeled) == 5
    for (word, label, score), orig in zip(labeled, words):
        assert word == orig
        assert label in PUNCT_LABELS
        assert 0.0 <= score <= 1.0


def test_punctuation_model_empty():
    model = PunctuationModel()
    assert model.predict([]) == []


def test_punctuation_overlapped_chunking_covers_all_words():
    """Long input steps by chunk−2·overlap; every word gets exactly one
    label, in order, and edge words take labels from interior context."""
    model = PunctuationModel()
    words = [f"w{i}" for i in range(57)]
    labeled = model.predict(words, chunk_size=10, overlap=3)
    assert [w for w, _, _ in labeled] == words
    assert all(l in PUNCT_LABELS and 0 <= s <= 1 for _, l, s in labeled)
    # single-chunk path agrees with itself (deterministic batching)
    again = model.predict(words, chunk_size=10, overlap=3)
    assert labeled == again


def test_punctuation_overlap_clamped_for_tiny_chunks():
    model = PunctuationModel()
    words = list("abcdefgh")
    labeled = model.predict(words, chunk_size=3)  # overlap 5 → clamped 1
    assert [w for w, _, _ in labeled] == words
