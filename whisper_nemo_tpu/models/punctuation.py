"""Punctuation restoration: XLM-RoBERTa token classifier in JAX.

Replacement for the reference's ``deepmultilingualpunctuation``
dependency (SURVEY D6; call sites diarize.py:222-244): a
token-classification model over word chunks predicting one of
``0 . , ? - :`` per word. ``PunctuationModel.predict(words,
chunk_size=230)`` returns ``(word, label, score)`` tuples — label read
at index 1 by the pipeline.

Architecture: standard XLM-R encoder (learned positions at offset 2,
post-LN transformer, GELU) + linear tag head; converter maps HF
``XLMRobertaForTokenClassification`` state dicts. Tokenization: a HF
``tokenizers`` tokenizer.json when present next to the checkpoint,
else a deterministic hash fallback (sufficient for pipeline plumbing;
meaningful labels require converted weights + the real tokenizer).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.checkpoint import load_params, model_cache_dir
from ..utils import get_logger

logger = get_logger(__name__)

PUNCT_LABELS = ["0", ".", ",", "?", "-", ":"]


@dataclass(frozen=True)
class XlmRobertaDims:
    vocab_size: int = 250002
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 514
    pad_token_id: int = 1
    num_labels: int = 6


def _ln(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]).astype(
        x.dtype
    )


def _linear(p, x):
    return (
        jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
        + p["b"]
    ).astype(x.dtype)


def token_classifier_logits(
    params: Dict[str, Any],
    input_ids: jnp.ndarray,  # [B, T]
    attention_mask: jnp.ndarray,  # [B, T]
    dims: XlmRobertaDims,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """[B, T] token ids → [B, T, num_labels] fp32 logits."""
    b, t = input_ids.shape
    # roberta position ids: pad tokens keep pad position; others count
    # from offset 2 over non-pad tokens
    positions = (
        jnp.cumsum(attention_mask, axis=1) * attention_mask
        + dims.pad_token_id
    ).astype(jnp.int32)
    x = (
        params["tok_emb"][input_ids]
        + params["pos_emb"][positions]
        + params["type_emb"]  # single token type: constant row
    ).astype(dtype)
    x = _ln(params["emb_ln"], x)

    big_neg = jnp.asarray(-1e9, jnp.float32)
    attn_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, big_neg)

    n_heads = dims.num_heads
    hd = dims.hidden_size // n_heads
    for blk in params["layers"]:
        q = _linear(blk["attn"]["q"], x).reshape(b, t, n_heads, hd)
        k = _linear(blk["attn"]["k"], x).reshape(b, t, n_heads, hd)
        v = _linear(blk["attn"]["v"], x).reshape(b, t, n_heads, hd)
        logits = (
            jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            )
            / np.sqrt(hd)
            + attn_bias
        )
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, -1)
        x = _ln(blk["attn_ln"], x + _linear(blk["attn"]["o"], attn))
        h = _linear(
            blk["ff_out"],
            jax.nn.gelu(_linear(blk["ff_in"], x), approximate=False),
        )
        x = _ln(blk["ff_ln"], x + h)
    return _linear(params["head"], x).astype(jnp.float32)


def init_xlmr_params(key, dims: XlmRobertaDims) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 8 + 8 * dims.num_layers))
    d = dims.hidden_size

    def lin(d_in, d_out):
        return {
            "w": jax.random.normal(next(keys), (d_in, d_out)) * (d_in**-0.5),
            "b": jnp.zeros((d_out,)),
        }

    def ln():
        return {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}

    layers = []
    for _ in range(dims.num_layers):
        layers.append(
            {
                "attn": {
                    "q": lin(d, d), "k": lin(d, d),
                    "v": lin(d, d), "o": lin(d, d),
                },
                "attn_ln": ln(),
                "ff_in": lin(d, dims.intermediate_size),
                "ff_out": lin(dims.intermediate_size, d),
                "ff_ln": ln(),
            }
        )
    return {
        "tok_emb": jax.random.normal(next(keys), (dims.vocab_size, d)) * 0.02,
        "pos_emb": jax.random.normal(next(keys), (dims.max_positions, d))
        * 0.02,
        "type_emb": jnp.zeros((d,)),
        "emb_ln": ln(),
        "layers": layers,
        "head": lin(d, dims.num_labels),
    }


def convert_hf_xlmr_state_dict(sd: Mapping, dims: XlmRobertaDims) -> Dict:
    """HF ``XLMRobertaForTokenClassification.state_dict()`` → params."""

    def t(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x, np.float32)

    def lin(prefix):
        return {"w": t(sd[f"{prefix}.weight"]).T, "b": t(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"g": t(sd[f"{prefix}.weight"]), "b": t(sd[f"{prefix}.bias"])}

    pre = "roberta."
    layers = []
    for i in range(dims.num_layers):
        lp = f"{pre}encoder.layer.{i}"
        layers.append(
            {
                "attn": {
                    "q": lin(f"{lp}.attention.self.query"),
                    "k": lin(f"{lp}.attention.self.key"),
                    "v": lin(f"{lp}.attention.self.value"),
                    "o": lin(f"{lp}.attention.output.dense"),
                },
                "attn_ln": ln(f"{lp}.attention.output.LayerNorm"),
                "ff_in": lin(f"{lp}.intermediate.dense"),
                "ff_out": lin(f"{lp}.output.dense"),
                "ff_ln": ln(f"{lp}.output.LayerNorm"),
            }
        )
    return {
        "tok_emb": t(sd[f"{pre}embeddings.word_embeddings.weight"]),
        "pos_emb": t(sd[f"{pre}embeddings.position_embeddings.weight"]),
        "type_emb": t(sd[f"{pre}embeddings.token_type_embeddings.weight"])[0],
        "emb_ln": ln(f"{pre}embeddings.LayerNorm"),
        "layers": layers,
        "head": lin("classifier"),
    }


class _HashTokenizer:
    """Deterministic fallback: one token per word, id by hash.

    Keeps the predict() plumbing runnable with random weights; replaced
    by the real tokenizer.json when model assets are installed.
    """

    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size

    def encode_words(self, words: Sequence[str]) -> Tuple[List[int], List[int]]:
        ids = [
            (hash(w) % (self.vocab_size - 10)) + 10 for w in words
        ]
        word_first_index = list(range(len(words)))
        return ids, word_first_index


class _JsonTokenizer:
    """HF tokenizers-backed subword tokenizer (first-subtoken mapping)."""

    def __init__(self, path: str):
        from tokenizers import Tokenizer

        self.tok = Tokenizer.from_file(path)

    def encode_words(self, words: Sequence[str]) -> Tuple[List[int], List[int]]:
        ids: List[int] = []
        first: List[int] = []
        for w in words:
            enc = self.tok.encode(w, add_special_tokens=False)
            first.append(len(ids))
            ids.extend(enc.ids if enc.ids else [3])  # <unk>
        return ids, first


class PunctuationModel:
    """deepmultilingualpunctuation-compatible facade
    (contract: diarize.py:222-226)."""

    def __init__(self, model: str = "kredor/punctuate-all"):
        safe = model.replace("/", "_")
        cache = model_cache_dir()
        ckpt = os.path.join(cache, f"{safe}.npz")
        tok_json = os.path.join(cache, f"{safe}.tokenizer.json")
        small = os.environ.get("WNT_TEST_SMALL_MODELS")
        if os.path.exists(ckpt):
            self.params = load_params(ckpt)
            self.dims = XlmRobertaDims()
        else:
            logger.warning(
                "no punctuation checkpoint at %s; using random init", ckpt
            )
            self.dims = (
                XlmRobertaDims(
                    vocab_size=1000, hidden_size=64, num_layers=2,
                    num_heads=4, intermediate_size=128,
                )
                if small
                else XlmRobertaDims()
            )
            self.params = init_xlmr_params(jax.random.PRNGKey(3), self.dims)
        if os.path.exists(tok_json):
            self.tokenizer = _JsonTokenizer(tok_json)
        else:
            self.tokenizer = _HashTokenizer(self.dims.vocab_size)
        self._jit = jax.jit(
            lambda p, ids, mask: token_classifier_logits(
                p, ids, mask, self.dims
            )
        )

    def predict(
        self, words: Sequence[str], chunk_size: int = 230, overlap: int = 5
    ) -> List[Tuple[str, str, float]]:
        """Per-word punctuation labels over overlapping word chunks.

        Long transcripts step by ``chunk_size − 2·overlap`` and each
        word takes its label from the chunk where it sits away from
        the chunk edge (deepmultilingualpunctuation's scheme — edge
        words lack right context and mispredict sentence ends). All
        chunks run as ONE padded batch through the jitted classifier;
        pad sizes bucket (tokens to 64, rows to powers of two) so the
        compile cache stays small across transcript lengths.
        """
        words = list(words)
        if not words:
            return []
        if len(words) <= chunk_size:
            starts = [0]
        else:
            overlap = min(overlap, (chunk_size - 1) // 2)
            step = chunk_size - 2 * overlap
            starts = list(range(0, len(words) - overlap, step))
        chunks = [words[s : s + chunk_size] for s in starts]
        encoded = [self.tokenizer.encode_words(c) for c in chunks]

        max_len = max(len(ids) for ids, _ in encoded)
        pad_len = -(-max_len // 64) * 64
        pad_rows = 1 << (len(encoded) - 1).bit_length()
        arr = np.zeros((pad_rows, pad_len), np.int32)
        mask = np.zeros_like(arr)
        for i, (ids, _) in enumerate(encoded):
            arr[i, : len(ids)] = ids
            mask[i, : len(ids)] = 1
        logits = np.asarray(
            self._jit(self.params, jnp.asarray(arr), jnp.asarray(mask))
        )

        out: List[Optional[Tuple[str, str, float]]] = [None] * len(words)
        for ci, (start, chunk, (ids, first)) in enumerate(
            zip(starts, chunks, encoded)
        ):
            lg = logits[ci]
            probs = np.exp(lg - lg.max(axis=-1, keepdims=True))
            probs /= probs.sum(axis=-1, keepdims=True)
            lo = 0 if start == 0 else overlap
            hi = (
                len(chunk)
                if start + len(chunk) >= len(words)
                else max(lo, len(chunk) - overlap)
            )
            for j in range(lo, hi):
                gi = start + j
                if gi < len(words) and out[gi] is None:
                    fi = first[j]
                    li = int(np.argmax(probs[fi]))
                    out[gi] = (
                        chunk[j], PUNCT_LABELS[li], float(probs[fi, li])
                    )
        assert all(o is not None for o in out), "chunking left gaps"
        return out  # type: ignore[return-value]
