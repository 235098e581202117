"""PyanNet (pyannote segmentation) in pure-functional JAX.

The reference's pyannote path (SpeakerDiarizationPipeline facade —
reference diarize.py uses NeMo, but the upstream project family ships
``pyannote/segmentation-3.0`` and the ``speaker-diarization-3.1``
pipeline built on it). Architecture: SincNet front-end (learned
band-pass filter bank → conv stack with instance norms and max pools)
→ multi-layer bidirectional LSTM → linear stack → per-frame powerset
classifier over local speakers.

TPU notes: the SincConv's filters are a fixed function of its
``low_hz_``/``band_hz_`` parameters at inference, so the converter
(engine/pyannote_weights.py) materializes them into an ordinary conv
weight — the runtime sees three plain NWC convolutions that XLA maps
onto the MXU. Instance norms are per-sample statistics (no running
buffers), computed in fp32. The BiLSTM runs as paired ``lax.scan``s
per layer.

Param layout (converter output):
  {"wav_norm": {"g","b"},
   "convs": [{"w","b"?}, ...]            # conv0 = materialized sinc
   "norms": [{"g","b"}, ...],
   "lstm": [{"fwd": {wx,wh,b}, "bwd": {wx,wh,b}}, ...],
   "linear": [{"w","b"}, ...],
   "classifier": {"w","b"}}
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .msdd import _lstm

Params = Dict[str, Any]

# SincNet geometry (pyannote.audio default: stride 10, kernel 251,
# 80 filters; conv1/conv2 are 5-wide with 3× max pools)
SINC_KERNEL = 251
SINC_STRIDE = 10
POOL = 3


def _instance_norm(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """InstanceNorm1d (eval, affine, no running stats): per-sample,
    per-channel statistics over time. x: [B, T, C]."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=1, keepdims=True)
    var = x32.var(axis=1, keepdims=True)
    y = (x32 - mean) / jnp.sqrt(var + 1e-5)
    return (y * p["g"] + p["b"]).astype(x.dtype)


def _conv(w, b, x, stride: int) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + b if b is not None else y


def _max_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    t = (x.shape[1] // k) * k
    return x[:, :t].reshape(x.shape[0], t // k, k, x.shape[2]).max(axis=2)


def sincnet(params: Params, waveform: jnp.ndarray) -> jnp.ndarray:
    """[B, T] samples → [B, T', 60] frame features (~16.6 ms hop)."""
    x = waveform[:, :, None]
    x = _instance_norm(params["wav_norm"], x)
    for i, (conv, norm) in enumerate(zip(params["convs"], params["norms"])):
        stride = SINC_STRIDE if i == 0 else 1
        x = _conv(conv["w"], conv.get("b"), x, stride)
        if i == 0:
            # SincNet takes the magnitude of the filter-bank response
            x = jnp.abs(x)
        x = _max_pool(x, POOL)
        x = jax.nn.leaky_relu(_instance_norm(norm, x))
    return x


def _bilstm(layers: List[Params], x: jnp.ndarray) -> jnp.ndarray:
    """Stacked bidirectional LSTM: [B, T, F] → [B, T, 2H]."""
    for layer in layers:
        fwd = _lstm(layer["fwd"], x)
        bwd = _lstm(layer["bwd"], x[:, ::-1])[:, ::-1]
        x = jnp.concatenate([fwd, bwd], axis=-1)
    return x


def frame_logits(params: Params, waveform: jnp.ndarray) -> jnp.ndarray:
    """[B, T] samples → [B, T', n_classes] powerset logits."""
    x = sincnet(params, waveform)
    x = _bilstm(params["lstm"], x)
    for lin in params["linear"]:
        x = jax.nn.leaky_relu(
            jnp.dot(x, lin["w"], preferred_element_type=jnp.float32)
            .astype(x.dtype) + lin["b"]
        )
    head = params["classifier"]
    return (
        jnp.dot(x, head["w"], preferred_element_type=jnp.float32)
        + head["b"]
    ).astype(jnp.float32)


def powerset_table(n_speakers: int = 3, max_simultaneous: int = 2
                   ) -> np.ndarray:
    """Powerset class → speaker multilabel map [n_classes, n_speakers].

    Class order matches pyannote: by set size then lexicographic —
    ∅, {0}, {1}, {2}, {0,1}, {0,2}, {1,2} for (3, 2)."""
    from itertools import combinations

    rows = []
    for size in range(max_simultaneous + 1):
        for combo in combinations(range(n_speakers), size):
            row = np.zeros(n_speakers, np.float32)
            row[list(combo)] = 1.0
            rows.append(row)
    return np.stack(rows)


def speaker_activity(
    params: Params, waveform: jnp.ndarray,
    n_speakers: int = 3, max_simultaneous: int = 2,
) -> jnp.ndarray:
    """[B, T] samples → [B, T', n_speakers] hard powerset decode."""
    logits = frame_logits(params, waveform)
    table = jnp.asarray(powerset_table(n_speakers, max_simultaneous))
    best = jnp.argmax(logits, axis=-1)
    return table[best]


def speech_probs(params: Params, waveform: jnp.ndarray) -> jnp.ndarray:
    """[B, T] samples → [B, T'] P(any speaker active): the powerset
    posterior mass on non-empty classes (VAD drop-in)."""
    logits = frame_logits(params, waveform)
    probs = jax.nn.softmax(logits, axis=-1)
    return 1.0 - probs[..., 0]  # class 0 is the empty set


def frames_per_second(sample_rate: int = 16000) -> float:
    """Effective frame rate of the SincNet front-end (stride 10 and
    three 3× max pools → hop of 270 samples)."""
    return sample_rate / (SINC_STRIDE * POOL**3)


def init_pyannet_params(
    key, n_classes: int = 7, lstm_layers: int = 4, hidden: int = 128
) -> Params:
    """Random params in the converter layout (tests only)."""
    keys = iter(jax.random.split(key, 8 + 3 * lstm_layers * 2))

    def lin(i, o):
        return {
            "w": jax.random.normal(next(keys), (i, o)) / np.sqrt(i),
            "b": jnp.zeros((o,)),
        }

    def lstm_dir(i, h):
        return {
            "wx": jax.random.normal(next(keys), (i, 4 * h)) / np.sqrt(i),
            "wh": jax.random.normal(next(keys), (h, 4 * h)) / np.sqrt(h),
            "b": jnp.zeros((4 * h,)),
        }

    convs = [
        {"w": jax.random.normal(next(keys), (SINC_KERNEL, 1, 80)) * 0.02},
        {"w": jax.random.normal(next(keys), (5, 80, 60)) / 20.0,
         "b": jnp.zeros((60,))},
        {"w": jax.random.normal(next(keys), (5, 60, 60)) / 17.0,
         "b": jnp.zeros((60,))},
    ]
    norms = [
        {"g": jnp.ones((c,)), "b": jnp.zeros((c,))} for c in (80, 60, 60)
    ]
    lstm = []
    f_in = 60
    for _ in range(lstm_layers):
        lstm.append(
            {"fwd": lstm_dir(f_in, hidden), "bwd": lstm_dir(f_in, hidden)}
        )
        f_in = 2 * hidden
    return {
        "wav_norm": {"g": jnp.ones((1,)), "b": jnp.zeros((1,))},
        "convs": convs,
        "norms": norms,
        "lstm": lstm,
        "linear": [lin(2 * hidden, hidden), lin(hidden, hidden)],
        "classifier": lin(hidden, n_classes),
    }
