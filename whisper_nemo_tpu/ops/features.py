"""Generic log-mel acoustic features for the diarization models.

MarbleNet/TitaNet consume NeMo-style features: 25 ms window / 10 ms hop,
natural-log mel energies, per-feature mean/variance normalization over
the utterance. Reuses the MXU matmul formulation of ``ops.mel`` with a
separate window/constant set (512-point FFT, HTK-free slaney mel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .framing import frame_signal
from .mel import mel_filter_bank

SAMPLE_RATE = 16000
WIN_LENGTH = 400  # 25 ms
HOP_LENGTH = 160  # 10 ms
N_FFT = 512


@functools.lru_cache(maxsize=4)
def _dft_constants(n_mels: int):
    n_freqs = N_FFT // 2 + 1
    j = np.arange(N_FFT)[:, None]
    k = np.arange(n_freqs)[None, :]
    angle = 2.0 * np.pi * j * k / N_FFT
    window = np.zeros(N_FFT)
    # centered Hann window of WIN_LENGTH zero-padded to N_FFT
    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(WIN_LENGTH) / WIN_LENGTH))
    window[:WIN_LENGTH] = hann
    cos_m = (window[:, None] * np.cos(angle)).astype(np.float32)
    sin_m = (window[:, None] * -np.sin(angle)).astype(np.float32)
    fb = mel_filter_bank(n_freqs, n_mels, SAMPLE_RATE)
    return cos_m, sin_m, fb


# frames per jitted feature block: the frame matrix and DFT temps for
# the whole recording at once reach ~6-8 GB at 4 h of audio (the frame
# matrix alone is [1.44M, 400] -> 2.3 GB), which OOM'd the 4 h bench;
# 100k frames (~16.7 min) keeps the per-dispatch peak near 300 MB
_CHUNK_FRAMES = 100_000


@functools.partial(jax.jit, static_argnames=("n_mels",))
def _features_core(x: jnp.ndarray, n_mels: int) -> jnp.ndarray:
    """Already-padded [B, S] signal → [B, n_frames, n_mels] UNnormalized
    log-mel (no reflect padding here — the wrapper pads once so chunks
    are numerically identical to the whole-signal computation)."""
    cos_np, sin_np, fb_np = _dft_constants(n_mels)
    cos_m, sin_m, fb = jnp.array(cos_np), jnp.array(sin_np), jnp.array(fb_np)
    n_frames = (x.shape[-1] - WIN_LENGTH) // HOP_LENGTH + 1
    # gather-free framing (ops/framing.py): an index-matrix gather here
    # cost ~12 s/h of audio on TPU
    frames = frame_signal(x, n_frames, WIN_LENGTH, HOP_LENGTH)
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, N_FFT - WIN_LENGTH)))
    re = jnp.dot(frames, cos_m, preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_m, preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, fb, preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(mel, 2.0**-24))


def log_mel_features(
    waveform: jnp.ndarray, n_mels: int = 80, normalize: bool = True
) -> jnp.ndarray:
    """[T] or [B, T] waveform → [B?, n_frames, n_mels] log-mel features.

    Natural log with 2^-24 floor; optional per-feature utterance
    mean/variance normalization (NeMo ``normalize: per_feature`` —
    always global over the utterance, also when the computation
    chunks). Long signals compute in ``_CHUNK_FRAMES`` blocks of one
    fixed compiled shape; short ones in a single call.
    """
    squeeze = waveform.ndim == 1
    if squeeze:
        waveform = waveform[None]
    x = jnp.asarray(waveform).astype(jnp.float32)
    pad = WIN_LENGTH // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (x.shape[-1] - WIN_LENGTH) // HOP_LENGTH + 1

    if n_frames <= _CHUNK_FRAMES:
        feats = _features_core(x, n_mels)
    else:
        span = (_CHUNK_FRAMES - 1) * HOP_LENGTH + WIN_LENGTH
        x_ext = jnp.pad(x, ((0, 0), (0, span)))  # last-chunk slack
        outs = []
        for f0 in range(0, n_frames, _CHUNK_FRAMES):
            f_cnt = min(_CHUNK_FRAMES, n_frames - f0)
            block = jax.lax.dynamic_slice_in_dim(
                x_ext, f0 * HOP_LENGTH, span, axis=-1
            )
            outs.append(_features_core(block, n_mels)[:, :f_cnt])
        feats = jnp.concatenate(outs, axis=1)

    if normalize:
        mu = jnp.mean(feats, axis=1, keepdims=True)
        sd = jnp.std(feats, axis=1, keepdims=True)
        feats = (feats - mu) / (sd + 1e-5)
    return feats[0] if squeeze else feats
