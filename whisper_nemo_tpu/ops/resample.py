"""Device-resident polyphase resampling.

The reference pipeline resamples with ffmpeg/swresample on the host
(reference diarize.py:125 via faster_whisper.decode_audio;
nemo_process.py:24 via pydub) — fine when every stage lives on one
host. On TPU the expensive producer/consumer pairs are device-resident
(htdemucs emits 44.1 kHz stems on device; whisper/VAD consume 16 kHz
waveforms on device), and a host round-trip through the axon tunnel
costs ~30-50 s per audio-hour of stereo float32 at the measured
25-45 MB/s — far more than the resample itself.

This module computes the standard ``scipy.signal.resample_poly``
polyphase sum (zero-insertion upsample by ``up``, Kaiser-windowed sinc
lowpass, decimate by ``down``) in the TPU-native form: frame the input
at hop ``down`` through shifted reshapes (``ops.framing.frame_signal``
— no gathers) and contract each frame with a dense ``[up, W]``
polyphase matrix in ONE matmul on the MXU. Each block of ``up``
consecutive outputs reads the same ~``down + 2*ceil(half/up)``-sample
input window, so the whole resample is a [n_blocks, W] × [W, up] GEMM
— ~60 GFLOP per audio-hour for 44.1k→16k, static shapes, no dilated
convolution. (A ``lax.conv_general_dilated`` formulation with
``lhs_dilation=up`` was tried first and never returned from the XLA
compile at hour-scale lengths — the dilated spatial extent is ~25 B
positions; the GEMM form compiles in seconds and is how the MXU wants
this computation.)
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _design_filter(up: int, down: int) -> np.ndarray:
    """Kaiser-windowed sinc lowpass for a rational up/down resample —
    scipy.signal.resample_poly's default filter (half length
    10*max(up, down), cutoff at the tighter of the two Nyquists,
    Kaiser beta 5.0, gain ``up`` to undo zero-insertion loss)."""
    max_rate = max(up, down)
    half = 10 * max_rate
    n = np.arange(-half, half + 1, dtype=np.float64)
    cutoff = 1.0 / max_rate  # fraction of the upsampled Nyquist
    h = cutoff * np.sinc(cutoff * n)
    h *= np.kaiser(2 * half + 1, 5.0)
    h *= up
    return h.astype(np.float32)


@lru_cache(maxsize=32)
def _polyphase_matrix(up: int, down: int):
    """Dense [up, W] polyphase contraction matrix.

    Output ``k = m*up + p`` is the polyphase sum
    ``y[k] = Σ_i h[i] · x_dil[k*down − half + i]`` over the
    ``up``-dilated input. Every dilated index that lands on a real
    sample sits at input position ``n = m*down − off + j`` for some
    ``j ∈ [0, W)`` with ``off = half//up``, so a window of ``W`` input
    samples anchored at ``m*down − off`` serves all ``up`` phases of
    block ``m``:  ``G[p, j] = h[(j−off)*up − p*down + half]`` (zero
    where that tap index falls outside the filter). Returns
    ``(G, off, W)``."""
    h = _design_filter(up, down).astype(np.float64)
    half = (len(h) - 1) // 2
    off = half // up
    width = off + (2 * half + (up - 1) * down) // up + 1
    j = np.arange(width)
    p = np.arange(up)
    i = (j[None, :] - off) * up - p[:, None] * down + half
    valid = (i >= 0) & (i <= 2 * half)
    mat = np.where(valid, h[np.clip(i, 0, 2 * half)], 0.0)
    return mat.astype(np.float32), off, width


def resample_poly(
    x: jnp.ndarray, orig_sr: int, target_sr: int
) -> jnp.ndarray:
    """[..., T] at ``orig_sr`` → [..., ceil(T*up/down)] at
    ``target_sr``; output sample ``k`` is aligned to input time
    ``k*down/up`` (scipy.signal.resample_poly alignment).

    One hop-``down`` framing (shifted reshapes) + one
    [n_blocks, W] × [W, up] matmul; the framed operand is the only
    sizable temporary (~W/down ≈ 1.2× the input, f32)."""
    from .framing import frame_signal

    g = math.gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    if up == 1 and down == 1:
        return x
    t = x.shape[-1]
    out_len = -(-t * up // down)  # ceil
    mat, off, width = _polyphase_matrix(up, down)
    n_blocks = -(-out_len // up)

    lead = x.shape[:-1]
    flat = x.reshape((-1, t)).astype(jnp.float32)
    # block m's window starts at input index m*down − off; left-pad by
    # ``off`` zeros so frame m starts at padded index m*down (the tail
    # zero-pad matches scipy's implicit zero extension and is handled
    # inside frame_signal)
    padded = jnp.pad(flat, ((0, 0), (off, 0)))
    frames = frame_signal(padded, n_blocks, width, down)
    y = jnp.einsum(
        "bmw,pw->bmp", frames, jnp.asarray(mat)
    ).reshape(flat.shape[0], n_blocks * up)[:, :out_len]
    return y.reshape(lead + (out_len,)).astype(x.dtype)
