"""Whisper log-mel spectrogram front end, designed for the MXU.

The reference gets this from ffmpeg+faster-whisper's numpy/CTranslate2
front end (SURVEY D3). On TPU the natural formulation is two matmuls with
an elementwise square in between — the DFT as a [n_fft, n_freqs] matrix
and the mel filter bank as a [n_freqs, n_mels] matrix — so the whole
front end rides the systolic array:

    frames  [T, n_fft]   (strided view of the padded waveform)
    power   = (frames·W @ C)^2 + (frames·W @ S)^2      [T, n_freqs]
    logmel  = log10(max(power @ M, 1e-10))             [T, n_mels]
    out     = (max(logmel, logmel.max() - 8) + 4) / 4

Two implementations share those constants: an XLA path (works on any
backend; XLA fuses the elementwise epilogues into the matmuls) and a
fused Pallas kernel (`impl="pallas"`) that keeps a frame tile resident in
VMEM through both matmuls. Numerics match openai-whisper's front end
(n_fft=400, hop=160, periodic Hann, slaney mel, dynamic-range clamp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000


def _hz_to_mel_slaney(freq):
    freq = np.asarray(freq, dtype=np.float64)
    mels = freq * 3.0 / 200.0
    log_region = freq >= 1000.0
    mels = np.where(
        log_region,
        15.0 + np.log(np.maximum(freq, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
        mels,
    )
    return mels


def _mel_to_hz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    freq = mels * 200.0 / 3.0
    log_region = mels >= 15.0
    freq = np.where(
        log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (mels - 15.0)), freq
    )
    return freq


@functools.lru_cache(maxsize=8)
def mel_filter_bank(
    n_freqs: int = N_FFT // 2 + 1,
    n_mels: int = 80,
    sample_rate: int = SAMPLE_RATE,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filter bank
    [n_freqs, n_mels], matching whisper/librosa defaults."""
    fmax = fmax if fmax is not None else sample_rate / 2.0
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # [n_mels+2, n_freqs]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))  # [n_mels, n_freqs]

    # slaney area normalization
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # [n_freqs, n_mels]


@functools.lru_cache(maxsize=4)
def _dft_mel_constants(n_fft: int, n_mels: int):
    """Windowed DFT and mel matrices as numpy constants.

    The Hann window is folded into the DFT matrices so the kernel does
    pure matmuls: C[j, k] = w[j]·cos(2πjk/n), S[j, k] = -w[j]·sin(2πjk/n).
    """
    n_freqs = n_fft // 2 + 1
    j = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    angle = 2.0 * np.pi * j * k / n_fft
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    cos_m = (window[:, None] * np.cos(angle)).astype(np.float32)
    sin_m = (window[:, None] * -np.sin(angle)).astype(np.float32)
    fb = mel_filter_bank(n_freqs, n_mels)
    return cos_m, sin_m, fb


def _frame_signal(padded: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """[T+pad] -> [n_frames, n_fft] strided frames (hop 160).

    Built from three shifted reshapes instead of a gather: columns
    [0,160), [160,320), [320,400) of frame i are contiguous slices of the
    padded signal starting at offsets 0, 160, 320 — each is a plain
    reshape of a shifted slice, which XLA lowers to cheap copies.
    """
    h = HOP_LENGTH
    parts = []
    for shift in range(0, N_FFT, h):
        width = min(h, N_FFT - shift)
        block = jax.lax.dynamic_slice_in_dim(padded, shift, n_frames * h)
        block = block.reshape(n_frames, h)[:, :width]
        parts.append(block)
    return jnp.concatenate(parts, axis=1)


def _finalize(logmel: jnp.ndarray) -> jnp.ndarray:
    """Whisper dynamic-range compression: clamp to (max − 8), scale."""
    maxval = jnp.max(logmel, axis=(-2, -1), keepdims=True)
    return (jnp.maximum(logmel, maxval - 8.0) + 4.0) / 4.0


def _log_mel_xla(frames, cos_m, sin_m, fb):
    re = jnp.dot(frames, cos_m, preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_m, preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, fb, preferred_element_type=jnp.float32)
    return jnp.log10(jnp.maximum(mel, 1e-10))


def _mel_kernel(frames_ref, cos_ref, sin_ref, fb_ref, out_ref):
    frames = frames_ref[:]
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log10(jnp.maximum(mel, 1e-10))


def _log_mel_pallas(frames, cos_m, sin_m, fb, interpret: bool):
    n_frames, n_fft = frames.shape
    n_freqs, n_mels = fb.shape
    tile = 256
    n_tiles = pl.cdiv(n_frames, tile)
    # pad the frame count to a tile multiple; padded frames are all-zero
    # and produce log10(1e-10) rows that are sliced off below.
    pad = n_tiles * tile - n_frames
    if pad:
        frames = jnp.pad(frames, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        _mel_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (tile, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((n_fft, n_freqs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freqs, n_mels), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, n_mels), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * tile * n_fft * n_freqs * 2
            + 2 * n_tiles * tile * n_freqs * n_mels,
            bytes_accessed=frames.size * 4,
            transcendentals=n_tiles * tile * n_mels,
        ),
        interpret=interpret,
    )(frames, cos_m, sin_m, fb)
    return out[:n_frames]


@functools.partial(jax.jit, static_argnames=("n_mels", "impl"))
def log_mel_spectrogram(
    waveform: jnp.ndarray,
    n_mels: int = 80,
    impl: str = "auto",
) -> jnp.ndarray:
    """Log-mel features [n_mels, n_frames] of a 16 kHz waveform.

    ``waveform`` should already be padded/trimmed to the desired length
    (a multiple of the 160-sample hop; whisper uses 30 s = 480000).
    ``impl``: "auto" (pallas on TPU, XLA elsewhere), "xla", or "pallas"
    (interpreted off-TPU).
    """
    if impl == "auto":
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        impl = "pallas" if on_tpu else "xla"

    cos_np, sin_np, fb_np = _dft_mel_constants(N_FFT, n_mels)
    cos_m, sin_m, fb = jnp.array(cos_np), jnp.array(sin_np), jnp.array(fb_np)

    waveform = waveform.astype(jnp.float32)
    n_frames = waveform.shape[-1] // HOP_LENGTH
    padded = jnp.pad(waveform, (N_FFT // 2, N_FFT // 2), mode="reflect")
    frames = _frame_signal(padded, n_frames)

    if impl == "pallas":
        logmel = _log_mel_pallas(
            frames, cos_m, sin_m, fb,
            interpret=jax.devices()[0].platform not in ("tpu", "axon"),
        )
    elif impl == "xla":
        logmel = _log_mel_xla(frames, cos_m, sin_m, fb)
    else:
        raise ValueError(f"unknown impl {impl!r}")
    return _finalize(logmel).T  # [n_mels, n_frames]


@functools.partial(jax.jit, static_argnames=("n_mels",))
def log_mel_spectrogram_batch(
    waveforms: jnp.ndarray, n_mels: int = 80
) -> jnp.ndarray:
    """Batched mel: [B, T] equal-length waveforms → [B, n_mels, T//hop].

    One device invocation for a whole batch of decode windows — the
    per-window path costs a host→device transfer and kernel launch per
    window, which dominates at long-form batch sizes. Dynamic-range
    normalization is per-window, matching the unbatched path.
    """
    cos_np, sin_np, fb_np = _dft_mel_constants(N_FFT, n_mels)
    cos_m, sin_m, fb = jnp.array(cos_np), jnp.array(sin_np), jnp.array(fb_np)

    waveforms = waveforms.astype(jnp.float32)
    n_frames = waveforms.shape[-1] // HOP_LENGTH
    padded = jnp.pad(
        waveforms, ((0, 0), (N_FFT // 2, N_FFT // 2)), mode="reflect"
    )
    frames = jax.vmap(lambda p: _frame_signal(p, n_frames))(padded)
    logmel = _log_mel_xla(frames, cos_m, sin_m, fb)  # batched matmuls
    return _finalize(logmel).swapaxes(-1, -2)
