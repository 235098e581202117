"""Vocal source separation (Demucs-class spectrogram U-Net) in JAX.

The optional stemming stage of the reference CLI (SURVEY D2:
``python -m demucs.separate -n htdemucs --two-stems=vocals``,
diarize.py:98-100). TPU-native design: STFT magnitudes through a conv
U-Net (frequency-strided encoder, transformer bottleneck, skip-connected
decoder) predicting a sigmoid vocal mask; vocals are re-synthesized by
masking the complex STFT and inverting with overlap-add. Long audio is
processed in overlapped segments and cross-faded.

``separate_vocals`` reproduces the CLI contract: writes
``<out>/htdemucs/<track>/vocals.wav`` and raises when no converted
checkpoint is installed — the caller falls back to the original audio
exactly like the reference does on a non-zero demucs exit
(diarize.py:102-107).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.checkpoint import load_params, model_cache_dir
from ..utils import get_logger

logger = get_logger(__name__)

SAMPLE_RATE = 16000
N_FFT = 2048
HOP = 512


@dataclass(frozen=True)
class DemucsDims:
    channels: int = 48
    depth: int = 4
    freq_stride: int = 4
    bottleneck_heads: int = 4
    bottleneck_layers: int = 2
    # hybrid time-domain branch (htdemucs' second branch): a strided
    # conv1d U-Net over the raw waveform whose output adds to the
    # spectrogram branch's re-synthesis
    time_channels: int = 32
    time_depth: int = 4
    time_stride: int = 4
    time_kernel: int = 8

    @property
    def n_freqs(self) -> int:
        return N_FFT // 2  # drop the nyquist bin so strides divide evenly


# -- STFT / iSTFT -----------------------------------------------------------


def stft(wave: jnp.ndarray) -> jnp.ndarray:
    """[T] → complex [frames, n_fft//2+1] (hann, centered)."""
    pad = N_FFT // 2
    x = jnp.pad(wave, (pad, pad), mode="reflect")
    n_frames = 1 + (x.shape[0] - N_FFT) // HOP
    idx = (
        jnp.arange(N_FFT)[None, :] + HOP * jnp.arange(n_frames)[:, None]
    )
    frames = x[idx] * jnp.hanning(N_FFT)
    return jnp.fft.rfft(frames, axis=-1)


def istft(spec: jnp.ndarray, length: int) -> jnp.ndarray:
    """Inverse of :func:`stft` with hann overlap-add normalization."""
    frames = jnp.fft.irfft(spec, n=N_FFT, axis=-1)
    window = jnp.hanning(N_FFT)
    frames = frames * window
    n_frames = frames.shape[0]
    total = N_FFT + HOP * (n_frames - 1)
    out = jnp.zeros((total,))
    norm = jnp.zeros((total,))
    idx = jnp.arange(N_FFT)[None, :] + HOP * jnp.arange(n_frames)[:, None]
    out = out.at[idx.reshape(-1)].add(frames.reshape(-1))
    norm = norm.at[idx.reshape(-1)].add(jnp.tile(window**2, n_frames))
    out = out / jnp.maximum(norm, 1e-8)
    pad = N_FFT // 2
    return out[pad : pad + length]


# -- model ------------------------------------------------------------------


def _freq_pads(kf: int, sf: int) -> Tuple[int, int]:
    """Freq padding giving exactly F/s output (requires kf ≥ sf):
    total pad = kf − sf."""
    total = kf - sf
    return total // 2, total - total // 2


def _conv2d(p, x, stride: Tuple[int, int]):
    """[B, F, T, C] conv; freq dim downsamples exactly by stride, time
    dim keeps 'same' length."""
    kf, kt, _, _ = p["w"].shape
    pf = _freq_pads(kf, stride[0])
    return (
        jax.lax.conv_general_dilated(
            x,
            p["w"].astype(x.dtype),
            window_strides=stride,
            padding=(pf, (kt // 2, kt // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + p["b"]
    )


def _conv2d_transpose(p, x, stride: Tuple[int, int]):
    """Freq-upsampling transpose conv: VALID transpose then a crop to
    exactly F·s (sidesteps backend-dependent transpose-padding
    semantics)."""
    kf, kt, _, _ = p["w"].shape
    y = jax.lax.conv_transpose(
        x,
        p["w"].astype(x.dtype),
        strides=stride,
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    target_f = x.shape[1] * stride[0]
    lo = (y.shape[1] - target_f) // 2
    y = y[:, lo : lo + target_f]
    t_lo = (y.shape[2] - x.shape[2]) // 2
    y = y[:, :, t_lo : t_lo + x.shape[2]]
    return y + p["b"]


def _bottleneck_attention(p, x, n_heads):
    """Self-attention over time at the bottleneck: [B, F', T, C]."""
    b, f, t, c = x.shape
    seq = x.transpose(0, 2, 1, 3).reshape(b, t, f * c)
    h = seq
    for blk in p["layers"]:
        q = (h @ blk["q"]["w"] + blk["q"]["b"]).reshape(b, t, n_heads, -1)
        k = (h @ blk["k"]["w"] + blk["k"]["b"]).reshape(b, t, n_heads, -1)
        v = (h @ blk["v"]["w"] + blk["v"]["b"]).reshape(b, t, n_heads, -1)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(q.shape[-1])
        w = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, -1)
        h = h + attn @ blk["o"]["w"] + blk["o"]["b"]
        h = h + jax.nn.gelu(h @ blk["f1"]["w"] + blk["f1"]["b"]) @ blk["f2"]["w"] + blk["f2"]["b"]
    return h.reshape(b, t, f, c).transpose(0, 2, 1, 3)


def _conv1d_strided(p, x, stride: int, kernel: int):
    """[B, T, C] strided conv, exact T/stride output."""
    total = kernel - stride
    pads = (total // 2, total - total // 2)
    return (
        jax.lax.conv_general_dilated(
            x,
            p["w"].astype(x.dtype),
            window_strides=(stride,),
            padding=(pads,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + p["b"]
    )


def _conv1d_transpose(p, x, stride: int):
    y = jax.lax.conv_transpose(
        x,
        p["w"].astype(x.dtype),
        strides=(stride,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    target = x.shape[1] * stride
    lo = (y.shape[1] - target) // 2
    return y[:, lo : lo + target] + p["b"]


def time_branch(params: Dict[str, Any], wave: jnp.ndarray, dims: DemucsDims):
    """Raw waveform [B, T] → additive vocal correction [B, T].

    The hybrid second branch: strided conv1d encoder with GELU, skip-
    connected transpose-conv decoder, tanh-bounded output so the
    correction can't blow past the input scale.
    """
    x = wave[:, :, None]
    skips = []
    for enc in params["encoder"]:
        x = jax.nn.gelu(
            _conv1d_strided(enc, x, dims.time_stride, dims.time_kernel)
        )
        skips.append(x)
    for dec, skip in zip(params["decoder"], reversed(skips)):
        x = jax.nn.gelu(_conv1d_transpose(dec, x + skip, dims.time_stride))
    out = _conv1d_strided(params["head"], x, 1, 1)[..., 0]
    return jnp.tanh(out)


def vocal_mask(params: Dict[str, Any], mag: jnp.ndarray, dims: DemucsDims):
    """Magnitude [B, F, T] → sigmoid vocal mask [B, F, T]."""
    x = jnp.log1p(mag)[..., None]  # [B, F, T, 1]
    skips = []
    for enc in params["encoder"]:
        x = jax.nn.gelu(_conv2d(enc, x, (dims.freq_stride, 1)))
        skips.append(x)
    x = _bottleneck_attention(
        params["bottleneck"], x, dims.bottleneck_heads
    )
    for dec, skip in zip(params["decoder"], reversed(skips)):
        x = jax.nn.gelu(
            _conv2d_transpose(dec, x + skip, (dims.freq_stride, 1))
        )
    logits = _conv2d(params["head"], x, (1, 1))[..., 0]
    return jax.nn.sigmoid(logits)


def init_demucs_params(key, dims: DemucsDims) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 16 + 8 * dims.bottleneck_layers))

    def conv(kf, kt, c_in, c_out):
        return {
            "w": jax.random.normal(next(keys), (kf, kt, c_in, c_out))
            / np.sqrt(kf * kt * c_in),
            "b": jnp.zeros((c_out,)),
        }

    def lin(d_in, d_out):
        return {
            "w": jax.random.normal(next(keys), (d_in, d_out))
            / np.sqrt(d_in),
            "b": jnp.zeros((d_out,)),
        }

    encoder, c_in = [], 1
    c = dims.channels
    for _ in range(dims.depth):
        encoder.append(conv(dims.freq_stride * 2, 3, c_in, c))
        c_in = c
        c = min(2 * c, 384)
    bottleneck_f = dims.n_freqs // (dims.freq_stride**dims.depth)
    d_model = bottleneck_f * c_in
    layers = []
    for _ in range(dims.bottleneck_layers):
        layers.append(
            {
                "q": lin(d_model, d_model),
                "k": lin(d_model, d_model),
                "v": lin(d_model, d_model),
                "o": lin(d_model, d_model),
                "f1": lin(d_model, 2 * d_model),
                "f2": lin(2 * d_model, d_model),
            }
        )
    decoder = []
    cs = [e["w"].shape[-1] for e in encoder]
    for i in range(dims.depth - 1, -1, -1):
        c_out = cs[i - 1] if i > 0 else dims.channels
        decoder.append(conv(dims.freq_stride * 2, 3, cs[i], c_out))

    def conv1(k, c_in, c_out):
        return {
            "w": jax.random.normal(next(keys), (k, c_in, c_out))
            / np.sqrt(k * c_in),
            "b": jnp.zeros((c_out,)),
        }

    t_enc, c_in = [], 1
    tc = dims.time_channels
    for _ in range(dims.time_depth):
        t_enc.append(conv1(dims.time_kernel, c_in, tc))
        c_in = tc
        tc = min(2 * tc, 256)
    t_dec = []
    tcs = [e["w"].shape[-1] for e in t_enc]
    for i in range(dims.time_depth - 1, -1, -1):
        c_out = tcs[i - 1] if i > 0 else dims.time_channels
        t_dec.append(conv1(dims.time_kernel, tcs[i], c_out))
    return {
        "encoder": encoder,
        "bottleneck": {"layers": layers},
        "decoder": decoder,
        "head": conv(1, 1, dims.channels, 1),
        "time": {
            "encoder": t_enc,
            "decoder": t_dec,
            "head": conv1(1, dims.time_channels, 1),
        },
    }


# -- separation -------------------------------------------------------------

SEGMENT_SECONDS = 10
OVERLAP_SECONDS = 1


def separate_waveform(
    params: Dict[str, Any], wave: np.ndarray, dims: DemucsDims
) -> np.ndarray:
    """Full-length vocal separation with overlapped segments."""
    seg = SEGMENT_SECONDS * SAMPLE_RATE
    hop = seg - OVERLAP_SECONDS * SAMPLE_RATE
    out = np.zeros_like(wave)
    weight = np.zeros_like(wave)

    @jax.jit
    def run_segment(w):
        spec = stft(w)
        mag = jnp.abs(spec)[:, : dims.n_freqs]
        mask = vocal_mask(params, mag.T[None], dims)[0].T  # [T, F']
        full_mask = jnp.concatenate(
            [mask, jnp.ones((mask.shape[0], spec.shape[1] - dims.n_freqs))],
            axis=1,
        )
        spectral = istft(spec * full_mask, w.shape[0])
        if "time" in params:
            # hybrid: the time branch adds a waveform-domain correction
            t_len = (w.shape[0] // dims.time_stride**dims.time_depth) * (
                dims.time_stride**dims.time_depth
            )
            correction = time_branch(
                params["time"], w[None, :t_len], dims
            )[0]
            spectral = spectral.at[:t_len].add(0.1 * correction)
        return spectral

    for start in range(0, len(wave), hop):
        chunk = wave[start : start + seg]
        pad = seg - len(chunk)
        if pad:
            chunk = np.pad(chunk, (0, pad))
        voc = np.asarray(run_segment(jnp.asarray(chunk)))[: seg - pad or None]
        n = len(voc)
        ramp = np.ones(n)
        fade = min(OVERLAP_SECONDS * SAMPLE_RATE, n)
        ramp[:fade] = np.linspace(0, 1, fade)
        out[start : start + n] += voc * ramp
        weight[start : start + n] += ramp
        if start + seg >= len(wave):
            break
    return (out / np.maximum(weight, 1e-8)).astype(np.float32)


def separate_vocals(
    audio_path: str, out_dir: str, device: str = "auto"
) -> str:
    """CLI contract (diarize.py:98-114): write
    ``<out_dir>/htdemucs/<track>/vocals.wav`` and return its path.

    Raises when no converted separator checkpoint is installed so the
    caller can fall back to the unseparated audio (the reference's
    behavior on a failed demucs run).
    """
    from ..audio import decode_audio, write_wav

    ckpt = os.path.join(model_cache_dir(), "htdemucs.npz")
    if not os.path.exists(ckpt):
        raise FileNotFoundError(
            f"no separator checkpoint at {ckpt}; skipping source separation"
        )
    params = load_params(ckpt)
    dims = DemucsDims()

    wave = decode_audio(audio_path)
    vocals = separate_waveform(params, wave, dims)

    track = os.path.splitext(os.path.basename(audio_path))[0]
    target_dir = os.path.join(out_dir, "htdemucs", track)
    os.makedirs(target_dir, exist_ok=True)
    target = os.path.join(target_dir, "vocals.wav")
    write_wav(target, vocals)
    return target
