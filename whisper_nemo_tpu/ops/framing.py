"""Gather-free signal framing for TPU.

``x[starts + offsets]``-style framing lowers to an element-wise XLA
gather, which runs orders of magnitude below copy speed on TPU at
hour-scale frame counts (measured: ~12 s for 360k frames of 400
samples). Because frame hops are fixed, every frame column block
``[q*hop, (q+1)*hop)`` is a contiguous, hop-strided slice of the
signal: frame ``t``'s samples ``t*hop + q*hop + r`` equal
``x[(t+q)*hop + r]``. So the frame matrix is ``ceil(win/hop)`` shifted
reshapes concatenated along the column axis — plain slices and
reshapes that XLA lowers to cheap copies.

(`ops/mel.py` applied this trick to the Whisper mel in round 1; this
module generalizes it for every framing consumer.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_signal(
    x: jnp.ndarray, n_frames: int, win: int, hop: int
) -> jnp.ndarray:
    """[B, T] (or [T]) -> [B, n_frames, win] frames at stride ``hop``.

    ``T`` may fall short of the last block's reach
    (``(win//hop)*hop + n_frames*hop``); the tail is zero-padded, which
    never lands inside a real frame (frame ``n_frames-1`` ends at
    ``(n_frames-1)*hop + win <= T`` by construction of ``n_frames``).
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    need = ((win - 1) // hop) * hop + n_frames * hop
    if x.shape[-1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[-1])))
    parts = []
    for shift in range(0, win, hop):
        width = min(hop, win - shift)
        block = jax.lax.dynamic_slice_in_dim(
            x, shift, n_frames * hop, axis=1
        )
        block = block.reshape(x.shape[0], n_frames, hop)[:, :, :width]
        parts.append(block)
    frames = jnp.concatenate(parts, axis=2)
    return frames[0] if squeeze else frames


def frame_energy(
    x: jnp.ndarray, n_frames: int, win: int, hop: int
) -> jnp.ndarray:
    """[B, T] (or [T]) -> [B, n_frames] per-frame mean-square energy.

    ``frame_signal`` + ``mean(square)`` materializes the [n_frames,
    win] frame matrix — 3.7 GB for 4 h of audio at a 10 ms hop, which
    OOM'd the 4 h bench in the energy-VAD framing (plus XLA held
    several 1.4 GB shifted-reshape temps). A frame's energy is a sum
    over whole hop-blocks: frame ``t`` covers blocks ``t..t+k-1`` fully
    plus ``rem`` samples of block ``t+k`` (``win = k*hop + rem``), so
    only the [T/hop] block sums of the squared signal are needed —
    the square and the block reduction fuse into one pass over ``x``
    and the rest is O(n_frames) adds.
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    k, rem = divmod(win, hop)
    need = ((win - 1) // hop) * hop + n_frames * hop
    if x.shape[-1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[-1])))
    total_blocks = x.shape[-1] // hop
    xsq = jnp.square(x[:, : total_blocks * hop].astype(jnp.float32))
    blocks = xsq.reshape(x.shape[0], total_blocks, hop)
    block_sums = blocks.sum(axis=-1)  # [B, total_blocks]
    acc = jnp.zeros((x.shape[0], n_frames), jnp.float32)
    for q in range(k):
        acc = acc + jax.lax.dynamic_slice_in_dim(
            block_sums, q, n_frames, axis=1
        )
    if rem:
        partial = blocks[:, :, :rem].sum(axis=-1)
        acc = acc + jax.lax.dynamic_slice_in_dim(
            partial, k, n_frames, axis=1
        )
    energy = acc / win
    return energy[0] if squeeze else energy
