"""CTC Viterbi forced alignment on the XLA/TPU compute path.

The replacement for ctc-forced-aligner's compiled alignment core
(reference diarize.py:176-180, SURVEY D4/§2d-4). The CTC trellis (blank-
interleaved label states) is swept with a ``lax.scan`` over time — the
max-plus recurrence runs on-device with one [L]-state vector per step —
while the O(T·L) int8 backpointer matrix is returned for a host-side
backtrack (O(T)).

Wildcard ``<star>`` labels match any non-blank symbol: their emission is
the per-frame max over the non-blank vocabulary, appended as an extra
emission column.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@jax.jit
def _viterbi_forward_states(
    state_emissions: jnp.ndarray,  # [T, L] log-probs gathered per state
    allow_skip: jnp.ndarray,  # [L] bool: skip transition into state
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trellis sweep over pre-gathered state emissions.

    Gathering emissions into state space happens once, in parallel,
    BEFORE the scan: a per-step gather inside the while-loop measured
    ~1000× slower on TPU than the vectorized pre-gather.
    Returns (final alpha [L], backpointers [T-1, L] int8).
    """
    L = allow_skip.shape[0]
    alpha0 = jnp.where(
        jnp.arange(L) < 2, state_emissions[0], NEG_INF
    )

    def step(alpha, e_row):
        stay = alpha
        prev = jnp.concatenate([jnp.full((1,), NEG_INF), alpha[:-1]])
        skip = jnp.concatenate([jnp.full((2,), NEG_INF), alpha[:-2]])
        skip = jnp.where(allow_skip, skip, NEG_INF)
        choices = jnp.stack([stay, prev, skip])  # [3, L]
        bp = jnp.argmax(choices, axis=0).astype(jnp.int8)
        new_alpha = e_row + jnp.max(choices, axis=0)
        return new_alpha, bp

    alpha_final, bps = jax.lax.scan(step, alpha0, state_emissions[1:])
    return alpha_final, bps


@jax.jit
def _gather_state_emissions(emissions, state_labels):
    """[T, V], [L] → [T, L] (one parallel gather)."""
    return emissions[:, state_labels]


def _viterbi_forward(emissions, state_labels, allow_skip):
    """Gather once, then sweep.

    On TPU, long lattices route to the Pallas kernel
    (ops/viterbi_pallas.py): the scan's per-iteration overhead dominates
    past a few thousand steps (measured 4.8× at T=180k), and the kernel
    is bit-identical.
    """
    e_states = _gather_state_emissions(emissions, state_labels)
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if on_tpu and emissions.shape[0] >= 4096:
        from .viterbi_pallas import viterbi_forward_pallas

        return viterbi_forward_pallas(e_states, allow_skip)
    return _viterbi_forward_states(e_states, allow_skip)


@jax.jit
def _viterbi_backtrack(
    alpha_final: jnp.ndarray, bps: jnp.ndarray
) -> jnp.ndarray:
    """On-device backtrack: avoids transferring the O(T·L) backpointer
    matrix to the host (it can reach hundreds of MB for hour-scale
    audio); only the [T] state path leaves the device."""
    L = alpha_final.shape[0]
    start = jnp.where(alpha_final[L - 1] >= alpha_final[L - 2], L - 1, L - 2)

    def step(s, bp_t):
        # bps[t] holds the backpointer for the transition into time t+1,
        # so processing it maps path[t+1] -> path[t]
        s_new = s - bp_t[s].astype(jnp.int32)
        return s_new, s_new

    _, states = jax.lax.scan(step, start, bps, reverse=True)
    return jnp.concatenate([states, start[None]])


def forced_align(
    emissions: np.ndarray,  # [T, V] log-probs, star column at index V-1
    labels: np.ndarray,  # [N] int label ids into the emission columns
    blank_id: int = 0,
) -> Tuple[np.ndarray, float]:
    """Viterbi-align ``labels`` to ``emissions``.

    Returns (frame_labels [T] — the label *state index* path encoded as
    -1 for blank frames and the label position 0..N-1 otherwise — and
    the path log-score).
    """
    T, _ = emissions.shape
    N = len(labels)
    if N == 0:
        return np.full((T,), -1, np.int32), float(
            emissions[:, blank_id].sum()
        )
    L = 2 * N + 1

    state_labels = np.full((L,), blank_id, np.int32)
    state_labels[1::2] = labels
    allow_skip = np.zeros((L,), bool)
    for s in range(3, L, 2):
        allow_skip[s] = labels[(s - 1) // 2] != labels[(s - 3) // 2]

    alpha, bps = _viterbi_forward(
        jnp.asarray(emissions),
        jnp.asarray(state_labels),
        jnp.asarray(allow_skip),
    )
    # backtrack on-device: only the [T] path transfers to the host
    path = np.asarray(_viterbi_backtrack(alpha, bps))
    alpha = np.asarray(alpha)
    score = float(alpha[path[-1]])

    frame_labels = np.where(path % 2 == 1, (path - 1) // 2, -1)
    return frame_labels.astype(np.int32), score


def label_segments(
    frame_labels: np.ndarray,
    emissions: np.ndarray,
    labels: np.ndarray,
) -> List[dict]:
    """Per-label (start, end) frame spans and mean-probability scores.

    A label occupies the contiguous run of frames Viterbi assigned to
    it; labels squeezed to zero frames inherit a point span at their
    neighbor boundary.
    """
    N = len(labels)
    out: List[dict] = []
    starts = np.full(N, -1, np.int64)
    ends = np.full(N, -1, np.int64)
    for t, li in enumerate(frame_labels):
        if li >= 0:
            if starts[li] < 0:
                starts[li] = t
            ends[li] = t + 1
    prev_end = 0
    for i in range(N):
        s, e = starts[i], ends[i]
        if s < 0:  # label got no frames: zero-width at previous boundary
            s = e = prev_end
        score = (
            float(np.exp(emissions[s:e, labels[i]]).mean()) if e > s else 0.0
        )
        out.append(
            {"label": int(labels[i]), "start": int(s), "end": int(e),
             "score": score}
        )
        prev_end = e
    return out


def add_star_column(
    emissions: np.ndarray, blank_id: int = 0, discount: float = float(np.log(0.5))
) -> np.ndarray:
    """Append a wildcard emission column: per-frame max over non-blank
    symbols, discounted by ``discount`` (log-space) so a true label
    always beats the wildcard on its own frames while the wildcard still
    absorbs audio no label explains."""
    masked = emissions.copy()
    masked[:, blank_id] = NEG_INF
    star = masked.max(axis=1, keepdims=True) + discount
    return np.concatenate([emissions, star], axis=1)
