"""Device mesh construction and core-group splitting.

The TPU equivalents of the reference's two parallelism mechanisms
(SURVEY §2c): ``make_mesh`` builds the dp×tp mesh pjit shards model
math over (P3 batched parallelism over ICI), and ``split_core_groups``
carves one device set into disjoint groups so the Whisper branch and
the diarization branch run concurrently on separate cores (P1, the
TPU-native version of diarize_parallel.py's child process).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axes: Dict[str, int],
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a named mesh, e.g. ``make_mesh({"dp": 2, "tp": 4})``.

    The product of axis sizes must equal the device count; axis order
    in the dict defines the major-to-minor device layout (put the
    fastest-varying, most-communicating axis — tp — last so its
    collectives ride neighboring ICI links).
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = tuple(axes.values())
    total = int(np.prod(shape))
    if total != len(devices):
        raise ValueError(
            f"mesh {dict(axes)} needs {total} devices, got {len(devices)}"
        )
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes.keys()))


def split_core_groups(
    fractions: Sequence[float],
    devices: Optional[Sequence] = None,
) -> List[List]:
    """Split devices into disjoint contiguous groups by fraction.

    ``split_core_groups([0.75, 0.25])`` on 8 devices → [6 devices,
    2 devices]: the ASR branch gets the large group, diarization the
    small one. Groups are contiguous so intra-group collectives stay on
    neighboring links. Every group gets at least one device.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not fractions or any(f <= 0 for f in fractions):
        raise ValueError("fractions must be positive")
    total = sum(fractions)
    counts = [max(1, int(round(n * f / total))) for f in fractions]
    # fix rounding drift while keeping every group non-empty
    while sum(counts) > n:
        counts[int(np.argmax(counts))] -= 1
    while sum(counts) < n:
        counts[int(np.argmin(counts))] += 1
    if any(c < 1 for c in counts):
        raise ValueError(f"cannot split {n} devices into {len(fractions)} groups")
    groups = []
    start = 0
    for c in counts:
        groups.append(devices[start : start + c])
        start += c
    return groups
