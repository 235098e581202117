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


def mesh_from_spec(
    spec: str, devices: Optional[Sequence] = None
) -> Optional[Mesh]:
    """Build a mesh from a user-facing spec string — the configuration
    surface behind ``WNT_MESH`` / ``--mesh``.

    Format: comma-separated ``axis[=size]`` entries, e.g. ``dp=4,tp=2``.
    One axis may omit its size (or use ``auto``/``-1``) to absorb every
    remaining device: ``dp,tp=2`` on 8 devices is dp=4×tp=2; plain
    ``dp`` is all-device data parallelism. Sizes must multiply to at
    most the device count (extra devices are left unused). Returns None
    for an empty/blank spec.
    """
    if not spec or not spec.strip():
        return None
    devices = list(devices if devices is not None else jax.devices())
    axes: Dict[str, int] = {}
    wildcard = None
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            name, _, size = part.partition("=")
            name = name.strip()
            size = size.strip()
            if size in ("auto", "-1", ""):
                axes[name] = -1
            else:
                axes[name] = int(size)
        else:
            axes[part] = -1
        if axes[list(axes)[-1]] == -1:
            if wildcard is not None:
                raise ValueError(
                    f"mesh spec {spec!r}: only one axis may omit its size"
                )
            wildcard = list(axes)[-1]
    fixed = int(np.prod([s for s in axes.values() if s > 0])) or 1
    if wildcard is not None:
        if len(devices) % fixed:
            raise ValueError(
                f"mesh spec {spec!r}: {fixed} fixed-size slots do not "
                f"divide {len(devices)} devices"
            )
        axes[wildcard] = len(devices) // fixed
    total = int(np.prod(list(axes.values())))
    if total > len(devices):
        raise ValueError(
            f"mesh spec {spec!r} needs {total} devices, have {len(devices)}"
        )
    return make_mesh(axes, devices[:total])


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
