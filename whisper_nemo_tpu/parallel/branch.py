"""Branch-parallel orchestration over disjoint core groups.

The TPU-native replacement for ``diarize_parallel.py``'s child process
(SURVEY P1): instead of forking an OS process and joining on an RTTM
file, the Whisper branch and the diarization branch run concurrently on
disjoint device groups of one slice, and the join is an in-memory
Python object. Each branch pins its arrays to its own devices, so XLA
executions from the two branches overlap on separate cores; the host
side uses two threads only to drive dispatch.

On a single-chip host both branches share the one device — the code
path is identical, there's just no spatial overlap (same degradation
the reference has on a single GPU).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax

from ..utils import get_logger
from .mesh import split_core_groups

logger = get_logger(__name__)


@dataclass
class BranchResult:
    value: Any = None
    error: Optional[BaseException] = None


def run_branches(
    branch_fns: Sequence[Callable[[Sequence], Any]],
    fractions: Optional[Sequence[float]] = None,
    devices: Optional[Sequence] = None,
) -> List[Any]:
    """Run each ``branch_fns[i](devices_i)`` concurrently on its own
    disjoint device group; join and re-raise the first branch error
    (mirroring diarize_parallel.py:191-196's rc!=0 assert).

    ``fractions`` splits the devices (default: equal split). Returns the
    branch results in order.
    """
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) >= len(branch_fns):
        fractions = fractions or [1.0 / len(branch_fns)] * len(branch_fns)
        groups = split_core_groups(fractions, devices)
    else:
        # single-device host: both branches share it
        groups = [devices for _ in branch_fns]

    results = [BranchResult() for _ in branch_fns]

    def runner(i: int) -> None:
        try:
            results[i].value = branch_fns[i](groups[i])
        except BaseException as exc:  # surfaced at join
            results[i].error = exc

    threads = [
        threading.Thread(target=runner, args=(i,), name=f"branch-{i}")
        for i in range(len(branch_fns))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, r in enumerate(results):
        if r.error is not None:
            raise RuntimeError(
                f"branch {i} failed: {r.error}"
            ) from r.error
    return [r.value for r in results]


def asr_and_diarization(
    asr_fn: Callable[[Sequence], Any],
    diar_fn: Callable[[Sequence], Any],
    asr_fraction: float = 0.75,
    devices: Optional[Sequence] = None,
) -> Tuple[Any, Any]:
    """The P1 split: the ASR branch takes the large core group (it
    carries the FLOPs), diarization the small one."""
    asr_result, diar_result = run_branches(
        [asr_fn, diar_fn],
        fractions=[asr_fraction, 1.0 - asr_fraction],
        devices=devices,
    )
    return asr_result, diar_result
