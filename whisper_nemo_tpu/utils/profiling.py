"""Profiling hooks (SURVEY §5 tracing/profiling).

The reference's observability is wall-clock deltas + nvidia-smi polls;
here stage timing lives in ``utils.logging.stage_timer`` and deep
profiling uses jax.profiler traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax

from .logging import get_logger

logger = get_logger(__name__)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/wnt_profile") -> Iterator[None]:
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    """Named trace span (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
