"""Device utilization/memory reporting.

The TPU replacement for the reference's nvidia-smi shell-out
(main.py:85-100): per-device memory stats come from JAX's
memory_stats(), printed in the same one-line spirit.
"""

from __future__ import annotations

from typing import Dict, List

import jax

from .logging import get_logger

logger = get_logger(__name__)


def device_memory_stats() -> List[Dict]:
    """Per-device memory stats (bytes), empty dict when the backend
    doesn't expose them."""
    stats = []
    for dev in jax.devices():
        try:
            s = dev.memory_stats() or {}
        except Exception:
            s = {}
        stats.append(
            {
                "device": str(dev),
                "bytes_in_use": s.get("bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            }
        )
    return stats


def monitor_device_usage() -> None:
    """Log one line per device (contract: the reference's
    ``monitor_gpu_usage`` print, main.py:96)."""
    for s in device_memory_stats():
        used = s["bytes_in_use"]
        limit = s["bytes_limit"]
        if used is not None and limit:
            logger.info(
                "%s: %.0f/%.0f MB (%.1f%%)",
                s["device"],
                used / 2**20,
                limit / 2**20,
                100.0 * used / limit,
            )
        else:
            logger.info("%s: memory stats unavailable", s["device"])
