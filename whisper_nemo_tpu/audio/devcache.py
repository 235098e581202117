"""One-upload device residency for waveforms shared across stages.

The pipeline's three stages (ASR, forced alignment, diarization) all
consume the same decoded waveform, and at hour scale each independently
uploaded it — ~230 MB of float32 per stage over the host↔device link
(the diarizer twice: VAD features + embedding features). On the
tunnel-attached TPU that link runs at ~23 MB/s, so redundant uploads
alone cost tens of seconds per hour of audio.

``device_waveform(audio)`` uploads a host waveform once and returns the
device-resident float32 array; subsequent calls with the *same host
array object* return the cached device buffer. Stages gather their
windows/chunks on device from this single copy (see
``engine/transcribe.py`` window gather, ``align/api.py`` chunking).

Caching is keyed by ``id(array)`` and guarded by a weak reference, so a
recycled id after garbage collection can never alias a different
array. The cache keeps at most ``_MAX_ENTRIES`` waveforms (an hour of
float32 audio is ~230 MB of HBM) in LRU order.

Reference contract: the reference pipeline equally decodes once and
hands the same tensor to every stage (diarize.py audio_waveform use);
this module is the TPU-native equivalent of that single residency.
"""

from __future__ import annotations

import threading
import weakref
from collections import OrderedDict

import numpy as np

_MAX_ENTRIES = 2
_lock = threading.Lock()
# id(host_array) -> (weakref to host_array, device_array)
_cache: "OrderedDict[int, tuple]" = OrderedDict()


def device_waveform(audio):
    """Host float waveform -> device-resident float32 array (cached).

    Already-device arrays (anything that is not an ``np.ndarray``) pass
    through unchanged, so callers can hand a device array down a stage
    stack without re-wrapping.
    """
    import jax.numpy as jnp

    if not isinstance(audio, np.ndarray):
        return audio  # already on device (jax.Array)

    key = id(audio)
    with _lock:
        hit = _cache.get(key)
        if hit is not None:
            ref, dev = hit
            if ref() is audio:
                _cache.move_to_end(key)
                return dev
            del _cache[key]  # stale id reuse

    host = audio if audio.dtype == np.float32 else audio.astype(np.float32)
    dev = jnp.asarray(host)

    with _lock:
        _cache[key] = (weakref.ref(audio), dev)
        while len(_cache) > _MAX_ENTRIES:
            _cache.popitem(last=False)
    return dev


_clear_hooks: list = []


def register_clear_hook(fn) -> None:
    """Register a callable to run on ``clear_cache()``.

    Long-lived bench/serving sessions reclaim HBM between steps via
    ``engine.unload()`` + ``clear_cache()`` (CLAUDE.md environment
    rules); any module that pins device buffers or jitted executables
    in its own module-level cache (e.g. ``models.htdemucs``'s window-
    batch jit, which holds an ``idx_dev`` constant and one executable
    per padded audio length) registers its clearer here so those
    survive neither."""
    with _lock:
        if fn not in _clear_hooks:
            _clear_hooks.append(fn)


def clear_cache() -> None:
    """Drop every cached device waveform (frees the HBM buffers) and
    run registered module-cache clearers."""
    with _lock:
        _cache.clear()
        hooks = list(_clear_hooks)
    for fn in hooks:
        fn()
