"""Pod-scale long-form transcription: windows sharded over a mesh.

BASELINE.json config 5 ("multi-hour audio, chunked streaming decode
batched across a v5e pod"): the 30 s decode windows are data-parallel
work items, so the batch axis shards over the ``dp`` mesh axis while
parameters stay replicated (or tp-sharded via
``shard_whisper_params``). XLA inserts zero collectives for the
replicated-params case — every chip decodes its own windows; the only
synchronization is the final host gather of tokens.

Since round 4 the engine itself is mesh-aware
(``WhisperEngine(mesh=...)`` / the ``WNT_MESH`` env var /
``diarize.py --mesh``): ``transcribe_batched`` shards its window batch
over ``dp`` and its params carry TP specs, so the sharded path IS the
production path — VAD windowing, suppression defaults, beam search,
timestamp grammar, int8 and language detection included.
``transcribe_windows_sharded`` remains as the explicit-mesh API and
delegates to it.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from jax.sharding import Mesh

from ..engine.transcribe import Segment, TranscriptionInfo, WhisperEngine


def transcribe_windows_sharded(
    engine: WhisperEngine,
    audio: np.ndarray,
    mesh: Mesh,
    language: Optional[str] = "en",
    windows_per_device: int = 4,
    min_new_tokens: int = 0,
    max_new_tokens: Optional[int] = None,
    beam_size: int = 1,
    without_timestamps: bool = True,
    use_vad: bool = True,
    suppress_tokens=(-1,),
) -> Tuple[List[Segment], TranscriptionInfo]:
    """Batched transcription with the window batch sharded over the
    mesh's ``dp`` axis — the full production decode (VAD windowing,
    default suppression, beam search, timestamp grammar) running
    data-parallel. Parameters are resharded onto ``mesh`` if the engine
    was not already built with one (prefer ``WhisperEngine(mesh=...)``
    so placement happens once at load)."""
    prev_mesh = engine.mesh
    if prev_mesh is not mesh:
        from .sharding import shard_whisper_params

        engine.mesh = mesh
        engine.params = shard_whisper_params(
            engine.params, mesh, engine.dims
        )
        if engine._params_stacked is not None:
            engine._params_stacked = shard_whisper_params(
                engine._params_stacked, mesh, engine.dims
            )
    n_dev = mesh.shape.get("dp", 1)
    return engine.transcribe_batched(
        audio,
        language=language,
        suppress_tokens=suppress_tokens,
        batch_size=n_dev * windows_per_device,
        without_timestamps=without_timestamps,
        use_vad=use_vad,
        min_new_tokens=min_new_tokens,
        max_new_tokens=max_new_tokens,
        beam_size=beam_size,
    )
