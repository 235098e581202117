import numpy as np
import pytest

import jax

from whisper_nemo_tpu.engine.transcribe import WhisperEngine
from whisper_nemo_tpu.models.whisper import WhisperDims, init_whisper_params
from whisper_nemo_tpu.parallel import make_mesh
from whisper_nemo_tpu.parallel.longform import transcribe_windows_sharded
from whisper_nemo_tpu.text.tokenizer import WhisperTokenizer

DIMS = WhisperDims(
    n_audio_ctx=1500,
    n_audio_layer=1,
    n_text_layer=1,
    n_audio_state=64,
    n_text_state=64,
    n_audio_head=4,
    n_text_head=4,
    n_vocab=51865,
    n_text_ctx=64,
)


def _engine(mesh=False):
    params = init_whisper_params(jax.random.PRNGKey(0), DIMS)
    return WhisperEngine(
        "tiny", params=params, dims=DIMS,
        tokenizer=WhisperTokenizer.byte_fallback(), mesh=mesh,
    )


def test_sharded_windows_match_unsharded(cpu_devices):
    rng = np.random.default_rng(0)
    # ~70s of audio with speech bursts → multiple windows
    audio = (rng.standard_normal(70 * 16000) * 0.2).astype(np.float32)

    plain_segments, _ = _engine().transcribe_batched(
        audio, language="en", batch_size=4,
        min_new_tokens=4, max_new_tokens=8,
    )

    mesh = make_mesh({"dp": 4}, jax.devices()[:4])
    engine = _engine()
    sharded_segments, info = transcribe_windows_sharded(
        engine, audio, mesh, language="en",
        windows_per_device=1, min_new_tokens=4, max_new_tokens=8,
    )
    assert engine.mesh is mesh  # placement committed for later calls
    assert info.duration == pytest.approx(70.0)
    assert len(sharded_segments) >= 2

    # same windows, same tokens regardless of sharding
    assert len(sharded_segments) == len(plain_segments)
    for a, b in zip(sharded_segments, plain_segments):
        assert a.start == b.start and a.end == b.end
        assert a.tokens == b.tokens
