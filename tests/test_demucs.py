import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_nemo_tpu.models.demucs import (
    DemucsDims,
    init_demucs_params,
    istft,
    separate_vocals,
    separate_waveform,
    stft,
    vocal_mask,
)


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    spec = stft(jnp.asarray(wave))
    back = np.asarray(istft(spec, len(wave)))
    # overlap-add hann reconstruction must be near-exact away from edges
    np.testing.assert_allclose(back[2048:-2048], wave[2048:-2048], atol=1e-4)


@pytest.fixture(scope="module")
def small_demucs():
    dims = DemucsDims(channels=8, depth=2, freq_stride=4,
                      bottleneck_heads=2, bottleneck_layers=1)
    params = init_demucs_params(jax.random.PRNGKey(0), dims)
    return params, dims


def test_vocal_mask_bounds(small_demucs):
    params, dims = small_demucs
    mag = jnp.asarray(
        np.abs(np.random.default_rng(1).standard_normal((1, dims.n_freqs, 20))),
        jnp.float32,
    )
    mask = np.asarray(vocal_mask(params, mag, dims))
    assert mask.shape == (1, dims.n_freqs, 20)
    assert (mask >= 0).all() and (mask <= 1).all()


def test_separate_waveform_shape(small_demucs):
    params, dims = small_demucs
    wave = (np.random.default_rng(2).standard_normal(3 * 16000) * 0.2).astype(
        np.float32
    )
    vocals = separate_waveform(params, wave, dims)
    assert vocals.shape == wave.shape
    assert np.isfinite(vocals).all()
    # masked output can't exceed input energy by much
    assert np.abs(vocals).max() <= np.abs(wave).max() * 2


def test_separate_vocals_raises_without_checkpoint(tmp_path, monkeypatch):
    monkeypatch.setenv("WNT_MODEL_DIR", str(tmp_path))
    with pytest.raises(FileNotFoundError):
        separate_vocals("/tmp/nope.wav", str(tmp_path))


def test_separate_vocals_with_checkpoint(tmp_path, monkeypatch, small_demucs):
    """With a checkpoint installed the CLI layout contract holds."""
    import whisper_nemo_tpu.models.demucs as demucs_mod
    from whisper_nemo_tpu.audio import write_wav
    from whisper_nemo_tpu.engine.checkpoint import save_params

    params, dims = small_demucs
    monkeypatch.setenv("WNT_MODEL_DIR", str(tmp_path))
    save_params(str(tmp_path / "htdemucs.npz"), params)
    monkeypatch.setattr(demucs_mod, "DemucsDims", lambda: dims)

    wave = (np.random.default_rng(3).standard_normal(16000) * 0.2).astype(
        np.float32
    )
    src = tmp_path / "song.wav"
    write_wav(str(src), wave)
    out = separate_vocals(str(src), str(tmp_path / "temp_outputs"))
    assert out.endswith(os.path.join("htdemucs", "song", "vocals.wav"))
    import os.path as osp

    assert osp.exists(out)





def test_time_branch_shapes(small_demucs):
    from whisper_nemo_tpu.models.demucs import time_branch

    params, dims = small_demucs
    t = dims.time_stride ** dims.time_depth * 50
    wave = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, t)), jnp.float32
    )
    out = np.asarray(time_branch(params["time"], wave, dims))
    assert out.shape == (2, t)
    assert np.abs(out).max() <= 1.0  # tanh-bounded
