"""Production multi-chip wiring (VERDICT r3 ask #1).

The mesh configuration surface (``WhisperEngine(mesh=...)`` /
``WNT_MESH`` / ``--mesh``) must route the REAL pipeline — stacked-scan
decode, int8 quantization, beam search, timestamp grammar, default
suppression — through dp×tp shardings with token-exact parity, and the
parallel CLI must run its branches on disjoint core groups
(reference contract: diarize_parallel.py:117-120 runs diarization in a
separate process on its own GPU; here the branches are device groups of
one slice, SURVEY P1).
"""

import argparse
import filecmp
import os
import shutil

import numpy as np
import pytest

import jax

from whisper_nemo_tpu.engine.transcribe import WhisperEngine
from whisper_nemo_tpu.models.whisper import WhisperDims, init_whisper_params
from whisper_nemo_tpu.parallel import make_mesh
from whisper_nemo_tpu.text.tokenizer import WhisperTokenizer

DIMS = WhisperDims(
    n_audio_ctx=1500,
    n_audio_layer=2,
    n_text_layer=2,
    n_audio_state=64,
    n_text_state=64,
    n_audio_head=4,
    n_text_head=4,
    n_vocab=51865,
    n_text_ctx=96,
)


def _engine(mesh=False, compute_type="default"):
    params = init_whisper_params(jax.random.PRNGKey(0), DIMS)
    return WhisperEngine(
        "tiny", params=params, dims=DIMS, compute_type=compute_type,
        tokenizer=WhisperTokenizer.byte_fallback(), mesh=mesh,
    )


def _audio():
    rng = np.random.default_rng(7)
    return (rng.standard_normal(70 * 16000) * 0.2).astype(np.float32)


def test_production_decode_parity_under_mesh(cpu_devices):
    """The production configuration — int8 weights, layer-stacked scan,
    beam-5 ancestry search, timestamp grammar, default ``(-1,)``
    suppression — decodes token-identically on a dp=4×tp=2 mesh and on
    a single device."""
    audio = _audio()
    kwargs = dict(
        language="en", batch_size=4, beam_size=5,
        without_timestamps=False, min_new_tokens=4, max_new_tokens=12,
    )
    plain, _ = _engine(compute_type="int8").transcribe_batched(
        audio, **kwargs
    )

    mesh = make_mesh({"dp": 4, "tp": 2}, jax.devices())
    sharded, _ = _engine(
        mesh=mesh, compute_type="int8"
    ).transcribe_batched(audio, **kwargs)

    assert len(plain) >= 2
    assert len(sharded) == len(plain)
    for a, b in zip(sharded, plain):
        assert (a.start, a.end) == (b.start, b.end)
        assert a.tokens == b.tokens


def test_engine_mesh_spec_string_and_env(cpu_devices, monkeypatch):
    """The configuration surface: a 'dp=4,tp=2' spec string and the
    WNT_MESH env var both build the same mesh placement."""
    e1 = _engine(mesh="dp=4,tp=2")
    assert e1.mesh is not None
    assert e1.mesh.shape == {"dp": 4, "tp": 2}

    monkeypatch.setenv("WNT_MESH", "dp=2")
    e2 = _engine(mesh=None)
    assert e2.mesh is not None and e2.mesh.shape == {"dp": 2}

    # mesh=False forces single-device regardless of env
    e3 = _engine(mesh=False)
    assert e3.mesh is None

    # a tp axis actually shards the attention projections
    qw = e1.params["decoder"]["blocks"][0]["attn"]["q"]
    leaf = qw.get("w", qw.get("w_q"))
    spec = leaf.sharding.spec
    assert "tp" in str(spec)


@pytest.fixture()
def short_wav(tmp_path):
    from whisper_nemo_tpu.audio import write_wav

    rng = np.random.default_rng(0)
    audio = np.zeros(4 * 16000, np.float32)
    audio[16000:48000] = rng.standard_normal(32000).astype(np.float32) * 0.2
    path = tmp_path / "clip.wav"
    write_wav(str(path), audio)
    return path


def _args(audio_path, **over):
    base = dict(
        audio=str(audio_path),
        stemming=False,
        suppress_numerals=False,
        model_name="tiny.en",
        batch_size=2,
        language="en",
        device="cpu",
        domain="telephonic",
        mesh=None,
    )
    base.update(over)
    return argparse.Namespace(**base)


def test_full_pipeline_sharded_parity(short_wav, tmp_path, monkeypatch):
    """run_sequential with --mesh dp=4,tp=2 produces byte-identical
    .txt/.srt to the single-device run (VERDICT r3 ask #1: the
    user-visible flag runs the sharded path, and it changes nothing
    but the device layout)."""
    monkeypatch.chdir(tmp_path)
    from whisper_nemo_tpu.cli.flow import run_sequential

    plain_wav = tmp_path / "plain.wav"
    mesh_wav = tmp_path / "mesh.wav"
    shutil.copy(short_wav, plain_wav)
    shutil.copy(short_wav, mesh_wav)

    run_sequential(_args(plain_wav))
    run_sequential(_args(mesh_wav, mesh="dp=4,tp=2"))

    for ext in (".txt", ".srt"):
        a = str(plain_wav)[:-4] + ext
        b = str(mesh_wav)[:-4] + ext
        assert os.path.exists(a) and os.path.exists(b)
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), f"{ext} diverged under mesh"


def test_parallel_flow_core_groups(short_wav, tmp_path, monkeypatch):
    """The in-process parallel CLI runs ASR and diarization on disjoint
    core groups via parallel.branch (not a bare thread), and its
    outputs match the sequential flow's byte-for-byte."""
    monkeypatch.chdir(tmp_path)
    import whisper_nemo_tpu.parallel.branch as branch_mod
    from whisper_nemo_tpu.cli.flow import run_parallel, run_sequential

    seq_wav = tmp_path / "seq.wav"
    par_wav = tmp_path / "par.wav"
    shutil.copy(short_wav, seq_wav)
    shutil.copy(short_wav, par_wav)

    run_sequential(_args(seq_wav))

    seen = {}
    orig = branch_mod.run_branches

    def spying_run_branches(branch_fns, fractions=None, devices=None):
        devices = list(devices if devices is not None else jax.devices())
        seen["n_branches"] = len(branch_fns)
        seen["n_devices"] = len(devices)
        return orig(branch_fns, fractions=fractions, devices=devices)

    monkeypatch.setattr(branch_mod, "run_branches", spying_run_branches)
    run_parallel(_args(par_wav, subprocess_diarization=False))

    assert seen.get("n_branches") == 2, "parallel flow bypassed run_branches"
    assert seen.get("n_devices") == 8

    for ext in (".txt", ".srt"):
        a = str(seq_wav)[:-4] + ext
        b = str(par_wav)[:-4] + ext
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), f"{ext}: parallel != sequential"
