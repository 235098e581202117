import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_nemo_tpu.models.whisper import (
    WhisperDims,
    encode,
    init_whisper_params,
)
from whisper_nemo_tpu.parallel import (
    make_mesh,
    shard_whisper_params,
    split_core_groups,
)


def test_make_mesh_shapes(cpu_devices):
    mesh = make_mesh({"dp": 2, "tp": 4})
    assert mesh.shape == {"dp": 2, "tp": 4}
    with pytest.raises(ValueError):
        make_mesh({"dp": 3, "tp": 2})


def test_split_core_groups(cpu_devices):
    groups = split_core_groups([0.75, 0.25])
    assert [len(g) for g in groups] == [6, 2]
    # disjoint and exhaustive
    flat = [d for g in groups for d in g]
    assert len(set(flat)) == 8
    groups = split_core_groups([0.5, 0.5])
    assert [len(g) for g in groups] == [4, 4]
    # every group gets at least one device
    groups = split_core_groups([0.99, 0.01])
    assert min(len(g) for g in groups) >= 1


def test_sharded_encode_matches_single_device(cpu_devices):
    dims = WhisperDims(
        n_audio_ctx=32,
        n_audio_layer=2,
        n_text_layer=1,
        n_audio_state=64,
        n_text_state=64,
        n_audio_head=4,
        n_text_head=4,
        n_vocab=128,
        n_text_ctx=16,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), dims)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 80, 64)), jnp.float32
    )
    ref = np.asarray(encode(params, mel, dims))

    mesh = make_mesh({"dp": 2, "tp": 2}, jax.devices()[:4])
    sharded_params = shard_whisper_params(params, mesh, dims)
    mel_sharded = jax.device_put(
        mel, NamedSharding(mesh, P("dp", None, None))
    )
    with mesh:
        out = jax.jit(lambda p, m: encode(p, m, dims))(
            sharded_params, mel_sharded
        )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_tp_sharded_decode_token_parity(cpu_devices):
    """tp=2 KV-cache *decode* must emit the same tokens as a single
    device (VERDICT r2 weak #3: the encoder had a dp×tp parity test but
    nothing pinned the sharded autoregressive loop — a TP bug in the
    cache layout or cross-KV would produce wrong tokens while keeping
    shapes)."""
    from whisper_nemo_tpu.engine.decode import DecodeOptions, greedy_decode
    from whisper_nemo_tpu.models.whisper import cross_attention_kv

    dims = WhisperDims(
        n_audio_ctx=32,
        n_audio_layer=1,
        n_text_layer=2,
        n_audio_state=64,
        n_text_state=64,
        n_audio_head=4,
        n_text_head=4,
        n_vocab=51865,
        n_text_ctx=32,
    )
    params = init_whisper_params(jax.random.PRNGKey(1), dims)
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 80, 64)), jnp.float32
    )
    prompt = jnp.tile(
        jnp.asarray([[50258, 50259, 50359, 50363]], jnp.int32), (4, 1)
    )
    suppress = jnp.zeros((dims.n_vocab,), jnp.float32)
    opts = DecodeOptions(max_new_tokens=8)

    def run(p, m, pr):
        feats = encode(p, m, dims)
        tokens, lengths, sum_lp, no_speech = greedy_decode(
            p, feats, pr, suppress, dims, opts, n_prompt=4
        )
        return tokens, lengths, sum_lp

    ref_tokens, ref_lengths, ref_lp = jax.jit(run)(params, mel, prompt)

    mesh = make_mesh({"dp": 2, "tp": 2}, jax.devices()[:4])
    sharded_params = shard_whisper_params(params, mesh, dims)
    mel_sh = jax.device_put(mel, NamedSharding(mesh, P("dp", None, None)))
    prompt_sh = jax.device_put(prompt, NamedSharding(mesh, P("dp", None)))
    with mesh:
        tok, lens, lp = jax.jit(run)(sharded_params, mel_sh, prompt_sh)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tokens))
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(ref_lengths))
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(ref_lp), rtol=1e-4, atol=1e-4
    )


def test_graft_entry_multichip(cpu_devices):
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_branch_device_placement(cpu_devices):
    """Serving-side two-branch placement (reference main.py:109-130):
    an engine committed to one device keeps params AND computation
    there; the diarizer's `.to(jax.Device)` commits its model trees."""
    import jax
    import numpy as np

    from whisper_nemo_tpu.config import create_config
    from whisper_nemo_tpu.diarize.pipeline import NeuralDiarizer
    from whisper_nemo_tpu.engine.transcribe import WhisperEngine
    from whisper_nemo_tpu.models.whisper import (
        WhisperDims,
        init_whisper_params,
    )
    from whisper_nemo_tpu.text.tokenizer import WhisperTokenizer

    devices = jax.devices()
    dims = WhisperDims(
        n_audio_layer=1, n_text_layer=1, n_audio_state=64, n_text_state=64,
        n_audio_head=4, n_text_head=4, n_vocab=51865, n_text_ctx=48,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), dims)
    engine = WhisperEngine(
        "tiny", params=params, dims=dims,
        tokenizer=WhisperTokenizer.byte_fallback(), device=devices[1],
    )
    leaf = jax.tree_util.tree_leaves(engine.params)[0]
    assert leaf.devices() == {devices[1]}

    audio = np.random.default_rng(0).standard_normal(16000).astype(
        np.float32
    ) * 0.1
    segments, info = engine.transcribe_batched(
        audio, language="en", batch_size=1, max_new_tokens=4
    )
    assert info.duration == 1.0

    import tempfile

    diar = NeuralDiarizer(create_config(tempfile.mkdtemp())).to(devices[-1])
    spk_leaf = jax.tree_util.tree_leaves(diar.spk_params)[0]
    assert spk_leaf.devices() == {devices[-1]}
