import numpy as np
import pytest

import jax

from whisper_nemo_tpu.engine.transcribe import WhisperEngine
from whisper_nemo_tpu.models.whisper import WhisperDims, init_whisper_params
from whisper_nemo_tpu.serving.scheduler import WindowScheduler
from whisper_nemo_tpu.text.tokenizer import WhisperTokenizer


@pytest.fixture(scope="module")
def engine():
    dims = WhisperDims(
        n_audio_ctx=1500, n_audio_layer=1, n_text_layer=1,
        n_audio_state=64, n_text_state=64, n_audio_head=4, n_text_head=4,
        n_vocab=51865, n_text_ctx=96,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), dims)
    return WhisperEngine(
        "tiny", params=params, dims=dims,
        tokenizer=WhisperTokenizer.byte_fallback(),
    )


def test_scheduler_single_request(engine):
    sched = WindowScheduler(engine, batch_size=4, max_new_tokens=8)
    try:
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal(40 * 16000) * 0.2).astype(np.float32)
        segments = sched.transcribe(audio, "en")
        assert len(segments) >= 2
        for s in segments:
            assert s.end > s.start
    finally:
        sched.shutdown()


def test_scheduler_concurrent_requests_share_batches(engine):
    import threading

    sched = WindowScheduler(
        engine, batch_size=8, max_wait_s=0.2, max_new_tokens=8
    )
    try:
        rng = np.random.default_rng(1)
        results = {}

        def client(name, seed):
            audio = (
                np.random.default_rng(seed).standard_normal(35 * 16000) * 0.2
            ).astype(np.float32)
            results[name] = sched.transcribe(audio, "en")

        threads = [
            threading.Thread(target=client, args=(f"c{i}", i))
            for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert set(results) == {"c0", "c1", "c2"}
        for segs in results.values():
            assert len(segs) >= 1
            # windows are returned in submission (time) order
            starts = [s.start for s in segs]
            assert starts == sorted(starts)
    finally:
        sched.shutdown()


def test_scheduler_buckets_and_warmup(engine):
    sched = WindowScheduler(engine, batch_size=6, max_new_tokens=8)
    try:
        assert sched._buckets() == [1, 2, 4, 6]
        assert sched._bucket_for(1) == 1
        assert sched._bucket_for(3) == 4
        assert sched._bucket_for(5) == 6
        assert sched._bucket_for(6) == 6
        sched.warmup()  # compiles every bucket; must not deadlock
        audio = (
            np.random.default_rng(3).standard_normal(16000) * 0.2
        ).astype(np.float32)
        segments = sched.transcribe(audio, "en")
        assert len(segments) >= 1
    finally:
        sched.shutdown()


def test_scheduler_bucket_list_override(engine, monkeypatch):
    # explicit list: single bucket recovers full-batch padding
    sched = WindowScheduler(engine, batch_size=6, bucket_sizes=[6])
    try:
        assert sched._buckets() == [6]
        assert sched._bucket_for(1) == 6
    finally:
        sched.shutdown()
    # env override, clamped to batch_size, batch_size appended
    monkeypatch.setenv("WNT_SERVING_BUCKETS", "2,99")
    sched = WindowScheduler(engine, batch_size=6)
    try:
        assert sched._buckets() == [2, 6]
    finally:
        sched.shutdown()


def test_scheduler_error_propagates(engine):
    sched = WindowScheduler(engine, batch_size=2, max_new_tokens=8)
    try:
        # poison the engine to force a batch failure
        original = engine._decode_batch

        def boom(*a, **k):
            raise RuntimeError("decode exploded")

        engine._decode_batch = boom
        futures = sched.submit_audio(
            (np.random.default_rng(2).standard_normal(16000) * 0.3).astype(
                np.float32
            ),
            "en",
        )
        with pytest.raises(RuntimeError, match="decode exploded"):
            for f in futures:
                f.result(timeout=60)
        engine._decode_batch = original
    finally:
        engine._decode_batch = original
        sched.shutdown()


def test_scheduler_two_tier_pad_target(engine, monkeypatch):
    """Two-tier policy (VERDICT r3 ask #4): partial batches pad to
    small buckets only while the scheduler is idle; a full batch or a
    queue backlog flips it to full-batch padding for load_cooldown_s
    (so saturated runs keep one hot executable), then decays back."""
    sched = WindowScheduler(engine, batch_size=8, load_cooldown_s=0.2)
    try:
        assert sched.bucket_policy == "two-tier"
        # idle: smallest bucket
        assert not sched._loaded(n_collected=1)
        assert sched._pad_target(1, loaded=False) == 1
        assert sched._pad_target(3, loaded=False) == 4
        # a full batch marks the scheduler loaded -> full padding
        assert sched._loaded(n_collected=8)
        assert sched._pad_target(1, loaded=True) == 8
        assert sched._pad_target(5, loaded=True) == 8
        # the loaded state decays after the cooldown
        import time

        time.sleep(0.25)
        assert not sched._loaded(n_collected=1)
        assert sched._pad_target(1, sched._loaded(1)) == 1
        # a queue backlog also marks loaded
        sched._queue.put(object())
        assert sched._loaded(n_collected=1)
        sched._queue.get()
    finally:
        sched.shutdown()

    # policy overrides
    monkeypatch.setenv("WNT_SERVING_BUCKET_POLICY", "never")
    sched = WindowScheduler(engine, batch_size=8)
    try:
        assert sched._pad_target(1, loaded=False) == 8
    finally:
        sched.shutdown()
    monkeypatch.setenv("WNT_SERVING_BUCKET_POLICY", "always")
    sched = WindowScheduler(engine, batch_size=8, load_cooldown_s=60.0)
    try:
        assert sched._pad_target(1, loaded=True) == 1
    finally:
        sched.shutdown()
