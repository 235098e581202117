import asyncio
import json

import numpy as np
import pytest

from whisper_nemo_tpu.serving.schemas import (
    TranscriptionRequest,
    TranscriptionResponse,
)
from whisper_nemo_tpu.serving.download import suffix_for_content_type


def test_request_schema_defaults():
    req = TranscriptionRequest(audio_url="https://example.com/a.mp3")
    assert req.language == "fr"
    assert req.min_speakers == 1
    assert req.max_speakers == 4
    assert req.transcription_only is False


def test_request_schema_language_validation():
    with pytest.raises(Exception):
        TranscriptionRequest(
            audio_url="https://example.com/a.mp3", language="zz"
        )
    req = TranscriptionRequest(
        audio_url="https://example.com/a.mp3", language="auto"
    )
    assert req.language == "auto"


def test_suffix_sniffing():
    assert suffix_for_content_type("audio/mpeg") == ".mp3"
    assert suffix_for_content_type("audio/mp4") == ".mp4"
    assert suffix_for_content_type("video/webm") == ".webm"
    assert suffix_for_content_type("application/octet-stream") == ".wav"
    assert suffix_for_content_type("") == ".wav"


@pytest.fixture()
def serving_with_test_models(monkeypatch, tmp_path):
    """Wire the handler to a local file:// 'download' and tiny models."""
    import jax

    from whisper_nemo_tpu import serving
    from whisper_nemo_tpu.audio import write_wav
    from whisper_nemo_tpu.engine.transcribe import WhisperEngine
    from whisper_nemo_tpu.models.whisper import WhisperDims, init_whisper_params
    import importlib

    # the package exports the handler *function* under the same name as
    # the module, so resolve the module explicitly
    handler_mod = importlib.import_module("whisper_nemo_tpu.serving.handler")
    from whisper_nemo_tpu.text.tokenizer import WhisperTokenizer
    from whisper_nemo_tpu.asr.openai_api import OpenAIWhisperModel
    from whisper_nemo_tpu.config import domain_config
    from whisper_nemo_tpu.diarize import SpeakerDiarizationPipeline

    # tiny whisper behind the openai facade
    dims = WhisperDims(
        n_audio_layer=1, n_text_layer=1, n_audio_state=64, n_text_state=64,
        n_audio_head=4, n_text_head=4, n_vocab=51865, n_text_ctx=48,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), dims)
    shim = OpenAIWhisperModel.__new__(OpenAIWhisperModel)
    shim.engine = WhisperEngine(
        "tiny", params=params, dims=dims,
        tokenizer=WhisperTokenizer.byte_fallback(),
    )
    shim.name = "tiny"
    handler_mod.whisper_model = shim
    handler_mod.diarization_pipeline = (
        SpeakerDiarizationPipeline(domain_config("telephonic"))
    )

    # audio fixture served from disk instead of http
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(2 * 16000) * 0.2).astype(np.float32)
    wav_path = tmp_path / "in.wav"
    write_wav(str(wav_path), audio)

    async def fake_download(url):
        return str(wav_path)

    monkeypatch.setattr(handler_mod, "download_audio_file", fake_download)
    monkeypatch.setattr(handler_mod, "WHISPER_MODEL_NAME", "tiny")

    # the serving decode path: timestamped window scheduler
    from whisper_nemo_tpu.serving.scheduler import WindowScheduler

    scheduler = WindowScheduler(
        shim.engine, batch_size=4, max_wait_s=0.3,
        without_timestamps=False, max_new_tokens=8,
    )
    monkeypatch.setattr(handler_mod, "window_scheduler", scheduler)
    yield handler_mod
    scheduler.shutdown()


def test_handler_full_job(serving_with_test_models):
    handler_mod = serving_with_test_models
    job = {
        "id": "job-1",
        "input": {
            "audio_url": "https://example.com/audio.wav",
            "language": "en",
            "max_speakers": 2,
        },
    }
    result = asyncio.run(handler_mod.handler(job))
    assert result["success"] is True, result.get("error")
    assert result["model"] == "tiny"
    assert "transcription_brute" in result
    assert "statistiques" in result
    stats = result["statistiques"]
    assert "speakers_detectes" in stats
    assert "language_detected" in stats
    assert result["processing_time"] > 0
    json.dumps(result)  # fully JSON-serializable


def test_handler_transcription_only(serving_with_test_models):
    handler_mod = serving_with_test_models
    job = {
        "input": {
            "audio_url": "https://example.com/audio.wav",
            "language": "en",
            "transcription_only": True,
        }
    }
    result = asyncio.run(handler_mod.handler(job))
    assert result["success"] is True
    assert result["transcription_formatee"] is None
    assert "nombre_segments" in result["statistiques"]


def test_handler_fallback_without_scheduler(serving_with_test_models, monkeypatch):
    """WNT_SERVING_SCHEDULER=0 routes through the sequential
    openai-whisper facade (the reference-faithful path)."""
    handler_mod = serving_with_test_models
    monkeypatch.setenv("WNT_SERVING_SCHEDULER", "0")
    job = {
        "input": {
            "audio_url": "https://example.com/audio.wav",
            "language": "en",
            "transcription_only": True,
        }
    }
    result = asyncio.run(handler_mod.handler(job))
    assert result["success"] is True


def test_warmup_runs_serving_decode_path(serving_with_test_models):
    """warmup() must push a dummy window through the scheduler without
    raising (the reference's import-time fail-fast, main.py:33-38)."""
    handler_mod = serving_with_test_models
    batches = []
    orig = handler_mod.window_scheduler._process

    def spy(items, **kwargs):
        batches.append(len(items))
        return orig(items, **kwargs)

    handler_mod.window_scheduler._process = spy
    try:
        handler_mod.warmup()
    finally:
        handler_mod.window_scheduler._process = orig
    assert batches, "warmup did not reach the scheduler"


def test_concurrent_jobs_share_scheduler_batch(serving_with_test_models):
    """Two concurrent /run jobs over the real HTTP surface must ride
    one decode batch through the shared scheduler."""
    handler_mod = serving_with_test_models
    batch_sizes = []
    orig = handler_mod.window_scheduler._process

    def spy(items, **kwargs):
        batch_sizes.append(len(items))
        return orig(items, **kwargs)

    handler_mod.window_scheduler._process = spy

    async def run():
        from aiohttp import web
        from aiohttp.test_utils import TestClient, TestServer

        app = web.Application()

        async def run_route(request):
            job = await request.json()
            return web.json_response(await handler_mod.handler(job))

        app.router.add_post("/run", run_route)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            job = {
                "input": {
                    "audio_url": "https://example.com/audio.wav",
                    "language": "en",
                    "transcription_only": True,
                }
            }
            r1, r2 = await asyncio.gather(
                client.post("/run", json=job),
                client.post("/run", json=job),
            )
            j1, j2 = await r1.json(), await r2.json()
            assert j1["success"], j1.get("error")
            assert j2["success"], j2.get("error")
        finally:
            await client.close()

    try:
        asyncio.run(run())
    finally:
        handler_mod.window_scheduler._process = orig
    assert max(batch_sizes) >= 2, (
        f"jobs never shared a batch: {batch_sizes}"
    )


def test_handler_invalid_input(serving_with_test_models):
    handler_mod = serving_with_test_models
    result = asyncio.run(
        handler_mod.handler({"input": {"audio_url": "not-a-url"}})
    )
    assert result["success"] is False
    assert "error" in result


def test_stream_route_ndjson(serving_with_test_models):
    """POST /stream: chunked PCM in, NDJSON committed words + final
    done line out — exercised over a real aiohttp socket."""
    import asyncio
    import json

    handler_mod = serving_with_test_models

    async def run():
        from aiohttp import web
        from aiohttp.test_utils import TestClient, TestServer

        app = web.Application()
        app.router.add_post("/stream", handler_mod.stream_route)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            async def pcm_chunks():
                rng = np.random.default_rng(1)
                for _ in range(3):  # 3 x 1 s of s16 PCM
                    samples = (rng.standard_normal(16000) * 3000).astype(
                        "<i2"
                    )
                    yield samples.tobytes()

            resp = await client.post(
                "/stream?language=en", data=pcm_chunks()
            )
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith(
                "application/x-ndjson"
            )
            lines = [
                json.loads(l)
                for l in (await resp.text()).splitlines() if l
            ]
            assert lines, "no NDJSON lines"
            assert lines[-1].get("done") is True
            assert "text" in lines[-1]
            for word in lines[:-1]:
                assert set(word) == {"word", "start", "end"}
                assert word["end"] >= word["start"] >= 0

            # probe: bad format is a clean 400
            bad = await client.post("/stream?format=mp3", data=b"xx")
            assert bad.status == 400
            assert "unknown format" in (await bad.json())["error"]
        finally:
            await client.close()

    asyncio.run(run())
