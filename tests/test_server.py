"""HTTP API tests against the real aiohttp app (demo-tiny model, CPU)."""

import asyncio
import json

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from f5tts_tpu.serve.server import build_app
from f5tts_tpu.utils.config import Settings


@pytest.fixture(scope="module")
def client():
    loop = asyncio.new_event_loop()
    settings = Settings(demo_tiny=True, warmup=False, speech_rate_limit="100/minute")
    app = build_app(settings)
    server = TestServer(app, loop=loop)
    client = TestClient(server, loop=loop)
    loop.run_until_complete(client.start_server())
    yield client, loop
    loop.run_until_complete(client.close())
    loop.close()


def _req(client_loop, method, path, **kw):
    client, loop = client_loop
    resp = loop.run_until_complete(client.request(method, path, **kw))
    body = loop.run_until_complete(resp.read())
    return resp, body


def test_health_and_index(client):
    resp, body = _req(client, "GET", "/v1/health")
    assert resp.status == 200
    data = json.loads(body)
    assert data["status"] == "healthy"
    assert "consecutive_failures" in data

    resp, body = _req(client, "GET", "/")
    assert resp.status == 200
    assert "/v1/audio/speech" in body.decode()


def test_speech_roundtrip(client):
    resp, body = _req(
        client, "POST", "/v1/audio/speech",
        json={"text": "server test sentence.", "nfe_step": 2, "seed": 4},
    )
    assert resp.status == 200
    assert resp.headers["Content-Type"].startswith("audio/wav")
    from f5tts_tpu.audio.io import read_wav

    wav, sr = read_wav(bytes(body))
    assert sr == 24000 and len(wav) > 1000 and np.isfinite(wav).all()

    # determinism with a fixed seed
    resp2, body2 = _req(
        client, "POST", "/v1/audio/speech",
        json={"text": "server test sentence.", "nfe_step": 2, "seed": 4},
    )
    assert body2 == body


def test_speech_streaming(client):
    resp, body = _req(
        client, "POST", "/v1/audio/speech",
        json={"text": "stream me please.", "nfe_step": 2, "response_format": "stream"},
    )
    assert resp.status == 200
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    pcm = np.frombuffer(body[44:], dtype=np.int16)
    assert len(pcm) > 1000


def test_error_paths(client):
    resp, _ = _req(client, "POST", "/v1/audio/speech", json={"text": ""})
    assert resp.status == 400
    resp, _ = _req(client, "POST", "/v1/audio/speech", json={"text": "x", "voice": "ghost"})
    assert resp.status == 400
    resp, _ = _req(client, "POST", "/v1/audio/speech", data=b"nonsense")
    assert resp.status == 400
    resp, _ = _req(client, "POST", "/v1/indic_chat", json={"prompt": "hi", "src_lang": "hin_Deva"})
    assert resp.status == 501  # no local LLM weights in this build
    resp, _ = _req(client, "POST", "/v1/translate", json={"sentences": ["hi"], "src_lang": "a", "tgt_lang": "b"})
    assert resp.status == 501


def test_voices_webui_metrics(client):
    resp, body = _req(client, "GET", "/v1/voices")
    assert resp.status == 200 and "default" in json.loads(body)["voices"]
    resp, body = _req(client, "GET", "/app")
    assert resp.status == 200 and b"Synthesize" in body
    resp, body = _req(client, "GET", "/v1/metrics")
    assert resp.status == 200 and "stages" in json.loads(body)


def test_speech_edit_route(client):
    import io

    from f5tts_tpu.audio.io import wav_bytes

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(24000) * 0.1).astype(np.float32)
    data = {"file": io.BytesIO(wav_bytes(wav, 24000)), "target_text": "edited words here.",
            "parts": "0.2,0.5", "nfe_step": "2", "seed": "3"}
    resp, body = _req(client, "POST", "/v1/speech_edit", data=data)
    assert resp.status == 200, body
    from f5tts_tpu.audio.io import read_wav

    out, sr = read_wav(bytes(body))
    assert sr == 24000 and len(out) > 1000 and np.isfinite(out).all()

    resp, body = _req(client, "POST", "/v1/speech_edit",
                      data={"file": io.BytesIO(wav_bytes(wav, 24000)), "target_text": "x.", "parts": "garbage"})
    assert resp.status == 400


def test_concurrent_requests_share_batches(client):
    c, loop = client

    async def fire(i):
        resp = await c.request(
            "POST", "/v1/audio/speech",
            json={"text": f"concurrent request number {i}.", "nfe_step": 2, "seed": i},
        )
        body = await resp.read()
        return resp.status, body

    async def run_all():
        return await asyncio.gather(*(fire(i) for i in range(6)))

    results = loop.run_until_complete(run_all())
    assert all(status == 200 for status, _ in results)

    resp, body = _req(client, "GET", "/v1/metrics")
    stats = json.loads(body)["batcher"]
    assert stats["rows"] >= 6
    # at least one multi-request batch formed (continuous batching active)
    assert stats["max_batch_seen"] >= 2, stats


def test_unload_load_cycle(client):
    resp, _ = _req(client, "POST", "/v1/unload_all_models")
    assert resp.status == 200
    resp, _ = _req(client, "POST", "/v1/audio/speech", json={"text": "hi."})
    assert resp.status == 503  # model not loaded
    resp, _ = _req(client, "POST", "/v1/load_all_models")
    assert resp.status == 200
    resp, _ = _req(client, "POST", "/v1/audio/speech", json={"text": "hi again.", "nfe_step": 2})
    assert resp.status == 200


def test_multistyle_speech(client):
    # {default} resolves to the built-in voice; {Regular} maps to the request
    # default; unknown bracketed words stay verbatim in the text
    resp, body = _req(
        client, "POST", "/v1/audio/speech",
        json={"text": "First part. {default} second part [not a voice]. {Regular} third.",
              "nfe_step": 2, "seed": 9},
    )
    assert resp.status == 200
    from f5tts_tpu.audio.io import read_wav

    wav, sr = read_wav(bytes(body))
    assert sr == 24000 and len(wav) > 1000 and np.isfinite(wav).all()

    # single-segment output for comparison: multi-style concat is longer
    resp2, body2 = _req(
        client, "POST", "/v1/audio/speech",
        json={"text": "First part.", "nfe_step": 2, "seed": 9},
    )
    wav2, _ = read_wav(bytes(body2))
    assert len(wav) > len(wav2)


def test_visual_query_gated(client):
    import io

    # missing parts -> 400
    resp, _ = _req(client, "POST", "/v1/visual_query", data={"query": "what is this?"})
    assert resp.status == 400
    # valid request but no local VLM weights -> 501
    png = io.BytesIO(
        b"\x89PNG\r\n\x1a\n" + bytes.fromhex(
            "0000000d49484452000000010000000108020000009077"
            "53de0000000c4944415408d763f8cfc000000301010018"
            "dd8db00000000049454e44ae426082"))
    resp, body = _req(client, "POST", "/v1/visual_query",
                      data={"file": png, "query": "what is this?", "src_lang": "eng_Latn"})
    assert resp.status == 501, body
    resp, _ = _req(client, "POST", "/v1/document_query_batch",
                   data={"file": io.BytesIO(png.getvalue()), "query": "q"})
    assert resp.status == 501


def test_model_info_and_ckpt_picker_validation(client):
    """Custom-ckpt picker routes: GET /v1/model reports state; POST
    /v1/load_model rejects nonexistent paths without unloading state loss."""
    resp, body = _req(client, "GET", "/v1/model")
    assert resp.status == 200
    info = json.loads(body)
    assert info["demo_tiny"] is True and "last_used" in info

    resp, body = _req(client, "POST", "/v1/load_model",
                      json={"tts_ckpt": "/nonexistent/model.pt",
                            "tts_vocab": "/nonexistent/vocab.txt",
                            "vocoder_ckpt": "/nonexistent/vocos.bin"})
    assert resp.status == 400
    assert "nonexistent" in json.loads(body)["error"]

    # the served demo model still answers after the rejected swap
    resp, body = _req(client, "POST", "/v1/audio/speech",
                      json={"text": "still alive.", "nfe_step": 2})
    assert resp.status == 200 and body[:4] == b"RIFF"

    # paths that exist but are not checkpoints: load fails AND the previous
    # (demo) model is rolled back, so serving continues
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        for name in ("m.pt", "v.txt", "voc.bin"):
            open(os.path.join(d, name), "w").write("not a checkpoint")
        resp, body = _req(client, "POST", "/v1/load_model",
                          json={"tts_ckpt": os.path.join(d, "m.pt"),
                                "tts_vocab": os.path.join(d, "v.txt"),
                                "vocoder_ckpt": os.path.join(d, "voc.bin")})
        assert resp.status == 400
        assert "previous model restored" in json.loads(body).get("rollback", "")
    resp, body = _req(client, "POST", "/v1/audio/speech",
                      json={"text": "rolled back fine.", "nfe_step": 2})
    assert resp.status == 200 and body[:4] == b"RIFF"


def test_server_sampler_acceleration_knobs():
    """F5TPU_CFG_CACHE / F5TPU_CFG_INTERVAL settings reach the engine and the
    speech route still produces audio."""
    loop = asyncio.new_event_loop()
    settings = Settings(demo_tiny=True, warmup=False, speech_rate_limit="100/minute",
                        cfg_cache=2)
    app = build_app(settings)
    server = TestServer(app, loop=loop)
    c = TestClient(server, loop=loop)
    loop.run_until_complete(c.start_server())
    try:
        resp = loop.run_until_complete(c.request(
            "POST", "/v1/audio/speech", json={"text": "cached guidance.", "nfe_step": 4}))
        body = loop.run_until_complete(resp.read())
        assert resp.status == 200 and body[:4] == b"RIFF"
        svc = app["service"] if "service" in app else None
        # the knob must be live on the engine config
        eng = svc.engine if svc else None
        if eng is not None:
            assert eng.cfg.sampler.cfg_cache_period == 2
    finally:
        loop.run_until_complete(c.close())
        loop.close()


def test_server_step_batcher_mode():
    """batcher=step serves concurrent speech requests through the step-level
    continuous batcher (mid-solve join/leave path)."""
    loop = asyncio.new_event_loop()
    settings = Settings(demo_tiny=True, warmup=False, speech_rate_limit="100/minute",
                        batcher="step")
    app = build_app(settings)
    server = TestServer(app, loop=loop)
    c = TestClient(server, loop=loop)
    loop.run_until_complete(c.start_server())
    try:
        async def burst():
            reqs = [c.request("POST", "/v1/audio/speech",
                              json={"text": f"step batched {i}.", "nfe_step": 2})
                    for i in range(3)]
            resps = await asyncio.gather(*reqs)
            return [(r.status, await r.read()) for r in resps]

        out = loop.run_until_complete(burst())
        assert all(st == 200 and body[:4] == b"RIFF" for st, body in out)
        svc = app["service"]
        from f5tts_tpu.engine.step_batcher import StepBatcher

        assert isinstance(svc.batcher, StepBatcher)
        assert svc.batcher.stats["rows"] >= 3
    finally:
        loop.run_until_complete(c.close())
        loop.close()


def test_streaming_response_carries_cors(client):
    """Streamed responses flush headers at prepare(); the CORS middleware
    can't add headers afterwards, so the stream handler must set them before
    preparing (a cross-origin browser fetch is blocked without them)."""
    resp, body = _req(
        client, "POST", "/v1/audio/speech",
        json={"text": "cors stream.", "nfe_step": 2, "response_format": "stream"},
    )
    assert resp.status == 200
    assert resp.headers.get("Access-Control-Allow-Origin") == "*"
    assert body[:4] == b"RIFF"


def test_transcribe_malformed_body_is_400(client):
    """Non-multipart or empty-multipart ASR uploads are client errors, not
    AttributeError-turned-500s."""
    resp, _ = _req(client, "POST", "/v1/transcribe/", data=b"not multipart")
    assert resp.status == 400
    resp, _ = _req(client, "POST", "/v1/speech_to_speech", data=b"not multipart")
    assert resp.status == 400


def test_failed_load_leaves_service_unloaded(tmp_path):
    """A failure AFTER the engine is constructed (corrupt voice wav) must not
    leave the service half-loaded (loaded==True made load_model's rollback a
    silent no-op and served an un-warmed model under stale settings)."""
    from f5tts_tpu.serve.server import ModelService
    from f5tts_tpu.utils.config import Settings

    (tmp_path / "bad.wav").write_bytes(b"RIFFnope")
    settings = Settings(demo_tiny=True, warmup=False, voices_dir=str(tmp_path))
    service = ModelService(settings)
    with pytest.raises(Exception):
        service.load()
    assert not service.loaded
    assert service.batcher is None
    # a later load with good settings recovers cleanly
    settings.voices_dir = ""
    service.load()
    assert service.loaded and "default" in service.voices
    service.unload()


def test_prometheus_metrics_exposition(client):
    """/metrics (and ?format=prometheus) emit Prometheus text exposition —
    model gauge, failure counters, batcher counters, stage quantiles."""
    resp, body = _req(client, "GET", "/metrics")
    assert resp.status == 200
    text = body.decode()
    assert resp.headers["Content-Type"].startswith("text/plain")
    assert "f5tpu_model_loaded 1" in text
    assert "f5tpu_reloads_total" in text
    resp, body = _req(client, "GET", "/v1/metrics?format=prometheus")
    assert body.decode() == text or "f5tpu_model_loaded" in body.decode()
    resp, body = _req(client, "GET", "/v1/metrics")
    assert "stages" in json.loads(body)  # JSON view unchanged


def test_server_bigvgan_vocoder():
    """F5TPU_VOCODER_TYPE=bigvgan serves through the BigVGAN head."""
    loop = asyncio.new_event_loop()
    settings = Settings(demo_tiny=True, warmup=False, vocoder_type="bigvgan",
                        speech_rate_limit="100/minute")
    app = build_app(settings)
    server = TestServer(app, loop=loop)
    c = TestClient(server, loop=loop)
    loop.run_until_complete(c.start_server())
    try:
        resp, body = _req((c, loop), "POST", "/v1/audio/speech",
                          json={"text": "bigvgan server.", "nfe_step": 2, "seed": 1})
        assert resp.status == 200
        from f5tts_tpu.audio.io import read_wav

        wav, sr = read_wav(bytes(body))
        assert sr == 24000 and len(wav) > 1000 and np.isfinite(wav).all()
    finally:
        loop.run_until_complete(c.close())
        loop.close()
    with pytest.raises(ValueError):
        Settings(vocoder_type="nonsense")


def test_server_parler_branch():
    """F5TPU_TTS_MODEL=parler serves the AR branch: style description +
    prompt in, 44.1 kHz DAC audio out, batched through the continuous
    batcher; response_format=stream streams the incremental AR decode and
    equals the batched output."""
    loop = asyncio.new_event_loop()
    settings = Settings(demo_tiny=True, warmup=False, tts_model="parler",
                        speech_rate_limit="100/minute")
    app = build_app(settings)
    server = TestServer(app, loop=loop)
    c = TestClient(server, loop=loop)
    loop.run_until_complete(c.start_server())
    try:
        resp, body = _req((c, loop), "GET", "/v1/health")
        assert json.loads(body)["model"].endswith("-parler")
        resp, body = _req((c, loop), "POST", "/v1/audio/speech",
                          json={"text": "parler utterance.", "seed": 3,
                                "description": "a calm speaker."})
        assert resp.status == 200
        from f5tts_tpu.audio.io import read_wav

        wav, sr = read_wav(bytes(body))
        assert sr == 44100 and len(wav) > 100 and np.isfinite(wav).all()
        # deterministic under greedy demo decoding
        resp, body2 = _req((c, loop), "POST", "/v1/audio/speech",
                           json={"text": "parler utterance.", "seed": 3,
                                 "description": "a calm speaker."})
        assert body2 == body
        # streaming: chunked WAV whose PCM equals the batched output
        resp, sbody = _req((c, loop), "POST", "/v1/audio/speech",
                           json={"text": "parler utterance.", "seed": 3,
                                 "description": "a calm speaker.",
                                 "response_format": "stream"})
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("audio/wav")
        streamed = np.frombuffer(bytes(sbody)[44:], dtype="<i2").astype(np.float32) / 32768.0
        assert len(streamed) == len(wav)
        np.testing.assert_allclose(streamed, wav, atol=2 / 32768.0)
        resp, body = _req((c, loop), "GET", "/v1/model",
                          headers={})
        assert json.loads(body)["tts_model"] == "parler"
    finally:
        loop.run_until_complete(c.close())
        loop.close()


def test_server_parler_over_budget_text_is_400():
    """An over-budget parler request 400s alone, before batching — it must
    not fail a co-batched group or trip the failure-recovery reload."""
    loop = asyncio.new_event_loop()
    settings = Settings(demo_tiny=True, warmup=False, tts_model="parler",
                        speech_rate_limit="100/minute")
    app = build_app(settings)
    server = TestServer(app, loop=loop)
    c = TestClient(server, loop=loop)
    loop.run_until_complete(c.start_server())
    try:
        resp, body = _req((c, loop), "POST", "/v1/audio/speech",
                          json={"text": "y" * 500, "description": "a speaker."})
        assert resp.status == 400
        assert json.loads(body)["error"].startswith("text is")
        # a description-less request must use a default that fits the budget
        resp, _ = _req((c, loop), "POST", "/v1/audio/speech", json={"text": "hello."})
        assert resp.status == 200
        resp, body = _req((c, loop), "GET", "/v1/health")
        assert json.loads(body)["consecutive_failures"] == 0
        # speech_edit is a flow capability: clean 501 on this branch
        resp, _ = _req((c, loop), "POST", "/v1/speech_edit", data={"target_text": "x"})
        assert resp.status == 501
    finally:
        loop.run_until_complete(c.close())
        loop.close()


def test_voice_slot_management(client, tmp_path):
    """Voice-slot API (gradio multistyle slot workflow, infer_gradio.py:317-499):
    upload a named reference voice, it becomes usable for synthesis, delete it;
    the last remaining voice cannot be deleted; bad names 400."""
    import io
    import wave as wave_mod

    import numpy as np

    def wav_bytes():
        sr = 24000
        t = np.arange(sr) / sr
        pcm = (np.sin(2 * np.pi * 300 * t) * 0.2 * 32767).astype("<i2")
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
        return buf.getvalue()

    import aiohttp

    form = aiohttp.FormData()
    form.add_field("name", "narrator_f")
    form.add_field("ref_text", "a calm narration voice.")
    form.add_field("file", wav_bytes(), filename="v.wav", content_type="audio/wav")
    resp, body = _req(client, "POST", "/v1/voices", data=form)
    assert resp.status == 200, body
    assert "narrator_f" in json.loads(body)["voices"]

    # synthesize with the new slot
    resp, body = _req(client, "POST", "/v1/audio/speech",
                      json={"text": "testing the new voice.", "voice": "narrator_f", "nfe_step": 2})
    assert resp.status == 200, body

    # bad name rejected
    bad = aiohttp.FormData()
    bad.add_field("name", "../evil")
    bad.add_field("file", wav_bytes(), filename="v.wav", content_type="audio/wav")
    resp, body = _req(client, "POST", "/v1/voices", data=bad)
    assert resp.status == 400

    resp, body = _req(client, "DELETE", "/v1/voices/narrator_f")
    assert resp.status == 200
    assert "narrator_f" not in json.loads(body)["voices"]

    # cannot delete the last voice
    remaining = json.loads(body)["voices"]
    for name in remaining[:-1]:
        _req(client, "DELETE", f"/v1/voices/{name}")
    resp, body = _req(client, "DELETE", f"/v1/voices/{remaining[-1]}")
    assert resp.status == 400


def test_server_sampler_env_knobs_build_the_engine_sampler():
    """F5TPU_ODE_METHOD / F5TPU_NFE / F5TPU_CFG_CACHE reach the engine's
    sampler: euler-only knobs force euler, nfe counts evals per branch, and
    the default (no knobs) is the certified ralston recipe."""
    from f5tts_tpu.serve.server import ModelService
    from f5tts_tpu.utils.config import Settings

    svc = ModelService(Settings(demo_tiny=True, warmup=False))
    svc.load()
    assert (svc.engine.cfg.sampler.method, svc.engine.cfg.sampler.steps) == ("ralston", 10)
    svc.unload()

    svc = ModelService(Settings(demo_tiny=True, warmup=False, ode_method="euler", nfe=32))
    svc.load()
    assert (svc.engine.cfg.sampler.method, svc.engine.cfg.sampler.steps) == ("euler", 32)
    svc.unload()

    svc = ModelService(Settings(demo_tiny=True, warmup=False, cfg_cache=4))
    svc.load()
    s = svc.engine.cfg.sampler
    assert (s.method, s.steps, s.cfg_cache_period) == ("euler", 32, 4)
    svc.unload()

    svc = ModelService(Settings(demo_tiny=True, warmup=False, ode_method="midpoint", nfe=16))
    svc.load()
    assert (svc.engine.cfg.sampler.method, svc.engine.cfg.sampler.steps) == ("midpoint", 8)
    svc.unload()
