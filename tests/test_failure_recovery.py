"""Failure detection: consecutive synthesis failures trigger one model reload."""

import time

import pytest
from aiohttp import web

from f5tts_tpu.serve.schemas import SpeechRequest
from f5tts_tpu.serve.server import ModelService
from f5tts_tpu.utils.config import Settings


def test_auto_reload_after_consecutive_failures():
    service = ModelService(Settings(demo_tiny=True, warmup=False))
    service.load()
    assert service.loaded

    class Boom(Exception):
        pass

    def broken(*a, **kw):
        raise Boom("device lost")

    service.engine.synthesize_rows = broken
    req = SpeechRequest(text="hello there.")

    for expected in (1, 2):
        with pytest.raises(web.HTTPInternalServerError):
            service.synthesize_sync(req)

    # second consecutive failure kicks off a background reload
    deadline = time.time() + 120
    while time.time() < deadline and service.reloads == 0:
        time.sleep(0.2)
    assert service.reloads == 1
    assert service.failures == 0
    assert service.loaded
    # reloaded engine is a fresh object (the monkeypatched one is gone)
    assert service.engine.synthesize_rows is not broken
    service.unload()
