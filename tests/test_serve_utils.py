"""Serve-layer utilities: settings, deployment config, rate limits, schemas,
time-to-words, zero-egress gating."""

import datetime
import json

import pytest

from f5tts_tpu.serve.schemas import SpeechRequest
from f5tts_tpu.utils.config import Settings, load_deployment_config, parse_rate_limit
from f5tts_tpu.utils.misc import load_audio, time_to_words


def test_settings_rate_limit_validation():
    Settings(speech_rate_limit="5/minute")
    with pytest.raises(ValueError):
        Settings(speech_rate_limit="whenever")


def test_parse_rate_limit():
    assert parse_rate_limit("5/minute") == (5, 60.0)
    assert parse_rate_limit("100/hour") == (100, 3600.0)


def test_deployment_config_merge(tmp_path):
    cfg = {
        "global_settings": {"port": 9000, "dtype": "float32", "lazy_load": True},
        "specific_configs": {"config_one": {"tts_ckpt": "/x/model.pt"}},
    }
    p = tmp_path / "deploy.json"
    p.write_text(json.dumps(cfg))
    s = load_deployment_config(str(p), "config_one", Settings())
    assert s.port == 9000 and s.dtype == "float32" and s.lazy_load_model and s.tts_ckpt == "/x/model.pt"
    with pytest.raises(ValueError):
        load_deployment_config(str(p), "config_nine", Settings())


def test_repo_deploy_config_loads():
    s = load_deployment_config("deploy_config.json", "config_two", Settings())
    assert s.tts_vocab.endswith("vocab.txt")


def test_speech_request_schema():
    r = SpeechRequest(input="hello")
    assert r.effective_text == "hello"
    with pytest.raises(ValueError):
        SpeechRequest(text="x" * 100_001)
    with pytest.raises(ValueError):
        SpeechRequest(text="hi", language="nope_Xxxx")
    assert SpeechRequest(text="hi", language="kan_Knda").language == "kan_Knda"


def test_time_to_words():
    ist = datetime.timezone(datetime.timedelta(hours=5, minutes=30))
    assert time_to_words(datetime.datetime(2026, 1, 1, 9, 0, tzinfo=ist)) == "nine o'clock"
    assert time_to_words(datetime.datetime(2026, 1, 1, 14, 35, tzinfo=ist)) == "two thirty five"


def test_load_audio_rejects_remote():
    with pytest.raises(ValueError):
        load_audio("https://example.com/x.wav")
    with pytest.raises(FileNotFoundError):
        load_audio("/nonexistent/x.wav")


def test_chat_gating_without_weights():
    from f5tts_tpu.serve.chat import indic_chat

    with pytest.raises(ImportError):
        indic_chat("hello", "hin_Deva")
