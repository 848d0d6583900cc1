"""Drive the gated chat/translate/ASR paths with tiny REAL HF models
(VERDICT #6): the pipelines execute end-to-end in CI — model construction,
tokenization, beam generation, decoding — not just their availability gates.

Models are built offline at tiny geometry and saved into tmp_path:
- seq2seq translator (T5 architecture + WordLevel tokenizer carrying the
  FLORES lang-tag tokens) driving the IndicTrans2-contract ``translate()``
  (reference ``routes/translate.py:29-76``),
- causal LM (GPT-2 architecture) driving the ``indic_chat`` translate-in ->
  chat -> translate-out sandwich (``routes/chat.py:17-63``),
- CTC ASR model (wav2vec2 architecture) driving ``transcribe_bytes`` with the
  md5 cache (``infer/utils_infer.py:133-169``),
and the same paths are exercised through the HTTP routes.
"""

import io
import json
import wave

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import f5tts_tpu.serve.asr as asr_mod  # noqa: E402
import f5tts_tpu.serve.chat as chat_mod  # noqa: E402

LANG_TAGS = ["kan_Knda", "hin_Deva", "tam_Taml", "eng_Latn"]
WORDS = ["hello", "world", "ok", "one", "two", "namaste", "ondu", "eradu"]


def _word_tokenizer(extra=()):
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {"<pad>": 0, "</s>": 1, "<unk>": 2}
    for w in [*LANG_TAGS, *WORDS, *extra]:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab=vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    return PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", eos_token="</s>", unk_token="<unk>"
    ), len(vocab)


@pytest.fixture(scope="module")
def translator_dir(tmp_path_factory):
    from transformers import T5Config, T5ForConditionalGeneration

    d = tmp_path_factory.mktemp("tiny_translator")
    tok, vocab_size = _word_tokenizer()
    tok.save_pretrained(d)
    torch.manual_seed(0)
    cfg = T5Config(vocab_size=vocab_size, d_model=32, d_ff=64, d_kv=16,
                   num_layers=2, num_heads=2, decoder_start_token_id=0,
                   pad_token_id=0, eos_token_id=1)
    T5ForConditionalGeneration(cfg).save_pretrained(d)
    return str(d)


@pytest.fixture(scope="module")
def llm_dir(tmp_path_factory):
    from transformers import GPT2Config, GPT2LMHeadModel

    d = tmp_path_factory.mktemp("tiny_llm")
    tok, vocab_size = _word_tokenizer()
    tok.save_pretrained(d)
    torch.manual_seed(1)
    # n_positions must cover the tiny translator's max_length=256 output
    cfg = GPT2Config(vocab_size=vocab_size, n_embd=32, n_layer=2, n_head=2,
                     n_positions=512, bos_token_id=1, eos_token_id=1, pad_token_id=0)
    GPT2LMHeadModel(cfg).save_pretrained(d)
    return str(d)


@pytest.fixture(scope="module")
def asr_dir(tmp_path_factory):
    from transformers import (
        Wav2Vec2Config,
        Wav2Vec2CTCTokenizer,
        Wav2Vec2FeatureExtractor,
        Wav2Vec2ForCTC,
        Wav2Vec2Processor,
    )

    d = tmp_path_factory.mktemp("tiny_asr")
    vocab = {"<pad>": 0, "|": 1, "<unk>": 2}
    for ch in "abcdefghijklmnopqrstuvwxyz":
        vocab[ch] = len(vocab)
    vf = d / "vocab.json"
    vf.write_text(json.dumps(vocab), encoding="utf-8")
    tok = Wav2Vec2CTCTokenizer(str(vf), unk_token="<unk>", pad_token="<pad>", word_delimiter_token="|")
    fe = Wav2Vec2FeatureExtractor(feature_size=1, sampling_rate=16000, padding_value=0.0,
                                  do_normalize=True, return_attention_mask=False)
    Wav2Vec2Processor(feature_extractor=fe, tokenizer=tok).save_pretrained(d)
    torch.manual_seed(2)
    cfg = Wav2Vec2Config(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16, 16), conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3), num_feat_extract_layers=3, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    Wav2Vec2ForCTC(cfg).save_pretrained(d)
    return str(d)


@pytest.fixture()
def wired(monkeypatch, translator_dir, llm_dir, asr_dir):
    monkeypatch.setattr(chat_mod, "TRANSLATE_MODEL", translator_dir)
    monkeypatch.setattr(chat_mod, "LLM_MODEL", llm_dir)
    monkeypatch.setattr(chat_mod, "_translator", None)
    monkeypatch.setattr(chat_mod, "_llm", None)
    monkeypatch.setattr(asr_mod, "WHISPER_MODEL", asr_dir)
    monkeypatch.setattr(asr_mod, "_asr_pipe", None)
    asr_mod._ref_text_cache.clear()


def _wav_bytes(seconds=0.4, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    pcm = (np.sin(2 * np.pi * 330 * t) * 0.2 * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_translate_executes_indictrans2_contract(wired):
    out = chat_mod.translate(["ondu eradu", "hello world"], "kan_Knda", "eng_Latn",
                             max_length=12, num_beams=2)
    assert isinstance(out, list) and len(out) == 2
    assert all(isinstance(s, str) for s in out)


def test_indic_chat_english_skips_translation_legs(wired, monkeypatch):
    def boom(*a, **k):  # the English path must not touch the translator
        raise AssertionError("translate called on English path")

    monkeypatch.setattr(chat_mod, "translate", boom)
    reply = chat_mod.indic_chat("hello world", "eng_Latn", max_new_tokens=4)
    assert isinstance(reply, str)


def test_indic_chat_full_sandwich(wired):
    reply = chat_mod.indic_chat("ondu eradu namaste", "kan_Knda", max_new_tokens=4)
    assert isinstance(reply, str)


def test_transcribe_executes_and_caches(wired):
    audio = _wav_bytes()
    text1 = asr_mod.transcribe_bytes(audio)
    assert isinstance(text1, str)
    # second call hits the md5 cache (reference's _ref_audio_cache contract)
    asr_mod._asr_pipe = None  # pipeline gone; only the cache can answer
    assert asr_mod.transcribe_bytes(audio) == text1


async def _post_json(handler_client, path, payload):
    resp = await handler_client.post(path, json=payload)
    return resp


def test_routes_end_to_end(wired):
    """Drive /v1/translate, /v1/indic_chat and /v1/transcribe/ through the
    aiohttp app with the tiny models wired in."""
    import asyncio

    import aiohttp
    from aiohttp.test_utils import TestClient, TestServer

    from f5tts_tpu.serve.server import build_app
    from f5tts_tpu.utils.config import Settings

    async def run():
        app = build_app(Settings(demo_tiny=True, warmup=False, speech_rate_limit="100/minute"))
        async with TestClient(TestServer(app)) as client:
            r = await client.post("/v1/translate", json={
                "sentences": ["ondu eradu"], "src_lang": "kan_Knda", "tgt_lang": "eng_Latn"})
            assert r.status == 200, await r.text()
            body = await r.json()
            assert isinstance(body.get("translations"), list)

            r = await client.post("/v1/indic_chat", json={
                "prompt": "hello world", "language": "eng_Latn"})
            assert r.status == 200, await r.text()
            assert "response" in await r.json()

            form = aiohttp.FormData()
            form.add_field("file", _wav_bytes(), filename="a.wav", content_type="audio/wav")
            r = await client.post("/v1/transcribe/", data=form)
            assert r.status == 200, await r.text()
            assert "text" in await r.json()

    asyncio.run(run())
