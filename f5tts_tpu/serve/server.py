"""HTTP serving surface (aiohttp).

API parity with the reference (``src/server/main.py`` + ``routes/``):

- ``POST /v1/audio/speech``  -> WAV stream (``routes/speech.py:19-41``)
- ``POST /v1/transcribe/``   -> Whisper ASR, gated on availability (``:43-68``)
- ``POST /v1/speech_to_speech`` -> ASR -> TTS pipeline (``:70-102``)
- ``GET  /v1/health``, ``GET /`` -> health/docs (``routes/health.py:9-37``)
- ``POST /v1/load_all_models`` / ``/v1/unload_all_models``
- request-timing middleware with ``X-Response-Time`` (``main.py:77-85``),
  CORS headers (``main.py:69-75``), per-route token-bucket rate limiting
  (slowapi parity, ``main.py:87-88``), optional API-key auth (the reference
  documents keys but never enforces them — here enforced when configured).

TPU-native deltas: requests run through the continuous batcher (the reference
blocks its event loop on one request at a time, SURVEY §3.2), synthesis runs in
a worker thread, and reference voices come from a local voices dir instead of a
per-request URL download (``utils/tts_utils.py:54`` — a network fetch on every
request)."""

from __future__ import annotations

import asyncio
import json
import logging
import time

import numpy as np
from aiohttp import web

from f5tts_tpu.audio.io import read_wav, wav_bytes
from f5tts_tpu.audio.preprocess import clip_ref_audio, ensure_sentence_punctuation
from f5tts_tpu.serve.schemas import SpeechRequest
from f5tts_tpu.text.chunker import split_style_segments
from f5tts_tpu.utils.config import Settings, load_deployment_config, parse_arguments, parse_rate_limit

log = logging.getLogger("f5tpu.serve")


class RateLimiter:
    """Token bucket per client IP."""

    def __init__(self, spec: str):
        self.limit, self.window = parse_rate_limit(spec)
        self._hits: dict[str, list[float]] = {}

    def allow(self, client: str) -> bool:
        now = time.monotonic()
        if len(self._hits) > 4096:  # evict clients idle past the window
            self._hits = {c: h for c, h in self._hits.items() if h and now - h[-1] < self.window}
        hits = [t for t in self._hits.get(client, []) if now - t < self.window]
        if len(hits) >= self.limit:
            self._hits[client] = hits
            return False
        hits.append(now)
        self._hits[client] = hits
        return True


class ModelService:
    """Model lifecycle (lazy load/unload) — TTSManager parity
    (``core/managers.py:62-85``)."""

    def __init__(self, settings: Settings):
        self.settings = settings
        self.engine = None
        self.batcher = None
        self.voices: dict[str, tuple[np.ndarray, int, str]] = {}
        # failure detection / recovery (the reference's only recovery is a
        # docker restart policy — SURVEY §5): consecutive synthesis failures
        # trigger one automatic model reload; health reports the counters.
        self.failures = 0
        self.reloads = 0
        self._reloading = False
        _threading = __import__("threading")
        self._fail_lock = _threading.Lock()
        # thread-level lifecycle serialization: covers the route handlers'
        # executor calls AND the failure-recovery reload thread (the route
        # layer's asyncio lock can't reach a raw thread)
        self._lifecycle = _threading.RLock()

    @property
    def loaded(self) -> bool:
        return self.engine is not None

    def load(self):
        with self._lifecycle:
            self._load_locked()

    def _load_locked(self):
        if self.loaded:
            return
        if self.settings.tts_model == "parler":
            self._load_parler_locked()
            return
        import jax

        from f5tts_tpu.engine.batcher import ContinuousBatcher
        from f5tts_tpu.engine.engine import EngineConfig, TTSEngine
        from f5tts_tpu.models.dit import DiTConfig, init_dit
        from f5tts_tpu.models.vocos import VocosConfig, init_vocos
        from f5tts_tpu.ops.mel import MelConfig
        from f5tts_tpu.text.tokenizer import Tokenizer

        s = self.settings
        # flash kernels on the TPU; XLA elsewhere (interpret-mode pallas is
        # only for tests). conv_pos_impl is flipped by the engine itself.
        attn = "flash" if jax.default_backend() == "tpu" else "xla"
        use_bigvgan = s.vocoder_type == "bigvgan"
        mel_flavor = "bigvgan" if use_bigvgan else "vocos"  # paired mel front-end
        vocoder_kw = {}
        if s.demo_tiny:
            mel_cfg = MelConfig(n_mels=20, flavor=mel_flavor)
            dit_cfg = DiTConfig(
                dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
                text_num_embeds=256, text_dim=32, conv_layers=1, max_pos=1024, attn_impl=attn,
            )
            voc_cfg = VocosConfig(input_channels=20, dim=48, intermediate_dim=96, num_layers=2)
            tok = Tokenizer({" ": 0, **{chr(i): i - 31 for i in range(33, 127)}})
            dit_params = init_dit(jax.random.PRNGKey(0), dit_cfg)
            if use_bigvgan:
                from f5tts_tpu.models.bigvgan import BigVGANConfig, init_bigvgan

                bcfg = BigVGANConfig(mel_dim=20, upsample_initial_channel=32,
                                     upsample_rates=(4, 4, 4, 4), upsample_kernel_sizes=(8, 8, 8, 8),
                                     resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),))
                voc_params = init_bigvgan(jax.random.PRNGKey(1), bcfg)
                vocoder_kw = {"vocoder_type": "bigvgan", "bigvgan": bcfg}
            else:
                voc_params = init_vocos(jax.random.PRNGKey(1), voc_cfg)
            engine_cfg = EngineConfig(
                mel=mel_cfg, vocoder=voc_cfg, compute_dtype="float32",
                duration_buckets=(128, 256, 512), text_pad=128, **vocoder_kw,
            )
        else:
            from f5tts_tpu.models.convert import load_f5_checkpoint, load_vocos_checkpoint

            tok = Tokenizer.from_file(s.tts_vocab)
            dit_cfg = DiTConfig(
                **{**DiTConfig.base().__dict__, "text_num_embeds": tok.vocab_size, "attn_impl": attn}
            )
            voc_cfg = VocosConfig()
            dit_params = load_f5_checkpoint(s.tts_ckpt, dit_cfg)
            mel_cfg = MelConfig(flavor=mel_flavor)
            if use_bigvgan:
                from f5tts_tpu.models.bigvgan import BigVGANConfig, convert_bigvgan
                from f5tts_tpu.models.convert import load_torch_state_dict

                bcfg = BigVGANConfig(mel_dim=mel_cfg.n_mels)
                voc_params = convert_bigvgan(load_torch_state_dict(s.vocoder_ckpt), bcfg)
                vocoder_kw = {"vocoder_type": "bigvgan", "bigvgan": bcfg}
            else:
                voc_params = load_vocos_checkpoint(s.vocoder_ckpt, voc_cfg)
            engine_cfg = EngineConfig(mel=mel_cfg, compute_dtype=s.dtype, **vocoder_kw)

        if s.cfg_interval or s.cfg_cache > 1 or s.ode_method or s.nfe:
            import dataclasses

            from f5tts_tpu.sampling.euler import (
                DEFAULT_NFE,
                default_time_grid,
                nfe_to_steps,
                parse_cfg_interval,
            )

            # euler-only accelerations force the euler integrator (Settings
            # validation already rejects an explicit non-euler ode_method)
            method = s.ode_method or ("euler" if (s.cfg_interval or s.cfg_cache > 1)
                                      else engine_cfg.sampler.method)
            steps = nfe_to_steps(s.nfe or DEFAULT_NFE[method], method)
            sampler = dataclasses.replace(
                engine_cfg.sampler,
                method=method,
                steps=steps,
                # knot grids are (method, steps)-specific: re-resolve, never
                # inherit the default grid into a different step count
                time_grid=default_time_grid(method, steps),
                cfg_interval=parse_cfg_interval(s.cfg_interval) if s.cfg_interval else (0.0, 1.0),
                cfg_cache_period=s.cfg_cache,
            )
            engine_cfg = dataclasses.replace(engine_cfg, sampler=sampler)
        if s.chunk_budget != 0:  # 0 = engine default; -1 = reference chunking
            import dataclasses

            engine_cfg = dataclasses.replace(
                engine_cfg, chunk_frames_budget=s.chunk_budget if s.chunk_budget > 0 else None)
        # build everything into locals and publish only on full success: a
        # failure in voices/warmup must not leave self.engine set (loaded=True
        # for a half-initialized model makes load_model's rollback a no-op)
        engine = TTSEngine(dit_params, dit_cfg, voc_params, tok, engine_cfg)
        voices = self._read_voices()
        if s.warmup:
            batches = [int(v) for v in str(s.warmup_batches).split(",") if v.strip()]
            durations = [int(v) for v in str(s.warmup_buckets).split(",") if v.strip()] \
                or [engine.cfg.duration_buckets[0]]
            for d in durations:
                if d not in engine.cfg.duration_buckets:
                    raise ValueError(
                        f"warmup bucket {d} not in engine duration buckets "
                        f"{engine.cfg.duration_buckets}")
            for bv in batches:
                if bv not in engine.cfg.batch_buckets:
                    # synthesize_rows snaps batches to these buckets — warming
                    # any other size compiles a program that is never used
                    raise ValueError(
                        f"warmup batch {bv} not in engine batch buckets "
                        f"{engine.cfg.batch_buckets}")
            log.info("warming up (duration buckets %s, batch buckets %s)...",
                     durations, batches)
            engine.warmup(buckets=[(d, b) for d in durations for b in batches])
        self.engine = engine
        want_step = s.batcher in ("step", "auto")
        if want_step and s.batcher == "auto" and engine.cfg.sampler.cfg_cache_period > 1:
            # auto degrades gracefully: the null-holding knob needs the
            # window path (batcher=step with cfg_cache errors at Settings)
            log.info("batcher=auto: cfg_cache sampler -> window batcher")
            want_step = False
        if want_step:
            from f5tts_tpu.engine.step_batcher import StepBatcher

            self.batcher = StepBatcher(engine, s.batcher_segment_intervals,
                                       adaptive=s.batcher == "auto").start()
        else:
            self.batcher = ContinuousBatcher(engine, s.max_batch, s.batch_wait_ms).start()
        self.voices = voices
        log.info("models loaded (demo_tiny=%s, batcher=%s)", s.demo_tiny, s.batcher)

    def _load_parler_locked(self):
        """AR-branch serving (the TTS component the reference's deployment
        config names, ``dhwani_config.json:81`` ai4bharat/indic-parler-tts):
        style-description + prompt in, 44.1 kHz DAC audio out, batched through
        the same continuous batcher."""
        import jax

        from f5tts_tpu.engine.ar_engine import ParlerEngineConfig, ParlerTTSEngine
        from f5tts_tpu.engine.batcher import ContinuousBatcher
        from f5tts_tpu.models import parler as P

        s = self.settings
        if s.demo_tiny:
            t5 = P.T5Config(vocab=60, d_model=24, d_kv=6, d_ff=32, heads=4, layers=2,
                            rel_buckets=8, rel_max_dist=20)
            dec = P.ParlerDecoderConfig(vocab=40, codebooks=4, hidden=32, layers=2,
                                        heads=4, ffn=48, cross_dim=24, prompt_vocab=60)
            dac = P.DacConfig(num_codebooks=4, codebook_size=40, codebook_dim=6,
                              latent_dim=24, decoder_dim=16, rates=(4, 2))
            kt, kd, kq = jax.random.split(jax.random.PRNGKey(0), 3)
            t5_p, dec_p, dac_p = (P.init_t5_encoder(kt, t5), P.init_parler_decoder(kd, dec),
                                  P.init_dac_decoder(kq, dac))
            encode_fn = lambda txt: [ord(c) % t5.vocab for c in txt]  # noqa: E731
            ecfg = ParlerEngineConfig(max_frames=32, desc_pad=64, prompt_pad=64,
                                      temperature=0.0, eos_token=-1,
                                      compute_dtype="float32", batch_buckets=(1, 2, 4))
        else:
            if not s.parler_ckpt or not s.parler_tokenizer:
                raise ValueError("tts_model=parler needs F5TPU_PARLER_CKPT and "
                                 "F5TPU_PARLER_TOKENIZER (local T5 tokenizer dir)")
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(s.parler_tokenizer)
            encode_fn = lambda txt: tok(txt).input_ids  # noqa: E731
            t5, dec, dac = P.T5Config(), P.ParlerDecoderConfig(), P.DacConfig()
            t5_p, dec_p, dac_p = P.load_parler_checkpoint(s.parler_ckpt, t5, dec, dac)
            ecfg = ParlerEngineConfig(max_frames=s.parler_max_frames,
                                      desc_pad=s.parler_desc_pad,
                                      prompt_pad=s.parler_prompt_pad,
                                      compute_dtype=s.dtype)
        engine = ParlerTTSEngine(t5_p, t5, dec_p, dec, dac_p, dac, ecfg, encode_fn=encode_fn)
        if s.warmup:
            batches = [int(v) for v in str(s.warmup_batches).split(",") if v.strip()] or [1]
            log.info("warming up parler (batch buckets %s)...", batches)
            engine.warmup(batches)
        self.engine = engine
        self.batcher = ContinuousBatcher(engine, s.max_batch, s.batch_wait_ms).start()
        self.voices = {}  # parler conditions on style descriptions, not reference voices
        log.info("parler models loaded (demo_tiny=%s)", s.demo_tiny)

    def _read_voices(self) -> dict[str, tuple[np.ndarray, int, str]]:
        import os

        voices: dict[str, tuple[np.ndarray, int, str]] = {}
        if self.settings.voices_dir and os.path.isdir(self.settings.voices_dir):
            for name in os.listdir(self.settings.voices_dir):
                if name.endswith(".wav"):
                    stem = name[:-4]
                    wav, sr = read_wav(os.path.join(self.settings.voices_dir, name))
                    txt_path = os.path.join(self.settings.voices_dir, stem + ".txt")
                    ref_text = open(txt_path, encoding="utf-8").read().strip() if os.path.exists(txt_path) else ""
                    voices[stem] = (clip_ref_audio(wav, sr), sr, ref_text)
        if not voices:
            # built-in fallback voice so the API is usable without assets
            sr = 24000
            tone = (np.sin(2 * np.pi * 220 * np.arange(sr) / sr) * 0.1).astype(np.float32)
            voices["default"] = (tone, sr, "reference audio.")
        return voices

    MAX_VOICE_SLOTS = 100  # the reference gradio's multistyle slot cap (infer_gradio.py:317-499)

    def add_voice(self, name: str, wav_bytes: bytes, ref_text: str) -> None:
        """Register a reference-voice slot at runtime (gradio voice-slot
        management parity). Persists into voices_dir when configured; the
        voices dict is swapped, not mutated, so in-flight requests keep a
        consistent snapshot."""
        import re as _re

        if not _re.fullmatch(r"[\w.-]{1,64}", name):
            raise ValueError("voice name must be 1-64 chars of [A-Za-z0-9_.-]")
        if len(self.voices) >= self.MAX_VOICE_SLOTS and name not in self.voices:
            raise ValueError(f"voice-slot limit ({self.MAX_VOICE_SLOTS}) reached")
        wav, sr = read_wav(wav_bytes)
        clipped = clip_ref_audio(wav, sr)
        if self.settings.voices_dir:
            import os

            os.makedirs(self.settings.voices_dir, exist_ok=True)
            with open(os.path.join(self.settings.voices_dir, f"{name}.wav"), "wb") as f:
                f.write(wav_bytes)
            with open(os.path.join(self.settings.voices_dir, f"{name}.txt"), "w", encoding="utf-8") as f:
                f.write(ref_text)
        self.voices = {**self.voices, name: (clipped, sr, ref_text)}

    def remove_voice(self, name: str) -> None:
        if name not in self.voices:
            raise KeyError(name)
        if len(self.voices) == 1:
            raise ValueError("cannot remove the last voice")
        new = dict(self.voices)
        new.pop(name)
        self.voices = new
        if self.settings.voices_dir:
            import os

            for ext in (".wav", ".txt"):
                p = os.path.join(self.settings.voices_dir, name + ext)
                if os.path.exists(p):
                    os.remove(p)

    def unload(self):
        with self._lifecycle:
            if self.batcher:
                self.batcher.stop()
            self.engine = None
            self.batcher = None
            # replace, don't clear(): in-flight requests hold a snapshot of
            # the old dict and must keep reading it consistently
            self.voices = {}

    def swap(self, mutate_settings):
        """Atomically replace the served model: unload, apply the settings
        mutation, load — all under one lifecycle-lock hold, so the
        failure-recovery reload thread cannot interleave its own unload/load
        between the steps (each op alone is serialized; the compound wasn't)."""
        with self._lifecycle:
            self.unload()
            mutate_settings()
            self._load_locked()

    def synthesize_sync(self, req: SpeechRequest) -> bytes:
        if self.settings.tts_model == "parler":
            return self._synthesize_parler_sync(req)
        # snapshot the engine/batcher/voices refs: a concurrent unload/hot-swap
        # replaces the attributes, but in-flight work may finish against the
        # old objects (they stay alive through these locals; unload swaps the
        # voices dict rather than clearing it in place for the same reason)
        engine, batcher, voices = self.engine, self.batcher, self.voices
        if engine is None or batcher is None or not voices:
            raise web.HTTPServiceUnavailable(text=json.dumps({"error": "TTS model not loaded"}))
        voice = req.voice or next(iter(voices))
        if voice not in voices:
            raise web.HTTPBadRequest(text=json.dumps({"error": f"unknown voice {voice!r}"}))
        # multi-style: `{Style}` / `[voice]` tags in the text switch the
        # reference voice per segment (gradio multi-style contract,
        # infer/infer_gradio.py:317-499); tagless text is one segment
        segments = split_style_segments(req.effective_text, voices, default=voice)
        try:
            plans = []
            for seg_voice, seg_text in segments:
                ref_audio, ref_sr, ref_text = voices[seg_voice]
                if seg_voice == voice and req.ref_text:
                    ref_text = req.ref_text
                ref_text = ensure_sentence_punctuation(ref_text)
                plans.append(engine.prepare_request(
                    seg_text, ref_audio, ref_sr, ref_text,
                    speed=req.speed, nfe_step=req.nfe_step, cfg_strength=req.cfg_strength, seed=req.seed,
                    quality=req.quality,
                ))
            # chunk rows go through the continuous batcher so concurrent
            # requests (and segments) share batched ODE solves
            futures = [[batcher.submit(row) for row in plan.rows] for plan in plans]
            waves = []
            for plan, fs in zip(plans, futures):
                results = [f.result(timeout=600) for f in fs]
                seg_wave, sr, _ = engine.finalize_request(plan, results)
                waves.append(seg_wave)
            wave = waves[0] if len(waves) == 1 else np.concatenate(waves)
            if not np.isfinite(wave).all():
                # a NaN/Inf solve must fail THIS request (and count toward
                # auto-reload) — never ship non-finite PCM to a client
                raise RuntimeError("non-finite audio from solve (NaN/Inf): model fault")
        except web.HTTPException:
            raise
        except Exception as e:
            from f5tts_tpu.engine.batcher import OverloadedError

            if isinstance(e, OverloadedError):  # load shedding, not a model fault
                raise web.HTTPServiceUnavailable(text=json.dumps({"error": str(e)}))
            self._record_failure(e)
            raise web.HTTPInternalServerError(text=json.dumps({"error": f"synthesis failed: {e}"}))
        with self._fail_lock:
            self.failures = 0
        return wav_bytes(wave, sr)

    def _synthesize_parler_sync(self, req: SpeechRequest) -> bytes:
        from f5tts_tpu.engine.ar_engine import ParlerRow

        engine, batcher = self.engine, self.batcher  # snapshot across unload
        if engine is None or batcher is None:
            raise web.HTTPServiceUnavailable(text=json.dumps({"error": "TTS model not loaded"}))
        desc = req.description or self.settings.parler_default_description
        try:
            # per-request length validation BEFORE batching: an oversized
            # request must 400 alone, not fail its whole co-batched group
            engine.validate_lengths(desc, req.effective_text)
        except ValueError as e:
            raise web.HTTPBadRequest(text=json.dumps({"error": str(e)}))
        try:
            fut = batcher.submit(ParlerRow(desc, req.effective_text, seed=req.seed or 0))
            wave, _ = fut.result(timeout=600)
            if not np.isfinite(wave).all():
                raise RuntimeError("non-finite audio from decode (NaN/Inf): model fault")
        except web.HTTPException:
            raise
        except ValueError as e:  # strict-length backstop inside the batch
            raise web.HTTPBadRequest(text=json.dumps({"error": str(e)}))
        except Exception as e:
            from f5tts_tpu.engine.batcher import OverloadedError

            if isinstance(e, OverloadedError):
                raise web.HTTPServiceUnavailable(text=json.dumps({"error": str(e)}))
            self._record_failure(e)
            raise web.HTTPInternalServerError(text=json.dumps({"error": f"synthesis failed: {e}"}))
        with self._fail_lock:
            self.failures = 0
        return wav_bytes(wave, engine.dac_cfg.sampling_rate)

    def _record_failure(self, exc: Exception, threshold: int = 2):
        """Consecutive device/runtime failures -> one background reload."""
        log.error("synthesis failure: %s", exc)
        with self._fail_lock:
            self.failures += 1
            should_reload = self.failures >= threshold and not self._reloading
            if should_reload:
                self._reloading = True

        if should_reload:
            def _do():
                try:
                    log.warning("reloading models after %d consecutive failures", self.failures)
                    # hold the lifecycle lock across the PAIR: another thread's
                    # unload/swap must not interleave between our two steps
                    with self._lifecycle:
                        self.unload()
                        self.load()
                    self.reloads += 1
                    with self._fail_lock:
                        self.failures = 0
                finally:
                    self._reloading = False

            __import__("threading").Thread(target=_do, name="model-reload", daemon=True).start()


@web.middleware
async def timing_middleware(request: web.Request, handler):
    start = time.monotonic()
    try:
        resp = await handler(request)
    except web.HTTPException as e:
        # error responses carry the timing header too (HTTPExceptions ARE
        # the responses in aiohttp — mutate, then re-raise)
        e.headers["X-Response-Time"] = f"{time.monotonic() - start:.3f}s"
        raise
    finally:
        dur = time.monotonic() - start
        log.info("%s %s took %.3fs", request.method, request.path, dur)
    if not resp.prepared:  # streamed responses flushed their headers already
        resp.headers["X-Response-Time"] = f"{dur:.3f}s"
    return resp


def _cors(headers) -> None:
    headers["Access-Control-Allow-Origin"] = "*"
    headers["Access-Control-Allow-Methods"] = "GET,POST,OPTIONS"
    headers["Access-Control-Allow-Headers"] = "*"


@web.middleware
async def cors_middleware(request: web.Request, handler):
    if request.method == "OPTIONS":
        resp = web.Response()
    else:
        try:
            resp = await handler(request)
        except web.HTTPException as e:
            # without these a browser client sees an opaque CORS failure
            # instead of the JSON error body (400/429/503 all raise)
            _cors(e.headers)
            raise
    if not resp.prepared:  # streams set their CORS headers before prepare()
        _cors(resp.headers)
    return resp


def build_app(settings: Settings) -> web.Application:
    service = ModelService(settings)
    speech_limiter = RateLimiter(settings.speech_rate_limit)
    chat_limiter = RateLimiter(settings.chat_rate_limit)

    def check_auth(request):
        import hmac

        # compare bytes: compare_digest on str raises TypeError for non-ASCII
        # header values, which would turn an auth failure into a 500
        supplied = request.headers.get("Authorization", "").encode("utf-8", "surrogateescape")
        expected = f"Bearer {settings.api_key}".encode("utf-8", "surrogateescape")
        if settings.api_key and not hmac.compare_digest(supplied, expected):
            raise web.HTTPUnauthorized(text=json.dumps({"error": "invalid api key"}))

    async def speech(request: web.Request) -> web.StreamResponse:
        check_auth(request)
        client = request.remote or "?"
        if not speech_limiter.allow(client):
            raise web.HTTPTooManyRequests(text=json.dumps({"error": "rate limit exceeded"}))
        if not service.loaded:
            raise web.HTTPServiceUnavailable(text=json.dumps({"error": "TTS model not loaded"}))
        try:
            req = SpeechRequest(**await request.json())
        except Exception as e:
            raise web.HTTPBadRequest(text=json.dumps({"error": str(e)}))
        if not req.effective_text.strip():
            raise web.HTTPBadRequest(text=json.dumps({"error": "text must not be empty"}))

        if req.response_format == "stream":
            if settings.tts_model == "parler":
                return await stream_speech_parler(request, req)
            return await stream_speech(request, req)
        data = await asyncio.get_running_loop().run_in_executor(None, service.synthesize_sync, req)
        return web.Response(
            body=data,
            content_type="audio/wav",
            headers={"Content-Disposition": 'inline; filename="speech.wav"', "Cache-Control": "no-cache"},
        )

    async def stream_speech(request: web.Request, req: SpeechRequest) -> web.StreamResponse:
        """Chunked-transfer WAV: header with unknown length, then int16 PCM as
        each text chunk's ODE solve completes (time-to-first-audio = 1 chunk)."""
        engine, voices = service.engine, service.voices  # snapshot across unload
        if engine is None or not voices:
            raise web.HTTPServiceUnavailable(text=json.dumps({"error": "TTS model not loaded"}))
        voice = req.voice or next(iter(voices))
        if voice not in voices:
            raise web.HTTPBadRequest(text=json.dumps({"error": f"unknown voice {voice!r}"}))
        ref_audio, ref_sr, ref_text = voices[voice]
        ref_text = ensure_sentence_punctuation(req.ref_text or ref_text)

        def segments():
            return engine.synthesize_streaming(
                req.effective_text, ref_audio, ref_sr, ref_text,
                speed=req.speed, nfe_step=req.nfe_step, cfg_strength=req.cfg_strength, seed=req.seed,
            )

        return await stream_pcm(request, 24000, segments)

    async def stream_speech_parler(request: web.Request, req: SpeechRequest) -> web.StreamResponse:
        """AR-branch streaming: the delay-pattern decode is incremental, so
        PCM flows as code frames become final (DAC receptive-field margin
        withheld) — concatenated output equals the batched path exactly."""
        engine = service.engine  # snapshot across unload
        if engine is None:
            raise web.HTTPServiceUnavailable(text=json.dumps({"error": "TTS model not loaded"}))
        desc = req.description or settings.parler_default_description
        try:
            engine.validate_lengths(desc, req.effective_text)
        except ValueError as e:
            raise web.HTTPBadRequest(text=json.dumps({"error": str(e)}))

        def segments():
            return engine.synthesize_streaming(desc, req.effective_text, seed=req.seed or 0)

        return await stream_pcm(request, engine.dac_cfg.sampling_rate, segments)

    async def stream_pcm(request: web.Request, sr: int, segments) -> web.StreamResponse:
        """Shared chunked-WAV plumbing: header with unknown sizes, a bounded
        producer queue, disconnect-safe teardown. ``segments``: zero-arg
        callable returning an iterator of float32 PCM arrays."""
        import queue as _queue
        import struct

        from f5tts_tpu.audio import native

        resp = web.StreamResponse(headers={"Content-Type": "audio/wav", "Cache-Control": "no-cache"})
        # headers flush at prepare(): middlewares can't add these afterwards
        _cors(resp.headers)
        resp.headers["X-Accel-Buffering"] = "no"
        resp.enable_chunked_encoding()
        await resp.prepare(request)
        # WAV header with streaming (unknown) sizes
        header = b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt " + struct.pack(
            "<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16
        ) + b"data" + struct.pack("<I", 0xFFFFFFFF)
        await resp.write(header)

        q: _queue.Queue = _queue.Queue(maxsize=4)
        abandoned = __import__("threading").Event()

        def _put(item) -> bool:
            # bounded put that gives up when the consumer is gone — a plain
            # q.put() would block this executor thread forever after a client
            # disconnect, leaking one pool thread per dropped stream
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except _queue.Full:
                    continue
            return False

        def produce():
            try:
                for seg in segments():
                    if not _put(native.encode_pcm16(seg).tobytes()):
                        return
            except Exception as e:  # surfaced as stream truncation
                log.error("stream synthesis failed: %s", e)
            finally:
                _put(None)

        loop = asyncio.get_running_loop()
        loop.run_in_executor(None, produce)
        try:
            while True:
                chunk = await loop.run_in_executor(None, q.get)
                if chunk is None:
                    break
                await resp.write(chunk)
            await resp.write_eof()
        finally:
            abandoned.set()
            # if this coroutine was cancelled while awaiting q.get, that
            # executor thread is still parked in the blocking get — and the
            # producer's final sentinel is suppressed once `abandoned` is set.
            # Drain and push one sentinel (non-blocking; abandoned stops any
            # racing producer put) so no pool thread is pinned forever.
            try:
                while True:
                    q.get_nowait()
            except _queue.Empty:
                pass
            try:
                q.put_nowait(None)
            except _queue.Full:
                pass
        return resp

    async def _read_multipart_audio(request: web.Request) -> bytes:
        """First multipart part as bytes; malformed/non-multipart bodies are
        client errors (400), not AttributeErrors-turned-500s."""
        try:
            reader = await request.multipart()
            field = await reader.next()
        except (AssertionError, ValueError):
            field = None
        if field is None:
            raise web.HTTPBadRequest(
                text=json.dumps({"error": "multipart body with an audio file part required"}))
        return await field.read(decode=True)

    async def transcribe(request: web.Request) -> web.Response:
        check_auth(request)
        try:
            from f5tts_tpu.serve.asr import transcribe_bytes
        except Exception:
            raise web.HTTPNotImplemented(text=json.dumps({"error": "ASR backend unavailable in this build"}))
        audio = await _read_multipart_audio(request)
        language = request.query.get("language")
        try:
            text = await asyncio.get_running_loop().run_in_executor(None, transcribe_bytes, audio, language)
        except ImportError as e:
            raise web.HTTPNotImplemented(text=json.dumps({"error": str(e)}))
        return web.json_response({"text": text})

    async def speech_to_speech(request: web.Request) -> web.StreamResponse:
        check_auth(request)
        if not service.loaded:
            raise web.HTTPServiceUnavailable(text=json.dumps({"error": "TTS model not loaded"}))
        try:
            from f5tts_tpu.serve.asr import transcribe_bytes
        except Exception:
            raise web.HTTPNotImplemented(text=json.dumps({"error": "ASR backend unavailable in this build"}))
        audio = await _read_multipart_audio(request)
        language = request.query.get("language")
        loop = asyncio.get_running_loop()
        try:
            text = await loop.run_in_executor(None, transcribe_bytes, audio, language)
        except ImportError as e:
            raise web.HTTPNotImplemented(text=json.dumps({"error": str(e)}))
        req = SpeechRequest(text=text, voice=request.query.get("voice"))
        data = await loop.run_in_executor(None, service.synthesize_sync, req)
        return web.Response(body=data, content_type="audio/wav")

    async def health(request: web.Request) -> web.Response:
        stats = service.batcher.stats if service.batcher else {}
        return web.json_response(
            {
                "status": "healthy" if service.loaded else "idle",
                "model": ("demo_tiny" if settings.demo_tiny else "IndicF5-TPU")
                         + ("-parler" if settings.tts_model == "parler" else ""),
                "device": settings.device,
                "consecutive_failures": service.failures,
                "reloads": service.reloads,
                **stats,
            }
        )

    async def speech_edit(request: web.Request) -> web.Response:
        """Span regeneration over an uploaded utterance (speech_edit.py as an
        API). Multipart: `file` (wav) + form fields `target_text`,
        `parts` ('start,end;start,end' seconds), optional `fix_durations`,
        `nfe_step`, `cfg_strength`, `seed`."""
        check_auth(request)
        if settings.tts_model == "parler":
            raise web.HTTPNotImplemented(text=json.dumps(
                {"error": "speech editing is a flow-matching capability; not available on the parler branch"}))
        if not service.loaded:
            raise web.HTTPServiceUnavailable(text=json.dumps({"error": "TTS model not loaded"}))
        form = await request.post()
        upload = form.get("file")
        if upload is None or not hasattr(upload, "file"):
            raise web.HTTPBadRequest(text=json.dumps({"error": "multipart field 'file' (wav) required"}))
        target_text = str(form.get("target_text", ""))
        parts_raw = str(form.get("parts", ""))
        if not target_text or not parts_raw:
            raise web.HTTPBadRequest(text=json.dumps({"error": "need target_text and parts"}))
        try:
            parts = [tuple(float(x) for x in span.split(",")) for span in parts_raw.split(";") if span]
            fixes_raw = str(form.get("fix_durations", ""))
            fixes = [float(x) for x in fixes_raw.split(";") if x] or None
        except ValueError:
            raise web.HTTPBadRequest(text=json.dumps({"error": "bad parts/fix_durations format"}))
        if fixes is not None and len(fixes) != len(parts):
            raise web.HTTPBadRequest(text=json.dumps({"error": "fix_durations must match parts count"}))

        from f5tts_tpu.audio.io import read_wav

        audio, sr = read_wav(upload.file.read())

        def run():
            # snapshot refs (see synthesize_sync); the edit row rides the
            # continuous batcher so it co-batches with synthesis traffic
            engine, batcher = service.engine, service.batcher
            if engine is None or batcher is None:
                raise web.HTTPServiceUnavailable(text=json.dumps({"error": "TTS model not loaded"}))
            row, rms = engine.prepare_edit_row(
                audio, sr, target_text, parts, fixes,
                steps=int(form["nfe_step"]) if form.get("nfe_step") else None,
                cfg_strength=float(form.get("cfg_strength", 2.0)),
                seed=int(form["seed"]) if form.get("seed") else None,
            )
            wave, gen_mel = batcher.submit(row).result(timeout=600)
            return engine.finalize_edit(row, rms, wave, gen_mel)

        wave, out_sr, _ = await asyncio.get_running_loop().run_in_executor(None, run)
        return web.Response(body=wav_bytes(wave, out_sr), content_type="audio/wav")

    async def metrics(request: web.Request) -> web.Response:
        """Serving metrics: JSON by default, Prometheus text exposition with
        ``?format=prometheus`` (or at ``/metrics``) for scrape-based monitoring
        — the reference has no metrics surface at all (SURVEY §5)."""
        from f5tts_tpu.utils.profiling import GLOBAL_TIMER

        stages = GLOBAL_TIMER.summary()
        batcher = service.batcher.stats if service.batcher else {}
        if request.query.get("format") == "prometheus" or request.path == "/metrics":
            lines = [
                "# HELP f5tpu_stage_ms per-request stage timings (rolling window)",
                "# TYPE f5tpu_stage_ms summary",
            ]
            for name, s in sorted(stages.items()):
                for q, key in (("0.5", "p50_ms"), ("0.95", "p95_ms"), ("1.0", "max_ms")):
                    lines.append(f'f5tpu_stage_ms{{stage="{name}",quantile="{q}"}} {s[key]}')
                lines.append(f'f5tpu_stage_ms_count{{stage="{name}"}} {s["count"]}')
            lines += [
                "# HELP f5tpu_batcher continuous-batcher counters",
                "# TYPE f5tpu_batcher_batches_total counter",
            ]
            for k, v in sorted(batcher.items()):
                lines.append(f"f5tpu_batcher_{k} {v}")
            lines += [
                f"f5tpu_model_loaded {int(service.loaded)}",
                f"f5tpu_consecutive_failures {service.failures}",
                f"f5tpu_reloads_total {service.reloads}",
                f"f5tpu_quality_escalations_total {getattr(service.engine, 'escalations', 0)}",
            ]
            return web.Response(text="\n".join(lines) + "\n",
                                content_type="text/plain", charset="utf-8")
        return web.json_response({"stages": stages, "batcher": batcher,
                                  "quality_escalations": getattr(service.engine, "escalations", 0)})

    async def profiler_start(request: web.Request) -> web.Response:
        check_auth(request)
        from f5tts_tpu.utils.profiling import start_device_trace

        log_dir = request.query.get("dir", "/tmp/f5tpu_trace")
        ok = start_device_trace(log_dir)
        return web.json_response({"started": ok, "dir": log_dir})

    async def profiler_stop(request: web.Request) -> web.Response:
        check_auth(request)
        from f5tts_tpu.utils.profiling import stop_device_trace

        return web.json_response({"stopped": stop_device_trace()})

    async def index(request: web.Request) -> web.Response:
        routes = sorted({f"{r.method} {r.resource.canonical}" for r in app.router.routes() if r.method != "HEAD"})
        return web.json_response({"service": "f5tts-tpu", "endpoints": routes})

    async def webapp(request: web.Request) -> web.Response:
        from f5tts_tpu.serve.webui import PAGE

        return web.Response(text=PAGE, content_type="text/html")

    async def voices(request: web.Request) -> web.Response:
        return web.json_response({"voices": sorted(service.voices)})

    async def add_voice(request: web.Request) -> web.Response:
        """Create/replace a reference-voice slot (multipart: ``name``,
        ``file`` wav, optional ``ref_text``) — the reference gradio's
        multistyle voice-slot workflow (``infer_gradio.py:317-499``) as API."""
        check_auth(request)
        form = await request.post()
        upload = form.get("file")
        name = str(form.get("name", "")).strip()
        if upload is None or not hasattr(upload, "file") or not name:
            raise web.HTTPBadRequest(text=json.dumps({"error": "need multipart fields 'name' and 'file' (wav)"}))
        try:
            service.add_voice(name, upload.file.read(), str(form.get("ref_text", "")))
        except ValueError as e:
            raise web.HTTPBadRequest(text=json.dumps({"error": str(e)}))
        except Exception as e:
            raise web.HTTPBadRequest(text=json.dumps({"error": f"bad wav: {e}"}))
        return web.json_response({"voices": sorted(service.voices)})

    async def delete_voice(request: web.Request) -> web.Response:
        check_auth(request)
        name = request.match_info["name"]
        try:
            service.remove_voice(name)
        except KeyError:
            raise web.HTTPNotFound(text=json.dumps({"error": f"unknown voice {name!r}"}))
        except ValueError as e:
            raise web.HTTPBadRequest(text=json.dumps({"error": str(e)}))
        return web.json_response({"voices": sorted(service.voices)})

    async def indic_chat(request: web.Request) -> web.Response:
        check_auth(request)
        client = request.remote or "?"
        if not chat_limiter.allow(client):
            raise web.HTTPTooManyRequests(text=json.dumps({"error": "rate limit exceeded"}))
        body = await request.json()
        prompt = body.get("prompt", "")
        if not prompt or len(prompt) > 100_000:
            raise web.HTTPBadRequest(text=json.dumps({"error": "prompt must be 1..100k chars"}))
        language = body.get("src_lang", "eng_Latn")
        try:
            from f5tts_tpu.serve.chat import indic_chat as chat_fn

            reply = await asyncio.get_running_loop().run_in_executor(None, chat_fn, prompt, language)
        except ImportError as e:
            raise web.HTTPNotImplemented(text=json.dumps({"error": str(e)}))
        return web.json_response({"response": reply})

    async def translate_route(request: web.Request) -> web.Response:
        check_auth(request)
        body = await request.json()
        sentences = body.get("sentences", [])
        src, tgt = body.get("src_lang", ""), body.get("tgt_lang", "")
        if not sentences or not src or not tgt:
            raise web.HTTPBadRequest(text=json.dumps({"error": "need sentences, src_lang, tgt_lang"}))
        try:
            from f5tts_tpu.serve.chat import translate as translate_fn

            out = await asyncio.get_running_loop().run_in_executor(None, translate_fn, sentences, src, tgt)
        except ImportError as e:
            raise web.HTTPNotImplemented(text=json.dumps({"error": str(e)}))
        return web.json_response({"translations": out})

    async def visual_query(request: web.Request) -> web.Response:
        """Image + question -> answer (reference ``routes/chat.py:65-241``
        ``indic_visual_query``); multipart `file` + fields `query`,
        `src_lang`, `tgt_lang`. 501 unless F5TPU_VLM_MODEL points at local
        weights. `/v1/document_query_batch` accepts repeated `file` parts."""
        check_auth(request)
        try:
            reader = await request.multipart()
        except (AssertionError, ValueError):
            raise web.HTTPBadRequest(text=json.dumps({"error": "multipart body required"}))
        images, query = [], ""
        src, tgt = "eng_Latn", "eng_Latn"
        async for part in reader:
            if part.name == "file":
                images.append(await part.read())
            elif part.name == "query":
                query = (await part.read()).decode()
            elif part.name == "src_lang":
                src = (await part.read()).decode()
            elif part.name == "tgt_lang":
                tgt = (await part.read()).decode()
        if not images or not query:
            raise web.HTTPBadRequest(text=json.dumps({"error": "need multipart 'file' image(s) and 'query'"}))
        try:
            import io

            from PIL import Image

            from f5tts_tpu.serve.chat import document_query_batch

            pil = [Image.open(io.BytesIO(b)).convert("RGB") for b in images]
            answers = await asyncio.get_running_loop().run_in_executor(
                None, document_query_batch, pil, query, src, tgt)
        except ImportError as e:
            raise web.HTTPNotImplemented(text=json.dumps({"error": str(e)}))
        if request.path.endswith("document_query_batch"):
            return web.json_response({"answers": answers})
        return web.json_response({"answer": answers[0]})

    # one lock for every model-lifecycle mutation: overlapping load/unload
    # calls would otherwise race loaded-state checks and orphan a running
    # ContinuousBatcher thread
    model_lock = asyncio.Lock()

    async def load_all(request: web.Request) -> web.Response:
        check_auth(request)
        async with model_lock:
            await asyncio.get_running_loop().run_in_executor(None, service.load)
        return web.json_response({"status": "models loaded"})

    async def unload_all(request: web.Request) -> web.Response:
        check_auth(request)
        async with model_lock:
            service.unload()
        return web.json_response({"status": "models unloaded"})

    def _last_model_path() -> str:
        import os

        return os.path.join(os.path.expanduser("~"), ".cache", "f5tts_tpu", "last_model.json")

    async def get_model(request: web.Request) -> web.Response:
        """Current + last-used checkpoint paths (the Gradio app's custom-ckpt
        picker remembers the last choice, ``infer_gradio.py:751-819``).
        Auth-gated: the response discloses server filesystem paths."""
        import os

        check_auth(request)

        last = {}
        try:
            with open(_last_model_path(), encoding="utf-8") as f:
                last = json.load(f)
        except (OSError, ValueError):
            pass
        s = service.settings
        return web.json_response({
            "loaded": service.loaded, "demo_tiny": s.demo_tiny, "tts_model": s.tts_model,
            "tts_ckpt": s.tts_ckpt, "tts_vocab": s.tts_vocab,
            "vocoder_ckpt": s.vocoder_ckpt, "last_used": last,
        })

    async def load_model(request: web.Request) -> web.Response:
        """Hot-swap the served checkpoint: POST {tts_ckpt, tts_vocab,
        vocoder_ckpt, vocoder_type?} — validates paths, reloads the engine,
        remembers the choice for next time. ``vocoder_type`` (vocos|bigvgan)
        states the vocoder checkpoint's family; without it a bigvgan-launched
        server could never swap to a vocos checkpoint (wrong converter)."""
        import os

        check_auth(request)
        body = await request.json()
        paths = {k: body.get(k, "") for k in ("tts_ckpt", "tts_vocab", "vocoder_ckpt")}
        missing = [k for k, v in paths.items() if not v or not os.path.exists(v)]
        if missing:
            raise web.HTTPBadRequest(
                text=json.dumps({"error": f"missing or nonexistent paths: {missing}"}))
        vocoder_type = body.get("vocoder_type", "vocos")
        if vocoder_type not in ("vocos", "bigvgan"):
            raise web.HTTPBadRequest(
                text=json.dumps({"error": f"vocoder_type must be vocos|bigvgan, got {vocoder_type!r}"}))
        s = service.settings
        prev = (s.tts_ckpt, s.tts_vocab, s.vocoder_ckpt, s.demo_tiny, s.tts_model, s.vocoder_type)

        def _set_new():
            s.tts_ckpt, s.tts_vocab, s.vocoder_ckpt = (
                paths["tts_ckpt"], paths["tts_vocab"], paths["vocoder_ckpt"])
            s.demo_tiny = False
            s.tts_model = "f5"  # the hot-swap route takes f5-family checkpoints
            s.vocoder_type = vocoder_type

        def _set_prev():
            (s.tts_ckpt, s.tts_vocab, s.vocoder_ckpt, s.demo_tiny,
             s.tts_model, s.vocoder_type) = prev

        def _swap_with_rollback():
            # one sync compound in one executor call: service.swap holds the
            # lifecycle lock across unload+mutate+load so the failure-recovery
            # reload thread can't interleave its own unload/load mid-swap
            try:
                service.swap(_set_new)
                return None, ""
            except Exception as e:  # bad checkpoint: restore the previous model
                log.exception("checkpoint load failed; rolling back")
                try:
                    service.swap(_set_prev)
                    return e, "previous model restored"
                except Exception as e2:
                    return e, f"previous model restore also failed: {e2}"

        loop = asyncio.get_running_loop()
        async with model_lock:
            err, restore = await loop.run_in_executor(None, _swap_with_rollback)
        if err is not None:
            raise web.HTTPBadRequest(
                text=json.dumps({"error": f"load failed: {err}", "rollback": restore}))
        try:
            os.makedirs(os.path.dirname(_last_model_path()), exist_ok=True)
            with open(_last_model_path(), "w", encoding="utf-8") as f:
                json.dump(paths, f)
        except OSError:
            pass
        return web.json_response({"status": "model loaded", **paths})

    app = web.Application(middlewares=[cors_middleware, timing_middleware], client_max_size=64 * 1024 * 1024)
    app.router.add_post("/v1/audio/speech", speech)
    app.router.add_post("/v1/transcribe/", transcribe)
    app.router.add_post("/v1/speech_to_speech", speech_to_speech)
    app.router.add_post("/v1/speech_edit", speech_edit)
    app.router.add_get("/v1/health", health)
    app.router.add_get("/v1/metrics", metrics)
    app.router.add_get("/metrics", metrics)  # Prometheus scrape convention
    app.router.add_post("/v1/profiler/start", profiler_start)
    app.router.add_post("/v1/profiler/stop", profiler_stop)
    app.router.add_get("/", index)
    app.router.add_post("/v1/load_all_models", load_all)
    app.router.add_post("/v1/unload_all_models", unload_all)
    app.router.add_get("/v1/model", get_model)
    app.router.add_post("/v1/load_model", load_model)
    app.router.add_get("/app", webapp)
    app.router.add_get("/v1/voices", voices)
    app.router.add_post("/v1/voices", add_voice)
    app.router.add_delete("/v1/voices/{name}", delete_voice)
    app.router.add_post("/v1/indic_chat", indic_chat)
    app.router.add_post("/v1/translate", translate_route)
    app.router.add_post("/v1/visual_query", visual_query)
    app.router.add_post("/v1/document_query_batch", visual_query)
    app["service"] = service

    async def on_startup(app):
        if not settings.lazy_load_model:
            await asyncio.get_running_loop().run_in_executor(None, service.load)

    async def on_cleanup(app):
        service.unload()

    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)
    return app


def main(argv=None):
    from f5tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s")
    args = parse_arguments(argv)
    settings = Settings.from_env(
        host=args.host, port=args.port,
        tts_ckpt=args.tts_ckpt, tts_vocab=args.tts_vocab,
        vocoder_ckpt=args.vocoder_ckpt, voices_dir=args.voices_dir,
    )
    if args.demo_tiny:
        settings.demo_tiny = True
    if args.config and args.config_file:
        settings = load_deployment_config(args.config_file, args.config, settings)
    app = build_app(settings)
    web.run_app(app, host=settings.host, port=settings.port)


if __name__ == "__main__":
    main()
