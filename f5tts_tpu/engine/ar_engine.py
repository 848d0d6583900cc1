"""AR-branch engine: batched autoregressive mel decoding + vocoder.

Minimal serving wrapper over ``models/ar.py`` (the Parler-class non-flow
branch, BASELINE config #3): encode text, run the KV-cache scan decode at a
static frame budget, trim by predicted stop lengths, vocode. Shares the
tokenizer and Vocos with the flow engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.models.ar import ARConfig, ar_generate
from f5tts_tpu.models.vocos import VocosConfig, vocos_decode
from f5tts_tpu.text.tokenizer import Tokenizer


@dataclass(frozen=True)
class AREngineConfig:
    vocoder: VocosConfig = field(default_factory=VocosConfig)
    text_pad: int = 256
    max_frames: int = 1024
    hop_length: int = 256
    sample_rate: int = 24000
    compute_dtype: str = "bfloat16"


class ARTTSEngine:
    def __init__(self, ar_params, ar_cfg: ARConfig, vocos_params, tokenizer: Tokenizer,
                 cfg: AREngineConfig = AREngineConfig()):
        self.ar_params = ar_params
        self.ar_cfg = ar_cfg
        self.vocos_params = vocos_params
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self._cache: dict = {}

    def _compiled(self, batch: int, max_frames: int):
        key = (batch, max_frames)
        if key in self._cache:
            return self._cache[key]

        def fn(ar_params, vocos_params, text):
            mel, lengths = ar_generate(
                self.ar_params if ar_params is None else ar_params,
                self.ar_cfg, text, max_frames, compute_dtype=self.compute_dtype,
            )
            mask = jnp.arange(max_frames)[None, :, None] < lengths[:, None, None]
            wave = vocos_decode(vocos_params, jnp.where(mask, mel, 0.0), self.cfg.vocoder,
                                compute_dtype=self.compute_dtype)
            return mel, lengths, wave

        self._cache[key] = jax.jit(fn)
        return self._cache[key]

    def synthesize_batch(self, texts: list[str]) -> list[np.ndarray]:
        b = len(texts)
        ids = self.tokenizer.encode(texts, pad_to=self.cfg.text_pad)
        fn = self._compiled(b, self.cfg.max_frames)
        mel, lengths, wave = fn(self.ar_params, self.vocos_params, jnp.asarray(ids))
        wave = np.asarray(wave, np.float32)
        lengths = np.asarray(lengths)
        out = []
        for i in range(b):
            n_samples = max((int(lengths[i]) - 1) * self.cfg.hop_length, 0)
            out.append(wave[i, :n_samples])
        return out


# ---------------------------------------------------------------------------
# ParlerTTS-architecture engine (description-conditioned codec decoding)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ParlerEngineConfig:
    max_frames: int = 256
    desc_pad: int = 64
    prompt_pad: int = 64
    temperature: float = 1.0
    top_k: int = 0
    eos_token: int = 1024
    compute_dtype: str = "bfloat16"
    # batch sizes snapped up to these when serving rows (one compiled program
    # per bucket instead of one per distinct request-batch size). Measured on
    # chip (BENCH.md config #3, random-init weights at real geometry): batch
    # 32 is the per-chip throughput optimum (35.9 vs 30.4 audio-s/s at 16 —
    # weights amortize, KV-cache traffic scales with b) and 64 does NOT fit
    # HBM (the 44.1 kHz DAC activations push past 15.75 G), so 32 tops the
    # bucket list; latency-sensitive deployments can cap at 16.
    batch_buckets: tuple[int, ...] = (1, 2, 4, 8, 16, 32)
    # streaming: decode segment length (code-stream positions per device
    # call) and the DAC receptive-field margin (latent frames withheld until
    # the window around them is final — makes streamed PCM exactly equal the
    # batch path; the real-geometry DAC RF is ~12 latent frames)
    stream_frames: int = 64
    stream_margin_frames: int = 32
    # decode-step layout override applied onto the decoder config (see
    # ParlerDecoderConfig.decode_layout / fuse_decode_qkv; bit-compatible,
    # probe-measured on chip — PARLER_STEP_PROBE.json). SERVING defaults are
    # the round-5 engine-level chip A/B winner: unrolled + fused q|k|v
    # (27.82 -> 32.49 audio-s/s at b=16 vs the stacked scan, same session).
    # The model-config default stays "stacked" (compact HLO for training /
    # portable paths). None = keep the decoder's own values.
    decode_layout: str | None = "unrolled"
    fuse_decode_qkv: bool | None = True
    # "pallas" = fused single-pass cache-attention decode kernel
    # (ops/pallas/decode_attention.py; requires decode_layout="unrolled")
    decode_attn: str | None = None


@dataclass
class ParlerRow:
    """One serving request for the AR branch: a style description + the text
    to speak (the ParlerTTS contract — no reference audio)."""

    description: str
    prompt: str
    seed: int = 0


class ParlerTTSEngine:
    """Batched serving wrapper over the ParlerTTS-compatible branch
    (models/parler.py): T5-encode the style description once per request,
    generate DAC codes with the delay-pattern KV-cache decode, vocode with the
    DAC decoder. One jitted program per (batch, frames) bucket — BASELINE
    config #3 runs this at batch 16.

    Token ids come from the caller (the real checkpoint's T5 tokenizer is a
    sentencepiece asset fetched with the weights; any per-string callable
    ``text -> list[int]`` plugs in via ``encode_fn`` — padding/masking is
    handled here).
    """

    def __init__(self, t5_params, t5_cfg, dec_params, dec_cfg, dac_params, dac_cfg,
                 cfg: ParlerEngineConfig = ParlerEngineConfig(), encode_fn=None):
        from f5tts_tpu.models import parler as P

        self.P = P
        self.t5_params, self.t5_cfg = t5_params, t5_cfg
        if (cfg.decode_layout is not None or cfg.fuse_decode_qkv is not None
                or cfg.decode_attn is not None):
            import dataclasses

            dec_cfg = dataclasses.replace(
                dec_cfg,
                **({"decode_layout": cfg.decode_layout} if cfg.decode_layout is not None else {}),
                **({"fuse_decode_qkv": cfg.fuse_decode_qkv} if cfg.fuse_decode_qkv is not None else {}),
                **({"decode_attn": cfg.decode_attn} if cfg.decode_attn is not None else {}),
            )
        self.dec_params, self.dec_cfg = dec_params, dec_cfg
        self.dac_params, self.dac_cfg = dac_params, dac_cfg
        self.cfg = cfg
        self.encode_fn = encode_fn
        self.compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self._cache: dict = {}
        # streaming programs are keyed by per-request values (frames, window
        # width) with unbounded distinct values over process lifetime — LRU
        # bounded so serving many distinct frames= requests can't grow
        # compiled-program memory forever (batch programs stay unbounded:
        # their keys come from the finite bucket lists)
        from collections import OrderedDict

        self._stream_cache: OrderedDict = OrderedDict()
        self.stream_cache_max = 64
        # Style-description encoder cache (measured: T5 encode is a constant
        # ~300 ms per batch on chip = 8-14% of the pipeline, PARLER_ROOFLINE;
        # production deployments serve a small set of named voices/styles, so
        # repeated descriptions skip the T5 entirely). Keyed by the exact
        # token-id tuple; value = a DEVICE-resident (desc_pad, hidden) row —
        # host round trips of enc measured 5x slower than the T5 itself
        # through the remote tunnel (~130 KB/style bf16 stays in HBM instead).
        self._desc_cache: OrderedDict = OrderedDict()
        self.desc_cache_max = 256
        self.desc_cache_hits = 0
        self.desc_cache_misses = 0

    def _stream_program(self, key, build):
        """LRU-bounded compile cache for the streaming path."""
        if key in self._stream_cache:
            self._stream_cache.move_to_end(key)
            return self._stream_cache[key]
        fn = build()
        self._stream_cache[key] = fn
        while len(self._stream_cache) > self.stream_cache_max:
            self._stream_cache.popitem(last=False)
        return fn

    def _pad_ids(self, ids_list, pad_to, side: str = "right"):
        """Prompts pad LEFT (official ParlerTTS batched inference: every
        prompt abuts the decoder start so sinusoidal position indices match
        the trained layout); descriptions pad right (standard T5 encoder)."""
        b = len(ids_list)
        out = np.zeros((b, pad_to), np.int32)
        mask = np.zeros((b, pad_to), bool)
        for i, ids in enumerate(ids_list):
            ids = np.asarray(ids, np.int32)
            if side == "left":
                # over-long prompts keep their TAIL: the tokens abutting the
                # decoder start are the ones the position layout depends on
                ids = ids[-pad_to:]
                out[i, pad_to - len(ids):] = ids
                mask[i, pad_to - len(ids):] = True
            else:
                ids = ids[:pad_to]
                out[i, : len(ids)] = ids
                mask[i, : len(ids)] = True
        return out, mask

    def _compiled(self, batch: int, frames: int, per_row_seeds: bool = False,
                  enc_input: bool = False):
        """``enc_input=True`` compiles the desc-cache fast path: takes the
        precomputed encoder states instead of description ids and skips the
        T5 entirely. The standard program also RETURNS ``enc`` so warm-up
        traffic fills the cache."""
        key = (batch, frames, per_row_seeds, enc_input)
        if key in self._cache:
            return self._cache[key]
        P, cfg = self.P, self.cfg

        def decode_part(dec_p, dac_p, enc, desc_mask, prompt, prompt_mask, rng, row_seeds):
            codes, lengths = P.parler_generate(
                dec_p, self.dec_cfg, enc, desc_mask, frames, rng,
                prompt_ids=prompt, prompt_mask=prompt_mask,
                eos_token=cfg.eos_token, temperature=cfg.temperature,
                top_k=cfg.top_k, max_code=self.dac_cfg.codebook_size,
                row_seeds=row_seeds,
                compute_dtype=self.compute_dtype)
            wave = P.dac_decode_codes(dac_p, codes, self.dac_cfg,
                                      compute_dtype=self.compute_dtype)
            return codes, lengths, wave

        if enc_input:
            def fn(t5_p, dec_p, dac_p, enc, desc_mask, prompt, prompt_mask, rng, row_seeds):
                enc = enc.astype(self.compute_dtype)
                codes, lengths, wave = decode_part(
                    dec_p, dac_p, enc, desc_mask, prompt, prompt_mask, rng, row_seeds)
                return codes, lengths, wave
        else:
            def fn(t5_p, dec_p, dac_p, desc, desc_mask, prompt, prompt_mask, rng, row_seeds):
                enc = P.t5_encode(t5_p, self.t5_cfg, desc, desc_mask,
                                  compute_dtype=self.compute_dtype)
                codes, lengths, wave = decode_part(
                    dec_p, dac_p, enc, desc_mask, prompt, prompt_mask, rng, row_seeds)
                return codes, lengths, wave, enc

        self._cache[key] = jax.jit(fn)
        return self._cache[key]

    def synthesize_batch(self, descriptions, prompts, seed: int = 0,
                         frames: int | None = None, row_seeds=None,
                         strict_lengths: bool = False) -> list[np.ndarray]:
        """descriptions/prompts: lists of token-id sequences (or raw strings
        when ``encode_fn`` is set). Returns float32 waves at the DAC rate,
        trimmed to each row's predicted length.

        ``row_seeds`` (one int per row) makes each row's sampling stream
        independent of batch composition; ``seed`` alone keys the whole batch.
        ``strict_lengths`` raises instead of silently clipping rows whose
        encoded prompt/description exceed the pad budgets (serving turns this
        on: a 200 with the head of the text missing is worse than a 400)."""
        if len(descriptions) != len(prompts):
            raise ValueError(
                f"descriptions ({len(descriptions)}) and prompts ({len(prompts)}) "
                "must pair up row-for-row")
        if self.encode_fn is not None:
            descriptions = [self.encode_fn(d) for d in descriptions]
            prompts = [self.encode_fn(p) for p in prompts]
        if strict_lengths:
            for i, (d, pr) in enumerate(zip(descriptions, prompts)):
                if len(d) > self.cfg.desc_pad:
                    raise ValueError(
                        f"description of row {i} is {len(d)} tokens, over the "
                        f"{self.cfg.desc_pad}-token budget")
                if len(pr) > self.cfg.prompt_pad:
                    raise ValueError(
                        f"text of row {i} is {len(pr)} tokens, over the "
                        f"{self.cfg.prompt_pad}-token budget — split the request")
        frames = self.cfg.max_frames if frames is None else frames
        desc, desc_mask = self._pad_ids(descriptions, self.cfg.desc_pad)
        prompt, prompt_mask = self._pad_ids(prompts, self.cfg.prompt_pad, side="left")
        if row_seeds is not None:
            row_seeds = jnp.asarray(np.asarray(row_seeds, np.int32))

        # description-encoder cache: when every row's style is cached, run
        # the enc-input program and skip the T5 (~300 ms/batch on chip)
        # key on the TRUNCATED ids — _pad_ids clips to desc_pad, so anything
        # past it never reaches the T5; keying on the full tuple would give
        # truncation-identical styles distinct entries holding identical rows
        keys = [tuple(np.asarray(d, np.int32)[: self.cfg.desc_pad].tolist())
                for d in descriptions]
        if all(k in self._desc_cache for k in keys):
            self.desc_cache_hits += len(keys)
            # device-side stack of device-resident rows: no host round trip
            enc = jnp.stack([self._desc_cache[k] for k in keys])
            for k in keys:
                self._desc_cache.move_to_end(k)
            fn = self._compiled(len(descriptions), frames, row_seeds is not None,
                                enc_input=True)
            _, lengths, wave = fn(self.t5_params, self.dec_params, self.dac_params,
                                  enc, jnp.asarray(desc_mask),
                                  jnp.asarray(prompt), jnp.asarray(prompt_mask),
                                  jax.random.PRNGKey(seed), row_seeds)
        else:
            self.desc_cache_misses += len(keys)
            fn = self._compiled(len(descriptions), frames, row_seeds is not None)
            _, lengths, wave, enc = fn(self.t5_params, self.dec_params, self.dac_params,
                                       jnp.asarray(desc), jnp.asarray(desc_mask),
                                       jnp.asarray(prompt), jnp.asarray(prompt_mask),
                                       jax.random.PRNGKey(seed), row_seeds)
            for i, k in enumerate(keys):
                self._desc_cache[k] = enc[i]  # device array; stays in HBM
                self._desc_cache.move_to_end(k)
            while len(self._desc_cache) > self.desc_cache_max:
                self._desc_cache.popitem(last=False)
        wave = np.asarray(wave, np.float32)
        lengths = np.asarray(lengths)
        return [wave[i, : int(lengths[i]) * self.dac_cfg.hop] for i in range(len(wave))]

    def synthesize_rows(self, rows: list[ParlerRow]) -> list[tuple[np.ndarray, None]]:
        """Row-level batched synthesis (the ``ContinuousBatcher`` primitive —
        same contract as ``TTSEngine.synthesize_rows``): co-arriving requests
        share one decode. Batches are split at ``batch_buckets[-1]`` (a burst
        above the top bucket must not compile a never-warmed exact-size
        program at serve time) and snapped UP to the next bucket by repeating
        the last row; per-row masks isolate rows, and ``ParlerRow.seed`` keys
        each row's own sampling stream, so outputs don't depend on which rows
        happened to co-batch."""
        results: list[tuple[np.ndarray, None]] = []
        top = self.cfg.batch_buckets[-1]
        for start in range(0, len(rows), top):
            sub = rows[start : start + top]
            bucket = next(v for v in self.cfg.batch_buckets if v >= len(sub))
            padded = sub + [sub[-1]] * (bucket - len(sub))
            waves = self.synthesize_batch(
                [r.description for r in padded], [r.prompt for r in padded],
                row_seeds=[r.seed for r in padded], strict_lengths=True)
            results.extend((w, None) for w in waves[: len(sub)])
        return results

    def synthesize_streaming(self, description, prompt, seed: int = 0,
                             frames: int | None = None):
        """Generator of PCM segments for ONE request — the AR decode is
        incremental, so audio streams as codes become final instead of after
        the whole utterance (closing the flow-branch/AR-branch streaming gap).

        Exactness: concatenating every yield equals
        ``synthesize_batch([description], [prompt], row_seeds=[seed])[0]``
        sample-for-sample (test-pinned). Two mechanisms make that hold:
        per-(seed, position) sampling streams (segmentation-invariant tokens),
        and DAC windows with ``stream_margin_frames`` of context on each side
        — a latent frame's samples are only emitted once every code within
        the decoder's receptive field is final.

        Compiled programs: one decode-segment program (fixed ``stream_frames``
        positions; the tail segment pads past the end — discarded), plus one
        DAC program per distinct window width (ramp-up widths below
        ``stream_frames + 2*margin``, then steady-state; bounded per request).
        """
        P, cfg = self.P, self.cfg
        if self.encode_fn is not None:
            d_ids, p_ids = self.encode_fn(description), self.encode_fn(prompt)
        else:
            d_ids, p_ids = description, prompt
        if len(d_ids) > cfg.desc_pad:
            raise ValueError(f"description is {len(d_ids)} tokens, over the {cfg.desc_pad}-token budget")
        if len(p_ids) > cfg.prompt_pad:
            raise ValueError(f"text is {len(p_ids)} tokens, over the {cfg.prompt_pad}-token budget")
        desc, desc_mask = self._pad_ids([d_ids], cfg.desc_pad)
        pr, pr_mask = self._pad_ids([p_ids], cfg.prompt_pad, side="left")
        frames = cfg.max_frames if frames is None else frames
        K = self.dec_cfg.codebooks
        steps = frames + K - 1
        seg = cfg.stream_frames
        margin = cfg.stream_margin_frames
        row_seeds = jnp.asarray([seed], jnp.int32)
        max_code = self.dac_cfg.codebook_size
        hop = self.dac_cfg.hop

        def build_seg():
            def seg_fn(t5_p, dec_p, desc, desc_mask, pr, pr_mask, carry, js, row_seeds):
                enc = P.t5_encode(t5_p, self.t5_cfg, desc, desc_mask, compute_dtype=self.compute_dtype)
                return P.parler_decode_segment(
                    dec_p, self.dec_cfg, enc, desc_mask, frames, js, carry,
                    prompt_ids=pr, prompt_mask=pr_mask, eos_token=cfg.eos_token,
                    temperature=cfg.temperature, top_k=cfg.top_k,
                    row_seeds=row_seeds, compute_dtype=self.compute_dtype)

            return jax.jit(seg_fn, static_argnames=())

        seg_fn = self._stream_program(("stream_seg", seg, frames), build_seg)

        def dac_win(width: int):
            return self._stream_program(
                ("stream_dac", width),
                lambda: jax.jit(lambda dac_p, codes: P.dac_decode_codes(
                    dac_p, codes, self.dac_cfg, compute_dtype=self.compute_dtype)))

        args = (jnp.asarray(desc), jnp.asarray(desc_mask), jnp.asarray(pr), jnp.asarray(pr_mask))
        carry = None
        toks_all = np.zeros((steps, 1, K), np.int32)
        n_done = 0  # decoded code-stream positions
        emitted = 0  # latent frames already emitted as PCM

        for j0 in range(1, steps + 1, seg):
            js = jnp.arange(j0, j0 + seg, dtype=jnp.int32)  # tail runs past steps; extras discarded
            carry, toks = seg_fn(self.t5_params, self.dec_params, *args, carry, js, row_seeds)
            real = min(seg, steps + 1 - j0)
            toks_all[n_done : n_done + real] = np.asarray(toks)[:real]
            n_done += real
            eos = int(np.asarray(carry[3])[0])
            # frame f is final once codebook K-1 emitted at position f+K
            done = min(max(n_done - K + 1, 0), frames, eos)
            finished = (n_done == steps) or (done >= eos)
            target = done if finished else max(done - margin, emitted)
            if target > emitted:
                # Window context: on the final flush after an early EOS the
                # batch path decoded `frames`-wide codes ZEROED past eos —
                # extend the window with those known zeros so the tail samples
                # see the identical code context (conv padding differs from
                # code-0 embeddings).
                ctx_end = min(frames, done + margin) if finished else done
                # de-delay + finalize the decoded prefix (host-side numpy)
                codes = np.zeros((1, K, ctx_end), np.int32)
                for k in range(K):
                    codes[0, k, :done] = toks_all[k : k + done, 0, k]
                codes[:, :, eos:] = 0
                codes = np.where((codes >= 0) & (codes < max_code), codes, 0)
                w0 = max(0, emitted - margin)
                wave = np.asarray(dac_win(ctx_end - w0)(
                    self.dac_params, jnp.asarray(codes[:, :, w0:ctx_end])), np.float32)
                yield wave[0, (emitted - w0) * hop : (target - w0) * hop]
                emitted = target
            if finished:
                break

    def validate_lengths(self, description: str, prompt: str) -> None:
        """Raise ValueError when the encoded description/prompt exceeds the
        pad budgets — called per request BEFORE batching so one oversized
        request cannot fail an entire co-batched group."""
        if self.encode_fn is None:
            return
        d, pr = self.encode_fn(description), self.encode_fn(prompt)
        if len(d) > self.cfg.desc_pad:
            raise ValueError(
                f"description is {len(d)} tokens, over the {self.cfg.desc_pad}-token budget")
        if len(pr) > self.cfg.prompt_pad:
            raise ValueError(
                f"text is {len(pr)} tokens, over the {self.cfg.prompt_pad}-token "
                "budget — split the request into shorter utterances")

    def warmup(self, batches=(1,)) -> None:
        """Pre-compile the (bucket, max_frames) programs a first burst would
        otherwise pay for."""
        for bv in batches:
            self.synthesize_rows([ParlerRow("warmup description", "warm up.")] * bv)
