"""TTS engine: the TPU-native replacement for the reference's inference
pipeline (``infer/utils_infer.py:357-524``) and model-call path
(``core/managers.py:82-85``).

Design (SURVEY §7 stage 5):

- **Static-shape buckets.** XLA compiles once per (duration bucket, batch
  bucket); requests pad up to the nearest bucket. The reference re-runs eager
  torch at every shape.
- **Batched chunks.** Long texts are chunked (speech-rate-aware byte budget)
  and chunks are synthesized as ONE batched ODE solve per bucket — the
  reference loops chunks sequentially at batch 1 (``utils_infer.py:441``).
- **Fused CFG** and step-invariant text embedding inside the sampler
  (``f5tts_tpu.sampling.euler``).
- **Vocoder in-graph.** Mel -> waveform decode is jitted with the sampler;
  generated frames are rolled to the origin with a gather so the decode is
  static-shape, zero-masked beyond each row's generated length (matches the
  reference's zero conv padding at the clip edge).

Host-side work (text encode, wav io, crossfade) stays in numpy; everything
between cond-mel and waveform is one jit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from f5tts_tpu.audio.preprocess import TARGET_RMS, TARGET_SR, normalize_rms, resample
from f5tts_tpu.audio.stitch import crossfade_concat
from f5tts_tpu.models.dit import DiTConfig, dit_embed, dit_forward
from f5tts_tpu.models.vocos import VocosConfig, vocos_decode
from f5tts_tpu.ops.mel import MelConfig, bucketed_log_mel
from f5tts_tpu.sampling.euler import SamplerConfig, nfe_to_steps, sample_cfm, serving_default_sampler
from f5tts_tpu.text.chunker import chunk_text, chunk_text_packed, duration_frames, max_chars_for_ref
from f5tts_tpu.text.tokenizer import Tokenizer
from f5tts_tpu.utils.profiling import GLOBAL_TIMER


@dataclass(frozen=True)
class EngineConfig:
    mel: MelConfig = field(default_factory=MelConfig)
    vocoder_type: str = "vocos"  # "vocos" | "bigvgan" (utils_infer.py:92-130 choice)
    vocoder: VocosConfig = field(default_factory=VocosConfig)
    bigvgan: "object" = None  # BigVGANConfig when vocoder_type == "bigvgan"
    # serving default = the CERTIFIED reduced-compute recipe (Ralston RK2, 10
    # intervals = NFE 40 across both branches; BENCH.md round-2 quality
    # certification: 0.48-0.69x the Euler-32 recipe's own solver error at
    # 40/64 the forwards). The exact reference recipe is
    # SamplerConfig(method="euler", steps=32).
    sampler: SamplerConfig = field(default_factory=serving_default_sampler)
    duration_buckets: tuple[int, ...] = (256, 512, 768, 1024, 1536, 2048, 3072, 4096)
    batch_buckets: tuple[int, ...] = (1, 2, 4, 8, 16, 32)
    text_pad: int = 512
    max_duration: int = 4096  # model/cfm.py:93
    compute_dtype: str = "bfloat16"
    quantization: str = "none"  # "none" | "int8" (W8A8 dynamic, serving-only)
    cross_fade_duration: float = 0.15
    target_rms: float = TARGET_RMS
    speed: float = 1.0
    # Per-solve row caps by duration bucket: batch scaling of the fused-CFG
    # solve is NOT monotone on chip, so every bucket carries its measured
    # optimum (round-3 full grid, SOLVE_GRID.jsonl / BENCH.md: e.g. 1024-bucket
    # 53.0 audio-s/s at 8 rows vs 47.7 at 16; 512 peaks at 16; nothing above
    # 512 gains past 8 rows). 256 stays uncapped (batch mildly helps there);
    # larger groups split into capped solves and continuous batching still
    # fills them across requests.
    solve_batch_caps: tuple[tuple[int, int], ...] = (
        (512, 16), (768, 8), (1024, 8), (1536, 8), (2048, 8), (3072, 8), (4096, 8))
    # Long-form throughput knob: additionally cap each chunk so its predicted
    # TOTAL frames (ref + generated) fit this bucket. The reference's byte
    # budget targets ~25 s chunks (utils_infer.py:377) which land in the
    # 2048-frame bucket; the attention n² makes 1024-frame chunks ~1.4x
    # faster per generated frame on chip (BENCH.md), so the default caps
    # chunks at the 1024 bucket — slightly more crossfade/ref overhead for
    # net long-form throughput (measured in BENCH.md config #4).
    # None = exact reference chunking contract (~25 s chunks).
    chunk_frames_budget: int | None = 1024
    # quality=strict escalation threshold: per-row embedded-error estimate
    # (RMSE over generated frames of the accumulated RK2-vs-Euler
    # disagreement — same normalization as the certification metric) above
    # which a strict row re-solves with the exact reference recipe
    # (euler-32). Calibrated on the toy-field ladder (BENCH.md round-4):
    # the estimate tracks field sharpness, and this value separates the
    # fields where the RK2 default certifies from the sharp field where no
    # sub-recipe-cost config does.
    strict_threshold: float = 0.12
    # Floor on generated frames per chunk when chunk_frames_budget is set:
    # long references (clip cap is 15 s ~ 1406 frames, audio/preprocess.py)
    # can leave the configured bucket little or no room to generate, which
    # would degenerate chunking to one clause per solve; the budget instead
    # relaxes to the smallest duration bucket leaving at least this much
    # generation room (see _max_chunk_chars).
    min_chunk_gen_frames: int = 256
    # Long-form packing mode: when chunk_frames_budget is set, fill each
    # chunk's byte budget to within ~8% with word-boundary top-off
    # (chunk_text_packed) instead of stopping at the last whole clause.
    # Clause quantization leaves ~8% of the bucket unfilled (944/1024
    # measured), which IS the structural long-form throughput gap — a full
    # chunk is exactly the headline geometry. Trade-off: some crossfades land
    # on word boundaries instead of clause pauses (the reference already
    # splits mid-sentence at commas; this is one step further). False, or
    # chunk_frames_budget=None, restores the exact reference contract.
    chunk_pack_words: bool = True
    # Max solve groups in flight during synthesize_rows' dispatch/fetch
    # overlap: bounds peak HBM to O(1) extra group buffers instead of
    # O(groups) (a long-form job submits every chunk in one call).
    fetch_pipeline_depth: int = 3

    def __post_init__(self):
        # Normalize solve_batch_caps: drop entries for absent duration buckets
        # and snap each cap DOWN to a real batch bucket. synthesize_rows
        # re-buckets capped groups with _bucket(len(sub), batch_buckets), so a
        # non-bucket cap would pad every group back UP to the next bucket —
        # running the big-batch solve once per group (multiplying work) and
        # paying a serve-time compile that warmup (bb=min(bb, cap)) never saw.
        caps = []
        for nb, cap in self.solve_batch_caps:
            if nb not in self.duration_buckets:
                continue
            legal = [b for b in self.batch_buckets if b <= cap]
            caps.append((nb, max(legal) if legal else min(self.batch_buckets)))
        object.__setattr__(self, "solve_batch_caps", tuple(caps))


def _bucket(v: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if v <= b:
            return b
    return buckets[-1]


def _ref_mel(wav: np.ndarray, mel_cfg: MelConfig) -> np.ndarray:
    """Log-mel of a reference clip (sample-bucketed to bound XLA compiles)."""
    return bucketed_log_mel(wav, mel_cfg)


@dataclass
class RequestPlan:
    """One request's preprocessed synthesis plan."""

    rows: list["RowSpec"]
    rms: float
    cross_fade_duration: float


@dataclass
class RowSpec:
    """One utterance-chunk to synthesize: its own reference voice + duration.

    With ``edit_mask`` set, the row is a speech-EDIT row (``cfm.py:130-131``
    infill semantics): ``cond_mel`` is the full edited utterance
    (``ref_frames == duration`` frames), ``edit_mask`` marks frames to keep
    verbatim (False = regenerate), and the result covers the WHOLE utterance
    from frame 0 instead of the generated tail. Edit rows co-batch with
    synthesis rows in the same duration bucket (``synthesize_rows``)."""

    text: str  # ref_text + gen chunk (edit rows: the full target text)
    cond_mel: np.ndarray  # (ref_frames, n_mels)
    ref_frames: int
    duration: int  # total frames incl. ref
    steps: int = 32
    cfg_strength: float = 2.0
    seed: int | None = None
    edit_mask: np.ndarray | None = None  # (duration,) bool; None = synthesis row
    # "strict": solve with the embedded RK2 error estimate and auto-escalate
    # to the exact reference recipe (euler-32) when it exceeds the calibrated
    # threshold (EngineConfig.strict_threshold) — turns the sharp-field
    # failure mode (BENCH.md round-3) into a detected, costed fallback
    quality: str = "default"  # "default" | "strict"


class TTSEngine:
    def __init__(
        self,
        dit_params,
        dit_cfg: DiTConfig,
        vocos_params,
        tokenizer: Tokenizer,
        cfg: EngineConfig = EngineConfig(),
        mesh=None,
        forward_fn=dit_forward,
        embed_fn=dit_embed,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` ('data','model'); DiT params
        are tensor-parallel sharded over 'model' (``parallel.sharding`` rules),
        vocos replicated, and XLA inserts the TP collectives under jit."""
        if mesh is not None:
            from f5tts_tpu.parallel.sharding import shard_params, vocos_param_specs
            from jax.sharding import NamedSharding

            dit_params = shard_params(dit_params, mesh)
            vocos_params = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), vocos_params, vocos_param_specs(vocos_params)
            )
        self.mesh = mesh
        self.compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        # inference-only: fused true-FLOP Pallas conv-pos (ops/pallas/conv_pos.py)
        # replaces the earlier block-diagonal densify (16x MACs) — 15.8 -> ~3 ms
        # of the DiT step; keep XLA under a mesh (pallas doesn't auto-partition)
        if mesh is None and getattr(dit_cfg, "conv_pos_impl", None) == "xla":
            import dataclasses

            dit_cfg = dataclasses.replace(dit_cfg, conv_pos_impl="fused")
        if self.compute_dtype == jnp.bfloat16:
            # serving copy in bf16: halves HBM weight traffic per ODE step and
            # removes per-use f32->bf16 casts from the compiled graph
            cast = lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x
            dit_params = jax.tree.map(cast, dit_params)
            vocos_params = jax.tree.map(cast, vocos_params)
        if cfg.quantization == "int8" and isinstance(dit_params, dict) and "blocks" in dit_params:
            from f5tts_tpu.models.dit import quantize_dit_params

            dit_params = quantize_dit_params(dit_params)
        # NOTE: fuse_attention_qkv benched ~11% slower end-to-end (24.9x vs
        # 28.0x) — XLA pipelines the three separate projections better than
        # one matmul + split; intentionally not applied.
        self.dit_params = dit_params
        self.dit_cfg = dit_cfg
        self.vocos_params = vocos_params
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.forward_fn = forward_fn
        self.embed_fn = embed_fn
        self._host_rng = np.random.default_rng()
        # per-instance compile caches (functools.lru_cache on methods would
        # key on self and pin the engine + compiled graphs across reloads)
        self._compiled_cache: dict = {}
        self._edit_cache: dict = {}
        # quality=strict observability: total recipe escalations + the last
        # synthesize_rows call's per-row embedded-error estimates
        self.escalations = 0
        self.last_estimates: dict[int, float] = {}
        if cfg.vocoder_type == "bigvgan":
            from f5tts_tpu.models.bigvgan import BigVGANConfig, bigvgan_decode

            bcfg = cfg.bigvgan if cfg.bigvgan is not None else BigVGANConfig(mel_dim=cfg.mel.n_mels)
            self._decode = lambda vp, mel_frames: bigvgan_decode(vp, mel_frames, bcfg, compute_dtype=self.compute_dtype)
        else:
            self._decode = lambda vp, mel_frames: vocos_decode(vp, mel_frames, cfg.vocoder, compute_dtype=self.compute_dtype)

    def _max_chunk_chars(self, ref_text: str, ref_secs: float, ref_frames: int, speed: float) -> int:
        """Chunker byte budget (utils_infer.py:376-378), additionally capped by
        chunk_frames_budget: invert the duration heuristic (utils_infer.py:446-453)
        so ref + generated frames of a full chunk fit the target bucket."""
        max_chars = max_chars_for_ref(ref_text, ref_secs)
        budget = self.cfg.chunk_frames_budget
        if budget is not None:
            if budget - ref_frames < self.cfg.min_chunk_gen_frames:
                # long reference: the configured bucket leaves (almost) no
                # room to generate — chunking would degenerate to one clause
                # per solve, each re-paying the full reference. Relax to the
                # smallest duration bucket with real generation room; if none
                # exists, drop the cap (pure reference byte budget).
                budget = next(
                    (b for b in self.cfg.duration_buckets
                     if b - ref_frames >= self.cfg.min_chunk_gen_frames),
                    None,
                )
            if budget is not None:
                ref_bytes = max(len(ref_text.encode("utf-8")), 1)
                budget_frames = max(budget - ref_frames, 1)
                max_chars = min(max_chars, int(budget_frames * ref_bytes / max(ref_frames, 1) * speed))
        return max(max_chars, 1)

    def _chunk(self, gen_text: str, max_chars: int) -> list[str]:
        """Chunker dispatch: word-topoff packing in budget mode (fills the
        duration bucket — see EngineConfig.chunk_pack_words), exact reference
        clause chunking (utils_infer.py:61-88) otherwise."""
        if self.cfg.chunk_frames_budget is not None and self.cfg.chunk_pack_words:
            return chunk_text_packed(gen_text, max_chars=max_chars)
        return chunk_text(gen_text, max_chars=max_chars)

    def _wave_samples(self, n_frames: int) -> int:
        """Samples produced for n mel frames: vocos iSTFT yields (n-1)*hop
        (center trim); bigvgan's transposed convs yield n*prod(rates)."""
        if self.cfg.vocoder_type == "bigvgan":
            from math import prod

            bcfg = self.cfg.bigvgan
            rate = prod(bcfg.upsample_rates) if bcfg is not None else 256
            return max(n_frames * rate, 0)
        return max((n_frames - 1) * self.cfg.mel.hop_length, 0)

    # ------------------------------------------------------------------
    # compiled core
    # ------------------------------------------------------------------

    def _request_sampler(self, steps: int, cfg_strength: float) -> SamplerConfig:
        """The engine's configured sampler at a per-request (steps, guidance):
        every other knob (method, sway, guidance interval/caching, null reuse)
        is inherited verbatim from ``cfg.sampler``."""
        import dataclasses

        from f5tts_tpu.sampling.euler import default_time_grid

        return dataclasses.replace(
            self.cfg.sampler, steps=steps, cfg_strength=cfg_strength,
            # a configured knot grid only applies at its own step count; other
            # per-request nfe_step values re-resolve against the framework's
            # per-(method, steps) recipe grids (sway when none)
            time_grid=(self.cfg.sampler.time_grid if steps == self.cfg.sampler.steps
                       else default_time_grid(self.cfg.sampler.method, steps)),
        )

    def _supports_estimate(self) -> bool:
        """quality=strict needs the embedded 2-stage estimate: a 2-eval
        integrator on the plain guidance path. With the euler recipe (or the
        cached/interval accelerations) configured, strict is a no-op — the
        user already chose an exact-recipe or reduced-guidance trade."""
        from f5tts_tpu.sampling.euler import EVALS_PER_STEP

        s = self.cfg.sampler
        return (EVALS_PER_STEP.get(s.method) == 2 and s.cfg_cache_period == 1
                and tuple(s.cfg_interval) == (0.0, 1.0))

    def _compiled(self, n: int, b: int, nt: int, steps: int, cfg_strength: float,
                  estimate: bool = False, recipe: bool = False):
        """``estimate``: the program also returns the per-row embedded error
        (strict-mode groups). ``recipe``: solve with the EXACT reference
        recipe (euler-32/sway, ``utils_infer.py:49-52``) regardless of the
        engine's configured sampler — the escalation target."""
        key = (n, b, nt, steps, cfg_strength, estimate, recipe)
        if key in self._compiled_cache:
            return self._compiled_cache[key]
        if recipe:
            sampler = SamplerConfig(method="euler", steps=32, cfg_strength=cfg_strength,
                                    sway_sampling_coef=-1.0)
        else:
            sampler = self._request_sampler(steps, cfg_strength)

        def fn(dit_params, vocos_params, cond, cond_lens, text, duration, seeds):
            mel_out = sample_cfm(
                dit_params, self.dit_cfg,
                cond=cond, cond_lens=cond_lens, text=text, duration=duration,
                sampler=sampler, seeds=seeds, compute_dtype=self.compute_dtype,
                forward_fn=self.forward_fn, embed_fn=self.embed_fn,
                return_error_estimate=estimate,
            )
            if estimate:
                mel_out, est = mel_out
            # roll generated frames to origin; zero beyond generated length
            idx = (jnp.arange(n)[None, :] + cond_lens[:, None]) % n
            gen = jnp.take_along_axis(mel_out, idx[..., None], axis=1)
            gen_len = duration - cond_lens
            gen = jnp.where(jnp.arange(n)[None, :, None] < gen_len[:, None, None], gen, 0.0)
            wave = self._decode(vocos_params, gen)
            if estimate:
                return gen.astype(jnp.float32), wave, est
            return gen.astype(jnp.float32), wave

        self._compiled_cache[key] = jax.jit(fn)
        return self._compiled_cache[key]

    def _compiled_edit(self, n: int, b: int, steps: int, cfg_strength: float):
        """Edit-capable batched program: the synthesis program plus an
        ``edit_mask`` (infill conditioning, ``cfm.py:130-131``) and a per-row
        ``out_start`` (0 for edit rows -> full utterance; ``cond_lens`` for
        synthesis rows -> generated tail), so edit and synthesis rows share
        ONE batched solve. Compiled per (bucket, batch, steps, cfg) like the
        plain program; the plain program stays separate so pure-synthesis
        traffic carries no edit inputs."""
        key = (n, b, steps, cfg_strength)
        if key in self._edit_cache:
            return self._edit_cache[key]
        sampler = self._request_sampler(steps, cfg_strength)

        def fn(dit_params, vocos_params, cond, cond_lens, text, duration, edit_mask, out_start, seeds):
            mel_out = sample_cfm(
                dit_params, self.dit_cfg,
                cond=cond, cond_lens=cond_lens, text=text, duration=duration,
                sampler=sampler, seeds=seeds, edit_mask=edit_mask, compute_dtype=self.compute_dtype,
                forward_fn=self.forward_fn, embed_fn=self.embed_fn,
            )
            idx = (jnp.arange(n)[None, :] + out_start[:, None]) % n
            gen = jnp.take_along_axis(mel_out, idx[..., None], axis=1)
            gen_len = duration - out_start
            gen = jnp.where(jnp.arange(n)[None, :, None] < gen_len[:, None, None], gen, 0.0)
            wave = self._decode(vocos_params, gen)
            return gen.astype(jnp.float32), wave

        self._edit_cache[key] = jax.jit(fn)
        return self._edit_cache[key]

    def speech_edit(
        self,
        audio: np.ndarray,
        sr: int,
        target_text: str,
        parts_to_edit: list[tuple[float, float]],
        fix_durations: list[float] | None = None,
        *,
        steps: int | None = None,
        cfg_strength: float | None = None,
        seed: int | None = None,
    ) -> tuple[np.ndarray, int, np.ndarray]:
        """Regenerate the given time spans to match ``target_text``, preserving
        unmasked frames verbatim (``infer/speech_edit.py:129-176`` semantics via
        the sampler's edit_mask; ``model/cfm.py:130-131,204``).

        Unlike the reference script — which builds the span-resized conditioning
        signal but then passes the *original* audio (``speech_edit.py:137-149``,
        the resized ``audio_`` is dead code) — this uses the resized signal, so
        ``fix_durations`` actually changes span lengths.
        """
        row, rms = self.prepare_edit_row(
            audio, sr, target_text, parts_to_edit, fix_durations,
            steps=steps, cfg_strength=cfg_strength, seed=seed,
        )
        wave, gen_mel = self.synthesize_rows([row])[0]
        return self.finalize_edit(row, rms, wave, gen_mel)

    def prepare_edit_row(
        self,
        audio: np.ndarray,
        sr: int,
        target_text: str,
        parts_to_edit: list[tuple[float, float]],
        fix_durations: list[float] | None = None,
        *,
        steps: int | None = None,
        cfg_strength: float | None = None,
        seed: int | None = None,
    ) -> tuple[RowSpec, float]:
        """Host-side edit preprocessing -> a batchable ``RowSpec`` (+ the
        original RMS for ``finalize_edit``). The row rides the continuous
        batcher like any synthesis chunk."""
        cfg = self.cfg
        hop = cfg.mel.hop_length
        steps = nfe_to_steps(steps, cfg.sampler.method) if steps is not None else cfg.sampler.steps
        guidance = cfg_strength if cfg_strength is not None else cfg.sampler.cfg_strength

        if audio.ndim == 2:
            audio = audio.mean(axis=0)
        audio, rms = normalize_rms(audio, cfg.target_rms)
        if sr != TARGET_SR:
            audio = resample(audio, sr, TARGET_SR)

        fixes = list(fix_durations) if fix_durations else None
        pieces, mask_frames = [], []
        offset = 0.0
        for start, end in parts_to_edit:
            part_dur = (end - start) if fixes is None else fixes.pop(0)
            keep = audio[round(offset * TARGET_SR) : round(start * TARGET_SR)]
            pieces += [keep, np.zeros(round(part_dur * TARGET_SR), np.float32)]
            mask_frames += [
                np.ones(round((start - offset) * TARGET_SR / hop), bool),
                np.zeros(round(part_dur * TARGET_SR / hop), bool),
            ]
            offset = end
        pieces.append(audio[round(offset * TARGET_SR) :])
        edited = np.concatenate(pieces)
        n_frames = len(edited) // hop
        edit_mask = np.concatenate(mask_frames)
        edit_mask = np.pad(edit_mask, (0, max(n_frames + 1 - len(edit_mask), 0)), constant_values=True)[: n_frames]

        nb = _bucket(min(n_frames, cfg.max_duration), cfg.duration_buckets)
        n_frames = min(n_frames, nb)  # max_duration clamp (cfm.py:137)
        cond_mel = _ref_mel(edited, cfg.mel)[:n_frames]
        row = RowSpec(
            text=target_text, cond_mel=cond_mel, ref_frames=n_frames,
            duration=n_frames, steps=steps, cfg_strength=guidance,
            seed=seed if seed is not None else int(self._host_rng.integers(2**31 - 1)),
            edit_mask=edit_mask[:n_frames],
        )
        return row, rms

    def finalize_edit(self, row: RowSpec, rms: float, wave: np.ndarray,
                      gen_mel: np.ndarray) -> tuple[np.ndarray, int, np.ndarray]:
        if rms < self.cfg.target_rms:
            wave = wave * rms / self.cfg.target_rms
        return wave, TARGET_SR, gen_mel

    def warmup(self, buckets: list[tuple[int, int]] | None = None, *, nfe_step: int | None = None,
               cfg_strength: float | None = None) -> None:
        """Pre-compile (duration, batch) buckets so the first request doesn't
        pay XLA compile latency (the reference has no AOT story at all).

        ``nfe_step`` uses the same unit as ``prepare_request``'s knob — model
        evals per guidance branch — so warming up with the number you serve
        with precompiles the shape requests actually run."""
        steps = nfe_to_steps(nfe_step, self.cfg.sampler.method) if nfe_step is not None else self.cfg.sampler.steps
        guidance = cfg_strength if cfg_strength is not None else self.cfg.sampler.cfg_strength
        buckets = buckets or [(self.cfg.duration_buckets[0], self.cfg.batch_buckets[0])]
        caps = dict(self.cfg.solve_batch_caps)
        for nb, bb in buckets:
            # solve_batch_caps: synthesize_rows never runs more rows than the
            # bucket's cap — don't pay a (possibly 10+ min remote) compile for
            # a shape that can't occur
            bb = min(bb, caps.get(nb, bb))
            fn = self._compiled(nb, bb, self.cfg.text_pad, steps, guidance)
            cond = jnp.zeros((bb, nb, self.cfg.mel.n_mels), jnp.float32)
            out = fn(
                self.dit_params, self.vocos_params, cond,
                jnp.full((bb,), 2, jnp.int32),
                jnp.full((bb, self.cfg.text_pad), -1, jnp.int32),
                jnp.full((bb,), nb, jnp.int32),
                jnp.zeros((bb,), jnp.int32),
            )
            jax.block_until_ready(out)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def prepare_request(
        self,
        gen_text: str,
        ref_audio: np.ndarray,
        ref_sr: int,
        ref_text: str,
        *,
        speed: float | None = None,
        fix_duration_secs: float | None = None,
        nfe_step: int | None = None,
        cfg_strength: float | None = None,
        seed: int | None = None,
        cross_fade_duration: float | None = None,
        quality: str = "default",
    ) -> "RequestPlan":
        """Host-side preprocessing: ref conditioning, chunking, durations ->
        the RowSpecs to synthesize. Used by both the direct path and the
        cross-request continuous batcher."""
        if quality not in ("default", "strict"):
            raise ValueError(f"quality must be default|strict, got {quality!r}")
        cfg = self.cfg
        speed = speed if speed is not None else cfg.speed
        # nfe_step counts model evals per branch (the reference's knob);
        # convert to ODE intervals for the configured integrator
        steps = nfe_to_steps(nfe_step, cfg.sampler.method) if nfe_step is not None else cfg.sampler.steps
        guidance = cfg_strength if cfg_strength is not None else cfg.sampler.cfg_strength
        xfade = cross_fade_duration if cross_fade_duration is not None else cfg.cross_fade_duration

        # --- reference audio conditioning (utils_infer.py:423-433)
        if ref_audio.ndim == 2:
            ref_audio = ref_audio.mean(axis=0)
        ref_audio, rms = normalize_rms(ref_audio, cfg.target_rms)
        if ref_sr != TARGET_SR:
            ref_audio = resample(ref_audio, ref_sr, TARGET_SR)
        ref_secs = len(ref_audio) / TARGET_SR

        if ref_text and len(ref_text[-1].encode("utf-8")) == 1:
            ref_text = ref_text + " "

        ref_frames = len(ref_audio) // cfg.mel.hop_length
        cond_mel = _ref_mel(ref_audio, cfg.mel)

        # --- chunking (utils_infer.py:376-378)
        chunks = self._chunk(gen_text, self._max_chunk_chars(ref_text, ref_secs, ref_frames, speed))
        if not chunks:
            chunks = [gen_text]

        rows = [
            RowSpec(
                text=ref_text + c,
                cond_mel=cond_mel[:ref_frames],
                ref_frames=ref_frames,
                duration=min(
                    duration_frames(ref_frames, ref_text, c, speed, fix_duration_secs,
                                    cfg.mel.sample_rate, cfg.mel.hop_length),
                    cfg.max_duration,
                ),
                steps=steps, cfg_strength=guidance, seed=seed, quality=quality,
            )
            for c in chunks
        ]
        return RequestPlan(rows=rows, rms=rms, cross_fade_duration=xfade)

    def finalize_request(self, plan: "RequestPlan", results: list[tuple[np.ndarray, np.ndarray]]):
        """Per-row (wave, mel) results -> (stitched wave, sr, concat mel)."""
        cfg = self.cfg
        waves = [w for w, _ in results]
        mels = [m_ for _, m_ in results]
        if plan.rms < cfg.target_rms:
            waves = [w * plan.rms / cfg.target_rms for w in waves]
        final = crossfade_concat(waves, plan.cross_fade_duration, TARGET_SR)
        combined_mel = np.concatenate(mels, axis=0) if mels else np.zeros((0, cfg.mel.n_mels), np.float32)
        return final, TARGET_SR, combined_mel

    def synthesize(self, gen_text, ref_audio, ref_sr, ref_text, **kw) -> tuple[np.ndarray, int, np.ndarray]:
        """Full text -> waveform path (parity contract of ``infer_process``,
        ``utils_infer.py:357-400``): returns (wave, 24000, concat mel)."""
        plan = self.prepare_request(gen_text, ref_audio, ref_sr, ref_text, **kw)
        return self.finalize_request(plan, self.synthesize_rows(plan.rows))

    def synthesize_streaming(
        self,
        gen_text: str,
        ref_audio: np.ndarray,
        ref_sr: int,
        ref_text: str,
        *,
        speed: float | None = None,
        nfe_step: int | None = None,
        cfg_strength: float | None = None,
        seed: int | None = None,
        cross_fade_duration: float | None = None,
    ):
        """Generator of waveform segments, emitted as each text chunk finishes
        its ODE solve — time-to-first-audio is one chunk instead of the whole
        utterance (the reference buffers everything, ``routes/speech.py:37``).
        Crossfade regions are blended across yields; concatenating all yields
        equals the non-streaming output."""
        cfg = self.cfg
        speed = speed if speed is not None else cfg.speed
        steps = nfe_to_steps(nfe_step, cfg.sampler.method) if nfe_step is not None else cfg.sampler.steps
        guidance = cfg_strength if cfg_strength is not None else cfg.sampler.cfg_strength
        xfade = cross_fade_duration if cross_fade_duration is not None else cfg.cross_fade_duration
        n_fade = int(xfade * TARGET_SR)

        if ref_audio.ndim == 2:
            ref_audio = ref_audio.mean(axis=0)
        ref_audio, rms = normalize_rms(ref_audio, cfg.target_rms)
        if ref_sr != TARGET_SR:
            ref_audio = resample(ref_audio, ref_sr, TARGET_SR)
        ref_secs = len(ref_audio) / TARGET_SR
        if ref_text and len(ref_text[-1].encode("utf-8")) == 1:
            ref_text = ref_text + " "
        ref_frames = len(ref_audio) // cfg.mel.hop_length
        cond_mel = _ref_mel(ref_audio, cfg.mel)

        # identical chunking to prepare_request (incl. the chunk_frames_budget
        # cap) so concatenating the stream equals the non-streaming output
        chunks = self._chunk(gen_text, self._max_chunk_chars(ref_text, ref_secs, ref_frames, speed)) or [gen_text]

        from f5tts_tpu.audio import native

        pending: np.ndarray | None = None
        for ci, c in enumerate(chunks):
            is_last = ci == len(chunks) - 1
            dur = min(
                duration_frames(ref_frames, ref_text, c, speed, None, cfg.mel.sample_rate, cfg.mel.hop_length),
                cfg.max_duration,
            )
            rows = [RowSpec(text=ref_text + c, cond_mel=cond_mel[:ref_frames], ref_frames=ref_frames,
                            duration=dur, steps=steps, cfg_strength=guidance, seed=seed)]
            wave = self.synthesize_rows(rows)[0][0]
            if rms < cfg.target_rms:
                wave = wave * rms / cfg.target_rms
            if pending is None:
                merged = wave
            else:
                merged = native.crossfade_pair(pending, wave, min(n_fade, len(pending), len(wave)))
            if not is_last and n_fade > 0:
                yield merged[:-n_fade] if len(merged) > n_fade else merged[:0]
                pending = merged[-n_fade:]
            else:
                yield merged
                pending = None
        if pending is not None and len(pending):
            yield pending

    def synthesize_batch(
        self,
        chunks: list[str],
        cond_mel: np.ndarray,  # (ref_frames, n_mels)
        ref_frames: int,
        ref_text: str,
        durations: list[int],
        *,
        steps: int,
        cfg_strength: float,
        seed: int | None = None,
    ) -> tuple[list[np.ndarray], list[np.ndarray]]:
        """Synthesize one request's chunks as batched rows (input order preserved)."""
        rows = [
            RowSpec(
                text=ref_text + c, cond_mel=cond_mel, ref_frames=ref_frames,
                duration=d, steps=steps, cfg_strength=cfg_strength, seed=seed,
            )
            for c, d in zip(chunks, durations)
        ]
        out = self.synthesize_rows(rows)
        return [w for w, _ in out], [m_ for _, m_ in out]

    def _pack_group(self, rows: list["RowSpec"], sub: list[int], nb: int, bb: int):
        """Pack the rows at indices ``sub`` into padded batch arrays."""
        cfg = self.cfg
        pad_rows = bb - len(sub)
        text_ids = self.tokenizer.encode([rows[i].text for i in sub], pad_to=cfg.text_pad)
        if pad_rows:
            text_ids = np.concatenate([text_ids, np.repeat(text_ids[:1], pad_rows, 0)])
        cond = np.zeros((bb, nb, cfg.mel.n_mels), np.float32)
        cond_lens = np.empty((bb,), np.int32)
        dur = np.empty((bb,), np.int32)
        out_start = np.empty((bb,), np.int32)
        em = np.ones((bb, nb), bool)
        seeds = np.empty((bb,), np.int32)
        for row, i in enumerate(sub):
            r = rows[i]
            rf = min(r.ref_frames, nb)
            cond[row, :rf] = r.cond_mel[:rf]
            cond_lens[row] = rf
            dur[row] = min(r.duration, nb)
            if r.edit_mask is None:
                out_start[row] = rf  # synthesis: return the generated tail
            else:
                out_start[row] = 0  # edit: return the whole utterance
                em[row, : min(len(r.edit_mask), nb)] = r.edit_mask[:nb]
            seeds[row] = r.seed if r.seed is not None else self._host_rng.integers(2**31 - 1)
        if pad_rows:
            cond[len(sub) :] = cond[0]
            cond_lens[len(sub) :] = cond_lens[0]
            dur[len(sub) :] = dur[0]
            seeds[len(sub) :] = seeds[0]
            out_start[len(sub) :] = out_start[0]
            em[len(sub) :] = em[0]
        return text_ids, cond, cond_lens, dur, out_start, em, seeds

    def synthesize_rows(self, rows: list["RowSpec"]) -> list[tuple[np.ndarray, np.ndarray]]:
        """Row-level batched synthesis: rows may carry *different* reference
        voices/durations (the cross-request continuous-batching primitive).
        Groups rows by (duration bucket, steps, cfg); one compiled call per
        group. Returns per-row (wave, gen mel).

        Rows with ``quality="strict"`` run through the estimating program;
        any whose embedded-error estimate exceeds
        ``cfg.strict_threshold`` are re-solved with the exact reference
        recipe (euler-32) in a second pass (per-request quality escalation —
        the sharp-field guard, BENCH.md round-4)."""
        cfg = self.cfg
        results: list[tuple[np.ndarray, np.ndarray] | None] = [None] * len(rows)
        escalate: list[int] = []
        can_estimate = self._supports_estimate()
        self.last_estimates = {}  # row index -> embedded-error estimate (observability/tests)

        groups: dict[tuple, list[int]] = {}
        for i, r in enumerate(rows):
            nb = _bucket(max(r.duration, r.ref_frames + 2), cfg.duration_buckets)
            groups.setdefault((nb, r.steps, r.cfg_strength), []).append(i)

        # Two phases (VERDICT round-3 item #8, long-form overlap): dispatch
        # group solves WITHOUT blocking, fetch in dispatch order — jax queues
        # the executions, so the host fetch + unpacking (and the caller's
        # crossfade/stitch via generators) of group i overlaps the device
        # solve of group i+1 instead of serializing with it. Through a remote
        # tunnel the fetch is ~100x a real host's PCIe cost (BENCH.md), which
        # made this serialization the dominant long-form residual.
        # In-flight depth is BOUNDED (ADVICE round-4): an unbounded pipeline
        # keeps every group's device outputs + pinned inputs live at once —
        # O(groups) peak HBM on a target documented at ~47% scheduler
        # fragmentation. Depth 3 preserves the overlap with O(1) extras.
        max_in_flight = cfg.fetch_pipeline_depth

        def _fetch(entry):
            nb, bb, sub, dur, out_start, want_est, out = entry
            with GLOBAL_TIMER.stage(f"sample_decode_n{nb}_b{bb}"):
                gen_mel = np.asarray(out[0], np.float32)
                wave = np.asarray(out[1], np.float32)
            est = np.asarray(out[2], np.float32) if want_est else None
            for row, i in enumerate(sub):
                gen_len = int(dur[row]) - int(out_start[row])
                results[i] = (wave[row, : self._wave_samples(gen_len)], gen_mel[row, :gen_len])
                if est is not None:
                    self.last_estimates[i] = float(est[row])
                    if rows[i].quality == "strict" and est[row] > cfg.strict_threshold:
                        escalate.append(i)

        dispatched: list[tuple] = []
        for (nb, steps, guidance), idxs in groups.items():
            cap = min(dict(cfg.solve_batch_caps).get(nb, cfg.batch_buckets[-1]), cfg.batch_buckets[-1])
            for start in range(0, len(idxs), cap):
                sub = idxs[start : start + cap]
                bb = _bucket(len(sub), cfg.batch_buckets)
                has_edit = any(rows[i].edit_mask is not None for i in sub)
                want_est = (can_estimate and not has_edit
                            and any(rows[i].quality == "strict" for i in sub))

                text_ids, cond, cond_lens, dur, out_start, em, seeds = \
                    self._pack_group(rows, sub, nb, bb)

                if has_edit:
                    # edit rows co-batch with synthesis rows: same solve, the
                    # synthesis rows just carry trivial (all-True) edit masks
                    fn = self._compiled_edit(nb, bb, steps, guidance)
                    args = (jnp.asarray(em), jnp.asarray(out_start), jnp.asarray(seeds))
                else:
                    fn = self._compiled(nb, bb, self.cfg.text_pad, steps, guidance,
                                        estimate=want_est)
                    args = (jnp.asarray(seeds),)
                out = fn(
                    self.dit_params, self.vocos_params,
                    jnp.asarray(cond), jnp.asarray(cond_lens), jnp.asarray(text_ids), jnp.asarray(dur),
                    *args,
                )
                dispatched.append((nb, bb, sub, dur, out_start, want_est, out))
                if len(dispatched) > max_in_flight:
                    _fetch(dispatched.pop(0))

        for entry in dispatched:
            _fetch(entry)

        # escalation pass: re-solve flagged rows with the exact reference
        # recipe (euler-32, same seeds -> same noise -> the recipe's output)
        if escalate:
            self.escalations += len(escalate)
            by_bucket: dict[tuple, list[int]] = {}
            for i in escalate:
                r = rows[i]
                nb = _bucket(max(r.duration, r.ref_frames + 2), cfg.duration_buckets)
                by_bucket.setdefault((nb, r.cfg_strength), []).append(i)
            for (nb, guidance), idxs in by_bucket.items():
                cap = min(dict(cfg.solve_batch_caps).get(nb, cfg.batch_buckets[-1]), cfg.batch_buckets[-1])
                for start in range(0, len(idxs), cap):
                    sub = idxs[start : start + cap]
                    bb = _bucket(len(sub), cfg.batch_buckets)
                    text_ids, cond, cond_lens, dur, out_start, em, seeds = \
                        self._pack_group(rows, sub, nb, bb)
                    fn = self._compiled(nb, bb, cfg.text_pad, 32, guidance, recipe=True)
                    with GLOBAL_TIMER.stage(f"escalate_n{nb}_b{bb}"):
                        gen_mel, wave = fn(
                            self.dit_params, self.vocos_params,
                            jnp.asarray(cond), jnp.asarray(cond_lens),
                            jnp.asarray(text_ids), jnp.asarray(dur), jnp.asarray(seeds))
                        jax.block_until_ready(wave)
                    gen_mel = np.asarray(gen_mel, np.float32)
                    wave = np.asarray(wave, np.float32)
                    for row, i in enumerate(sub):
                        gen_len = int(dur[row]) - int(out_start[row])
                        results[i] = (wave[row, : self._wave_samples(gen_len)], gen_mel[row, :gen_len])
        return results  # type: ignore[return-value]
