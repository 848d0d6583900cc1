"""Step distillation: compress the guided ODE solve into a few-step student.

The serving cost of F5-TTS is ``NFE x 2`` transformer forwards (the CFG pair
on every eval — ``/root/reference/src/server/f5_tts/model/cfm.py:167-176``);
the reference recipe spends 64. Round-2/3 work took the integrator to the
hardware's accuracy/cost frontier (BENCH.md): the certified Ralston default
needs 40, and on sharp fields nothing at <= recipe cost certifies. The only
remaining per-request lever is changing the MODEL, not the integrator — train
a student whose *velocity field already includes guidance* and whose few-step
Euler rollout reproduces the teacher's fine guided solve.

Method (trajectory distillation with rollout-state targets):

- Teacher: the frozen base weights. Its guided velocity is
  ``v_g(t, y) = cond + s * (cond - null)`` — the exact field the serving
  sampler integrates (``sampling/euler.py``).
- Student: same architecture, initialized from the teacher weights, run with
  both branches conditioned (no drop flags) — ONE forward per eval. The
  student's Euler step on a K-knot grid is trained to match the teacher's
  fine integration of each interval.
- Targets from ROLLOUT states, not teacher-forcing: each training step rolls
  the student (stop-grad) through its own K-step trajectory from fresh noise,
  and at every visited state ``y_k`` regresses the student velocity against
  ``(T_m(y_k, t_k -> t_{k+1}) - y_k) / dt`` where ``T_m`` is an m-substep
  guided teacher solve of that interval. Training on the states the student
  actually visits removes the exposure-bias gap that teacher-forcing leaves
  at K as small as 4-8.

Everything is one jitted step: rollout (lax.scan over knots), per-knot
teacher fine solves (scan over substeps), and a single batched student
forward over all K knots (knots folded into the batch axis -> one big MXU
matmul instead of K small ones).

Cost per training step at batch b: K student rollout forwards (b rows)
+ 2*K*m fused teacher forwards (2b rows; ralston = 2 evals/substep)
+ 1 student grad forward (K*b rows).

This extends the training capability surface of the reference trainer
(``/root/reference/src/server/f5_tts/model/trainer.py:24-380``); the
distilled student serves through the same engine with
``SamplerConfig(method='euler', steps=K, cfg_strength=0, time_grid=...)`` —
see ``student_sampler``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from f5tts_tpu.models.dit import DiTConfig, dit_embed, dit_forward
from f5tts_tpu.ops.masks import lens_to_mask
from f5tts_tpu.sampling.euler import SamplerConfig, sample_noise_from_seeds, sway_time_grid


@dataclass(frozen=True)
class DistillConfig:
    student_steps: int = 8          # K: Euler intervals the student serves at
    substeps: int = 4               # m: teacher RALSTON sub-steps per student interval
    cfg_strength: float = 2.0       # guidance baked into the student
    sway_sampling_coef: float | None = -1.0  # student knot grid warp
    learning_rate: float = 1e-4
    lr_decay_steps: int | None = None  # cosine decay to lr/100 over this many steps
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    seed: int = 0
    # Progressive distillation (64->32->16->8 ladder, VERDICT r4 item #2):
    # when the teacher is itself a distilled student (guidance already baked
    # in), its velocity is ONE forward with no drop flags — set this and the
    # interval targets come from single-branch teacher substeps.
    teacher_single_branch: bool = False
    # Per-knot loss weighting: "none" = uniform MSE over all K knots;
    # "adaptive" = normalize each knot's contribution by its own (stop-grad)
    # error scale — sharp fields concentrate difficulty at few knots, and
    # uniform weighting lets the easy knots dominate the gradient.
    knot_weighting: str = "none"
    # Knots per gradient chunk for the K-fold loss forward (0 = all K at
    # once). The fused forward differentiates K*b rows at serving geometry;
    # K=32 x b=2 at base = 64 grad rows, which exhausts HBM at compile.
    # Chunking scans value_and_grad over K/loss_chunk chunks and SUMS the
    # grads — mathematically identical for knot_weighting="none" (the loss
    # is a flat sum with a global denominator); for "adaptive" the scale
    # normalization becomes chunk-local (mean over the chunk's knots instead
    # of all K). Must divide student_steps.
    loss_chunk: int = 0

    @property
    def time_grid(self) -> tuple[float, ...]:
        g = np.linspace(0.0, 1.0, self.student_steps + 1)
        if self.sway_sampling_coef is not None:
            g = g + self.sway_sampling_coef * (np.cos(np.pi / 2 * g) - 1 + g)
        g[0], g[-1] = 0.0, 1.0  # exact endpoints (float cos() dust breaks validation)
        return tuple(float(v) for v in g)


def student_sampler(cfg: DistillConfig) -> SamplerConfig:
    """SamplerConfig that serves a distilled student: plain Euler on the
    student's knot grid with guidance OFF (it is baked into the weights).
    NFE = student_steps forwards TOTAL (no CFG pair)."""
    return SamplerConfig(
        steps=cfg.student_steps, cfg_strength=0.0,
        sway_sampling_coef=None, method="euler", time_grid=cfg.time_grid,
    )


def deepen_student(teacher_params, model_cfg: DiTConfig, factor: int = 2):
    """Capacity-sweep student init (VERDICT r4 item #2): interleave ``factor-1``
    IDENTITY copies after each teacher block. The copies start exactly as
    identity — their adaLN-zero modulation projection is zeroed, so every
    gate is 0 and the block passes x through — which preserves the teacher's
    function at init while giving the student ``factor``x depth to absorb the
    fused cond+null map. Returns ``(params, deeper_cfg)``."""
    from dataclasses import replace

    depth = model_cfg.depth
    params = {k: v for k, v in teacher_params.items()}
    blocks = jax.tree.map(lambda x: jnp.repeat(x, factor, axis=0), params["blocks"])
    # positions i with i % factor != 0 are the inserted copies
    new_copy = (np.arange(depth * factor) % factor) != 0

    def zero_new(x):
        m_ = jnp.asarray(~new_copy, x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        return x * m_

    blocks["attn_norm"]["linear"] = jax.tree.map(zero_new, blocks["attn_norm"]["linear"])
    params["blocks"] = blocks
    return params, replace(model_cfg, depth=depth * factor)


def make_distill_step(model_cfg: DiTConfig, cfg: DistillConfig,
                      compute_dtype=jnp.float32):
    """Returns ``(optimizer, step)`` where
    ``step(student_params, opt_state, teacher_params, batch) ->
    (student_params, opt_state, metrics)`` is pure and jit-able.

    batch = dict(cond (b,n,mel), cond_lens (b,), text (b,nt), duration (b,),
    seeds (b,)) — the same serving-shaped prompts ``sample_cfm`` takes.
    """
    if cfg.lr_decay_steps:
        lr = optax.cosine_decay_schedule(cfg.learning_rate, cfg.lr_decay_steps,
                                         alpha=0.01)
    else:
        lr = cfg.learning_rate
    optimizer = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(lr, weight_decay=cfg.weight_decay),
    )
    s = cfg.cfg_strength
    K = cfg.student_steps
    m = cfg.substeps
    knots = jnp.asarray(cfg.time_grid, jnp.float32)

    def step(student_params, opt_state, teacher_params, batch):
        # knots in compute dtype: an f32 dt would upcast the bf16 rollout
        # carry and break the scan's carry-type invariance
        knots_c = knots.astype(compute_dtype)
        cond, cond_lens, text = batch["cond"], batch["cond_lens"], batch["text"]
        duration, seeds = batch["duration"], batch["seeds"]
        b, n, mel_dim = cond.shape

        text_lens = jnp.sum(text != -1, axis=-1)
        lens = jnp.maximum(text_lens, cond_lens)
        cond_mask = lens_to_mask(lens, n)
        duration = jnp.clip(jnp.maximum(lens + 1, duration), max=n)
        attn_mask = lens_to_mask(duration, n)
        step_cond = jnp.where(cond_mask[..., None], cond.astype(compute_dtype), 0.0)
        gen_mask = (attn_mask & ~cond_mask)[..., None]

        f = jnp.zeros((b,), bool)

        if cfg.teacher_single_branch:
            # the teacher is a distilled student: guidance is in its weights,
            # one conditioned forward per eval (progressive-stage teacher)
            t_emb1 = dit_embed(teacher_params, model_cfg, text, n, f, attn_mask)

            def teacher_vel(t_scalar, y):
                return dit_forward(
                    teacher_params, model_cfg, y, step_cond, None,
                    jnp.broadcast_to(t_scalar, (b,)).astype(compute_dtype),
                    f, f, attn_mask, text_emb=t_emb1,
                    compute_dtype=compute_dtype)
        else:
            # teacher guided velocity: one fused 2b forward (cond; null)
            text2 = jnp.concatenate([text, text], axis=0)
            drop_text2 = jnp.concatenate([f, ~f], axis=0)
            mask2 = jnp.concatenate([attn_mask, attn_mask], axis=0)
            t_emb2 = dit_embed(teacher_params, model_cfg, text2, n, drop_text2, mask2)
            cond2 = jnp.concatenate([step_cond, step_cond], axis=0)
            drop_audio2 = drop_text2

            def teacher_vel(t_scalar, y):
                y2 = jnp.concatenate([y, y], axis=0)
                out = dit_forward(
                    teacher_params, model_cfg, y2, cond2, None,
                    jnp.broadcast_to(t_scalar, (2 * b,)).astype(compute_dtype),
                    drop_audio2, drop_text2, mask2, text_emb=t_emb2,
                    compute_dtype=compute_dtype)
                pred, null = out[:b], out[b:]
                return pred + (pred - null) * s

        # student text embedding: depends only on (params, text) — compute it
        # ONCE per training step at batch b and tile across the rollout scan
        # and the K-fold loss forward (the module's own sampler lifts this out
        # of the ODE loop for exactly this reason). Gradients flow through the
        # loss_fn copy; the rollout uses the stop-grad params' embedding.
        def student_emb(params):
            return dit_embed(params, model_cfg, text, n,
                             jnp.zeros((b,), bool), attn_mask)

        # student velocity (single branch, guidance baked in)
        def student_vel(params, emb_b, t_vec, y, rep: int):
            emb = jnp.tile(emb_b, (rep, 1, 1)) if rep > 1 else emb_b
            return dit_forward(
                params, model_cfg, y, jnp.tile(step_cond, (rep, 1, 1)), None,
                t_vec.astype(compute_dtype),
                jnp.zeros((rep * b,), bool), jnp.zeros((rep * b,), bool),
                jnp.tile(attn_mask, (rep, 1)), emb, compute_dtype=compute_dtype)

        y0 = sample_noise_from_seeds(seeds, n, mel_dim, duration, compute_dtype)

        # 1) student rollout (stop-grad): states y_k at every knot
        sg = jax.lax.stop_gradient

        emb_sg = student_emb(sg(student_params))

        def roll(y, ts):
            t0, t1 = ts
            v = student_vel(sg(student_params), emb_sg,
                            jnp.broadcast_to(t0, (b,)), y, 1)
            return y + (t1 - t0) * v, y

        _, states = lax.scan(roll, y0, (knots_c[:-1], knots_c[1:]))  # (K, b, n, mel)
        states = sg(states)

        # 2) teacher fine solve of each interval from the rollout state —
        # RALSTON substeps (2nd order): at equal teacher forwards the target
        # is far closer to the true guided solution than euler substeps, and
        # the certification bar is error-to-TRUTH, not error-to-recipe
        def interval_target(y_k, t0, t1):
            sub = t0 + (t1 - t0) * jnp.linspace(0.0, 1.0, m + 1, dtype=compute_dtype)

            def fine(y, ts):
                a, c = ts
                dt_ = c - a
                k1 = teacher_vel(a, y)
                k2 = teacher_vel(a + (2.0 / 3.0) * dt_, y + (2.0 / 3.0) * dt_ * k1)
                return y + dt_ * (0.25 * k1 + 0.75 * k2), None

            y_end, _ = lax.scan(fine, y_k, (sub[:-1], sub[1:]))
            return (y_end - y_k) / (t1 - t0)

        _, targets = lax.scan(
            lambda _, xs: (None, interval_target(*xs)),
            None, (states, knots_c[:-1], knots_c[1:]))
        targets = sg(targets)  # (K, b, n, mel)

        # 3) batched student forward over the K knots (K*b rows), optionally
        # split into loss_chunk-knot gradient chunks (HBM: the differentiated
        # forward is the peak — K=32 x b=2 at base geometry does not compile
        # in one piece)
        kc = cfg.loss_chunk or K
        if K % kc != 0:
            raise ValueError(f"loss_chunk {kc} must divide student_steps {K}")
        # global denominator: sum over ALL K knots' masks — keeps the chunked
        # sum identical to the single-shot loss
        denom = jnp.maximum(K * jnp.sum(gen_mask.astype(jnp.float32)) * mel_dim, 1.0)

        def chunk_loss(params, st, tg, kn):
            t_vec = jnp.repeat(kn, b)                        # (kc*b,)
            y_flat = st.reshape(kc * b, n, mel_dim)
            pred = student_vel(params, student_emb(params), t_vec, y_flat, kc)
            err = (pred.astype(jnp.float32)
                   - tg.reshape(kc * b, n, mel_dim).astype(jnp.float32))
            w = jnp.tile(gen_mask.astype(jnp.float32), (kc, 1, 1))
            sq = jnp.square(err) * w
            if cfg.knot_weighting == "adaptive":
                # equalize per-knot gradient scale: each knot's MSE is
                # normalized by its own (stop-grad) magnitude, so the few
                # hard knots of a sharp field aren't drowned by the easy ones
                # (normalized over this chunk's knots; chunk-local when
                # loss_chunk < K)
                per_knot = (jnp.sum(sq.reshape(kc, b, n, mel_dim), axis=(1, 2, 3))
                            / jnp.maximum(jnp.sum(w) / kc * mel_dim, 1.0))  # (kc,)
                scale = sg(1.0 / jnp.maximum(per_knot, 1e-8))
                scale = scale / jnp.mean(scale)
                sq = sq.reshape(kc, b, n, mel_dim) * scale[:, None, None, None]
            return jnp.sum(sq) / denom

        if kc == K:
            loss, grads = jax.value_and_grad(chunk_loss)(
                student_params, states, targets, knots_c[:-1])
        else:
            nch = K // kc
            st_c = states.reshape(nch, kc, b, n, mel_dim)
            tg_c = targets.reshape(nch, kc, b, n, mel_dim)
            kn_c = knots_c[:-1].reshape(nch, kc)

            def acc(carry, xs):
                al, ag = carry
                l, g = jax.value_and_grad(chunk_loss)(student_params, *xs)
                return (al + l, jax.tree.map(jnp.add, ag, g)), None

            (loss, grads), _ = lax.scan(
                acc, (jnp.zeros((), jnp.float32),
                      jax.tree.map(jnp.zeros_like, student_params)),
                (st_c, tg_c, kn_c))
        updates, opt_state = optimizer.update(grads, opt_state, student_params)
        student_params = optax.apply_updates(student_params, updates)
        return student_params, opt_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return optimizer, step


def distill(teacher_params, model_cfg: DiTConfig, cfg: DistillConfig,
            prompt_fn, steps: int, compute_dtype=jnp.float32, log_every: int = 25,
            logger=print):
    """Run distillation: ``prompt_fn(rng) -> batch dict`` supplies serving-shaped
    prompts (cond/cond_lens/text/duration/seeds as numpy). Returns student params."""
    optimizer, step = make_distill_step(model_cfg, cfg, compute_dtype)
    # init = teacher, with COPIED buffers: the jitted step donates the student
    # pytree, and donating aliases of the teacher's (also-passed) arrays is an
    # XLA error (`f(donate(a), a)`)
    student = jax.tree.map(jnp.copy, teacher_params)
    opt_state = optimizer.init(student)
    jstep = jax.jit(step, donate_argnums=(0, 1))
    rng = np.random.default_rng(cfg.seed)
    for i in range(steps):
        batch = {k: jnp.asarray(v) for k, v in prompt_fn(rng).items()}
        student, opt_state, metrics = jstep(student, opt_state, teacher_params, batch)
        if logger and (i % log_every == 0 or i == steps - 1):
            logger(f"  distill step {i}: loss {float(metrics['loss']):.5f} "
                   f"gnorm {float(metrics['grad_norm']):.3f}")
    return student
