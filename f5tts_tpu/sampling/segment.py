"""Per-row-time ODE segment solver — the step-level continuous-batching
primitive (SURVEY hard-part #4: join/leave between ODE steps).

``sample_cfm`` integrates a whole trajectory in one device program, so a
request arriving 1 ms after a solve launches waits the FULL solve before its
own batch forms (the window batcher's head-of-line blocking,
``engine/batcher.py``). This module decomposes the solve into short segments
whose time knots are per-row DATA:

- every row in a batch carries its OWN (k+1)-knot sub-grid, so rows at
  different points of their trajectories — or with different total step
  counts / guidance strengths — share one compiled program;
- a slot whose row has finished (or is empty) passes degenerate knots
  (t0 == t1), making its update an exact no-op (``y += 0 * v``);
- the host regains control between segments, which is where the step batcher
  (``engine/step_batcher.py``) admits queued rows into free slots and
  finalizes completed ones.

The per-step math mirrors ``sample_cfm`` (``model/cfm.py:81-210`` semantics:
fused 2b CFG pair, step-invariant text embedding, masked conditioning) with
time broadcast per row instead of per batch; a row solved segment-by-segment
matches its monolithic solve to co-batching tolerance (test-pinned).

Guidance-interval engines (``cfg_interval``) are supported: the monolithic
path partitions knots host-side into guided/unguided runs (gated on each
step's START knot, ``lo <= t0 < hi``), which here becomes per-row DATA — the
step scales its row's strength by the gate, and ``pred + (pred-null)*0`` is
exactly the cond branch, so the math matches ``sample_cfm`` bit-for-bit in
f32 (the unguided evals do pay the fused 2b forward; compute-SKIPPING knobs
are where the restriction remains: ``cfg_cache_period``/``cfg_null_reuse``
hold a null velocity across steps, which cannot ride a mixed-progress batch,
so those engines stay on the window path).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from f5tts_tpu.models.dit import DiTConfig, dit_embed, dit_forward
from f5tts_tpu.ops.masks import lens_to_mask
from f5tts_tpu.sampling.euler import SamplerConfig, default_time_grid


def resolved_time_grid(sampler: SamplerConfig, steps: int) -> np.ndarray:
    """Host-side (numpy) knot grid for a request at ``steps`` intervals under
    the engine's configured sampler — the same resolution
    ``TTSEngine._request_sampler`` + ``sample_cfm`` perform on the window
    path: the configured explicit grid at its own step count, else the
    framework's per-(method, steps) recipe grid, else the sway warp."""
    if sampler.time_grid is not None and steps == sampler.steps:
        return np.asarray(sampler.time_grid, np.float64)
    grid = default_time_grid(sampler.method, steps)
    if grid is not None:
        return np.asarray(grid, np.float64)
    t = np.linspace(0.0, 1.0, steps + 1)
    if sampler.sway_sampling_coef is not None:
        t = t + sampler.sway_sampling_coef * (np.cos(np.pi / 2 * t) - 1 + t)
    return t


def row_masks(cond, cond_lens, text, duration, edit_mask=None):
    """The mask/conditioning derivation shared by every program of the
    segmented solve (must match ``sample_cfm`` exactly: segment, admission
    and finalize all recompute it from the same inputs)."""
    b, n, _ = cond.shape
    text_lens = jnp.sum(text != -1, axis=-1)
    lens = jnp.maximum(text_lens, cond_lens)
    cond_mask = lens_to_mask(lens, n)
    if edit_mask is not None:
        cond_mask = cond_mask & edit_mask
    duration = jnp.clip(jnp.maximum(lens + 1, duration), max=n)
    attn_mask = lens_to_mask(duration, n)
    return cond_mask, attn_mask, duration


def solve_segment(
    params,
    model_cfg: DiTConfig,
    *,
    cond: jnp.ndarray,  # (b, n, mel) padded cond mel
    cond_lens: jnp.ndarray,  # (b,)
    text: jnp.ndarray,  # (b, nt) int ids, pad -1
    duration: jnp.ndarray,  # (b,) total frames incl. cond
    y: jnp.ndarray,  # (b, n, mel) raw trajectory state (noise at knot 0)
    t0s: jnp.ndarray,  # (k, b) interval starts, per row
    t1s: jnp.ndarray,  # (k, b) interval ends, per row
    cfg_strength: jnp.ndarray,  # (b,) per-row guidance strength
    cfg_interval: tuple[float, float] = (0.0, 1.0),  # static (lo, hi) gate
    method: str = "ralston",
    edit_mask: jnp.ndarray | None = None,
    compute_dtype=jnp.float32,
    forward_fn=dit_forward,
    embed_fn=dit_embed,
) -> jnp.ndarray:
    """Advance each row k intervals along its own knots; returns the raw
    trajectory state (no paste-back — that's ``finalize_rows``)."""
    b, n, _ = cond.shape
    cond_mask, attn_mask, _ = row_masks(cond, cond_lens, text, duration, edit_mask)
    cond = cond.astype(compute_dtype)
    step_cond = jnp.where(cond_mask[..., None], cond, 0.0)
    y = y.astype(compute_dtype)

    f = jnp.zeros((b,), dtype=bool)
    text2 = jnp.concatenate([text, text], axis=0)
    drop2 = jnp.concatenate([f, ~f], axis=0)
    mask2 = jnp.concatenate([attn_mask, attn_mask], axis=0)
    text_emb2 = embed_fn(params, model_cfg, text2, n, drop2, mask2)
    cond2 = jnp.concatenate([step_cond, step_cond], axis=0)
    s = cfg_strength[:, None, None].astype(compute_dtype)

    lo, hi = cfg_interval
    if (lo, hi) == (0.0, 1.0):

        def gated_s(t0):  # full-interval: every step guided (no gate math)
            return s

    else:
        # the monolithic path guides a step iff its START knot satisfies
        # lo <= t0 < hi (euler.py sample_cfm's host-side partition); here t0
        # is per-row data, so the gate is computed per (step, row) and scales
        # the strength — an ungated row's combine degenerates to the cond
        # branch exactly
        def gated_s(t0):
            g = ((t0 >= lo) & (t0 < hi)).astype(compute_dtype)[:, None, None]
            return s * g

    def velocity(t_rows, x, sg):  # t_rows (b,) f32; sg (b,1,1) step strength
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t_rows, t_rows], axis=0).astype(compute_dtype)
        out = forward_fn(
            params, model_cfg, x2, cond2, None, t2, drop2, drop2, mask2,
            text_emb=text_emb2, compute_dtype=compute_dtype,
        )
        pred, null = out[:b], out[b:]
        return pred + (pred - null) * sg

    def dt_of(t0, t1):
        return (t1 - t0).astype(compute_dtype)[:, None, None]

    if method == "euler":

        def step(y, ts):
            t0, t1 = ts
            y = y + dt_of(t0, t1) * velocity(t0, y, gated_s(t0))
            return y, None

    elif method == "midpoint":

        def step(y, ts):
            t0, t1 = ts
            dt = dt_of(t0, t1)
            sg = gated_s(t0)
            k1 = velocity(t0, y, sg)
            y_mid = y + 0.5 * dt * k1
            y = y + dt * velocity(t0 + 0.5 * (t1 - t0), y_mid, sg)
            return y, None

    elif method == "heun":

        def step(y, ts):
            t0, t1 = ts
            dt = dt_of(t0, t1)
            sg = gated_s(t0)
            k1 = velocity(t0, y, sg)
            k2 = velocity(t1, y + dt * k1, sg)
            y = y + dt * 0.5 * (k1 + k2)
            return y, None

    elif method == "ralston":

        def step(y, ts):
            t0, t1 = ts
            dt = dt_of(t0, t1)
            sg = gated_s(t0)
            k1 = velocity(t0, y, sg)
            k2 = velocity(t0 + (2.0 / 3.0) * (t1 - t0), y + (2.0 / 3.0) * dt * k1, sg)
            y = y + dt * (0.25 * k1 + 0.75 * k2)
            return y, None

    elif method == "rk4":

        def step(y, ts):
            t0, t1 = ts
            dt = dt_of(t0, t1)
            sg = gated_s(t0)
            k1 = velocity(t0, y, sg)
            k2 = velocity(t0 + 0.5 * (t1 - t0), y + 0.5 * dt * k1, sg)
            k3 = velocity(t0 + 0.5 * (t1 - t0), y + 0.5 * dt * k2, sg)
            k4 = velocity(t1, y + dt * k3, sg)
            y = y + dt / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
            return y, None

    else:
        raise ValueError(f"unknown ODE method {method!r}")

    y, _ = lax.scan(step, y, (t0s, t1s))
    return y


def finalize_rows(
    decode_fn,
    vocos_params,
    *,
    cond: jnp.ndarray,
    cond_lens: jnp.ndarray,
    text: jnp.ndarray,
    duration: jnp.ndarray,
    y: jnp.ndarray,
    out_start: jnp.ndarray,  # (b,) cond_lens for synthesis rows, 0 for edit rows
    edit_mask: jnp.ndarray | None = None,
    compute_dtype=jnp.float32,
):
    """Paste cond frames back over the trajectory end (``cfm.py:204``), roll
    generated frames to the origin and vocode — the tail of the engine's
    monolithic program (``TTSEngine._compiled``), as its own program so it
    runs once per completed row batch."""
    b, n, _ = cond.shape
    cond_mask, _, _ = row_masks(cond, cond_lens, text, duration, edit_mask)
    mel_out = jnp.where(cond_mask[..., None], cond.astype(compute_dtype), y.astype(compute_dtype))
    idx = (jnp.arange(n)[None, :] + out_start[:, None]) % n
    gen = jnp.take_along_axis(mel_out, idx[..., None], axis=1)
    gen_len = duration - out_start
    gen = jnp.where(jnp.arange(n)[None, :, None] < gen_len[:, None, None], gen, 0.0)
    wave = decode_fn(vocos_params, gen)
    return gen.astype(jnp.float32), wave
