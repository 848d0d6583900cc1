"""Flow-matching ODE sampler: `lax.scan` Euler over a sway-warped grid with
fused classifier-free guidance.

Functional contract of ``CFM.sample`` (``model/cfm.py:81-210``), re-designed
for XLA:

- static shapes: the caller supplies mel padded to a bucket length ``n``;
  per-row conditioning/duration handled with masks (the reference resizes to
  ``duration.amax()`` eagerly).
- time grid: ``t = linspace(0, 1, steps+1)`` then sway warp
  ``t + s*(cos(pi/2 t) - 1 + t)`` (``cfm.py:196-198``).
- Euler: ``y_{k+1} = y_k + (t_{k+1} - t_k) * f(t_k, y_k)`` — exactly what
  ``torchdiffeq.odeint(method='euler')`` does on an explicit grid.
- CFG: the cond and null branches are evaluated as ONE batched forward of size
  ``2b`` (per-sample drop flags), instead of the reference's two sequential
  transformer calls per step (``cfm.py:167-176``) — twice the MXU batch, half
  the kernel launches.
- the step-invariant text embedding (char conv stack) is computed once outside
  the scan; the reference recomputes it inside every one of the 64 forwards.
- conditioning frames are pasted back over the trajectory end
  (``cfm.py:204``), preserving speech-edit/infill semantics via ``edit_mask``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from f5tts_tpu.models.dit import DiTConfig, dit_embed, dit_forward
from f5tts_tpu.ops.masks import lens_to_mask


@dataclass(frozen=True)
class SamplerConfig:
    steps: int = 32
    cfg_strength: float = 2.0
    sway_sampling_coef: float | None = -1.0
    method: str = "euler"  # "euler" | "midpoint" | "heun" | "ralston" | "rk4"
    # Within-step null reuse for multi-eval (RK) integrators: the step's first
    # velocity eval runs the fused cond+null pair; the remaining evals of the
    # SAME step run the b-row cond branch and reuse that null (staleness span
    # ≤ one interval — tighter than cfg_cache_period's k-step hold). Guidance
    # stays active on every eval. midpoint: 4 → 3 forwards per interval.
    cfg_null_reuse: bool = False
    # Explicit ODE time knots overriding steps/sway (training-free step
    # pruning a la EPSS, arXiv:2505.19931): monotone, from 0.0 to 1.0.
    time_grid: tuple[float, ...] | None = None
    # Guidance interval (Kynkäänniemi et al. 2024, arXiv:2404.07724): apply
    # CFG only on steps whose t0 falls in [lo, hi); elsewhere run the plain
    # cond branch at batch b instead of the fused 2b pair. (0, 1) = always
    # (the reference's behavior, ``cfm.py:167-176``). Training-free compute
    # saving: each skipped step costs one DiT forward instead of two.
    cfg_interval: tuple[float, float] = (0.0, 1.0)
    # Guidance caching (DiTReducio/FasterCache family, arXiv:2509.09748):
    # recompute the null branch only every k-th step and reuse the cached
    # null velocity in between — guidance stays active on EVERY step (unlike
    # cfg_interval), but null forwards drop to ceil(steps/k). 1 = off.
    # Euler only; mutually exclusive with cfg_interval.
    cfg_cache_period: int = 1
    # "hold": reuse the last null velocity as-is. "extrapolate": first-order
    # extrapolation from the last TWO refreshes, null(t) ≈ null(t_k) +
    # (t−t_k)/(t_k−t_{k−1})·(null(t_k)−null(t_{k−1})) — the coefficients are
    # static functions of the knot grid, so this costs two cached buffers and
    # a fused multiply-add, no extra forwards. Measured (BENCH.md) it cuts the
    # hold-cache's deviation from the full recipe by ~an order of magnitude.
    cfg_cache_mode: str = "hold"

    def __post_init__(self):
        # fail at config construction, not at first-request trace time
        if len(tuple(self.cfg_interval)) != 2:
            raise ValueError(f"cfg_interval must be (lo, hi), got {self.cfg_interval!r}")
        if self.cfg_cache_period < 1:
            raise ValueError("cfg_cache_period must be >= 1")
        if self.cfg_cache_mode not in ("hold", "extrapolate"):
            raise ValueError(f"cfg_cache_mode must be 'hold' or 'extrapolate', got {self.cfg_cache_mode!r}")
        if self.cfg_cache_period > 1:
            if self.method != "euler":
                raise ValueError("cfg_cache_period requires method='euler'")
            if tuple(self.cfg_interval) != (0.0, 1.0):
                raise ValueError("cfg_cache_period and cfg_interval are mutually exclusive")
        if self.method not in ("euler", "midpoint", "heun", "ralston", "rk4"):
            raise ValueError(f"unknown ODE method {self.method!r}")
        if self.cfg_null_reuse:
            if self.method == "euler":
                raise ValueError("cfg_null_reuse only applies to multi-eval methods")
            if tuple(self.cfg_interval) != (0.0, 1.0) or self.cfg_cache_period > 1:
                raise ValueError("cfg_null_reuse is mutually exclusive with cfg_interval/cfg_cache_period")


# model evaluations per ODE interval (per guidance branch)
EVALS_PER_STEP = {"euler": 1, "midpoint": 2, "heun": 2, "ralston": 2, "rk4": 4}

# user-facing NFE defaults per method, counting per-branch model evals (the
# reference's nfe_step knob, utils_infer.py:49): euler 32 = the reference
# recipe; the 2nd-order default is the certified serving recipe (20 evals =
# ralston 10 intervals — BENCH.md round-2 certification, re-confirmed at base
# geometry in round 3; the round-3 hard-field investigation kept NFE 20, see
# serving_default_sampler)
DEFAULT_NFE = {"euler": 32, "midpoint": 20, "heun": 20, "ralston": 20, "rk4": 20}


def nfe_to_steps(nfe: int, method: str) -> int:
    """User-facing nfe_step counts MODEL EVALS per guidance branch (the
    reference's knob); convert to ODE intervals for the configured integrator
    (midpoint/heun/ralston cost 2 evals per interval, rk4 costs 4) so
    ``nfe_step=32`` is the same compute at any method."""
    return max(nfe // EVALS_PER_STEP[method], 1)


# Optimized ralston knot grids (round 3). Tiny-geometry grids
# (scripts/optimize_time_grid.py, TIME_GRID_SEARCH.json) did NOT transfer to
# base geometry — knot placement is geometry-sensitive (QUALITY_BASE_OPTGRID:
# 1.27x/1.11x) — so the shipping grid was searched directly at BASE geometry
# on chip (scripts/optimize_time_grid_base.py, dynamic-knot solving,
# TIME_GRID_BASE.json) and then certified on held-out fields the search never
# saw (BENCH.md round-3 certification):
#   base search field (toy-train 400):  0.79x recipe error
#   base HOLDOUT field (toy-train 800): 0.99x   <- certifies, thin margin
#   tiny fields 500/1000/2000:          0.58 / 0.69 / 0.63x
# at 32 forwards = 50% of the reference recipe's compute.
OPT_GRID_BASE_RALSTON8 = (0.0, 0.153893, 0.287175, 0.475823, 0.516263,
                          0.661497, 0.745711, 0.918548, 1.0)
# runner-up (NFE 20): never beat the plain sway-10 grid on holdouts (0.83 vs
# 0.79) — kept for the record only, not wired anywhere.
OPT_GRID_BASE_RALSTON10 = (0.0, 0.007097, 0.061681, 0.108993, 0.21397,
                           0.317674, 0.412215, 0.54601, 0.690983, 0.843566, 1.0)

# the framework's recipe grid per (method, intervals): ralston@8 uses the
# base-geometry-optimized knots; everything else integrates the sway grid
DEFAULT_TIME_GRIDS: dict[tuple[str, int], tuple[float, ...]] = {
    ("ralston", 8): OPT_GRID_BASE_RALSTON8,
}


def default_time_grid(method: str, steps: int) -> tuple[float, ...] | None:
    return DEFAULT_TIME_GRIDS.get((method, steps))


def serving_default_sampler(**overrides) -> SamplerConfig:
    """The certified serving default: Ralston RK2 at 10 intervals on the sway
    grid (NFE 40 total across both guidance branches — 40/64 the reference
    recipe's forwards), CFG 2.0 / sway −1.0. Certification (BENCH.md):
    0.48-0.69x the Euler-32 recipe's own solver error on the tiny 3-field
    standard, 0.90x / 0.79x on two base-geometry chip fields.

    Round-3 finding that kept this at NFE 20: on a SHARP base-geometry field
    (1500-step toy-train, loss 0.28) no sub-recipe-cost config certifies —
    this default measures 1.50x there, the NFE-16 optimized grid 1.84x, and
    multi-field-searched grids bottom out at 1.08x (artifacts
    QUALITY_BASE_HOLDOUT2.json, TIME_GRID_BASE_MULTI.json). The NFE-16
    fast mode (``steps=8`` — auto-resolves the base-optimized knot grid,
    certified 0.58-0.99x on five standard fields) and the exact reference
    recipe (method='euler', steps=32) are each one knob away."""
    kw = dict(method="ralston", steps=10)
    kw.update(overrides)
    if kw.get("time_grid") is None:
        kw["time_grid"] = default_time_grid(kw["method"], kw["steps"])
    elif len(kw["time_grid"]) != kw["steps"] + 1:
        # an explicit grid that doesn't match the step count is a caller bug —
        # silently swapping in the framework default would mask it
        raise ValueError(
            f"time_grid has {len(kw['time_grid'])} knots but steps={kw['steps']} "
            f"needs {kw['steps'] + 1}; pass time_grid=None to use the framework default"
        )
    return SamplerConfig(**kw)


def parse_cfg_interval(s: str) -> tuple[float, float]:
    """'lo,hi' -> (lo, hi) with a clear error (shared by CLI/bench/server)."""
    parts = [float(v) for v in s.split(",") if v.strip() != ""]
    if len(parts) != 2:
        raise ValueError(f"guidance interval must be 'lo,hi', got {s!r}")
    return (parts[0], parts[1])


def sway_time_grid(steps: int, coef: float | None, t_start: float = 0.0, dtype=jnp.float32) -> jnp.ndarray:
    t = jnp.linspace(t_start, 1.0, steps + 1, dtype=dtype)
    if coef is not None:
        t = t + coef * (jnp.cos(jnp.pi / 2 * t) - 1 + t)
    return t


def sample_noise(key: jax.Array, batch: int, n: int, mel_dim: int, duration: jnp.ndarray, dtype=jnp.float32):
    """Per-sample noise, zeroed past each row's duration.

    Batch-size invariance (the reference's per-sample ``torch.manual_seed``
    trick, ``cfm.py:181-186``) comes from folding the row index into the key,
    so the same request yields the same noise at any batch position.
    """
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(batch))
    y0 = jax.vmap(lambda k: jax.random.normal(k, (n, mel_dim), dtype))(keys)
    return jnp.where(lens_to_mask(duration, n)[..., None], y0, 0.0)


def sample_noise_from_seeds(seeds: jnp.ndarray, n: int, mel_dim: int, duration: jnp.ndarray, dtype=jnp.float32):
    """Per-row noise from independent integer seeds — batch-position invariant
    across arbitrary request mixes (continuous batching)."""
    y0 = jax.vmap(lambda s: jax.random.normal(jax.random.PRNGKey(s), (n, mel_dim), dtype))(seeds)
    return jnp.where(lens_to_mask(duration, n)[..., None], y0, 0.0)


def sample_cfm(
    params,
    model_cfg: DiTConfig,
    *,
    cond: jnp.ndarray,  # (b, n, mel) padded cond mel
    cond_lens: jnp.ndarray,  # (b,) valid cond frames (ref audio length)
    text: jnp.ndarray,  # (b, nt) int ids, pad -1
    duration: jnp.ndarray,  # (b,) total frames incl. cond
    sampler: SamplerConfig = SamplerConfig(),
    y0: jnp.ndarray | None = None,  # explicit noise (parity tests); else from key/seeds
    key: jax.Array | None = None,
    seeds: jnp.ndarray | None = None,  # (b,) int32 per-row noise seeds
    edit_mask: jnp.ndarray | None = None,  # (b, n) bool; False = regenerate
    no_ref_audio: bool = False,
    compute_dtype=jnp.float32,
    forward_fn=dit_forward,
    embed_fn=dit_embed,
    knot_range: tuple[int, int] | None = None,
    paste_back: bool = True,
    time_grid_array: jnp.ndarray | None = None,
    return_error_estimate: bool = False,
) -> jnp.ndarray:
    """Returns the sampled mel ``(b, n, mel)`` (cond frames pasted back).

    ``knot_range=(a, b)`` integrates only knots ``t_grid[a..b]`` starting from
    ``y0`` (= the previous segment's raw output), and ``paste_back=False``
    returns the raw trajectory state instead of pasting cond frames — together
    they let a very fine solve (e.g. a 512-step quality-truth run) execute as
    several shorter device programs with host fetches in between (single
    executions beyond a few minutes can crash the remote TPU worker).

    ``return_error_estimate=True`` (2-stage methods, plain guidance only)
    additionally returns a per-row scalar ``(b,)``: the RMSE over generated
    frames of the accumulated EMBEDDED error — the signed sum of each step's
    RK2-vs-Euler disagreement ``c·dt·(k2−k1)`` (midpoint c=1, heun 1/2,
    ralston 3/4). The two stage velocities are already computed, so the
    estimate costs one extra accumulate buffer and zero model evals; it is
    the on-trajectory signal the engine's ``quality=strict`` escalation
    thresholds against (calibration: BENCH.md round-4)."""
    b, n, mel_dim = cond.shape

    if return_error_estimate:
        if EVALS_PER_STEP.get(sampler.method) != 2:
            raise ValueError(
                "return_error_estimate requires a 2-stage method (midpoint/heun/ralston)")
        if sampler.cfg_cache_period > 1 or tuple(sampler.cfg_interval) != (0.0, 1.0):
            raise ValueError("return_error_estimate supports plain full-interval guidance only")

    text_lens = jnp.sum(text != -1, axis=-1)
    lens = jnp.maximum(text_lens, cond_lens)

    cond_mask = lens_to_mask(lens, n)
    if edit_mask is not None:
        cond_mask = cond_mask & edit_mask

    duration = jnp.clip(jnp.maximum(lens + 1, duration), max=n)
    attn_mask = lens_to_mask(duration, n)

    cond = cond.astype(compute_dtype)
    if no_ref_audio:
        cond = jnp.zeros_like(cond)
    step_cond = jnp.where(cond_mask[..., None], cond, 0.0)

    if y0 is None:
        if seeds is not None:
            y0 = sample_noise_from_seeds(seeds, n, mel_dim, duration, compute_dtype)
        elif key is not None:
            y0 = sample_noise(key, b, n, mel_dim, duration, compute_dtype)
        else:
            raise ValueError("sample_cfm needs y0, key, or seeds")
    y0 = y0.astype(compute_dtype)

    use_cfg = sampler.cfg_strength >= 1e-5
    f = jnp.zeros((b,), dtype=bool)

    velocity_plain = None
    velocity_pair = None
    cond_forward = None
    if use_cfg:
        # one fused forward of batch 2b: [cond branch; null branch]
        text2 = jnp.concatenate([text, text], axis=0)
        drop_text2 = jnp.concatenate([f, ~f], axis=0)
        # valid_mask = per-row duration: the reference embeds text at exactly
        # the row's duration (batch-1 serving); masking the conv taps and the
        # GRN's global norm reproduces that inside the padded bucket.
        text_emb2 = embed_fn(params, model_cfg, text2, n, drop_text2,
                             jnp.concatenate([attn_mask, attn_mask], axis=0))
        cond2 = jnp.concatenate([step_cond, step_cond], axis=0)
        mask2 = jnp.concatenate([attn_mask, attn_mask], axis=0)
        drop_audio2 = jnp.concatenate([f, ~f], axis=0)

        def velocity_pair(t_scalar, x):
            x2 = jnp.concatenate([x, x], axis=0)
            out = forward_fn(
                params,
                model_cfg,
                x2,
                cond2,
                None,
                jnp.broadcast_to(t_scalar, (2 * b,)).astype(compute_dtype),
                drop_audio2,
                drop_text2,
                mask2,
                text_emb=text_emb2,
                compute_dtype=compute_dtype,
            )
            return out[:b], out[b:]

        def velocity(t_scalar, x):
            pred, null_pred = velocity_pair(t_scalar, x)
            return pred + (pred - null_pred) * sampler.cfg_strength

        lo, hi = sampler.cfg_interval
        if (lo, hi) != (0.0, 1.0) or sampler.cfg_cache_period > 1:
            # plain cond-branch forward (steps outside the guidance interval /
            # cached-null steps); reuses the cond half of the fused embedding
            text_emb1 = jax.tree.map(lambda e: e[:b] if hasattr(e, "shape") else e, text_emb2)

            def cond_forward(t_scalar, x):
                return forward_fn(
                    params,
                    model_cfg,
                    x,
                    step_cond,
                    None,
                    jnp.broadcast_to(t_scalar, (b,)).astype(compute_dtype),
                    f,
                    f,
                    attn_mask,
                    text_emb=text_emb1,
                    compute_dtype=compute_dtype,
                )

            if (lo, hi) != (0.0, 1.0):
                velocity_plain = cond_forward
        elif sampler.cfg_null_reuse:
            text_emb1 = jax.tree.map(lambda e: e[:b] if hasattr(e, "shape") else e, text_emb2)

            def cond_forward(t_scalar, x):
                return forward_fn(
                    params, model_cfg, x, step_cond, None,
                    jnp.broadcast_to(t_scalar, (b,)).astype(compute_dtype),
                    f, f, attn_mask, text_emb=text_emb1, compute_dtype=compute_dtype,
                )

    else:
        text_emb = embed_fn(params, model_cfg, text, n, f, attn_mask)

        def velocity(t_scalar, x):
            return forward_fn(
                params,
                model_cfg,
                x,
                step_cond,
                None,
                jnp.broadcast_to(t_scalar, (b,)).astype(compute_dtype),
                f,
                f,
                attn_mask,
                text_emb=text_emb,
                compute_dtype=compute_dtype,
            )

    if time_grid_array is not None:
        # dynamic knots (one compile serves many candidate grids — the
        # time-grid SEARCH path, scripts/optimize_time_grid.py). Must be
        # (steps+1,) monotone 0..1; not validated (traced). Plain guidance
        # only (the cache/interval paths partition knots host-side).
        if sampler.cfg_cache_period > 1 or sampler.cfg_interval != (0.0, 1.0):
            raise ValueError("time_grid_array supports plain full-interval guidance only")
        t_grid = time_grid_array.astype(compute_dtype)
    elif sampler.time_grid is not None:
        tg = sampler.time_grid
        if len(tg) < 2 or tg[0] != 0.0 or tg[-1] != 1.0 or any(b <= a for a, b in zip(tg, tg[1:])):
            raise ValueError("time_grid must be strictly increasing from 0.0 to 1.0")
        t_grid = jnp.asarray(tg, dtype=compute_dtype)
    else:
        t_grid = sway_time_grid(sampler.steps, sampler.sway_sampling_coef, dtype=compute_dtype)

    if knot_range is not None:
        if sampler.cfg_cache_period > 1 or sampler.cfg_interval != (0.0, 1.0):
            raise ValueError("knot_range supports plain (non-cached, full-interval) guidance only")
        a, bk = knot_range
        if not (0 <= a < bk <= int(t_grid.shape[0]) - 1):
            raise ValueError(f"knot_range {knot_range} out of bounds for {int(t_grid.shape[0]) - 1} steps")
        t_grid = t_grid[a : bk + 1]

    if use_cfg and sampler.cfg_cache_period > 1:
        # guidance caching: one fused 2b forward refreshes the null velocity
        # every k-th step; the k-1 steps in between run the b-row cond branch
        # and combine with the cached null. Guidance is applied on every step.
        if sampler.method != "euler":
            raise ValueError("cfg_cache_period requires method='euler'")
        if sampler.cfg_interval != (0.0, 1.0):
            raise ValueError("cfg_cache_period and cfg_interval are mutually exclusive")
        k = int(sampler.cfg_cache_period)
        nsteps = int(t_grid.shape[0]) - 1
        ngroups = nsteps // k
        s = sampler.cfg_strength

        y = y0
        if ngroups:
            knots = t_grid[: ngroups * k + 1]
            t0s = knots[:-1].reshape(ngroups, k)
            t1s = knots[1:].reshape(ngroups, k)

            if sampler.cfg_cache_mode == "extrapolate":
                # static extrapolation coefficients from the (host-side) knot
                # values: null(t) ≈ null(T_g) + c·(null(T_g) − null(T_{g−1})),
                # c = (t − T_g)/(T_g − T_{g−1}); group 0 holds (c = 0).
                import numpy as np

                if sampler.time_grid is not None:
                    t_np = np.asarray(sampler.time_grid, np.float64)
                else:
                    t_np = np.linspace(0.0, 1.0, sampler.steps + 1)
                    if sampler.sway_sampling_coef is not None:
                        t_np = t_np + sampler.sway_sampling_coef * (np.cos(np.pi / 2 * t_np) - 1 + t_np)
                refresh = t_np[np.arange(ngroups) * k]
                coefs = np.zeros((ngroups, k))
                for g in range(1, ngroups):
                    coefs[g] = (t_np[g * k : g * k + k] - refresh[g]) / (refresh[g] - refresh[g - 1])
                coefs_j = jnp.asarray(coefs, y0.dtype)

                def group_x(carry, xs):
                    y, null_prev = carry
                    t0v, t1v, cv = xs
                    pred, null = velocity_pair(t0v[0], y)
                    y = y + (t1v[0] - t0v[0]) * (pred + (pred - null) * s)
                    for j in range(1, k):
                        pj = cond_forward(t0v[j], y)
                        null_j = null + cv[j] * (null - null_prev)
                        y = y + (t1v[j] - t0v[j]) * (pj + (pj - null_j) * s)
                    return (y, null), None

                (y, _), _ = lax.scan(group_x, (y, jnp.zeros_like(y0)), (t0s, t1s, coefs_j))
            else:

                def group(y, ts):
                    t0v, t1v = ts
                    pred, null = velocity_pair(t0v[0], y)
                    y = y + (t1v[0] - t0v[0]) * (pred + (pred - null) * s)
                    for j in range(1, k):
                        pj = cond_forward(t0v[j], y)
                        y = y + (t1v[j] - t0v[j]) * (pj + (pj - null) * s)
                    return y, None

                y, _ = lax.scan(group, y, (t0s, t1s))
        # remainder steps (< k of them): full guided pairs
        for j in range(ngroups * k, nsteps):
            pred, null = velocity_pair(t_grid[j], y)
            y = y + (t_grid[j + 1] - t_grid[j]) * (pred + (pred - null) * s)
        if not paste_back:
            return y
        return jnp.where(cond_mask[..., None], cond, y)

    def make_step(vel):
        s = sampler.cfg_strength
        reuse = sampler.cfg_null_reuse and use_cfg

        def evals(t0, y0_, dt):
            """(k1, guided-eval fn for later stage points of this step)."""
            if reuse:
                pred, null = velocity_pair(t0, y0_)
                k1 = pred + (pred - null) * s

                def later(t, x):
                    p = cond_forward(t, x)
                    return p + (p - null) * s

                return k1, later
            return vel(t0, y0_), vel

        if sampler.method == "euler":

            def step(y, ts):
                t0, t1 = ts
                y = y + (t1 - t0) * vel(t0, y)
                return y, None

        elif sampler.method == "midpoint":

            def step(y, ts):
                t0, t1 = ts
                dt = t1 - t0
                k1, later = evals(t0, y, dt)
                y_mid = y + 0.5 * dt * k1
                y = y + dt * later(t0 + 0.5 * dt, y_mid)
                return y, None

        elif sampler.method == "heun":

            def step(y, ts):
                t0, t1 = ts
                dt = t1 - t0
                k1, later = evals(t0, y, dt)
                k2 = later(t1, y + dt * k1)
                y = y + dt * 0.5 * (k1 + k2)
                return y, None

        elif sampler.method == "ralston":

            def step(y, ts):
                t0, t1 = ts
                dt = t1 - t0
                k1, later = evals(t0, y, dt)
                k2 = later(t0 + (2.0 / 3.0) * dt, y + (2.0 / 3.0) * dt * k1)
                y = y + dt * (0.25 * k1 + 0.75 * k2)
                return y, None

        elif sampler.method == "rk4":

            def step(y, ts):
                t0, t1 = ts
                dt = t1 - t0
                k1, later = evals(t0, y, dt)
                k2 = later(t0 + 0.5 * dt, y + 0.5 * dt * k1)
                k3 = later(t0 + 0.5 * dt, y + 0.5 * dt * k2)
                k4 = later(t1, y + dt * k3)
                y = y + dt / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
                return y, None

        else:
            raise ValueError(f"unknown ODE method {sampler.method!r}")

        return step

    # embedded-pair coefficient: y_RK2 − y_Euler = c·dt·(k2 − k1)
    _EMB_COEF = {"midpoint": 1.0, "heun": 0.5, "ralston": 0.75}

    def make_step_est(vel):
        """2-stage step that ALSO accumulates the signed embedded error — the
        same stage velocities, one extra multiply-add into the carry."""
        s = sampler.cfg_strength
        reuse = sampler.cfg_null_reuse and use_cfg
        c = _EMB_COEF[sampler.method]

        def evals(t0, y0_):
            if reuse:
                pred, null = velocity_pair(t0, y0_)
                k1 = pred + (pred - null) * s

                def later(t, x):
                    p = cond_forward(t, x)
                    return p + (p - null) * s

                return k1, later
            return vel(t0, y0_), vel

        if sampler.method == "midpoint":

            def step(carry, ts):
                y, e = carry
                t0, t1 = ts
                dt = t1 - t0
                k1, later = evals(t0, y)
                k2 = later(t0 + 0.5 * dt, y + 0.5 * dt * k1)
                return (y + dt * k2, e + (c * dt) * (k2 - k1)), None

        elif sampler.method == "heun":

            def step(carry, ts):
                y, e = carry
                t0, t1 = ts
                dt = t1 - t0
                k1, later = evals(t0, y)
                k2 = later(t1, y + dt * k1)
                return (y + dt * 0.5 * (k1 + k2), e + (c * dt) * (k2 - k1)), None

        else:  # ralston (validated above)

            def step(carry, ts):
                y, e = carry
                t0, t1 = ts
                dt = t1 - t0
                k1, later = evals(t0, y)
                k2 = later(t0 + (2.0 / 3.0) * dt, y + (2.0 / 3.0) * dt * k1)
                return (y + dt * (0.25 * k1 + 0.75 * k2), e + (c * dt) * (k2 - k1)), None

        return step

    est = None
    if velocity_plain is None:
        if return_error_estimate:
            (y_final, e_acc), _ = lax.scan(
                make_step_est(velocity), (y0, jnp.zeros_like(y0)), (t_grid[:-1], t_grid[1:]))
            # per-row RMSE over generated frames — the same normalization as
            # the certification metric (eval/quality.py mel_l2), so thresholds
            # calibrate directly against error-to-truth tables
            gen_mask = attn_mask & ~cond_mask
            denom = jnp.maximum(jnp.sum(gen_mask, axis=1) * mel_dim, 1).astype(jnp.float32)
            est = jnp.sqrt(
                jnp.sum(jnp.square(e_acc.astype(jnp.float32)) * gen_mask[..., None], axis=(1, 2)) / denom)
        else:
            y_final, _ = lax.scan(make_step(velocity), y0, (t_grid[:-1], t_grid[1:]))
    else:
        # partition the knot sequence into contiguous runs of guided /
        # unguided steps and scan each run with the matching body. The knots
        # are a pure function of static config, but under jit every jnp op is
        # staged (omnistaging) — recompute them host-side in numpy to decide
        # the partition.
        import numpy as np

        if sampler.time_grid is not None:
            t_np = np.asarray(sampler.time_grid, np.float64)
        else:
            t_np = np.linspace(0.0, 1.0, sampler.steps + 1)
            if sampler.sway_sampling_coef is not None:
                t_np = t_np + sampler.sway_sampling_coef * (np.cos(np.pi / 2 * t_np) - 1 + t_np)
        lo, hi = sampler.cfg_interval
        flags = [bool(lo <= t0 < hi) for t0 in t_np[:-1]]
        y_final = y0
        i = 0
        while i < len(flags):
            j = i
            while j < len(flags) and flags[j] == flags[i]:
                j += 1
            seg = t_grid[i : j + 1]
            vel = velocity if flags[i] else velocity_plain
            y_final, _ = lax.scan(make_step(vel), y_final, (seg[:-1], seg[1:]))
            i = j
    out = y_final if not paste_back else jnp.where(cond_mask[..., None], cond, y_final)
    if return_error_estimate:
        return out, est
    return out
