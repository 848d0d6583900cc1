"""Where does sampler time go? Ablation timing on TPU: full step loop vs
attention/FF/conv-pos/adaLN knocked out. Tunnel RTT makes per-op timing
useless, so each measurement is a whole jitted sampler call at the SHIPPING
recipe (ralston NFE-20 by default; PS_METHOD/PS_NFE/PS_BATCH/PS_ATTN env to
override — PS_METHOD=euler PS_NFE=32 reproduces the round-2 knockout table's
program)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

RESULTS = {}


def measure(tag, params, cfg, inputs, iters=2):
    from f5tts_tpu.sampling.euler import DEFAULT_NFE, SamplerConfig, nfe_to_steps, sample_cfm

    method = os.environ.get("PS_METHOD", "ralston")
    nfe = int(os.environ.get("PS_NFE", 0)) or DEFAULT_NFE[method]
    steps = nfe_to_steps(nfe, method)
    fn = jax.jit(
        lambda p, cond, cl, text, dur, seeds: sample_cfm(
            p, cfg, cond=cond, cond_lens=cl, text=text, duration=dur,
            sampler=SamplerConfig(steps=steps, cfg_strength=2.0, method=method),
            seeds=seeds, compute_dtype=jnp.bfloat16,
        )
    )
    out = fn(params, *inputs)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, *inputs)
        float(jnp.sum(out[..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt:.3f} s per {method}-{steps} sample (NFE {nfe})", flush=True)
    RESULTS[tag] = round(dt, 4)
    return dt


def main():
    from f5tts_tpu.models import modules as m
    from f5tts_tpu.models.dit import DiTConfig, init_dit

    cfg = DiTConfig.base()
    if os.environ.get("PS_ATTN", "flash") == "flash":
        import dataclasses

        cfg = dataclasses.replace(cfg, attn_impl="flash")
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), init_dit(jax.random.PRNGKey(0), cfg))
    b, n = int(os.environ.get("PS_BATCH", 8)), int(os.environ.get("PS_FRAMES", 1024))
    rng = np.random.default_rng(0)
    inputs = (
        jnp.asarray(rng.standard_normal((b, n, 100)), jnp.float32),
        jnp.full((b,), 128, jnp.int32),
        jnp.asarray(rng.integers(0, 90, (b, 512)), jnp.int32),
        jnp.full((b,), n, jnp.int32),
        jnp.arange(b, dtype=jnp.int32),
    )

    # PS_VARIANTS subsets the knockouts (comma list) — each variant is a
    # separate ~6-10 min remote compile, so trim when the tunnel window is
    # short. Default = all.
    want = os.environ.get(
        "PS_VARIANTS", "full,no-attention,no-ff,no-convpos,no-adaln,other-attn")
    want = {v.strip() for v in want.split(",")}

    full = measure("full", params, cfg, inputs)

    no_attn = no_ff = no_cp = no_ada = float("nan")
    if "no-attention" in want:
        orig_attn = m.attention
        m.attention = lambda p, x, *a, **k: x
        no_attn = measure("no-attention", params, cfg, inputs)
        m.attention = orig_attn

    if "no-ff" in want:
        orig_ff = m.feed_forward
        m.feed_forward = lambda p, x, *a, **k: x
        no_ff = measure("no-ff", params, cfg, inputs)
        m.feed_forward = orig_ff

    if "no-convpos" in want:
        orig_cp = m.conv_pos_embedding
        m.conv_pos_embedding = lambda p, x, *a, **k: jnp.zeros_like(x)
        no_cp = measure("no-convpos", params, cfg, inputs)
        m.conv_pos_embedding = orig_cp

    if "no-adaln" in want:
        # knock out the whole adaLN chain (timestep-conditioned linear +
        # norms): identity modulation with the contract's shapes
        orig_ada = m.adaln_zero
        m.adaln_zero = lambda p, x, emb, *a, **k: (x, jnp.ones_like(emb), jnp.zeros_like(emb),
                                                   jnp.zeros_like(emb), jnp.ones_like(emb))
        no_ada = measure("no-adaln", params, cfg, inputs)
        m.adaln_zero = orig_ada

    if "other-attn" in want:
        import dataclasses

        other = "xla" if cfg.attn_impl == "flash" else "flash"
        cfg_other = dataclasses.replace(cfg, attn_impl=other)
        measure(f"{other}-attn", params, cfg_other, inputs)

    print(f"attention share ~{full - no_attn:.3f}s  ff share ~{full - no_ff:.3f}s  "
          f"convpos ~{full - no_cp:.3f}s  adaln ~{full - no_ada:.3f}s")
    out_path = os.environ.get("PS_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"batch": b, "frames": n,
                       "method": os.environ.get("PS_METHOD", "ralston"),
                       "attn": cfg.attn_impl, "times_s": RESULTS}, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
