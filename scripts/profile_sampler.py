"""Where does sampler time go? Ablation timing on TPU: full step loop vs
attention/FF/conv-pos knocked out. Tunnel RTT makes per-op timing useless, so
each measurement is a whole 32-step jitted sampler call."""

import time

import numpy as np

import jax
import jax.numpy as jnp


def measure(tag, params, cfg, inputs, iters=2):
    from f5tts_tpu.sampling.euler import SamplerConfig, sample_cfm

    fn = jax.jit(
        lambda p, cond, cl, text, dur, seeds: sample_cfm(
            p, cfg, cond=cond, cond_lens=cl, text=text, duration=dur,
            sampler=SamplerConfig(steps=32, cfg_strength=2.0), seeds=seeds,
            compute_dtype=jnp.bfloat16,
        )
    )
    out = fn(params, *inputs)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, *inputs)
        float(jnp.sum(out[..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt:.3f} s per 32-step sample")
    return dt


def main():
    from f5tts_tpu.models import modules as m
    from f5tts_tpu.models.dit import DiTConfig, init_dit

    cfg = DiTConfig.base()
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), init_dit(jax.random.PRNGKey(0), cfg))
    b, n = 8, 1024
    rng = np.random.default_rng(0)
    inputs = (
        jnp.asarray(rng.standard_normal((b, n, 100)), jnp.float32),
        jnp.full((b,), 128, jnp.int32),
        jnp.asarray(rng.integers(0, 90, (b, 512)), jnp.int32),
        jnp.full((b,), n, jnp.int32),
        jnp.arange(b, dtype=jnp.int32),
    )

    full = measure("full", params, cfg, inputs)

    orig_attn = m.attention
    m.attention = lambda p, x, heads, rope_freqs=None, mask=None, impl="xla", rope_all_heads=False: x
    no_attn = measure("no-attention", params, cfg, inputs)
    m.attention = orig_attn

    orig_ff = m.feed_forward
    m.feed_forward = lambda p, x: x
    no_ff = measure("no-ff", params, cfg, inputs)
    m.feed_forward = orig_ff

    orig_cp = m.conv_pos_embedding
    m.conv_pos_embedding = lambda p, x, mask=None, kernel_size=31, groups=16: jnp.zeros_like(x)
    no_cp = measure("no-convpos", params, cfg, inputs)
    m.conv_pos_embedding = orig_cp

    import dataclasses

    cfg_flash = dataclasses.replace(cfg, attn_impl="flash")
    flash = measure("flash-attn", params, cfg_flash, inputs)

    print(f"attention share ~{full - no_attn:.3f}s  ff share ~{full - no_ff:.3f}s  convpos ~{full - no_cp:.3f}s")


if __name__ == "__main__":
    main()
