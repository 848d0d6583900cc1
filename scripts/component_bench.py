"""Component-level timing on TPU: one fused-CFG DiT step, vocoder decode,
flash-vs-xla attention. Informs kernel work; not the headline bench."""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1]))  # force full sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0][..., :1]))
    return (time.perf_counter() - t0) / iters


def main():
    from f5tts_tpu.models.dit import DiTConfig, dit_forward, init_dit
    from f5tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode

    b = int(os.environ.get("CB_BATCH", 16))  # CFG-doubled batch
    n = int(os.environ.get("CB_FRAMES", 1024))
    rng = np.random.default_rng(0)

    for attn in ("xla", "flash"):
        cfg = DiTConfig(**{**DiTConfig.base().__dict__, "attn_impl": attn})
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), init_dit(jax.random.PRNGKey(0), cfg))
        x = jnp.asarray(rng.standard_normal((b, n, 100)), jnp.bfloat16)
        text = jnp.asarray(rng.integers(0, 90, (b, 512)), jnp.int32)
        time_t = jnp.full((b,), 0.4, jnp.float32)
        drop = jnp.asarray([False] * (b // 2) + [True] * (b // 2))
        mask = jnp.ones((b, n), bool)

        @jax.jit
        def step(params, x, text, time_t, drop, mask):
            return dit_forward(params, cfg, x, x, text, time_t, drop, drop, mask, compute_dtype=jnp.bfloat16)

        dt = timeit(step, params, x, text, time_t, drop, mask)
        flops = 32 * 2  # placeholder; report raw time
        print(f"dit_step attn={attn}: {dt*1000:.1f} ms  -> est 32-step sampler {32*dt:.2f} s")

    vcfg = VocosConfig()
    vparams = jax.tree.map(lambda x: x.astype(jnp.bfloat16), init_vocos(jax.random.PRNGKey(1), vcfg))
    mel = jnp.asarray(rng.standard_normal((b // 2, n, 100)), jnp.bfloat16)

    @jax.jit
    def dec(vparams, mel):
        return vocos_decode(vparams, mel, vcfg, compute_dtype=jnp.bfloat16)

    dt = timeit(dec, vparams, mel)
    print(f"vocos decode (b={b//2}, n={n}): {dt*1000:.1f} ms")


if __name__ == "__main__":
    main()
