"""Scaling-efficiency harness (BASELINE config #5 methodology).

Measures weak-scaling efficiency of the pjit train step and the TP-sharded
serving forward across mesh sizes: per-device work is held constant, so ideal
scaling keeps step time flat as devices are added (efficiency = t_1 / t_N).

On this machine it runs on the virtual CPU mesh (8 forced host devices —
the standard JAX fake-backend idiom); on a real slice the SAME script measures
the real thing: run it under `parallel.launcher.init_distributed()` with
JAX_PLATFORMS=tpu and the mesh spans all global chips (ICI/DCN).

Usage: python scripts/bench_scaling.py [--devices 1,2,4,8] [--mode train|tp]
Prints one JSON line per mesh size plus a final efficiency summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser("bench-scaling")
    p.add_argument("--devices", default="1,2,4,8", help="comma list of mesh sizes")
    p.add_argument("--mode", default="train", choices=["train", "tp"])
    p.add_argument("--per-device-batch", type=int, default=2)
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--tpu", action="store_true",
                   help="use the real accelerator mesh (default: virtual CPU devices)")
    args = p.parse_args(argv)

    import jax

    if not args.tpu:
        # force the virtual CPU mesh BEFORE any jax backend query (probing
        # the backend first would pin the single-device tunnel platform)
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", max(int(v) for v in args.devices.split(",")))
        except Exception:
            pass

    import jax.numpy as jnp
    import numpy as np

    from f5tts_tpu.models.cfm import CFMConfig
    from f5tts_tpu.models.dit import DiTConfig
    from f5tts_tpu.parallel.mesh import build_mesh

    sizes = [int(v) for v in args.devices.split(",")]
    avail = len(jax.devices())
    sizes = [s for s in sizes if s <= avail]

    model_cfg = CFMConfig(
        model=DiTConfig(
            dim=256, depth=4, heads=4, dim_head=64, ff_mult=2, mel_dim=20,
            text_num_embeds=64, text_dim=128, conv_layers=2, max_pos=512,
        )
    )

    times: dict[int, float] = {}
    for n in sizes:
        if args.mode == "train":
            dt = _train_step_time(jax, jnp, np, model_cfg, n,
                                  args.per_device_batch, args.frames, args.iters, build_mesh)
        else:
            dt = _tp_forward_time(jax, jnp, np, model_cfg.model, n,
                                  args.per_device_batch, args.frames, args.iters, build_mesh)
        times[n] = dt
        print(json.dumps({"devices": n, "mode": args.mode, "step_ms": round(dt * 1e3, 2)}))

    base = times[sizes[0]]
    summary = {
        "metric": f"weak_scaling_efficiency_{args.mode}",
        "efficiency": {str(n): round(base / times[n], 3) for n in sizes},
        "note": "per-device work constant; 1.0 = ideal"
                + ("" if args.tpu else
                   " — VIRTUAL CPU MESH: all devices share one physical host, so these"
                   " numbers validate the sharded-program mechanics, not hardware"
                   " efficiency; run with --tpu on a real slice for the config-#5 metric"),
    }
    print(json.dumps(summary))


def _train_step_time(jax, jnp, np, model_cfg, n, per_dev, frames, iters, build_mesh):
    """DP weak scaling: global batch = per_dev * n rows over a (n, 1) mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from f5tts_tpu.train.trainer import TrainConfig, init_train_state, make_train_step, state_shardings

    mesh = build_mesh(model_parallel=1, devices=jax.devices()[:n])
    train_cfg = TrainConfig(warmup_updates=2, total_updates=100)
    state = init_train_state(jax.random.PRNGKey(0), model_cfg, train_cfg)
    shardings = state_shardings(state, mesh)
    state = jax.tree.map(jax.device_put, state, shardings)

    b = per_dev * n
    rng = np.random.default_rng(0)
    data_sh = NamedSharding(mesh, P("data"))
    batch = {
        "mel": jax.device_put(jnp.asarray(rng.standard_normal((b, frames, 20)), jnp.float32), data_sh),
        "text": jax.device_put(jnp.asarray(rng.integers(0, 60, (b, 24)), jnp.int32), data_sh),
        "lens": jax.device_put(jnp.full((b,), frames, jnp.int32), data_sh),
        "key": jax.random.PRNGKey(1),
    }
    key_sh = NamedSharding(mesh, P())
    step = jax.jit(
        make_train_step(model_cfg, train_cfg, compute_dtype=jnp.float32),
        in_shardings=(shardings, {"mel": data_sh, "text": data_sh, "lens": data_sh, "key": key_sh}),
        out_shardings=(shardings, None),
    )
    with mesh:
        state, m = step(state, batch)  # compile
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch)
        float(m["loss"])  # host fetch = sync barrier
    return (time.perf_counter() - t0) / iters


def _tp_forward_time(jax, jnp, np, dit_cfg, n, per_dev_rows, frames, iters, build_mesh):
    """TP scaling of the serving forward: model sharded over all n devices,
    batch fixed — ideal TP cuts step time ~1/n (strong scaling)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from f5tts_tpu.models.dit import dit_forward, init_dit
    from f5tts_tpu.parallel.sharding import shard_params

    mesh = build_mesh(model_parallel=n, devices=jax.devices()[:n])
    params = init_dit(jax.random.PRNGKey(0), dit_cfg)
    params = shard_params(params, mesh)

    b = per_dev_rows
    rng = np.random.default_rng(0)
    repl = NamedSharding(mesh, P())
    x = jax.device_put(jnp.asarray(rng.standard_normal((b, frames, dit_cfg.mel_dim)), jnp.float32), repl)
    cond = jax.device_put(jnp.asarray(rng.standard_normal((b, frames, dit_cfg.mel_dim)), jnp.float32), repl)
    text = jax.device_put(jnp.asarray(rng.integers(0, dit_cfg.text_num_embeds, (b, 24)), jnp.int32), repl)
    t = jax.device_put(jnp.full((b,), 0.4, jnp.float32), repl)
    drop = jax.device_put(jnp.zeros((b,), bool), repl)
    mask = jax.device_put(jnp.ones((b, frames), bool), repl)

    def fn(p, x, cond, text, t, drop, mask):
        return dit_forward(p, dit_cfg, x, cond, text, t, drop, drop, mask, compute_dtype=jnp.float32)

    fwd = jax.jit(fn)
    with mesh:
        out = fwd(params, x, cond, text, t, drop, mask)
        float(out.sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, x, cond, text, t, drop, mask)
        float(out.sum())
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    main()
