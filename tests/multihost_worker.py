"""Worker process for the 2-process multi-host test (VERDICT #4).

Runs the REAL multi-host path — ``jax.distributed.initialize`` via
``parallel/launcher.py`` (the contract replacing the reference's Accelerate
DDP, ``model/trainer.py:53-65``), global ('data','model') mesh across
processes, ``make_global_batch`` feeding per-host rows — then takes one DP+TP
training step AND one TP-sharded batched serving solve (``sample_cfm``).

Launched by ``tests/test_multihost.py`` with COORDINATOR_ADDRESS /
NUM_PROCESSES / PROCESS_ID and a 2-device CPU backend per process
(4 global devices -> mesh (data=2, model=2); the 'model' axis stays within a
process's local devices, as ICI locality requires on real hardware).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from f5tts_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu"))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from f5tts_tpu.models.cfm import CFMConfig  # noqa: E402
from f5tts_tpu.models.dit import DiTConfig  # noqa: E402
from f5tts_tpu.parallel.launcher import (  # noqa: E402
    global_mesh,
    init_distributed,
    local_batch_slice,
    make_global_batch,
)
from f5tts_tpu.sampling.euler import SamplerConfig, sample_cfm  # noqa: E402
from f5tts_tpu.train.trainer import (  # noqa: E402
    TrainConfig,
    init_train_state,
    make_train_step,
    state_shardings,
)

MODEL = DiTConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2, mel_dim=8,
                  text_num_embeds=30, text_dim=16, conv_layers=1, max_pos=128)


def replicated(mesh, x):
    return jax.make_array_from_process_local_data(NamedSharding(mesh, P()), np.asarray(x))


def main():
    pid, n_proc = init_distributed()
    want = int(os.environ.get("NUM_PROCESSES", "2"))
    assert n_proc == want, (n_proc, want)
    assert jax.process_count() == want, jax.process_count()
    assert len(jax.devices()) == 2 * want, len(jax.devices())
    assert len(jax.local_devices()) == 2

    mesh = global_mesh(model_parallel=2)
    assert mesh.shape == {"data": want, "model": 2}, mesh.shape
    # 'model' axis must stay within one process's local devices (ICI domain)
    for col in range(want):
        procs = {mesh.devices[col, m].process_index for m in range(2)}
        assert len(procs) == 1, f"model axis spans processes: {procs}"

    # ---- one DP+TP training step, rows fed per host ----------------------
    model_cfg = CFMConfig(model=MODEL)
    train_cfg = TrainConfig(warmup_updates=10, total_updates=100)
    state = init_train_state(jax.random.PRNGKey(0), model_cfg, train_cfg)
    shardings = state_shardings(state, mesh)
    state = jax.tree.map(jax.device_put, state, shardings)

    gb, n, nt = 2 * want, 32, 12
    rng = np.random.default_rng(0)  # seed-synchronized across hosts
    full = {
        "mel": rng.standard_normal((gb, n, MODEL.mel_dim)).astype(np.float32),
        "text": rng.integers(0, 30, (gb, nt)).astype(np.int32),
        "lens": np.full((gb,), n, np.int32),
    }
    sl = local_batch_slice(gb)
    batch = make_global_batch({k: v[sl] for k, v in full.items()}, mesh)
    batch["key"] = replicated(mesh, jax.random.PRNGKey(1))

    data_sh = NamedSharding(mesh, P("data"))
    rep_sh = NamedSharding(mesh, P())
    step = jax.jit(
        make_train_step(model_cfg, train_cfg, compute_dtype=jnp.float32),
        in_shardings=(shardings, {"mel": data_sh, "text": data_sh, "lens": data_sh, "key": rep_sh}),
        out_shardings=(shardings, None),
    )
    with mesh:
        state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    assert int(state["step"]) == 1

    # ---- TP-sharded batched serving solve over the same mesh -------------
    serve = {
        "cond": rng.standard_normal((gb, n, MODEL.mel_dim)).astype(np.float32),
        "cond_lens": np.full((gb,), 16, np.int32),
        "text": rng.integers(0, 30, (gb, nt)).astype(np.int32),
        "duration": np.asarray([n - 4 * (i % 4) for i in range(gb)], np.int32),
        "seeds": np.arange(100, 100 + gb, dtype=np.int32),
    }
    sbatch = make_global_batch({k: v[sl] for k, v in serve.items()}, mesh)

    @jax.jit
    def solve(params, cond, cond_lens, text, duration, seeds):
        return sample_cfm(params, MODEL, cond=cond, cond_lens=cond_lens, text=text,
                          duration=duration, sampler=SamplerConfig(steps=1), seeds=seeds)

    with mesh:
        out = solve(state["params"], sbatch["cond"], sbatch["cond_lens"],
                    sbatch["text"], sbatch["duration"], sbatch["seeds"])
    assert out.shape == (gb, n, MODEL.mel_dim)
    for shard in out.addressable_shards:
        assert np.all(np.isfinite(np.asarray(shard.data))), "non-finite serving shard"

    print(f"MULTIHOST_OK pid={pid} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
