"""Trainer: loss descends on a toy task, EMA schedule, checkpoint resume
round-trip, LR schedule shape (SURVEY §4.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from f5tts_tpu.models.cfm import CFMConfig
from f5tts_tpu.models.dit import DiTConfig
from f5tts_tpu.train.data import FramePackedDataset, Item, synthetic_batches
from f5tts_tpu.train.ema import EMAConfig, ema_decay
from f5tts_tpu.train.trainer import TrainConfig, Trainer, init_train_state, lr_schedule, make_train_step

TINY = CFMConfig(
    model=DiTConfig(
        dim=32, depth=1, heads=2, dim_head=16, ff_mult=2, mel_dim=8,
        text_num_embeds=20, text_dim=16, conv_layers=1, max_pos=128,
    )
)


def test_train_step_runs_and_advances():
    cfg = TrainConfig(learning_rate=1e-3, warmup_updates=2, total_updates=100)
    state = init_train_state(jax.random.PRNGKey(0), TINY, cfg)
    step = jax.jit(make_train_step(TINY, cfg, compute_dtype=jnp.float32))
    batch = next(synthetic_batches(TINY.model, frames=32, batch=2, n_batches=1))
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    db["key"] = jax.random.PRNGKey(1)
    state2, m1 = step(state, db)
    assert int(state2["step"]) == 1
    assert np.isfinite(float(m1["loss"]))
    state3, m2 = step(state2, db)
    assert int(state3["step"]) == 2


def test_training_dropout_active_and_deterministic():
    import dataclasses

    from f5tts_tpu.models.cfm import cfm_loss

    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((2, 32, TINY.model.mel_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 18, (2, 10)), jnp.int32)
    lens = jnp.full((2,), 32, jnp.int32)
    key = jax.random.PRNGKey(7)

    params = init_train_state(jax.random.PRNGKey(0), TINY, TrainConfig())["params"]
    cfg_nodrop = CFMConfig(model=dataclasses.replace(TINY.model, dropout=0.0))
    loss_a, _ = cfm_loss(params, TINY, key, mel, text, lens)
    loss_b, _ = cfm_loss(params, TINY, key, mel, text, lens)
    loss_c, _ = cfm_loss(params, cfg_nodrop, key, mel, text, lens)
    assert float(loss_a) == float(loss_b)  # deterministic under the same key
    assert float(loss_a) != float(loss_c)  # dropout actually perturbs the forward


def test_grad_accumulation_matches_manual_average():
    cfg = TrainConfig(learning_rate=1e-3, warmup_updates=2, total_updates=100)
    state = init_train_state(jax.random.PRNGKey(0), TINY, cfg)
    b1 = next(synthetic_batches(TINY.model, frames=32, batch=2, n_batches=1, seed=1))
    b2 = next(synthetic_batches(TINY.model, frames=32, batch=2, n_batches=1, seed=2))
    key = jax.random.PRNGKey(5)

    # accumulated step over stacked micro-batches
    step_acc = jax.jit(make_train_step(TINY, cfg, compute_dtype=jnp.float32, accum_steps=2))
    stacked = {
        "mel": jnp.stack([jnp.asarray(b1["mel"]), jnp.asarray(b2["mel"])]),
        "text": jnp.stack([jnp.asarray(b1["text"]), jnp.asarray(b2["text"])]),
        "lens": jnp.stack([jnp.asarray(b1["lens"]), jnp.asarray(b2["lens"])]),
        "key": key,
    }
    _, metrics = step_acc(state, stacked)

    # manual: average of per-micro losses with the same split keys
    from f5tts_tpu.models.cfm import cfm_loss

    k1, k2 = jax.random.split(key, 2)
    l1 = cfm_loss(state["params"], TINY, k1, jnp.asarray(b1["mel"]), jnp.asarray(b1["text"]), jnp.asarray(b1["lens"]))[0]
    l2 = cfm_loss(state["params"], TINY, k2, jnp.asarray(b2["mel"]), jnp.asarray(b2["text"]), jnp.asarray(b2["lens"]))[0]
    assert abs(float(metrics["loss"]) - float((l1 + l2) / 2)) < 1e-5


def test_lr_schedule_warmup_then_decay():
    cfg = TrainConfig(learning_rate=1.0, warmup_updates=100, total_updates=1100)
    sched = lr_schedule(cfg)
    assert float(sched(0)) < 0.02
    assert abs(float(sched(100)) - 1.0) < 1e-6
    assert float(sched(600)) < 1.0
    assert float(sched(1100)) < 1e-6


def test_ema_decay_schedule():
    cfg = EMAConfig()
    assert float(ema_decay(jnp.asarray(1), cfg)) == 0.0  # before update_after_step
    assert 0.0 < float(ema_decay(jnp.asarray(500), cfg)) <= cfg.beta
    assert float(ema_decay(jnp.asarray(10_000_000), cfg)) == pytest.approx(cfg.beta)


def test_checkpoint_resume_roundtrip(tmp_path):
    from f5tts_tpu.train.checkpoint import latest_step, restore_state, save_state

    cfg = TrainConfig(learning_rate=1e-3, warmup_updates=2, total_updates=50)
    state = init_train_state(jax.random.PRNGKey(0), TINY, cfg)
    step = jax.jit(make_train_step(TINY, cfg, compute_dtype=jnp.float32))
    batch = next(synthetic_batches(TINY.model, frames=32, batch=2, n_batches=1))
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    db["key"] = jax.random.PRNGKey(1)
    state, _ = step(state, db)
    state, _ = step(state, db)

    d = str(tmp_path / "ckpt")
    save_state(d, int(state["step"]), state)
    assert latest_step(d) == 2

    template = init_train_state(jax.random.PRNGKey(9), TINY, cfg)  # different init
    restored = restore_state(d, 2, template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # training continues identically from the restored state
    s1, m1 = step(state, db)
    s2, m2 = step(restored, db)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]))


def test_hf_dataset_source():
    import datasets

    rng = np.random.default_rng(0)
    rows = [
        {"text": f"sample {i}", "audio": {"array": (rng.standard_normal(24000) * 0.1).tolist(), "sampling_rate": 24000}}
        for i in range(3)
    ]
    ds_hf = datasets.Dataset.from_list(rows)
    ds = FramePackedDataset.from_hf_dataset(ds_hf)
    assert len(ds.items) == 3
    batch = next(ds.batches(batch_frames=400, max_samples=4, frame_bucket=32))
    assert batch["mel"].shape[-1] == 100
    assert np.all(np.isfinite(batch["mel"]))


def test_frame_packed_batching(tmp_path):
    import json

    # synthesize a manifest of mel .npy files with varying lengths
    rng = np.random.default_rng(0)
    lengths = [40, 100, 60, 220, 30, 150, 90, 75]
    lines = []
    for i, L in enumerate(lengths):
        mel = rng.standard_normal((L, 8)).astype(np.float32)
        np.save(tmp_path / f"m{i}.npy", mel)
        lines.append({"mel": f"m{i}.npy", "text": f"utterance number {i}", "frames": L})
    with open(tmp_path / "manifest.jsonl", "w") as f:
        for rec in lines:
            f.write(json.dumps(rec) + "\n")

    ds = FramePackedDataset.from_dir(str(tmp_path))
    batches = ds.pack_batches(batch_frames=200, max_samples=3, seed=0)
    # every batch obeys the budget (except singletons over budget)
    for b in batches:
        frames = sum(ds.items[i].n_frames for i in b)
        assert len(b) <= 3
        assert frames <= 200 or len(b) == 1
    assert sorted(i for b in batches for i in b) == list(range(len(lengths)))

    collated = next(ds.batches(batch_frames=200, max_samples=3, seed=0, frame_bucket=64))
    assert collated["mel"].shape[1] % 64 == 0
    assert collated["text"].shape[0] == collated["mel"].shape[0] == len(collated["lens"])


@pytest.mark.slow  # default tier keeps one representative per capability
def test_train_step_unett_and_mmdit_backbones():
    """The trainer is backbone-generic (reference Trainer takes any CFM
    transformer, model/trainer.py:24): one optimizer step on UNetT and MMDiT."""
    from f5tts_tpu.models.mmdit import MMDiTConfig
    from f5tts_tpu.models.unett import UNetTConfig

    backbones = [
        UNetTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=8,
                    text_num_embeds=20, text_dim=16, conv_layers=1),
        MMDiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=8,
                    text_num_embeds=20),
    ]
    for model in backbones:
        cfgm = CFMConfig(model=model)
        cfg = TrainConfig(learning_rate=1e-3, warmup_updates=2, total_updates=100)
        state = init_train_state(jax.random.PRNGKey(0), cfgm, cfg)
        step = jax.jit(make_train_step(cfgm, cfg, compute_dtype=jnp.float32))
        batch = next(synthetic_batches(model, frames=32, batch=2, n_batches=1))
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        db["key"] = jax.random.PRNGKey(1)
        state2, metrics = step(state, db)
        assert int(state2["step"]) == 1, type(model).__name__
        assert np.isfinite(float(metrics["loss"])), type(model).__name__
        assert float(metrics["grad_norm"]) > 0, type(model).__name__
        # warmup LR is 0 at step 0; params move on the second step
        state3, _ = step(state2, db)
        moved = jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), state2["params"], state3["params"]))
        assert max(moved) > 0, type(model).__name__


def test_train_cli_model_registry():
    from f5tts_tpu.cli.train import MODEL_NAMES, resolve_model_cfg
    from f5tts_tpu.models.dit import DiTConfig
    from f5tts_tpu.models.unett import UNetTConfig

    for name in MODEL_NAMES:
        cfg = resolve_model_cfg(name)
        expect = UNetTConfig if name.startswith("E2TTS") else DiTConfig
        assert isinstance(cfg.model, expect), name
    assert resolve_model_cfg("E2TTS_Small").model.depth == 20
    assert resolve_model_cfg("E2TTS_Base").model.ff_mult == 4


def test_fit_with_grad_accum_groups_micro_batches():
    """Trainer.fit with max_grad_accum>1 pad-stacks unequal micro-batches into
    one accumulated update (padded rows carry lens=0 -> no loss frames)."""
    from f5tts_tpu.train.trainer import Trainer, group_micro_batches

    cfg = TrainConfig(learning_rate=1e-3, warmup_updates=1, total_updates=50, max_grad_accum=2)
    trainer = Trainer(TINY, cfg, compute_dtype=jnp.float32, logger=None)
    state, _ = trainer.init_or_resume()

    rng = np.random.default_rng(0)

    def micro(b, n, nt):
        return {
            "mel": rng.standard_normal((b, n, TINY.model.mel_dim)).astype(np.float32),
            "text": rng.integers(0, 18, (b, nt)).astype(np.int32),
            "lens": np.full((b,), n, np.int32),
        }

    # unequal rows/frames/text lengths across micro-batches
    batches = [micro(2, 32, 10), micro(3, 48, 8), micro(2, 48, 12), micro(2, 32, 10)]
    grouped = list(group_micro_batches(iter(batches), 2))
    assert len(grouped) == 2
    assert grouped[0]["mel"].shape == (2, 3, 48, TINY.model.mel_dim)
    assert grouped[0]["lens"][0, 2] == 0  # padded row selects nothing
    assert (grouped[0]["text"][0, :, 10:] == -1).all()

    state2 = trainer.fit(state, iter(batches))
    assert int(state2["step"]) == 2  # 4 micro-batches -> 2 optimizer updates


@pytest.mark.slow  # default tier keeps one representative per capability
def test_fit_grad_accum_on_mesh_shards_rows():
    """Under a mesh, grad-accumulated batches carry a leading (accum, ...)
    axis that the step scans over — the in_shardings must partition the
    per-sample rows (axis 1), not the accumulation axis. With 4 data-parallel
    devices and accum 2, sharding axis 0 would fail dispatch outright."""
    from f5tts_tpu.parallel.mesh import build_mesh

    mesh = build_mesh(model_parallel=1, devices=jax.devices()[:4])  # data=4
    cfg = TrainConfig(learning_rate=1e-3, warmup_updates=1, total_updates=50, max_grad_accum=2)
    trainer = Trainer(TINY, cfg, mesh=mesh, compute_dtype=jnp.float32)
    state, _ = trainer.init_or_resume()

    rng = np.random.default_rng(0)

    def micro():
        return {
            "mel": rng.standard_normal((4, 32, TINY.model.mel_dim)).astype(np.float32),
            "text": rng.integers(0, 18, (4, 10)).astype(np.int32),
            "lens": np.full((4,), 32, np.int32),
        }

    state2 = trainer.fit(state, iter([micro() for _ in range(4)]))
    assert int(state2["step"]) == 2  # 4 micro-batches -> 2 accumulated updates


def test_trained_checkpoint_loads_for_serving(tmp_path):
    """A checkpoint directory written by THIS trainer must load back through
    the serving-side loader (models.convert.load_trained_checkpoint /
    load_f5_checkpoint's directory branch) — EMA weights by default, exactly
    like the reference serves its ema_model.* torch checkpoints."""
    from f5tts_tpu.models.convert import load_f5_checkpoint, load_trained_checkpoint
    from f5tts_tpu.models.dit import dit_forward
    from f5tts_tpu.train.checkpoint import save_state

    cfg = TrainConfig(learning_rate=1e-3, warmup_updates=2, total_updates=100)
    state = init_train_state(jax.random.PRNGKey(0), TINY, cfg)
    # make EMA visibly different from params so the test can tell them apart
    state["ema"] = jax.tree.map(lambda x: x + 1.0, state["ema"])
    save_state(str(tmp_path), 7, state)

    ema = load_trained_checkpoint(str(tmp_path), TINY.model)
    raw = load_trained_checkpoint(str(tmp_path), TINY.model, use_ema=False)
    for got, want in ((ema, state["ema"]), (raw, state["params"])):
        flat_g, flat_w = jax.tree.leaves(got), jax.tree.leaves(want)
        assert all(np.allclose(g, w) for g, w in zip(flat_g, flat_w))

    # same entry point the CLI/server use for DiT checkpoints
    via_f5 = load_f5_checkpoint(str(tmp_path), TINY.model)
    assert np.allclose(jax.tree.leaves(via_f5)[0], jax.tree.leaves(ema)[0])

    # restored params drive a forward pass
    rng = np.random.default_rng(0)
    b, n, nt = 1, 16, 6
    out = dit_forward(
        ema, TINY.model,
        jnp.asarray(rng.standard_normal((b, n, TINY.model.mel_dim)), jnp.float32),
        jnp.asarray(rng.standard_normal((b, n, TINY.model.mel_dim)), jnp.float32),
        jnp.asarray(rng.integers(0, 18, (b, nt)), jnp.int32),
        jnp.asarray([0.3], jnp.float32),
        jnp.asarray([False]), jnp.asarray([False]), jnp.ones((b, n), bool),
        compute_dtype=jnp.float32,
    )
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow  # default tier keeps one representative per capability
def test_grad_accum_keeps_aux_metrics_and_trailing_group():
    """VERDICT weak #4: the accumulation branch must not drop aux metrics, and
    a trailing partial micro-group must train (weight-0 pads) with grads/loss
    averaged over the REAL micro count — 3 micro-batches at accum 2 give the
    same parameters as 2 updates where the second used only the odd batch."""
    from f5tts_tpu.train.trainer import group_micro_batches

    cfg = TrainConfig(learning_rate=1e-3, warmup_updates=2, total_updates=100, max_grad_accum=2)
    state = init_train_state(jax.random.PRNGKey(0), TINY, cfg)
    rng = np.random.default_rng(1)

    def micro(seed):
        r = np.random.default_rng(seed)
        return {
            "mel": r.standard_normal((2, 32, TINY.model.mel_dim)).astype(np.float32),
            "text": r.integers(0, 18, (2, 10)).astype(np.int32),
            "lens": np.full((2,), 32, np.int32),
        }

    del rng
    batches = [micro(1), micro(2), micro(3)]
    grouped = list(group_micro_batches(iter(batches), 2))
    assert len(grouped) == 2  # trailing micro-batch NOT dropped
    np.testing.assert_array_equal(grouped[1]["micro_weight"], [1.0, 0.0])

    step_acc = jax.jit(make_train_step(TINY, cfg, compute_dtype=jnp.float32, accum_steps=2))
    key = jax.random.PRNGKey(5)
    # run the PARTIAL group directly from the initial state so the reported
    # loss is comparable against a hand-computed single-micro loss
    _, metrics = step_acc(state, {**{k: jnp.asarray(v) for k, v in grouped[1].items()}, "key": key})
    # aux metrics flow through the accumulation branch
    assert "masked_frames" in metrics and "t_mean" in metrics
    assert np.isfinite(float(metrics["t_mean"]))
    assert float(metrics["masked_frames"]) > 0

    # the partial group's loss == the lone real micro's loss (weight-0 pad
    # excluded, average over the real count of 1) with the same split key
    from f5tts_tpu.models.cfm import cfm_loss

    k0 = jax.random.split(key, 2)[0]
    b3 = batches[2]
    l_single = cfm_loss(state["params"], TINY, k0, jnp.asarray(b3["mel"]),
                        jnp.asarray(b3["text"]), jnp.asarray(b3["lens"]))[0]
    np.testing.assert_allclose(float(metrics["loss"]), float(l_single), atol=1e-5)


@pytest.mark.slow  # default tier keeps one representative per capability
def test_sample_hook_fires_and_writes_files(tmp_path):
    """The periodic sample-synthesis hook (reference trainer.py:341-366
    parity): fires at sample_every cadence from the EMA weights, writes
    generated-mel files (+ wav with a vocoder), logs mel RMS."""
    from f5tts_tpu.models.vocos import VocosConfig, init_vocos
    from f5tts_tpu.train.sample_hook import make_sample_hook, prompts_from_batch

    # fast EMA so the shadow weights move between firings
    cfg = TrainConfig(learning_rate=1e-3, warmup_updates=2, total_updates=100,
                      ema=EMAConfig(update_after_step=0, update_every=1))
    batches = list(synthetic_batches(TINY.model, frames=32, batch=2, n_batches=4))
    prompts = prompts_from_batch(batches[0], k=2)
    assert len(prompts) == 2

    voc_cfg = VocosConfig(input_channels=TINY.model.mel_dim, dim=16, intermediate_dim=32, num_layers=1)
    logged = []
    hook = make_sample_hook(
        TINY, str(tmp_path / "samples"), prompts, nfe_step=2,
        vocoder=(init_vocos(jax.random.PRNGKey(3), voc_cfg), voc_cfg),
        logger=lambda **kw: logged.append(kw), compute_dtype=jnp.float32,
    )
    trainer = Trainer(TINY, cfg, compute_dtype=jnp.float32, save_every=10**9,
                      sample_hook=hook, sample_every=2)
    state, _ = trainer.init_or_resume()
    trainer.fit(state, batches, total_updates=4)

    # fired at steps 2 and 4
    for step in (2, 4):
        for i in range(2):
            mel_f = tmp_path / "samples" / f"step{step}_p{i}.npy"
            wav_f = tmp_path / "samples" / f"step{step}_p{i}.wav"
            assert mel_f.exists() and wav_f.exists()
            gen = np.load(mel_f)
            assert gen.shape[0] > 0 and np.isfinite(gen).all()
    assert [m["step"] for m in logged] == [2, 4]
    assert all(np.isfinite(v) for m in logged for k, v in m.items() if k.startswith("sample_mel_rms"))
    # the two firings differ (weights moved between steps 2 and 4)
    a = np.load(tmp_path / "samples" / "step2_p0.npy")
    b = np.load(tmp_path / "samples" / "step4_p0.npy")
    assert not np.allclose(a, b)


def test_train_cli_smoke_with_sample_hook(tmp_path, monkeypatch):
    """--sample-every wires the hook in the CLI smoke path."""
    from f5tts_tpu.cli import train as train_cli

    monkeypatch.chdir(tmp_path)
    train_cli.main(["--smoke", "--sample-every", "2", "--sample-nfe", "2",
                    "--checkpoint-dir", str(tmp_path / "ck")])
    samples = list((tmp_path / "ck" / "samples").glob("step*_p*.npy"))
    assert samples, "sample hook produced no files"


@pytest.mark.slow  # default tier keeps one representative per capability
def test_adafactor_optimizer_option():
    """TrainConfig(optimizer='adafactor') — the reduced-memory optimizer-state
    option standing in for the reference's bnb 8-bit AdamW
    (model/trainer.py:123-128): a step runs, loss finite, and the optimizer
    state holds strictly fewer bytes than adamw's 2x-params f32 moments."""
    cfg_af = TrainConfig(learning_rate=1e-3, warmup_updates=2, total_updates=100,
                         optimizer="adafactor")
    cfg_adam = TrainConfig(learning_rate=1e-3, warmup_updates=2, total_updates=100)
    batch = next(synthetic_batches(TINY.model, frames=32, batch=2, n_batches=1))
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    db["key"] = jax.random.PRNGKey(1)

    def state_bytes(state):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(state["opt_state"]))

    s_af = init_train_state(jax.random.PRNGKey(0), TINY, cfg_af)
    s_adam = init_train_state(jax.random.PRNGKey(0), TINY, cfg_adam)
    assert state_bytes(s_af) < state_bytes(s_adam)

    step = jax.jit(make_train_step(TINY, cfg_af, compute_dtype=jnp.float32))
    s2, m = step(s_af, db)
    assert np.isfinite(float(m["loss"]))
    moved = any(not np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(s_af["params"]), jax.tree.leaves(s2["params"])))
    assert moved

    with pytest.raises(ValueError, match="optimizer"):
        TrainConfig(optimizer="bnb8bit")
