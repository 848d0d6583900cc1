"""Checkpoint converter round-trip: reference-layout torch state dicts -> our
pytrees, including EMA-prefix stripping and buffer dropping
(``infer/utils_infer.py:175-218`` contract)."""

import numpy as np

import jax
import jax.numpy as jnp

from f5tts_tpu.models.convert import convert_f5_dit, convert_vocos, export_f5_state_dict, strip_ema
from f5tts_tpu.models.dit import DiTConfig, dit_forward, init_dit
from f5tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode

TINY = DiTConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
    text_num_embeds=30, text_dim=32, conv_layers=2, max_pos=256,
)


def test_f5_converter_roundtrip():
    params = init_dit(jax.random.PRNGKey(0), TINY)
    sd = export_f5_state_dict(params, TINY)
    # simulate an EMA checkpoint with bookkeeping + stale mel buffers
    sd_ema = {f"ema_model.{k}": v for k, v in sd.items()}
    sd_ema["initted"] = np.ones(1)
    sd_ema["step"] = np.ones(1)
    sd_ema["ema_model.mel_spec.mel_stft.spectrogram.window"] = np.ones(1024)

    converted = convert_f5_dit(sd_ema, TINY)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(converted)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # and the converted params produce identical forwards
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 24, TINY.mel_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 20, (2, 8)), jnp.int32)
    f = jnp.zeros((2,), bool)
    t = jnp.asarray([0.5, 0.5], jnp.float32)
    o1 = dit_forward(params, TINY, x, x, text, t, f, f)
    o2 = dit_forward(converted, TINY, x, x, text, t, f, f)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_vocos_converter_roundtrip():
    cfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64, num_layers=2)
    params = init_vocos(jax.random.PRNGKey(1), cfg)
    sd = {}
    sd["backbone.embed.weight"] = np.asarray(params["embed"]["w"]).transpose(2, 1, 0)
    sd["backbone.embed.bias"] = np.asarray(params["embed"]["b"])
    sd["backbone.norm.weight"] = np.asarray(params["norm_w"])
    sd["backbone.norm.bias"] = np.asarray(params["norm_b"])
    for i in range(cfg.num_layers):
        blk = jax.tree.map(lambda x: x[i], params["blocks"])
        sd[f"backbone.convnext.{i}.dwconv.weight"] = np.asarray(blk["dwconv"]["w"]).transpose(2, 1, 0)
        sd[f"backbone.convnext.{i}.dwconv.bias"] = np.asarray(blk["dwconv"]["b"])
        sd[f"backbone.convnext.{i}.norm.weight"] = np.asarray(blk["norm_w"])
        sd[f"backbone.convnext.{i}.norm.bias"] = np.asarray(blk["norm_b"])
        sd[f"backbone.convnext.{i}.pwconv1.weight"] = np.asarray(blk["pw1"]["w"]).T
        sd[f"backbone.convnext.{i}.pwconv1.bias"] = np.asarray(blk["pw1"]["b"])
        sd[f"backbone.convnext.{i}.pwconv2.weight"] = np.asarray(blk["pw2"]["w"]).T
        sd[f"backbone.convnext.{i}.pwconv2.bias"] = np.asarray(blk["pw2"]["b"])
        sd[f"backbone.convnext.{i}.gamma"] = np.asarray(blk["gamma"])
    sd["backbone.final_layer_norm.weight"] = np.asarray(params["final_norm_w"])
    sd["backbone.final_layer_norm.bias"] = np.asarray(params["final_norm_b"])
    sd["head.out.weight"] = np.asarray(params["head"]["w"]).T
    sd["head.out.bias"] = np.asarray(params["head"]["b"])

    converted = convert_vocos(sd, cfg)
    mel = jnp.asarray(np.random.default_rng(2).standard_normal((1, 16, 20)), jnp.float32)
    o1 = vocos_decode(params, mel, cfg)
    o2 = vocos_decode(converted, mel, cfg)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_strip_ema():
    sd = {"ema_model.a": np.ones(2), "initted": np.ones(1), "step": np.ones(1), "mel_spec.x": np.ones(1)}
    out = strip_ema(sd)
    assert set(out) == {"a"}


def test_convert_e2_unett_key_mapping():
    """E2/UNetT torch layout (`model/backbones/unett.py:130-162`:
    layers.{i}.[0=skip_proj|None, 1=attn_norm, 2=attn, 3=ff_norm, 4=ff]) lands
    in the right pytree slots with the right transposes."""
    from f5tts_tpu.models.convert import convert_e2_unett
    from f5tts_tpu.models.unett import UNetTConfig, init_unett, unett_forward

    cfg = UNetTConfig(dim=16, depth=4, heads=2, dim_head=8, ff_mult=2, mel_dim=6,
                      text_num_embeds=11, text_dim=8, conv_layers=1, max_pos=64)
    rng = np.random.default_rng(3)
    sd = {}

    def lin(prefix, din, dout, bias=True):
        sd[prefix + ".weight"] = rng.standard_normal((dout, din)).astype(np.float32)
        if bias:
            sd[prefix + ".bias"] = rng.standard_normal(dout).astype(np.float32)

    t = "transformer"
    lin(f"{t}.time_embed.time_mlp.0", 256, 16)
    lin(f"{t}.time_embed.time_mlp.2", 16, 16)
    sd[f"{t}.text_embed.text_embed.weight"] = rng.standard_normal((12, 8)).astype(np.float32)
    cb = f"{t}.text_embed.text_blocks.0"
    sd[f"{cb}.dwconv.weight"] = rng.standard_normal((8, 1, 7)).astype(np.float32)
    sd[f"{cb}.dwconv.bias"] = rng.standard_normal(8).astype(np.float32)
    sd[f"{cb}.norm.weight"] = rng.standard_normal(8).astype(np.float32)
    sd[f"{cb}.norm.bias"] = rng.standard_normal(8).astype(np.float32)
    lin(f"{cb}.pwconv1", 8, 16)
    sd[f"{cb}.grn.gamma"] = rng.standard_normal((1, 1, 16)).astype(np.float32)
    sd[f"{cb}.grn.beta"] = rng.standard_normal((1, 1, 16)).astype(np.float32)
    lin(f"{cb}.pwconv2", 16, 8)
    lin(f"{t}.input_embed.proj", 6 * 2 + 8, 16)
    for c in (0, 2):
        sd[f"{t}.input_embed.conv_pos_embed.conv1d.{c}.weight"] = rng.standard_normal((16, 1, 31)).astype(np.float32)
        sd[f"{t}.input_embed.conv_pos_embed.conv1d.{c}.bias"] = rng.standard_normal(16).astype(np.float32)
    for i in range(4):
        if i >= 2:  # later half: skip_proj at slot 0 (first half stores None -> no keys)
            lin(f"{t}.layers.{i}.0", 32, 16, bias=False)
        sd[f"{t}.layers.{i}.1.g"] = rng.standard_normal(16).astype(np.float32)
        for nm in ("to_q", "to_k", "to_v"):
            lin(f"{t}.layers.{i}.2.{nm}", 16, 16)
        lin(f"{t}.layers.{i}.2.to_out.0", 16, 16)
        sd[f"{t}.layers.{i}.3.g"] = rng.standard_normal(16).astype(np.float32)
        lin(f"{t}.layers.{i}.4.ff.0.0", 16, 32)
        lin(f"{t}.layers.{i}.4.ff.2", 32, 16)
    sd[f"{t}.norm_out.g"] = rng.standard_normal(16).astype(np.float32)
    lin(f"{t}.proj_out", 16, 6)

    params = convert_e2_unett(dict(sd), cfg)

    # structure matches random init exactly
    ref_tree = init_unett(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(params) == jax.tree.structure(ref_tree)

    # linears transposed, stacking order = layer order, skip_proj only in half 2
    np.testing.assert_array_equal(
        np.asarray(params["first_half"]["attn"]["to_q"]["w"][1]), sd[f"{t}.layers.1.2.to_q.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(params["second_half"]["skip_proj"]["w"][0]), sd[f"{t}.layers.2.0.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(params["second_half"]["ff"]["in"]["w"][1]), sd[f"{t}.layers.3.4.ff.0.0.weight"].T)
    np.testing.assert_array_equal(np.asarray(params["norm_out"]["g"]), sd[f"{t}.norm_out.g"])
    assert "skip_proj" not in params["first_half"]

    # converted params run end-to-end
    x = jnp.asarray(rng.standard_normal((1, 12, 6)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 11, (1, 5)), jnp.int32)
    out = unett_forward(params, cfg, x, x, text, jnp.asarray([0.4], jnp.float32),
                        jnp.zeros((1,), bool), jnp.zeros((1,), bool))
    assert out.shape == (1, 12, 6) and bool(jnp.isfinite(out).all())


def test_params_npz_round_trip(tmp_path):
    """Native .npz inference format: flatten/unflatten is exact, and the
    .npz branch of load_f5_checkpoint returns the identical pytree."""
    import jax

    from f5tts_tpu.models.convert import load_f5_checkpoint, load_params_npz, save_params_npz
    from f5tts_tpu.models.dit import DiTConfig, init_dit

    cfg = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=8,
                    text_num_embeds=16, text_dim=16, conv_layers=1, max_pos=64)
    params = init_dit(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "model.npz")
    save_params_npz(path, params)

    back = load_params_npz(path)
    assert jax.tree.structure(jax.tree.map(lambda x: 0, back)) == \
        jax.tree.structure(jax.tree.map(lambda x: 0, params))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    via_loader = load_f5_checkpoint(path, cfg)
    np.testing.assert_array_equal(
        jax.tree.leaves(via_loader)[0], jax.tree.leaves(params)[0])
