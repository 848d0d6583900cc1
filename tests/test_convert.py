"""Checkpoint converter round-trip: reference-layout torch state dicts -> our
pytrees, including EMA-prefix stripping and buffer dropping
(``infer/utils_infer.py:175-218`` contract)."""

import numpy as np

import jax
import jax.numpy as jnp

from f5tts_tpu.models.convert import convert_f5_dit, convert_vocos, strip_ema
from f5tts_tpu.models.dit import DiTConfig, dit_forward, init_dit
from f5tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode

TINY = DiTConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
    text_num_embeds=30, text_dim=32, conv_layers=2, max_pos=256,
)


def export_f5_state_dict(params, cfg: DiTConfig) -> dict[str, np.ndarray]:
    """Inverse of convert_f5_dit: write our pytree in the reference's torch
    key/shape layout (Linear (out,in), Conv1d (out,in/g,k), GRN (1,1,d))."""
    sd = {}

    def lin(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).T
        if "b" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def conv(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).transpose(2, 1, 0)
        sd[f"{prefix}.bias"] = np.asarray(p["b"])

    t = "transformer"
    lin(f"{t}.time_embed.time_mlp.0", params["time_embed"]["mlp1"])
    lin(f"{t}.time_embed.time_mlp.2", params["time_embed"]["mlp2"])
    sd[f"{t}.text_embed.text_embed.weight"] = np.asarray(params["text_embed"]["embed"]["w"])
    for i in range(cfg.conv_layers):
        blk = jax.tree.map(lambda x: x[i], params["text_embed"]["blocks"])
        conv(f"{t}.text_embed.text_blocks.{i}.dwconv", blk["dwconv"])
        sd[f"{t}.text_embed.text_blocks.{i}.norm.weight"] = np.asarray(blk["norm_w"])
        sd[f"{t}.text_embed.text_blocks.{i}.norm.bias"] = np.asarray(blk["norm_b"])
        lin(f"{t}.text_embed.text_blocks.{i}.pwconv1", blk["pw1"])
        sd[f"{t}.text_embed.text_blocks.{i}.grn.gamma"] = np.asarray(blk["grn_gamma"]).reshape(1, 1, -1)
        sd[f"{t}.text_embed.text_blocks.{i}.grn.beta"] = np.asarray(blk["grn_beta"]).reshape(1, 1, -1)
        lin(f"{t}.text_embed.text_blocks.{i}.pwconv2", blk["pw2"])
    lin(f"{t}.input_embed.proj", params["input_embed"]["proj"])
    conv(f"{t}.input_embed.conv_pos_embed.conv1d.0", params["input_embed"]["conv_pos"]["conv1"])
    conv(f"{t}.input_embed.conv_pos_embed.conv1d.2", params["input_embed"]["conv_pos"]["conv2"])
    for i in range(cfg.depth):
        blk = jax.tree.map(lambda x: x[i], params["blocks"])
        lin(f"{t}.transformer_blocks.{i}.attn_norm.linear", blk["attn_norm"]["linear"])
        for nm in ("to_q", "to_k", "to_v"):
            lin(f"{t}.transformer_blocks.{i}.attn.{nm}", blk["attn"][nm])
        lin(f"{t}.transformer_blocks.{i}.attn.to_out.0", blk["attn"]["to_out"])
        lin(f"{t}.transformer_blocks.{i}.ff.ff.0.0", blk["ff"]["in"])
        lin(f"{t}.transformer_blocks.{i}.ff.ff.2", blk["ff"]["out"])
    lin(f"{t}.norm_out.linear", params["norm_out"]["linear"])
    lin(f"{t}.proj_out", params["proj_out"])
    return sd


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
