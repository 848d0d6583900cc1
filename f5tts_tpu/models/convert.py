"""Torch-checkpoint converters: F5-TTS / IndicF5 CFM and Vocos layouts -> JAX pytrees.

Covers the reference's checkpoint contract (``infer/utils_infer.py:175-218``):
``.pt`` (full trainer state or bare) and ``.safetensors``; EMA weights stored
as ``ema_model.*`` with ``initted``/``step`` bookkeeping keys; stale
mel-filterbank buffer keys dropped. Key layout documented from
``model/backbones/dit.py`` / ``model/modules.py`` module names.

Torch tensors -> our layouts: Linear ``(out,in)`` -> ``(in,out)``; Conv1d
``(out,in/g,k)`` -> ``(k,in/g,out)``; GRN ``(1,1,d)`` -> ``(d,)``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from f5tts_tpu.models.dit import DiTConfig
from f5tts_tpu.models.vocos import VocosConfig


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a ``.pt``/``.ckpt`` (torch) or ``.safetensors`` file to numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "ema_model_state_dict" in ckpt:
        ckpt = ckpt["ema_model_state_dict"]
    elif isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    return {k: v.float().numpy() for k, v in ckpt.items() if hasattr(v, "numpy")}


def strip_ema(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """``ema_model.*`` -> bare keys; drop EMA bookkeeping and stale mel buffers
    (``utils_infer.py:195-207``)."""
    if any(k.startswith("ema_model.") for k in sd):
        sd = {k.replace("ema_model.", ""): v for k, v in sd.items() if k not in ("initted", "step")}
    for key in list(sd):
        if key.startswith("mel_spec.") or key in ("initted", "step"):
            sd.pop(key)
    return sd


def _lin(sd, prefix, bias=True):
    p = {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = sd[f"{prefix}.bias"]
    return p


def _conv(sd, prefix):
    return {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 1, 0)), "b": sd[f"{prefix}.bias"]}


def _stack(trees):
    import jax

    return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *trees)


def _convnext_block_from(sd, prefix):
    return {
        "dwconv": _conv(sd, f"{prefix}.dwconv"),
        "norm_w": sd[f"{prefix}.norm.weight"],
        "norm_b": sd[f"{prefix}.norm.bias"],
        "pw1": _lin(sd, f"{prefix}.pwconv1"),
        "grn_gamma": sd[f"{prefix}.grn.gamma"].reshape(-1),
        "grn_beta": sd[f"{prefix}.grn.beta"].reshape(-1),
        "pw2": _lin(sd, f"{prefix}.pwconv2"),
    }


def convert_f5_dit(sd: dict[str, np.ndarray], cfg: DiTConfig) -> dict:
    """Bare CFM state dict (keys ``transformer.*``) -> ``init_dit`` pytree."""
    sd = strip_ema(dict(sd))
    t = "transformer"
    params = {
        "time_embed": {
            "mlp1": _lin(sd, f"{t}.time_embed.time_mlp.0"),
            "mlp2": _lin(sd, f"{t}.time_embed.time_mlp.2"),
        },
        "text_embed": {
            "embed": {"w": sd[f"{t}.text_embed.text_embed.weight"]},
            "blocks": _stack(
                [_convnext_block_from(sd, f"{t}.text_embed.text_blocks.{i}") for i in range(cfg.conv_layers)]
            )
            if cfg.conv_layers > 0
            else None,
        },
        "input_embed": {
            "proj": _lin(sd, f"{t}.input_embed.proj"),
            "conv_pos": {
                "conv1": _conv(sd, f"{t}.input_embed.conv_pos_embed.conv1d.0"),
                "conv2": _conv(sd, f"{t}.input_embed.conv_pos_embed.conv1d.2"),
            },
        },
        "blocks": _stack(
            [
                {
                    "attn_norm": {"linear": _lin(sd, f"{t}.transformer_blocks.{i}.attn_norm.linear")},
                    "attn": {
                        "to_q": _lin(sd, f"{t}.transformer_blocks.{i}.attn.to_q"),
                        "to_k": _lin(sd, f"{t}.transformer_blocks.{i}.attn.to_k"),
                        "to_v": _lin(sd, f"{t}.transformer_blocks.{i}.attn.to_v"),
                        "to_out": _lin(sd, f"{t}.transformer_blocks.{i}.attn.to_out.0"),
                    },
                    "ff": {
                        "in": _lin(sd, f"{t}.transformer_blocks.{i}.ff.ff.0.0"),
                        "out": _lin(sd, f"{t}.transformer_blocks.{i}.ff.ff.2"),
                    },
                }
                for i in range(cfg.depth)
            ]
        ),
        "norm_out": {"linear": _lin(sd, f"{t}.norm_out.linear")},
        "proj_out": _lin(sd, f"{t}.proj_out"),
    }
    if cfg.long_skip_connection:
        params["long_skip"] = _lin(sd, f"{t}.long_skip_connection", bias=False)
    return _to_jnp(params)


def convert_e2_unett(sd: dict[str, np.ndarray], cfg) -> dict:
    """E2-TTS (UNetT) state dict -> ``init_unett`` pytree.

    Reference layout (``model/backbones/unett.py:130-162``): blocks are
    ``transformer.layers.{i}.{0..4}`` = [skip_proj | absent, RMSNorm(g), attn,
    RMSNorm(g), ff]; skip_proj exists only in the later half when
    ``skip_connect_type == 'concat'``.
    """
    sd = strip_ema(dict(sd))
    t = "transformer"
    half = cfg.depth // 2

    def half_block(i: int, with_skip: bool):
        p = {
            "attn_norm": {"g": sd[f"{t}.layers.{i}.1.g"]},
            "attn": {
                "to_q": _lin(sd, f"{t}.layers.{i}.2.to_q"),
                "to_k": _lin(sd, f"{t}.layers.{i}.2.to_k"),
                "to_v": _lin(sd, f"{t}.layers.{i}.2.to_v"),
                "to_out": _lin(sd, f"{t}.layers.{i}.2.to_out.0"),
            },
            "ff_norm": {"g": sd[f"{t}.layers.{i}.3.g"]},
            "ff": {"in": _lin(sd, f"{t}.layers.{i}.4.ff.0.0"), "out": _lin(sd, f"{t}.layers.{i}.4.ff.2")},
        }
        if with_skip:
            p["skip_proj"] = _lin(sd, f"{t}.layers.{i}.0", bias=False)
        return p

    needs_skip = cfg.skip_connect_type == "concat"
    params = {
        "time_embed": {
            "mlp1": _lin(sd, f"{t}.time_embed.time_mlp.0"),
            "mlp2": _lin(sd, f"{t}.time_embed.time_mlp.2"),
        },
        "text_embed": {
            "embed": {"w": sd[f"{t}.text_embed.text_embed.weight"]},
            "blocks": _stack(
                [_convnext_block_from(sd, f"{t}.text_embed.text_blocks.{i}") for i in range(cfg.conv_layers)]
            )
            if cfg.conv_layers > 0
            else None,
        },
        "input_embed": {
            "proj": _lin(sd, f"{t}.input_embed.proj"),
            "conv_pos": {
                "conv1": _conv(sd, f"{t}.input_embed.conv_pos_embed.conv1d.0"),
                "conv2": _conv(sd, f"{t}.input_embed.conv_pos_embed.conv1d.2"),
            },
        },
        "first_half": _stack([half_block(i, False) for i in range(half)]),
        "second_half": _stack([half_block(half + i, needs_skip) for i in range(half)]),
        "norm_out": {"g": sd[f"{t}.norm_out.g"]},
        "proj_out": _lin(sd, f"{t}.proj_out"),
    }
    return _to_jnp(params)


def convert_mmdit(sd: dict[str, np.ndarray], cfg) -> dict:
    """MMDiT state dict -> ``init_mmdit`` pytree.

    Reference layout (``model/backbones/mmdit.py:76-146`` + ``modules.py:578-642``):
    ``transformer_blocks.{i}.{attn_norm_c,attn_norm_x}.linear``, joint attention
    ``attn.{to_q,to_k,to_v,to_q_c,to_k_c,to_v_c,to_out.0,to_out_c}``, dual FFNs
    ``ff_{c,x}.ff.{0.0,2}``; the last block is ``context_pre_only`` (final-style
    AdaLN on c, no ``ff_c``/``to_out_c``).
    """
    sd = strip_ema(dict(sd))
    t = "transformer"

    def block(i: int, pre_only: bool):
        base = f"{t}.transformer_blocks.{i}"
        attn = {
            name: _lin(sd, f"{base}.attn.{name}")
            for name in ("to_q", "to_k", "to_v", "to_q_c", "to_k_c", "to_v_c")
        }
        attn["to_out"] = _lin(sd, f"{base}.attn.to_out.0")
        p = {
            "attn_norm_c": {"linear": _lin(sd, f"{base}.attn_norm_c.linear")},
            "attn_norm_x": {"linear": _lin(sd, f"{base}.attn_norm_x.linear")},
            "attn": attn,
            "ff_x": {"in": _lin(sd, f"{base}.ff_x.ff.0.0"), "out": _lin(sd, f"{base}.ff_x.ff.2")},
        }
        if not pre_only:
            p["attn"]["to_out_c"] = _lin(sd, f"{base}.attn.to_out_c")
            p["ff_c"] = {"in": _lin(sd, f"{base}.ff_c.ff.0.0"), "out": _lin(sd, f"{base}.ff_c.ff.2")}
        return p

    params = {
        "time_embed": {
            "mlp1": _lin(sd, f"{t}.time_embed.time_mlp.0"),
            "mlp2": _lin(sd, f"{t}.time_embed.time_mlp.2"),
        },
        "text_embed": {"w": sd[f"{t}.text_embed.text_embed.weight"]},
        "audio_embed": {
            "proj": _lin(sd, f"{t}.audio_embed.linear"),
            "conv_pos": {
                "conv1": _conv(sd, f"{t}.audio_embed.conv_pos_embed.conv1d.0"),
                "conv2": _conv(sd, f"{t}.audio_embed.conv_pos_embed.conv1d.2"),
            },
        },
        "blocks": _stack([block(i, False) for i in range(cfg.depth - 1)]),
        "final_block": block(cfg.depth - 1, True),
        "norm_out": {"linear": _lin(sd, f"{t}.norm_out.linear")},
        "proj_out": _lin(sd, f"{t}.proj_out"),
    }
    return _to_jnp(params)


def convert_vocos(sd: dict[str, np.ndarray], cfg: VocosConfig = VocosConfig()) -> dict:
    """``charactr/vocos-mel-24khz`` state dict -> ``init_vocos`` pytree."""
    params = {
        "embed": _conv(sd, "backbone.embed"),
        "norm_w": sd["backbone.norm.weight"],
        "norm_b": sd["backbone.norm.bias"],
        "blocks": _stack(
            [
                {
                    "dwconv": _conv(sd, f"backbone.convnext.{i}.dwconv"),
                    "norm_w": sd[f"backbone.convnext.{i}.norm.weight"],
                    "norm_b": sd[f"backbone.convnext.{i}.norm.bias"],
                    "pw1": _lin(sd, f"backbone.convnext.{i}.pwconv1"),
                    "pw2": _lin(sd, f"backbone.convnext.{i}.pwconv2"),
                    "gamma": sd[f"backbone.convnext.{i}.gamma"].reshape(-1),
                }
                for i in range(cfg.num_layers)
            ]
        ),
        "final_norm_w": sd["backbone.final_layer_norm.weight"],
        "final_norm_b": sd["backbone.final_layer_norm.bias"],
        "head": _lin(sd, "head.out"),
    }
    return _to_jnp(params)


def _to_jnp(tree):
    import jax

    return jax.tree.map(lambda x: jnp.asarray(x, dtype=jnp.float32), tree)


def export_f5_state_dict(params, cfg: DiTConfig) -> dict[str, np.ndarray]:
    """Inverse of ``convert_f5_dit``: write our pytree in the reference's torch
    key/shape layout (Linear (out,in), Conv1d (out,in/g,k), GRN (1,1,d)) so
    checkpoints trained here load into the PyTorch implementation."""
    sd: dict[str, np.ndarray] = {}

    def lin(prefix, p):
        sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
        if "b" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def conv(prefix, p):
        sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).transpose(2, 1, 0))
        sd[f"{prefix}.bias"] = np.asarray(p["b"])

    import jax

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
    if cfg.long_skip_connection and "long_skip" in params:
        lin(f"{t}.long_skip_connection", params["long_skip"])
    return sd


def save_f5_safetensors(path: str, params, cfg: DiTConfig) -> None:
    """Write an inference checkpoint consumable by the reference
    (``load_checkpoint`` treats bare safetensors as EMA weights,
    ``utils_infer.py:196-198``)."""
    from safetensors.numpy import save_file

    sd = {k: v.astype(np.float32) for k, v in export_f5_state_dict(params, cfg).items()}
    save_file(sd, path)


def save_params_npz(path: str, params: dict) -> None:
    """Native inference-checkpoint format: the params pytree (pure nested
    dicts of arrays) flattened to '/'-joined keys in one ``.npz``. Converting
    a torch checkpoint once and serving the ``.npz`` skips the per-start
    key-mapping/transpose work (``f5tpu-convert``)."""
    flat: dict[str, np.ndarray] = {}

    def rec(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree)

    rec("", params)
    np.savez(path, **flat)


def load_params_npz(path: str) -> dict:
    """Inverse of ``save_params_npz``."""
    out: dict = {}
    with np.load(path) as data:
        for key in data.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[key]
    return out


def load_trained_checkpoint(directory: str, model_cfg, use_ema: bool = True,
                            step: int | None = None) -> dict:
    """Backbone params from a checkpoint directory written by THIS framework's
    Trainer (orbax full-state: params/opt_state/ema/step) — so a model trained
    here can be served here without a torch round trip. EMA weights by default,
    matching how the reference serves its checkpoints (``utils_infer.py:187-213``
    strips the ``ema_model.`` prefix off torch checkpoints for the same reason).

    ``model_cfg`` is the backbone config (DiTConfig/UNetTConfig) or a CFMConfig
    wrapping one; it must match the trained geometry."""
    import jax

    from f5tts_tpu.models.cfm import CFMConfig
    from f5tts_tpu.train.checkpoint import latest_step, restore_state
    from f5tts_tpu.train.trainer import TrainConfig, init_train_state

    step = latest_step(directory) if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint steps under {directory!r}")
    cfm_cfg = model_cfg if isinstance(model_cfg, CFMConfig) else CFMConfig(model=model_cfg)
    template = init_train_state(jax.random.PRNGKey(0), cfm_cfg, TrainConfig())
    state = restore_state(directory, step, template)
    return state["ema"] if use_ema else state["params"]


def load_f5_checkpoint(path: str, cfg: DiTConfig) -> dict:
    """torch ``.pt``/``.safetensors`` file, a pre-converted native ``.npz``
    (``f5tpu-convert``), or a directory written by this framework's Trainer
    (orbax) — all land on the same pytree layout."""
    import os

    if os.path.isdir(path):
        return load_trained_checkpoint(path, cfg)
    if path.endswith(".npz"):
        return load_params_npz(path)
    return convert_f5_dit(load_torch_state_dict(path), cfg)


def load_vocos_checkpoint(path: str, cfg: VocosConfig = VocosConfig()) -> dict:
    if path.endswith(".npz"):
        return load_params_npz(path)
    return convert_vocos(load_torch_state_dict(path), cfg)
