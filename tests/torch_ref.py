"""Torch golden-reference implementations for numerical parity tests.

These are *test-only* functional re-statements of the reference model math
(``/root/reference/src/server/f5_tts/model/modules.py`` and
``backbones/dit.py``) using torch kernels (SDPA, conv1d, layer_norm), driven by
the SAME parameter pytrees as the JAX implementation (weights are kept in the
JAX layout and transposed here). They stand in for the PyTorch checkpoints the
BASELINE parity contract compares against (no network egress in this
environment), exercising: torch SDPA vs our attention, torch conv1d vs
lax.conv, torch layer_norm vs ours, and the reference's sequential
two-forward CFG Euler loop vs our fused scan.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def t_(x):
    return torch.from_numpy(np.asarray(x)).to(torch.float32)


def linear(p, x):
    y = x @ t_(p["w"])
    if "b" in p:
        y = y + t_(p["b"])
    return y


def conv1d(p, x, groups=1, padding=0, dilation=1):
    w = t_(p["w"]).permute(2, 1, 0)  # (width, in/g, out) -> (out, in/g, width)
    y = F.conv1d(x.transpose(1, 2), w, t_(p["b"]), padding=padding, groups=groups, dilation=dilation)
    return y.transpose(1, 2)


def layer_norm(x, w=None, b=None, eps=1e-6):
    wt = t_(w) if w is not None else None
    bt = t_(b) if b is not None else None
    return F.layer_norm(x, (x.shape[-1],), wt, bt, eps)


def mish(x):
    return x * torch.tanh(F.softplus(x))


# --- positional ----------------------------------------------------------


def rotary_freqs(seq_len, dim_head, theta=10000.0):
    inv = 1.0 / (theta ** (torch.arange(0, dim_head, 2).float() / dim_head))
    f = torch.outer(torch.arange(seq_len).float(), inv)
    return torch.cat([f, f], dim=-1)


def rotate_half(x):
    x1, x2 = x.chunk(2, dim=-1)
    return torch.cat([-x2, x1], dim=-1)


def apply_rotary(x, freqs, scale=1.0):
    rot_dim = freqs.shape[-1]
    xr, xp = x[..., :rot_dim], x[..., rot_dim:]
    xr = xr * freqs.cos() * scale + rotate_half(xr) * freqs.sin() * scale
    return torch.cat([xr, xp], dim=-1)


def precompute_freqs_cis(dim, end, theta=10000.0):
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim))
    angles = torch.outer(torch.arange(end).float(), freqs)
    return torch.cat([angles.cos(), angles.sin()], dim=-1)


# --- blocks --------------------------------------------------------------


def sinus_position_embedding(x, dim, scale=1000.0):
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    emb = torch.exp(torch.arange(half).float() * -emb)
    emb = scale * x.unsqueeze(1) * emb.unsqueeze(0)
    return torch.cat((emb.sin(), emb.cos()), dim=-1)


def timestep_embedding(p, time):
    h = sinus_position_embedding(time, 256)
    return linear(p["mlp2"], F.silu(linear(p["mlp1"], h)))


def grn(gamma, beta, x, mask=None):
    sq = x.square()
    if mask is not None:
        sq = sq.masked_fill(~mask[..., None], 0.0)
    gx = sq.sum(dim=1, keepdim=True).sqrt()
    nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
    return t_(gamma) * (x * nx) + t_(beta) + x


def convnext_v2_block(p, x, mask=None):
    # mask semantics mirror f5tts_tpu.models.modules.convnext_v2_block: valid
    # frames equal the reference's unpadded batch-1 computation at the row's
    # length; padded frames zeroed (GRN's norm is global over positions)
    if mask is not None:
        x = x.masked_fill(~mask[..., None], 0.0)
    h = conv1d(p["dwconv"], x, groups=x.shape[-1], padding=3)
    h = layer_norm(h, p["norm_w"], p["norm_b"])
    h = linear(p["pw1"], h)
    h = F.gelu(h)
    h = grn(p["grn_gamma"], p["grn_beta"], h, mask)
    h = linear(p["pw2"], h)
    out = x + h
    if mask is not None:
        out = out.masked_fill(~mask[..., None], 0.0)
    return out


def conv_pos_embedding(p, x, mask=None):
    # masked between the convs too: batch-1 (unpadded reference) equivalence
    if mask is not None:
        x = x.masked_fill(~mask[..., None], 0.0)
    y = mish(conv1d(p["conv1"], x, groups=16, padding=15))
    if mask is not None:
        y = y.masked_fill(~mask[..., None], 0.0)
    y = mish(conv1d(p["conv2"], y, groups=16, padding=15))
    if mask is not None:
        y = y.masked_fill(~mask[..., None], 0.0)
    return y


def adaln_zero(p, x, emb):
    mod = linear(p["linear"], F.silu(emb))
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mod.chunk(6, dim=1)
    h = layer_norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
    return h, gate_msa, shift_mlp, scale_mlp, gate_mlp


def adaln_zero_final(p, x, emb):
    mod = linear(p["linear"], F.silu(emb))
    scale, shift = mod.chunk(2, dim=1)
    return layer_norm(x) * (1 + scale)[:, None, :] + shift[:, None, :]


def feed_forward(p, x):
    return linear(p["out"], F.gelu(linear(p["in"], x), approximate="tanh"))


def attention(p, x, heads, freqs=None, mask=None):
    b, n, _ = x.shape
    q, k, v = linear(p["to_q"], x), linear(p["to_k"], x), linear(p["to_v"], x)
    if freqs is not None:
        q = apply_rotary(q, freqs)
        k = apply_rotary(k, freqs)
    hd = q.shape[-1] // heads
    q = q.view(b, n, heads, hd).transpose(1, 2)
    k = k.view(b, n, heads, hd).transpose(1, 2)
    v = v.view(b, n, heads, hd).transpose(1, 2)
    attn_mask = None
    if mask is not None:
        attn_mask = mask.unsqueeze(1).unsqueeze(1).expand(b, heads, n, n)
    o = F.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask, is_causal=False)
    o = o.transpose(1, 2).reshape(b, n, heads * hd)
    o = linear(p["to_out"], o)
    if mask is not None:
        o = o.masked_fill(~mask[..., None], 0.0)
    return o


def dit_block(p, x, t_emb, heads, freqs=None, mask=None):
    norm, gate_msa, shift_mlp, scale_mlp, gate_mlp = adaln_zero(p["attn_norm"], x, t_emb)
    x = x + gate_msa.unsqueeze(1) * attention(p["attn"], norm, heads, freqs, mask)
    norm = layer_norm(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    return x + gate_mlp.unsqueeze(1) * feed_forward(p["ff"], norm)


def text_embed(p, cfg, text, seq_len, drop_text=False, mask=None):
    text = text + 1
    text = text[:, :seq_len]
    text = F.pad(text, (0, seq_len - text.shape[1]), value=0)
    if drop_text:
        text = torch.zeros_like(text)
    h = t_(p["embed"]["w"])[text]
    if p["blocks"] is not None:
        table = precompute_freqs_cis(cfg["text_dim"], cfg["max_pos"])
        h = h + table[:seq_len][None]
        n_blocks = p["blocks"]["pw1"]["w"].shape[0]
        for i in range(n_blocks):
            h = convnext_v2_block(_index_tree(p["blocks"], i), h, mask)
    return h


def dit_forward(params, cfg, x, cond, text, time, drop_audio_cond, drop_text, mask=None):
    """Reference-semantics DiT forward (Python-bool drop flags, loop over blocks)."""
    b, n, _ = x.shape
    if time.ndim == 0:
        time = time.repeat(b)
    t_emb = timestep_embedding(params["time_embed"], time)
    te = text_embed(params["text_embed"], cfg, text, n, drop_text, mask)
    if drop_audio_cond:
        cond = torch.zeros_like(cond)
    h = linear(params["input_embed"]["proj"], torch.cat([x, cond, te], dim=-1))
    h = conv_pos_embedding(params["input_embed"]["conv_pos"], h, mask) + h

    freqs = rotary_freqs(n, cfg["dim_head"])
    depth = params["blocks"]["attn"]["to_q"]["w"].shape[0]
    for i in range(depth):
        blk = _index_tree(params["blocks"], i)
        h = dit_block(blk, h, t_emb, cfg["heads"], freqs, mask)
    h = adaln_zero_final(params["norm_out"], h, t_emb)
    return linear(params["proj_out"], h)


def _index_tree(tree, i):
    if isinstance(tree, dict):
        return {k: _index_tree(v, i) for k, v in tree.items()}
    return tree[i]


def rms_norm(p, x, eps=1e-8):
    scale = x.shape[-1] ** 0.5
    normed = x * torch.rsqrt(torch.clamp((x * x).sum(-1, keepdim=True), min=eps)) * scale
    return normed * t_(p["g"])


def unett_forward(params, cfg, x, cond, text, time, drop_audio_cond, drop_text, mask=None):
    """Reference UNetT semantics (unett.py:164-219): time token prepended,
    RMSNorm pre-norm, LIFO U-Net skips with concat+proj."""
    b, n, _ = x.shape
    if time.ndim == 0:
        time = time.repeat(b)
    t_emb = timestep_embedding(params["time_embed"], time)
    te = text_embed(params["text_embed"], cfg, text, n, drop_text, mask)
    if drop_audio_cond:
        cond = torch.zeros_like(cond)
    h = linear(params["input_embed"]["proj"], torch.cat([x, cond, te], dim=-1))
    h = conv_pos_embedding(params["input_embed"]["conv_pos"], h, mask) + h

    h = torch.cat([t_emb.unsqueeze(1), h], dim=1)
    if mask is not None:
        mask = F.pad(mask, (1, 0), value=True)
    freqs = rotary_freqs(n + 1, cfg["dim_head"])

    half = params["first_half"]["attn"]["to_q"]["w"].shape[0]
    skips = []
    for i in range(half):
        blk = _index_tree(params["first_half"], i)
        skips.append(h)
        h = attention(blk["attn"], rms_norm(blk["attn_norm"], h), cfg["heads"], freqs, mask) + h
        h = feed_forward(blk["ff"], rms_norm(blk["ff_norm"], h)) + h
    for i in range(half):
        blk = _index_tree(params["second_half"], i)
        skip = skips.pop()
        if "skip_proj" in blk:
            h = linear(blk["skip_proj"], torch.cat([h, skip], dim=-1))
        h = attention(blk["attn"], rms_norm(blk["attn_norm"], h), cfg["heads"], freqs, mask) + h
        h = feed_forward(blk["ff"], rms_norm(blk["ff_norm"], h)) + h
    h = rms_norm(params["norm_out"], h)[:, 1:, :]
    return linear(params["proj_out"], h)


def mmdit_text_embed(params, cfg, text, drop_text=False):
    text = text + 1
    if drop_text:
        text = torch.zeros_like(text)
    h = t_(params["text_embed"]["w"])[text]
    table = precompute_freqs_cis(cfg["dim"], cfg["text_max_pos"])
    return h + table[: h.shape[1]][None]


def mmdit_forward(params, cfg, x, cond, text, time, drop_audio_cond, drop_text, mask=None):
    """Reference MMDiT semantics (mmdit.py:116-146 + modules.py:456-642)."""
    b, n, _ = x.shape
    if time.ndim == 0:
        time = time.repeat(b)
    t_emb = timestep_embedding(params["time_embed"], time)
    c = mmdit_text_embed(params, cfg, text, drop_text)
    if drop_audio_cond:
        cond = torch.zeros_like(cond)
    h = linear(params["audio_embed"]["proj"], torch.cat([x, cond], dim=-1))
    h = conv_pos_embedding(params["audio_embed"]["conv_pos"], h) + h

    freqs_x = rotary_freqs(n, cfg["dim_head"])
    freqs_c = rotary_freqs(c.shape[1], cfg["dim_head"])
    heads = cfg["heads"]
    nt = c.shape[1]

    def joint_block(p, h, c, pre_only):
        if pre_only:
            norm_c = adaln_zero_final(p["attn_norm_c"], c, t_emb)
        else:
            norm_c, cg, csh, csc, cgm = adaln_zero(p["attn_norm_c"], c, t_emb)
        norm_x, xg, xsh, xsc, xgm = adaln_zero(p["attn_norm_x"], h, t_emb)

        a = p["attn"]
        q = apply_rotary(linear(a["to_q"], norm_x), freqs_x)
        k = apply_rotary(linear(a["to_k"], norm_x), freqs_x)
        v = linear(a["to_v"], norm_x)
        cq = apply_rotary(linear(a["to_q_c"], norm_c), freqs_c)
        ck = apply_rotary(linear(a["to_k_c"], norm_c), freqs_c)
        cv = linear(a["to_v_c"], norm_c)
        q = torch.cat([q, cq], dim=1)
        k = torch.cat([k, ck], dim=1)
        v = torch.cat([v, cv], dim=1)
        hd = q.shape[-1] // heads
        qh = q.view(b, n + nt, heads, hd).transpose(1, 2)
        kh = k.view(b, n + nt, heads, hd).transpose(1, 2)
        vh = v.view(b, n + nt, heads, hd).transpose(1, 2)
        attn_mask = None
        if mask is not None:
            am = F.pad(mask, (0, nt), value=True)
            attn_mask = am.unsqueeze(1).unsqueeze(1).expand(b, heads, n + nt, n + nt)
        o = F.scaled_dot_product_attention(qh, kh, vh, attn_mask=attn_mask, is_causal=False)
        o = o.transpose(1, 2).reshape(b, n + nt, heads * hd)
        xo, co = o[:, :n], o[:, n:]
        xo = linear(a["to_out"], xo)
        if not pre_only:
            co = linear(a["to_out_c"], co)
        if mask is not None:
            xo = xo.masked_fill(~mask[..., None], 0.0)

        if pre_only:
            c_new = None
        else:
            c_new = c + cg.unsqueeze(1) * co
            norm_c2 = layer_norm(c_new) * (1 + csc[:, None]) + csh[:, None]
            c_new = c_new + cgm.unsqueeze(1) * feed_forward(p["ff_c"], norm_c2)
        h_new = h + xg.unsqueeze(1) * xo
        norm_x2 = layer_norm(h_new) * (1 + xsc[:, None]) + xsh[:, None]
        h_new = h_new + xgm.unsqueeze(1) * feed_forward(p["ff_x"], norm_x2)
        return h_new, c_new

    depth_minus1 = params["blocks"]["attn"]["to_q"]["w"].shape[0]
    for i in range(depth_minus1):
        h, c = joint_block(_index_tree(params["blocks"], i), h, c, False)
    h, _ = joint_block(params["final_block"], h, c, True)
    h = adaln_zero_final(params["norm_out"], h, t_emb)
    return linear(params["proj_out"], h)


def convnext_v1_block(p, x):
    h = conv1d(p["dwconv"], x, groups=x.shape[-1], padding=3)
    h = layer_norm(h, p["norm_w"], p["norm_b"])
    h = linear(p["pw1"], h)
    h = F.gelu(h)
    h = linear(p["pw2"], h)
    return x + t_(p["gamma"]) * h


def vocos_decode(params, mel, n_fft=1024, hop=256):
    """Vocos ConvNeXt backbone + ISTFT head, torch.istft as the OLA golden."""
    x = conv1d(params["embed"], mel, padding=3)
    x = layer_norm(x, params["norm_w"], params["norm_b"])
    n_blocks = params["blocks"]["pw1"]["w"].shape[0]
    for i in range(n_blocks):
        x = convnext_v1_block(_index_tree(params["blocks"], i), x)
    x = layer_norm(x, params["final_norm_w"], params["final_norm_b"])
    x = linear(params["head"], x)
    n_freq = n_fft // 2 + 1
    mag, phase = x[..., :n_freq], x[..., n_freq:]
    mag = torch.clip(torch.exp(mag), max=1e2)
    spec = mag * (torch.cos(phase) + 1j * torch.sin(phase))
    window = torch.hann_window(n_fft)
    return torch.istft(spec.transpose(1, 2), n_fft, hop, n_fft, window, center=True)


def euler_cfg_sample(params, cfg, *, cond, cond_mask, attn_mask, text, y0, steps, cfg_strength, sway_coef):
    """Reference CFM.sample semantics: sequential cond/null forwards per step,
    text embedding recomputed in every forward (``cfm.py:162-200``)."""
    t = torch.linspace(0, 1, steps + 1)
    if sway_coef is not None:
        t = t + sway_coef * (torch.cos(torch.pi / 2 * t) - 1 + t)
    step_cond = torch.where(cond_mask[..., None], cond, torch.zeros_like(cond))
    y = y0.clone()
    for k in range(steps):
        tk = t[k]
        pred = dit_forward(params, cfg, y, step_cond, text, tk, False, False, attn_mask)
        if cfg_strength >= 1e-5:
            null_pred = dit_forward(params, cfg, y, step_cond, text, tk, True, True, attn_mask)
            v = pred + (pred - null_pred) * cfg_strength
        else:
            v = pred
        y = y + (t[k + 1] - t[k]) * v
    return torch.where(cond_mask[..., None], cond, y)
