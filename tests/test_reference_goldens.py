"""Goldens against the ACTUAL reference code (VERDICT round-1 items #1/#3).

Every test here instantiates the real classes from
``/root/reference/src/server/f5_tts/model`` (via ``reference_runtime``, which
stubs only the absent pip deps), seeds them, and compares against this
framework's forward/sampler/converters. Unlike ``torch_ref.py`` — our own
re-statement of the math — a shared misreading of the reference cannot pass
these: the reference's own ``DiT``/``UNetT``/``MMDiT``/``CFM`` modules produce
the expected values.

Covered reference surfaces: ``model/backbones/dit.py:93-163``,
``unett.py:96-219``, ``mmdit.py:76-146``, ``model/cfm.py:81-210`` (full guided
sample, single Euler step, speech-edit mask), the checkpoint layouts of
``infer/utils_infer.py:175-218`` (trainer ``.pt`` with ``ema_model.*`` +
stale mel buffers; bare-EMA ``.safetensors``), the reverse direction (our
``export_f5_state_dict`` loading into the reference module strictly), and the
tokenizer contract (``model/utils.py:88-131``).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_runtime import load_reference, state_dict_to_numpy

from f5tts_tpu.models.convert import (
    convert_e2_unett,
    convert_f5_dit,
    convert_mmdit,
    export_f5_state_dict,
    load_f5_checkpoint,
)
from f5tts_tpu.models.dit import DiTConfig, dit_forward
from f5tts_tpu.models.mmdit import MMDiTConfig, mmdit_forward
from f5tts_tpu.models.unett import UNetTConfig, unett_forward
from f5tts_tpu.sampling.euler import SamplerConfig, sample_cfm

ref = load_reference()

TINY = dict(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
            text_num_embeds=30, text_dim=32, conv_layers=2)
TINY_CFG = DiTConfig(**TINY)

MEL_KW = dict(n_fft=256, hop_length=64, win_length=256, n_mel_channels=20,
              target_sample_rate=24_000, mel_spec_type="vocos")


def make_ref_cfm(seed=0, method="euler"):
    torch.manual_seed(seed)
    transformer = ref.DiT(**TINY)
    cfm = ref.CFM(transformer=transformer, mel_spec_kwargs=MEL_KW,
                  odeint_kwargs=dict(method=method))
    cfm.eval()
    return cfm


@pytest.fixture(scope="module")
def ref_cfm():
    return make_ref_cfm()


@pytest.fixture(scope="module")
def jax_params(ref_cfm):
    return convert_f5_dit(state_dict_to_numpy(ref_cfm), TINY_CFG)


def make_inputs(rng, b=2, n=40, nt=18, zero_padded=True):
    """Random forward inputs. ``zero_padded=True`` zeroes x/cond past each
    row's mask: the reference does NOT mask its conv-pos embedding
    (``dit.py:86`` passes no mask), so nonzero padding would leak into valid
    frames there — a batched-mode quirk the reference itself flags
    ("still some difference maybe due to convolutional layers",
    ``cfm.py:179-180``). Our design masks conv-pos, which reproduces the
    reference's *batch-1* semantics (zero conv padding at the row boundary)
    for every row of a bucket; parity on valid frames holds exactly when the
    padded inputs are zero, as they are at step 0 of the real sampler."""
    x = rng.standard_normal((b, n, TINY["mel_dim"])).astype(np.float32)
    cond = rng.standard_normal((b, n, TINY["mel_dim"])).astype(np.float32)
    text = rng.integers(0, TINY["text_num_embeds"], (b, nt)).astype(np.int64)
    text[1, 12:] = -1
    time = np.array([0.3, 0.7], dtype=np.float32)
    mask = np.ones((b, n), dtype=bool)
    mask[1, 30:] = False
    if zero_padded:
        x = np.where(mask[..., None], x, 0.0)
        cond = np.where(mask[..., None], cond, 0.0)
    return x, cond, text, time, mask


def test_dit_forward_vs_reference(ref_cfm, jax_params):
    """Masked (bucketed) forward: every row must equal the reference run
    UNPADDED at that row's exact length — the reference's batch-1 serving
    semantics (see make_inputs docstring for why reference-batched is not the
    right golden)."""
    x, cond, text, time, mask = make_inputs(np.random.default_rng(0))
    durs = mask.sum(axis=1)
    for drop_a, drop_t in [(False, False), (True, True), (True, False)]:
        got = np.asarray(dit_forward(
            jax_params, TINY_CFG, jnp.asarray(x), jnp.asarray(cond),
            jnp.asarray(text, jnp.int32), jnp.asarray(time),
            jnp.full((2,), drop_a), jnp.full((2,), drop_t), jnp.asarray(mask),
        ))
        for r in range(2):
            d = int(durs[r])
            with torch.no_grad():
                want_r = ref_cfm.transformer(
                    x=torch.from_numpy(x[r:r + 1, :d]), cond=torch.from_numpy(cond[r:r + 1, :d]),
                    text=torch.from_numpy(text[r:r + 1]), time=torch.from_numpy(time[r:r + 1]),
                    drop_audio_cond=drop_a, drop_text=drop_t, mask=None,
                ).numpy()[0]
            np.testing.assert_allclose(got[r, :d], want_r, atol=5e-4, rtol=1e-4)


def test_dit_forward_vs_reference_unmasked(ref_cfm, jax_params):
    """mask=None (the reference's batch-1 serving path, cfm.py:151-154)."""
    x, cond, text, time, _ = make_inputs(np.random.default_rng(3), zero_padded=False)
    with torch.no_grad():
        want = ref_cfm.transformer(
            x=torch.from_numpy(x), cond=torch.from_numpy(cond),
            text=torch.from_numpy(text), time=torch.from_numpy(time),
            drop_audio_cond=False, drop_text=False, mask=None,
        ).numpy()
    got = np.asarray(dit_forward(
        jax_params, TINY_CFG, jnp.asarray(x), jnp.asarray(cond),
        jnp.asarray(text, jnp.int32), jnp.asarray(time),
        jnp.zeros((2,), bool), jnp.zeros((2,), bool), None,
    ))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_unett_forward_vs_reference():
    torch.manual_seed(1)
    cfg = UNetTConfig(dim=64, depth=4, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
                      text_num_embeds=30, text_dim=32, conv_layers=2,
                      skip_connect_type="concat")
    model = ref.UNetT(dim=64, depth=4, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
                      text_num_embeds=30, text_dim=32, conv_layers=2,
                      skip_connect_type="concat")
    model.eval()
    sd = {f"transformer.{k}": v for k, v in state_dict_to_numpy(model).items()}
    params = convert_e2_unett(sd, cfg)

    x, cond, text, time, mask = make_inputs(np.random.default_rng(1))
    durs = mask.sum(axis=1)
    got = np.asarray(unett_forward(
        params, cfg, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text, jnp.int32),
        jnp.asarray(time), jnp.zeros((2,), bool), jnp.zeros((2,), bool), jnp.asarray(mask),
    ))
    for r in range(2):
        d = int(durs[r])
        with torch.no_grad():
            want_r = model(
                x=torch.from_numpy(x[r:r + 1, :d]), cond=torch.from_numpy(cond[r:r + 1, :d]),
                text=torch.from_numpy(text[r:r + 1]), time=torch.from_numpy(time[r:r + 1]),
                drop_audio_cond=False, drop_text=False, mask=None,
            ).numpy()[0]
        np.testing.assert_allclose(got[r, :d], want_r, atol=5e-4, rtol=1e-4)


def test_mmdit_forward_vs_reference():
    torch.manual_seed(2)
    cfg = MMDiTConfig(dim=64, depth=3, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
                      text_num_embeds=30)
    model = ref.MMDiT(dim=64, depth=3, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
                      text_num_embeds=30)
    model.eval()
    sd = {f"transformer.{k}": v for k, v in state_dict_to_numpy(model).items()}
    params = convert_mmdit(sd, cfg)

    x, cond, text, time, mask = make_inputs(np.random.default_rng(2))
    text = np.clip(text, 0, None)  # MMDiT text embed has no -1 curtail path
    with torch.no_grad():
        want = model(
            x=torch.from_numpy(x), cond=torch.from_numpy(cond), text=torch.from_numpy(text),
            time=torch.from_numpy(time), drop_audio_cond=False, drop_text=False,
            mask=torch.from_numpy(mask),
        ).numpy()
    got = np.asarray(mmdit_forward(
        params, cfg, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text, jnp.int32),
        jnp.asarray(time), jnp.zeros((2,), bool), jnp.zeros((2,), bool), jnp.asarray(mask),
    ))
    np.testing.assert_allclose(got[mask], want[mask], atol=5e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# CFM sampler (model/cfm.py:81-210)
# ---------------------------------------------------------------------------


def reference_noise(duration, mel_dim, seed, n):
    """The per-row ``torch.manual_seed`` noise of ``cfm.py:181-186``."""
    rows = []
    for dur in duration:
        torch.manual_seed(seed)
        rows.append(torch.randn(int(dur), mel_dim))
    y0 = torch.nn.utils.rnn.pad_sequence(rows, padding_value=0, batch_first=True)
    return torch.nn.functional.pad(y0, (0, 0, 0, n - y0.shape[1])).numpy()


def run_sample_pair(ref_cfm, jax_params, *, steps, cfg_strength, sway, seed=5,
                    method="euler", edit_frames=None, atol=1e-3, rtol=1e-3):
    """Our ONE batched bucketed solve vs the reference run row-by-row at
    batch 1 — the reference's actual serving mode (``utils_infer.py:443``
    synthesizes chunks one at a time; at batch 1 it drops the attention mask,
    ``cfm.py:151-154``, and pads nothing). Matching every row of a batch to
    the reference's single-request output is the strongest parity statement:
    the reference's own batched mode differs from its batch-1 mode near row
    boundaries through the unmasked conv-pos embedding (``cfm.py:179-180``)."""
    rng = np.random.default_rng(10 + steps)
    b, cond_len, n = 2, 12, 40
    cond = rng.standard_normal((b, cond_len, TINY["mel_dim"])).astype(np.float32)
    lens = np.array([12, 9], dtype=np.int64)
    text = rng.integers(0, TINY["text_num_embeds"], (b, 14)).astype(np.int64)
    text[0, 11:] = -1
    text[1, 8:] = -1
    duration = np.array([40, 33], dtype=np.int64)

    y0 = reference_noise(duration, TINY["mel_dim"], seed, n)
    cond_padded = np.zeros((b, n, TINY["mel_dim"]), np.float32)
    cond_padded[:, :cond_len] = cond
    edit_ours = None
    if edit_frames is not None:
        edit_ours = np.ones((b, n), dtype=bool)
        edit_ours[:, edit_frames[0]:edit_frames[1]] = False
    got = np.asarray(sample_cfm(
        jax_params, TINY_CFG,
        cond=jnp.asarray(cond_padded), cond_lens=jnp.asarray(lens, jnp.int32),
        text=jnp.asarray(text, jnp.int32), duration=jnp.asarray(duration, jnp.int32),
        sampler=SamplerConfig(steps=steps, cfg_strength=cfg_strength,
                              sway_sampling_coef=sway, method=method),
        y0=jnp.asarray(y0),
        edit_mask=None if edit_ours is None else jnp.asarray(edit_ours),
    ))
    assert got.shape == (b, n, TINY["mel_dim"])

    for r in range(b):
        edit_ref = None
        if edit_frames is not None:
            edit_ref = torch.ones((1, int(lens[r])), dtype=torch.bool)
            edit_ref[:, edit_frames[0]:edit_frames[1]] = False
        with torch.no_grad():
            want_r, _ = ref_cfm.sample(
                cond=torch.from_numpy(cond[r:r + 1]), text=torch.from_numpy(text[r:r + 1]),
                duration=torch.from_numpy(duration[r:r + 1]), lens=torch.from_numpy(lens[r:r + 1]),
                steps=steps, cfg_strength=cfg_strength, sway_sampling_coef=sway,
                seed=seed, edit_mask=edit_ref,
            )
        want_r = want_r.numpy()[0]
        dur = int(duration[r])
        assert want_r.shape == (dur, TINY["mel_dim"])
        np.testing.assert_allclose(got[r, :dur], want_r, atol=atol, rtol=rtol)


def test_cfm_sample_vs_reference(ref_cfm, jax_params):
    """Full 8-step guided sample with sway warp — the BASELINE #1 contract
    (mel allclose atol 1e-3) against the reference's own sampler."""
    run_sample_pair(ref_cfm, jax_params, steps=8, cfg_strength=2.0, sway=-1.0)


def test_cfm_single_guided_euler_step_vs_reference(ref_cfm, jax_params):
    run_sample_pair(ref_cfm, jax_params, steps=1, cfg_strength=2.0, sway=None,
                    atol=2e-4, rtol=1e-4)


def test_cfm_unguided_sample_vs_reference(ref_cfm, jax_params):
    run_sample_pair(ref_cfm, jax_params, steps=4, cfg_strength=0.0, sway=-1.0,
                    atol=5e-4)


def test_cfm_speech_edit_mask_vs_reference(ref_cfm, jax_params):
    """Speech-edit infilling: masked cond frames are regenerated, unmasked kept
    verbatim (``cfm.py:130-131,204`` + ``infer/speech_edit.py:129-176``)."""
    run_sample_pair(ref_cfm, jax_params, steps=4, cfg_strength=2.0, sway=-1.0,
                    edit_frames=(4, 8))


def test_cfm_midpoint_vs_reference(jax_params):
    cfm_mid = make_ref_cfm(seed=0, method="midpoint")
    run_sample_pair(cfm_mid, jax_params, steps=2, cfg_strength=2.0, sway=-1.0,
                    method="midpoint", seed=3)


# ---------------------------------------------------------------------------
# Checkpoint layouts (infer/utils_infer.py:175-218) — authentic key layouts
# from the *instantiated reference module*, not synthesized dicts.
# ---------------------------------------------------------------------------


def forward_close(jax_params_a, jax_params_b):
    x, cond, text, time, mask = make_inputs(np.random.default_rng(7))
    outs = []
    for p in (jax_params_a, jax_params_b):
        outs.append(np.asarray(dit_forward(
            p, TINY_CFG, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text, jnp.int32),
            jnp.asarray(time), jnp.zeros((2,), bool), jnp.zeros((2,), bool), jnp.asarray(mask),
        )))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)


def test_trainer_pt_checkpoint_layout(ref_cfm, jax_params, tmp_path):
    """Full trainer ``.pt``: ``ema_model_state_dict`` with ``ema_model.*``
    prefixes, ``initted``/``step`` bookkeeping, stale mel-filterbank buffers
    (the 305e3ea backward-compat patch), plus optimizer/scheduler states."""
    sd = ref_cfm.state_dict()
    ema_sd = {f"ema_model.{k}": v.clone() for k, v in sd.items()}
    ema_sd["initted"] = torch.tensor(True)
    ema_sd["step"] = torch.tensor(1234)
    # stale buffers old checkpoints carry (utils_infer.py:203-207 drops them)
    ema_sd["ema_model.mel_spec.mel_stft.mel_scale.fb"] = torch.zeros(129, 20)
    ema_sd["ema_model.mel_spec.mel_stft.spectrogram.window"] = torch.hann_window(256)
    ckpt = dict(
        model_state_dict={k: v.clone() for k, v in sd.items()},
        ema_model_state_dict=ema_sd,
        optimizer_state_dict={},
        scheduler_state_dict={},
        step=1234,
    )
    path = tmp_path / "model_1234.pt"
    torch.save(ckpt, path)
    params = load_f5_checkpoint(str(path), TINY_CFG)
    forward_close(params, jax_params)


def test_bare_safetensors_ema_layout(ref_cfm, jax_params, tmp_path):
    """Bare ``.safetensors`` = EMA weights with ``ema_model.*`` prefixes
    (``load_checkpoint`` wraps it as ema_model_state_dict, utils_infer.py:196-198)."""
    from safetensors.numpy import save_file

    sd = state_dict_to_numpy(ref_cfm)
    ema = {f"ema_model.{k}": v for k, v in sd.items()}
    ema["initted"] = np.asarray([True])
    ema["step"] = np.asarray([1234])
    path = tmp_path / "model.safetensors"
    save_file(ema, str(path))
    params = load_f5_checkpoint(str(path), TINY_CFG)
    forward_close(params, jax_params)


def test_export_loads_into_reference_strictly(ref_cfm, jax_params):
    """Reverse direction: our exported torch layout load_state_dict(strict=True)
    into the real reference CFM, and the reloaded module matches the original."""
    sd = export_f5_state_dict(jax_params, TINY_CFG)
    other = make_ref_cfm(seed=99)
    other.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, strict=True)
    x, cond, text, time, mask = make_inputs(np.random.default_rng(8))
    with torch.no_grad():
        a = ref_cfm.transformer(
            x=torch.from_numpy(x), cond=torch.from_numpy(cond), text=torch.from_numpy(text),
            time=torch.from_numpy(time), drop_audio_cond=False, drop_text=False,
            mask=torch.from_numpy(mask)).numpy()
        b = other.transformer(
            x=torch.from_numpy(x), cond=torch.from_numpy(cond), text=torch.from_numpy(text),
            time=torch.from_numpy(time), drop_audio_cond=False, drop_text=False,
            mask=torch.from_numpy(mask)).numpy()
    np.testing.assert_allclose(a, b, atol=1e-6)


# ---------------------------------------------------------------------------
# Tokenizer contract (model/utils.py:88-131)
# ---------------------------------------------------------------------------


def test_tokenizer_vs_reference(tmp_path):
    from f5_tts.model.utils import get_tokenizer, list_str_to_idx

    from f5tts_tpu.text.tokenizer import Tokenizer

    chars = [" ", "a", "b", "c", "ಕ", "ನ", "ಡ", "।"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(chars) + "\n", encoding="utf-8")

    ref_map, ref_size = get_tokenizer(str(vocab_file), "custom")
    tok = Tokenizer.from_file(str(vocab_file))
    assert tok.vocab_size == ref_size
    assert tok.vocab_char_map == ref_map

    texts = [list("ab ಕನಡ"), list("c। x")]  # x is unk -> 0
    want = list_str_to_idx(texts, ref_map).numpy()
    got = tok.encode(["ab ಕನಡ", "c। x"], pinyin=False)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
