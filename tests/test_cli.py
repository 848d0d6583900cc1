"""CLI end-to-end smoke tests (demo-tiny, CPU).

Each CLI builds its own argparse namespace and hands it to the shared
``build_engine`` — these tests pin that every parser actually defines every
flag build_engine reads (a missing one is an unconditional AttributeError at
startup), and that the batch/edit drivers produce audio end-to-end.
"""

import csv
import os

import numpy as np
import pytest

from f5tts_tpu.audio.io import read_wav, write_wav


def _sine_wav(path, seconds=1.0, sr=24000):
    wav = (np.sin(2 * np.pi * 220 * np.arange(int(seconds * sr)) / sr) * 0.1).astype(np.float32)
    write_wav(path, wav, sr)
    return path


def test_infer_batch_cli_demo_tiny(tmp_path):
    from f5tts_tpu.cli import infer_batch

    rows = [
        {"text": "first row to speak.", "id": "a"},
        {"text": "second row to speak.", "id": "b", "language": "kan"},
        {"text": "third row.", "id": "c"},
    ]
    csv_path = tmp_path / "rows.csv"
    with open(csv_path, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=["text", "id", "language"])
        w.writeheader()
        w.writerows(rows)

    out_dir = tmp_path / "out"
    infer_batch.main([
        "--csv", str(csv_path), "--out-dir", str(out_dir),
        "--demo-tiny", "--nfe", "2", "--seed", "0",
    ])
    for rel in ("a.wav", os.path.join("kan", "b.wav"), "c.wav"):
        wav, sr = read_wav(str(out_dir / rel))
        assert sr == 24000 and len(wav) > 0, rel


def test_speech_edit_cli_demo_tiny(tmp_path):
    from f5tts_tpu.cli import speech_edit

    src = _sine_wav(str(tmp_path / "src.wav"), seconds=1.5)
    out = str(tmp_path / "edited.wav")
    speech_edit.main([
        "--audio", src, "--target-text", "hello edited world.",
        "--parts", "0.4,0.8", "--demo-tiny", "--nfe", "2", "-o", out,
    ])
    wav, sr = read_wav(out)
    assert sr == 24000 and len(wav) > 0


def test_infer_cli_hyphen_voice_tag(tmp_path, capsys):
    """[voice] tags share the server's parser: hyphen/dot voice names resolve
    (the old CLI-local regex used \\w+ and silently spoke the tag aloud)."""
    from f5tts_tpu.cli import infer

    ref = _sine_wav(str(tmp_path / "anchor.wav"))
    cfg = tmp_path / "voices.toml"
    cfg.write_text(
        f'[voices.news-anchor]\nref_audio = "{ref}"\nref_text = "anchor reference."\n',
        encoding="utf-8",
    )
    out = str(tmp_path / "tagged.wav")
    infer.main([
        "-c", str(cfg), "--demo-tiny", "--nfe", "2", "-o", out,
        "-t", "plain start. [news-anchor] and the news voice.",
    ])
    wav, sr = read_wav(out)
    assert sr == 24000 and len(wav) > 0
    # the tag resolved — no "not a known voice" note was printed
    assert "not a known voice" not in capsys.readouterr().err


def test_trained_checkpoint_to_npz_flow(tmp_path):
    """The f5tpu-convert orbax path (load_trained_checkpoint -> save_params_npz):
    EMA weights from a training run land bit-exact in the native .npz serving
    format. (The CLI wrapper itself pins Base/Small geometry, so the flow is
    driven at the function level with a tiny model.)"""
    import jax

    from f5tts_tpu.models.cfm import CFMConfig
    from f5tts_tpu.models.convert import (
        load_params_npz, load_trained_checkpoint, save_params_npz)
    from f5tts_tpu.models.dit import DiTConfig
    from f5tts_tpu.train.checkpoint import save_state
    from f5tts_tpu.train.trainer import TrainConfig, init_train_state

    cfm = CFMConfig(model=DiTConfig(
        dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=8,
        text_num_embeds=12, text_dim=16, conv_layers=1, max_pos=64))
    state = init_train_state(jax.random.PRNGKey(0), cfm, TrainConfig())
    ckpt_dir = tmp_path / "run"
    save_state(str(ckpt_dir), 5, state)

    out = str(tmp_path / "model.npz")
    params = load_trained_checkpoint(str(ckpt_dir), cfm.model)
    save_params_npz(out, params)
    back = load_params_npz(out)
    for a, b in zip(jax.tree.leaves(state["ema"]), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_infer_cli_bigvgan_vocoder(tmp_path):
    """--vocoder bigvgan selects the BigVGAN head + bigvgan mel flavor
    (reference --vocoder_name contract, utils_infer.py:92-130)."""
    from f5tts_tpu.cli import infer

    out = str(tmp_path / "bv.wav")
    infer.main(["--demo-tiny", "--vocoder", "bigvgan", "--nfe", "2",
                "-t", "bigvgan demo.", "-o", out])
    wav, sr = read_wav(out)
    assert sr == 24000 and len(wav) > 0


def test_quickstart_basic_toml_as_committed(tmp_path, monkeypatch):
    """VERDICT #8: `--config examples/basic.toml` must run in a fresh clone
    with no /models — demo-tiny mode, bundled vocab.txt + demo voice wav,
    relative paths resolved against the toml's directory (any cwd)."""
    from f5tts_tpu.cli import infer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.chdir(tmp_path)  # NOT the repo root — paths must still resolve
    out = str(tmp_path / "quickstart.wav")
    infer.main(["--config", os.path.join(repo, "examples", "basic.toml"),
                "--nfe", "2", "-o", out])
    wav, sr = read_wav(out)
    assert sr == 24000 and len(wav) > 1000 and np.all(np.isfinite(wav))
