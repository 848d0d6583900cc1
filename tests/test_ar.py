"""AR decoder branch: causality, KV-cache correctness, loss/grads, generation."""

import numpy as np

import jax
import jax.numpy as jnp

from f5tts_tpu.models.ar import ARConfig, ar_generate, ar_loss, init_ar

CFG = ARConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=12, text_num_embeds=30)


def _data(b=2, nt=8, nm=16, seed=0):
    rng = np.random.default_rng(seed)
    text = rng.integers(0, 30, (b, nt)).astype(np.int32)
    text[1, 5:] = -1
    mel = rng.standard_normal((b, nm, CFG.mel_dim)).astype(np.float32) * 0.3
    lens = np.asarray([nm, nm - 4], np.int32)
    return jnp.asarray(text), jnp.asarray(mel), jnp.asarray(lens)


def test_ar_loss_and_grads():
    params = init_ar(jax.random.PRNGKey(0), CFG)
    text, mel, lens = _data()
    (loss, aux), grads = jax.jit(jax.value_and_grad(ar_loss, has_aux=True), static_argnums=1)(
        params, CFG, text, mel, lens)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))
    assert float(aux["l1"]) > 0 and float(aux["stop_bce"]) > 0


def test_ar_causality():
    """Perturbing future mel frames must not change earlier predictions."""
    params = init_ar(jax.random.PRNGKey(0), CFG)
    text, mel, lens = _data()

    def preds(mel):
        # reuse the loss internals by differentiating against nothing: compute
        # teacher-forced predictions via ar_loss's forward path replicated here
        from f5tts_tpu.models import modules as m
        from f5tts_tpu.models.ar import _block_apply, _embed_sequence
        from f5tts_tpu.ops.rope import rotary_freqs
        from jax import lax

        h = _embed_sequence(params, CFG, text, mel)
        freqs = jnp.asarray(rotary_freqs(h.shape[1], CFG.dim_head))
        valid = jnp.concatenate(
            [text != -1, jnp.ones((mel.shape[0], 1 + mel.shape[1]), bool)], axis=1
        )
        h, _ = lax.scan(lambda c, blk: (_block_apply(blk, c, CFG.heads, freqs, valid), None), h, params["blocks"])
        h = m.rms_norm(params["norm_out"], h)
        return m.linear(params["mel_out"], h[:, text.shape[1] : text.shape[1] + mel.shape[1]])

    p1 = np.asarray(preds(mel))
    mel2 = np.asarray(mel).copy()
    mel2[:, 10:] += 1.0  # perturb frames 10+
    p2 = np.asarray(preds(jnp.asarray(mel2)))
    np.testing.assert_allclose(p1[:, :10], p2[:, :10], atol=1e-5)
    assert np.abs(p1[:, 11:] - p2[:, 11:]).max() > 1e-3


def test_ar_generate_matches_teacher_forcing():
    """KV-cache incremental decode == full causal pass over the same frames."""
    params = init_ar(jax.random.PRNGKey(1), CFG)
    text, _, _ = _data()
    K = 6
    gen, lengths = ar_generate(params, CFG, text, max_frames=K, stop_threshold=2.0)  # never stops
    gen = np.asarray(gen)
    assert gen.shape == (2, K, CFG.mel_dim)
    assert np.asarray(lengths).tolist() == [K, K]

    # teacher-forced pass over [text; BOS; gen[:, :K-1]] must reproduce gen
    from f5tts_tpu.models import modules as m
    from f5tts_tpu.models.ar import _block_apply, _embed_sequence
    from f5tts_tpu.ops.rope import rotary_freqs
    from jax import lax

    h = _embed_sequence(params, CFG, text, jnp.asarray(gen[:, : K - 1]))
    freqs = jnp.asarray(rotary_freqs(h.shape[1], CFG.dim_head))
    valid = jnp.concatenate([text != -1, jnp.ones((2, K), bool)], axis=1)
    h, _ = lax.scan(lambda c, blk: (_block_apply(blk, c, CFG.heads, freqs, valid), None), h, params["blocks"])
    h = m.rms_norm(params["norm_out"], h)
    nt = text.shape[1]
    preds = np.asarray(m.linear(params["mel_out"], h[:, nt : nt + K]))
    np.testing.assert_allclose(preds, gen, atol=2e-4, rtol=1e-3)


def test_ar_generate_stops():
    params = init_ar(jax.random.PRNGKey(2), CFG)
    # force immediate stop via a huge stop bias
    params["stop_out"]["b"] = params["stop_out"]["b"] + 100.0
    text, _, _ = _data()
    gen, lengths = ar_generate(params, CFG, text, max_frames=10, stop_threshold=0.5)
    # stop fires on the first prediction: emits ~2 frames then zeros
    assert np.asarray(lengths).max() <= 3
    assert np.abs(np.asarray(gen)[:, 4:]).max() == 0.0
