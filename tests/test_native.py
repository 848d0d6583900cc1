"""Native C++ audio ops == numpy fallbacks."""

import numpy as np

from f5tts_tpu.audio import native


def test_native_builds_and_matches_numpy():
    rng = np.random.default_rng(0)
    a = (rng.standard_normal(10_000) * 0.5).astype(np.float32)
    b = (rng.standard_normal(8_000) * 0.5).astype(np.float32)
    nf = 3600

    out = native.crossfade_pair(a, b, nf)
    fade_out = np.linspace(1.0, 0.0, nf, dtype=np.float32)
    fade_in = np.linspace(0.0, 1.0, nf, dtype=np.float32)
    ref = np.concatenate([a[:-nf], a[-nf:] * fade_out + b[:nf] * fade_in, b[nf:]])
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-6)

    pcm = native.encode_pcm16(np.asarray([0.0, 0.5, 1.5, -2.0], np.float32))
    np.testing.assert_array_equal(pcm, np.asarray([0, 16384, 32767, -32767], np.int16))

    # zero-fade degenerates to concat
    np.testing.assert_allclose(native.crossfade_pair(a, b, 0), np.concatenate([a, b]))


def test_native_lib_compiled():
    # the image ships g++ — the fast path should actually be active here
    assert native.available()
