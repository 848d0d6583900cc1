// Native host-side audio ops for the serving hot path.
//
// The reference's host path is pure Python/numpy (pydub/soundfile wheels);
// here the per-request post-processing — crossfade stitching and float->int16
// PCM encode (the work between device output and the HTTP response) — runs in
// C++ via a small shared library loaded with ctypes
// (f5tts_tpu/audio/native.py), with a numpy fallback when no compiler exists.
//
// Build: cc -O3 -shared -fPIC -o libf5audioops.so audioops.cpp

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// Encode float32 [-1,1] samples to int16 PCM with clipping.
void encode_pcm16(const float* in, int64_t n, int16_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i];
        if (v > 1.0f) v = 1.0f;
        if (v < -1.0f) v = -1.0f;
        out[i] = (int16_t)lrintf(v * 32767.0f);
    }
}

// Linear crossfade of two clips into dst:
//   dst = [a[0:na-nf] ; a_tail*fade_out + b_head*fade_in ; b[nf:nb]]
// Returns the output length. dst must hold na + nb - nf samples.
int64_t crossfade_pair(const float* a, int64_t na, const float* b, int64_t nb,
                       int64_t nf, float* dst) {
    if (nf > na) nf = na;
    if (nf > nb) nf = nb;
    if (nf <= 0) {
        memcpy(dst, a, sizeof(float) * na);
        memcpy(dst + na, b, sizeof(float) * nb);
        return na + nb;
    }
    int64_t head = na - nf;
    memcpy(dst, a, sizeof(float) * head);
    // match numpy.linspace(1,0,nf): denominator nf-1 (endpoints included)
    const float denom = nf > 1 ? (float)(nf - 1) : 1.0f;
    for (int64_t i = 0; i < nf; ++i) {
        float fade_in = (float)i / denom;
        float fade_out = 1.0f - fade_in;
        dst[head + i] = a[head + i] * fade_out + b[i] * fade_in;
    }
    memcpy(dst + na, b + nf, sizeof(float) * (nb - nf));
    return na + nb - nf;
}

// RMS of a float buffer (ref-audio normalization).
float rms(const float* in, int64_t n) {
    if (n <= 0) return 0.0f;
    double acc = 0.0;
    for (int64_t i = 0; i < n; ++i) acc += (double)in[i] * in[i];
    return (float)sqrt(acc / (double)n);
}

}  // extern "C"
