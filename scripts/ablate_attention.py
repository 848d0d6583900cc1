"""On-chip ablation of head-fusion layouts for the d=64 attention core.

BENCH.md round-2 headroom #1: the n² contraction at d=64 caps the MXU near
25%; the shipping packed kernel (block-diagonal head pairs, K=128) recovers
+6.5%. This script measures the remaining layout ideas — all EXACT (same
math), differing only in how two d=64 heads map onto the 128-lane MXU:

- ``unpacked``            per-head dots: s K=64, o K=n/N=64
- ``packed_blockdiag``    the shipping layout: [qa|qb] @ blockdiag(ka,kb),
                          per-half softmax, block-diag V (2x MACs, all K=128)
- ``packed_sep_o``        block-diag s-dot; o as two dense K=n, N=64 dots
- ``sumdiff_blockdiag``   s recovered from two DENSE K=128 dots
                          (q_sum = [qa|qb], q_dif = [qa|-qb] vs k_cat=[ka|kb]:
                          sa = (s_sum+s_dif)/2, sb = (s_sum-s_dif)/2);
                          block-diag V
- ``sumdiff_dense_cross`` sum/diff s + softmax on the SUBLANE-stacked
                          (2BQ, n) halves + ONE dense o-dot
                          [pa;pb] @ [va|vb] (K=n, N=128) taking the diagonal
                          blocks — no zero blocks anywhere, every dot
                          full-depth and full-width (same total MACs)

Two d=64 heads cannot come out of ONE K=128 pass (the MXU would sum their
logit matrices), so 2x the true MACs is the floor for exact attention at
this head size; these variants only move layout/VPU overhead around.

Timing: >=50 chained kernel calls inside one jit, one scalar fetch
(CLAUDE.md: per-call timings through the tunnel carry ~29 ms RTT).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = int(os.environ.get("AB_BH", 256))  # b*h (headline: fused 2x8 rows x 16 heads)
N = int(os.environ.get("AB_N", 1024))
D = 64
BQ = int(os.environ.get("AB_BQ", 512))
CHAIN = int(os.environ.get("AB_CHAIN", 50))
ITERS = int(os.environ.get("AB_ITERS", 3))


def _softmax_rows(s):
    m = jnp.max(s, -1, keepdims=True)
    p = jnp.exp(s - m)
    return p, jnp.sum(p, -1, keepdims=True)


def k_unpacked(bias_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0]
    p, l = _softmax_rows(s)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def k_packed_blockdiag(bias_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    qa, qb, ka, kb = q_ref[0], q_ref[1], k_ref[0], k_ref[1]
    n, d = ka.shape
    q2 = jnp.concatenate([qa, qb], axis=1)
    z = jnp.zeros((n, d), ka.dtype)
    kp = jnp.concatenate([jnp.concatenate([ka, z], 1), jnp.concatenate([z, kb], 1)], 0)
    s = jax.lax.dot_general(q2, kp, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
    bias = bias_ref[0]
    sa, sb = s[:, :n] + bias, s[:, n:] + bias
    pa, la = _softmax_rows(sa)
    pb, lb = _softmax_rows(sb)
    p = jnp.concatenate([pa, pb], axis=1)
    vp = jnp.concatenate([jnp.concatenate([v_ref[0], z], 1), jnp.concatenate([z, v_ref[1]], 1)], 0)
    o = jax.lax.dot_general(p.astype(vp.dtype), vp, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (o[:, :d] / jnp.maximum(la, 1e-30)).astype(o_ref.dtype)
    o_ref[1] = (o[:, d:] / jnp.maximum(lb, 1e-30)).astype(o_ref.dtype)


def k_packed_sep_o(bias_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    qa, qb, ka, kb = q_ref[0], q_ref[1], k_ref[0], k_ref[1]
    n, d = ka.shape
    q2 = jnp.concatenate([qa, qb], axis=1)
    z = jnp.zeros((n, d), ka.dtype)
    kp = jnp.concatenate([jnp.concatenate([ka, z], 1), jnp.concatenate([z, kb], 1)], 0)
    s = jax.lax.dot_general(q2, kp, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
    bias = bias_ref[0]
    pa, la = _softmax_rows(s[:, :n] + bias)
    pb, lb = _softmax_rows(s[:, n:] + bias)
    oa = jax.lax.dot_general(pa.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    ob = jax.lax.dot_general(pb.astype(v_ref.dtype), v_ref[1], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (oa / jnp.maximum(la, 1e-30)).astype(o_ref.dtype)
    o_ref[1] = (ob / jnp.maximum(lb, 1e-30)).astype(o_ref.dtype)


def k_sumdiff_blockdiag(bias_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    qa, qb, ka, kb = q_ref[0], q_ref[1], k_ref[0], k_ref[1]
    n, d = ka.shape
    q_sum = jnp.concatenate([qa, qb], axis=1)
    q_dif = jnp.concatenate([qa, -qb], axis=1)
    kc = jnp.concatenate([ka, kb], axis=1)  # (n, 2d) dense
    ssum = jax.lax.dot_general(q_sum, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    sdif = jax.lax.dot_general(q_dif, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    bias = bias_ref[0]
    sa = 0.5 * (ssum + sdif) * scale + bias
    sb = 0.5 * (ssum - sdif) * scale + bias
    pa, la = _softmax_rows(sa)
    pb, lb = _softmax_rows(sb)
    z = jnp.zeros((n, d), v_ref.dtype)
    p = jnp.concatenate([pa, pb], axis=1)
    vp = jnp.concatenate([jnp.concatenate([v_ref[0], z], 1), jnp.concatenate([z, v_ref[1]], 1)], 0)
    o = jax.lax.dot_general(p.astype(vp.dtype), vp, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (o[:, :d] / jnp.maximum(la, 1e-30)).astype(o_ref.dtype)
    o_ref[1] = (o[:, d:] / jnp.maximum(lb, 1e-30)).astype(o_ref.dtype)


def k_sumdiff_dense_cross(bias_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    qa, qb, ka, kb = q_ref[0], q_ref[1], k_ref[0], k_ref[1]
    n, d = ka.shape
    q_sum = jnp.concatenate([qa, qb], axis=1)
    q_dif = jnp.concatenate([qa, -qb], axis=1)
    kc = jnp.concatenate([ka, kb], axis=1)  # (n, 2d) dense
    ssum = jax.lax.dot_general(q_sum, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    sdif = jax.lax.dot_general(q_dif, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    bias = bias_ref[0]
    # stack the halves along SUBLANES -> one full-width softmax over (2BQ, n)
    s2 = jnp.concatenate([0.5 * (ssum + sdif) * scale + bias,
                          0.5 * (ssum - sdif) * scale + bias], axis=0)
    p2, l2 = _softmax_rows(s2)
    vc = jnp.concatenate([v_ref[0], v_ref[1]], axis=1)  # (n, 2d) dense
    # ONE dense o-dot: [[pa@va, pa@vb], [pb@va, pb@vb]] — keep the diagonal
    o2 = jax.lax.dot_general(p2.astype(vc.dtype), vc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    bq = qa.shape[0]
    o_ref[0] = (o2[:bq, :d] / jnp.maximum(l2[:bq], 1e-30)).astype(o_ref.dtype)
    o_ref[1] = (o2[bq:, d:] / jnp.maximum(l2[bq:], 1e-30)).astype(o_ref.dtype)


PAIR_KERNELS = {
    "packed_blockdiag": k_packed_blockdiag,
    "packed_sep_o": k_packed_sep_o,
    "sumdiff_blockdiag": k_sumdiff_blockdiag,
    "sumdiff_dense_cross": k_sumdiff_dense_cross,
}


def build(variant: str, interpret: bool):
    scale = D**-0.5
    if variant == "unpacked":
        grid = (BH, N // BQ)
        in_specs = [
            pl.BlockSpec((1, 1, N), lambda g, qi: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, D), lambda g, qi: (g, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda g, qi: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda g, qi: (g, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((1, BQ, D), lambda g, qi: (g, qi, 0), memory_space=pltpu.VMEM)
        kern = functools.partial(k_unpacked, scale=scale)
    else:
        grid = (BH // 2, N // BQ)
        in_specs = [
            pl.BlockSpec((1, 1, N), lambda g, qi: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BQ, D), lambda g, qi: (g, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, N, D), lambda g, qi: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, N, D), lambda g, qi: (g, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((2, BQ, D), lambda g, qi: (g, qi, 0), memory_space=pltpu.VMEM)
        kern = functools.partial(PAIR_KERNELS[variant], scale=scale)

    def call(bias, q, k, v):
        return pl.pallas_call(
            kern, grid=grid, in_specs=in_specs, out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((BH, N, D), q.dtype), interpret=interpret,
        )(bias, q, k, v)

    return call


def main():
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((BH, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((BH, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((BH, N, D)), jnp.bfloat16)
    bias = jnp.zeros((1, 1, N), jnp.float32)

    ref = None
    results = {}
    for name in ("unpacked", "packed_blockdiag", "packed_sep_o",
                 "sumdiff_blockdiag", "sumdiff_dense_cross"):
        call = build(name, interpret)

        @jax.jit
        def chained(bias, q, k, v, _call=call):
            def body(_, q_):
                return _call(bias, q_, k, v).astype(q_.dtype)

            return jax.lax.fori_loop(0, CHAIN, body, q)

        out1 = np.asarray(call(bias, q, k, v), np.float32)
        if ref is None:
            ref = out1
        else:
            err = float(np.max(np.abs(out1 - ref)))
            assert err < 0.05, f"{name} diverges from unpacked: {err}"

        o = chained(bias, q, k, v)
        float(jnp.sum(o[..., :1]))  # compile+sync
        t0 = time.perf_counter()
        for _ in range(ITERS):
            o = chained(bias, q, k, v)
            checksum = float(jnp.sum(o[..., :1]))
        dt = (time.perf_counter() - t0) / ITERS / CHAIN
        assert np.isfinite(checksum)
        results[name] = dt * 1e3
        print(f"{name:>22}: {dt*1e3:7.3f} ms/call  (max|Δ| vs unpacked "
              f"{0.0 if name == 'unpacked' else float(np.max(np.abs(out1 - ref))):.4f})", flush=True)

    base = results["packed_blockdiag"]
    for name, ms in results.items():
        print(f"{name:>22}: {base/ms:5.3f}x vs shipping packed_blockdiag")


if __name__ == "__main__":
    main()
