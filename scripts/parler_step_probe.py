"""Parler decode-step layout probe (VERDICT r4 item #3 groundwork).

The AR decode runs at ~0.32-0.42x of its HBM streaming bound
(PARLER_ROOFLINE.json). Before writing a fused kernel, this isolates WHERE
the per-step time goes by timing minimal decode-step programs at the real
geometry (24 layers, hidden 1024, ffn 4096, MHA 16 heads, bf16) under
layout variants:

  stacked   — the shipping pattern (models/parler.py step_token): lax.scan
              over layers, KV cache stacked (L, b, h, total, d), per-layer
              dynamic_index_in_dim gather + dynamic_update_slice.
  unrolled  — python loop over layers, per-layer cache arrays: static
              slices, no layer gather. If the stacked gather materializes
              slice copies, this wins big.
  fusedqkv  — unrolled + one (hidden -> q|k|v|ca_q) matmul per layer.
  shortcache— unrolled at total=256: cache-byte sensitivity (the einsum
              reads the full padded cache each step regardless of position).
  noattn    — unrolled with the cache attention removed entirely: weight
              streaming + FF only (the floor any attention work adds to).

Each variant scans STEPS positions inside one jit; timed with the scalar-
fetch barrier (tunnel-safe). One JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HBM_BW = 819e9


def main(argv=None):
    p = argparse.ArgumentParser("parler-step-probe")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--layers", type=int, default=24)
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--ffn", type=int, default=4096)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--total", type=int, default=494)
    p.add_argument("--enc-len", type=int, default=64)
    p.add_argument("--steps", type=int, default=64, help="decode positions per timed program")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--variants", default="stacked,unrolled,fusedqkv,shortcache,noattn")
    p.add_argument("--out", default="PARLER_STEP_PROBE.json")
    args = p.parse_args(argv)

    from f5tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    L, H, F, NH = args.layers, args.hidden, args.ffn, args.heads
    D = H // NH
    b = args.batch
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)

    def w(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.02, dt)

    # stacked per-layer weights (decode-relevant only; ca k/v are precomputed)
    params = {
        "wq": w(L, H, H), "wk": w(L, H, H), "wv": w(L, H, H), "wo": w(L, H, H),
        "cq": w(L, H, H), "co": w(L, H, H),
        "f1": w(L, H, F), "f2": w(L, F, H),
        "ln1": jnp.ones((L, H), dt), "ln2": jnp.ones((L, H), dt), "ln3": jnp.ones((L, H), dt),
    }
    # fused qkv+caq: (L, H, 4H)
    params["wqkvc"] = jnp.concatenate(
        [params["wq"], params["wk"], params["wv"], params["cq"]], axis=-1)

    ca_k = w(L, b, NH, args.enc_len, D)
    ca_v = w(L, b, NH, args.enc_len, D)
    x0 = w(b, 1, H)

    def ln(x, g):
        mu = jnp.mean(x.astype(jnp.float32), -1, keepdims=True)
        va = jnp.var(x.astype(jnp.float32), -1, keepdims=True)
        return (((x - mu) * jax.lax.rsqrt(va + 1e-5)) * g).astype(x.dtype)

    def attn_cache(q, kc, vc, abs_pos, total):
        # q (b,1,H) split -> (b,NH,1,D); cache (b,NH,total,D)
        qh = q.reshape(b, 1, NH, D).transpose(0, 2, 1, 3) * (D ** -0.5)
        lg = jnp.einsum("bhqd,bhkd->bhqk", qh, kc, preferred_element_type=jnp.float32)
        allowed = jnp.arange(total)[None, None, None, :] <= abs_pos
        lg = jnp.where(allowed, lg, -1e9)
        pr = jax.nn.softmax(lg, axis=-1).astype(vc.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", pr, vc)
        return o.transpose(0, 2, 1, 3).reshape(b, 1, H)

    def ca_attn(q, kc, vc):
        qh = q.reshape(b, 1, NH, D).transpose(0, 2, 1, 3) * (D ** -0.5)
        lg = jnp.einsum("bhqd,bhkd->bhqk", qh, kc, preferred_element_type=jnp.float32)
        pr = jax.nn.softmax(lg, axis=-1).astype(vc.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", pr, vc)
        return o.transpose(0, 2, 1, 3).reshape(b, 1, H)

    def ff(h, f1, f2):
        y = jax.nn.gelu(jnp.einsum("bnh,hf->bnf", h, f1), approximate=False)
        return jnp.einsum("bnf,fh->bnh", y, f2)

    total = args.total

    # ---- variant bodies ----------------------------------------------------

    def make_stacked():
        """lax.scan over layers; caches stacked (L,b,NH,total,D) with
        layer-indexed gather/DUS (the shipping pattern). params/ca caches are
        ARGUMENTS of the jitted fn — closing over them serializes ~700 MB of
        constants into the remote-compile request (HTTP 413)."""

        def fn(params, ca_k, ca_v, x0):
          def step(carry, j):
              h, ck, cv = carry

              def per_block(c, inp):
                  h, ck, cv = c
                  wq, wk, wv, wo, cq, co, f1, f2, l1, l2, l3, cak, cav, li = inp
                  xn = ln(h, l1)
                  q = jnp.einsum("bnh,hk->bnk", xn, wq)
                  kn = jnp.einsum("bnh,hk->bnk", xn, wk).reshape(b, 1, NH, D).transpose(0, 2, 1, 3)
                  vn = jnp.einsum("bnh,hk->bnk", xn, wv).reshape(b, 1, NH, D).transpose(0, 2, 1, 3)
                  ck = lax.dynamic_update_slice(ck, kn[None], (li, 0, 0, j, 0))
                  cv = lax.dynamic_update_slice(cv, vn[None], (li, 0, 0, j, 0))
                  kc = lax.dynamic_index_in_dim(ck, li, 0, keepdims=False)
                  vc = lax.dynamic_index_in_dim(cv, li, 0, keepdims=False)
                  h = h + jnp.einsum("bnh,hk->bnk", attn_cache(q, kc, vc, j, total), wo)
                  xn = ln(h, l2)
                  qc = jnp.einsum("bnh,hk->bnk", xn, cq)
                  h = h + jnp.einsum("bnh,hk->bnk", ca_attn(qc, cak, cav), co)
                  h = h + ff(ln(h, l3), f1, f2)
                  return (h, ck, cv), None

              (h, ck, cv), _ = lax.scan(
                  per_block, (h, ck, cv),
                  (params["wq"], params["wk"], params["wv"], params["wo"],
                   params["cq"], params["co"], params["f1"], params["f2"],
                   params["ln1"], params["ln2"], params["ln3"],
                   ca_k, ca_v, jnp.arange(L)))
              return (h, ck, cv), None

          ck = jnp.zeros((L, b, NH, total, D), dt)
          cv = jnp.zeros((L, b, NH, total, D), dt)
          (h, ck, cv), _ = lax.scan(step, (x0, ck, cv), jnp.arange(args.steps))
          return h

        return fn

    def make_unrolled(fused=False, tot=None, attn=True):
        """python loop over layers; per-layer caches (tuple), static slices."""
        tot = tot or total

        def fn(params, ca_k, ca_v, x0):
          def step(carry, j):
            h, caches = carry
            new_caches = []
            for l in range(L):
                ck, cv = caches[l]
                l1 = params["ln1"][l]
                xn = ln(h, l1)
                if fused:
                    qkvc = jnp.einsum("bnh,hk->bnk", xn, params["wqkvc"][l])
                    q, kn_, vn_, qc = jnp.split(qkvc, 4, axis=-1)
                else:
                    q = jnp.einsum("bnh,hk->bnk", xn, params["wq"][l])
                    kn_ = jnp.einsum("bnh,hk->bnk", xn, params["wk"][l])
                    vn_ = jnp.einsum("bnh,hk->bnk", xn, params["wv"][l])
                kn = kn_.reshape(b, 1, NH, D).transpose(0, 2, 1, 3)
                vn = vn_.reshape(b, 1, NH, D).transpose(0, 2, 1, 3)
                ck = lax.dynamic_update_slice(ck, kn, (0, 0, j, 0))
                cv = lax.dynamic_update_slice(cv, vn, (0, 0, j, 0))
                if attn:
                    h = h + jnp.einsum("bnh,hk->bnk", attn_cache(q, ck, cv, j, tot),
                                       params["wo"][l])
                xn = ln(h, params["ln2"][l])
                if not fused:
                    qc = jnp.einsum("bnh,hk->bnk", xn, params["cq"][l])
                h = h + jnp.einsum("bnh,hk->bnk", ca_attn(qc, ca_k[l], ca_v[l]),
                                   params["co"][l])
                h = h + ff(ln(h, params["ln3"][l]), params["f1"][l], params["f2"][l])
                new_caches.append((ck, cv))
            return (h, tuple(new_caches)), None

          caches = tuple((jnp.zeros((b, NH, tot, D), dt),
                          jnp.zeros((b, NH, tot, D), dt)) for _ in range(L))
          (h, _), _ = lax.scan(step, (x0, caches), jnp.arange(args.steps))
          return h

        return fn

    def make_pallas(fused=True):
        """unrolled + fused qkv + the fused single-pass cache-attention
        kernel (ops/pallas/decode_attention.py) for self AND cross attention
        — K caches transposed (d, total) with total/enc rounded to the
        128-lane tile (as the shipping decode context does)."""
        from f5tts_tpu.ops.pallas.decode_attention import decode_attention

        tot = -(-total // 128) * 128
        encp = -(-args.enc_len // 128) * 128

        def fn(params, ca_k, ca_v, x0):
          padn = encp - args.enc_len
          ca_kt = jnp.pad(ca_k, ((0, 0),) * 3 + ((0, padn), (0, 0))
                          ).transpose(0, 1, 2, 4, 3)
          ca_vp = jnp.pad(ca_v, ((0, 0),) * 3 + ((0, padn), (0, 0)))
          ca_bias = jnp.pad(jnp.zeros((b, args.enc_len), jnp.float32),
                            ((0, 0), (0, padn)), constant_values=-1e9)

          def step(carry, j):
            h, caches = carry
            sa_bias = jnp.where(jnp.arange(tot)[None, :] <= j, 0.0, -1e9
                                ).astype(jnp.float32) * jnp.ones((b, 1), jnp.float32)
            new_caches = []
            for l in range(L):
                ck, cv = caches[l]
                xn = ln(h, params["ln1"][l])
                if fused:
                    qkvc = jnp.einsum("bnh,hk->bnk", xn, params["wqkvc"][l])
                    q, kn_, vn_, qc = jnp.split(qkvc, 4, axis=-1)
                else:
                    q = jnp.einsum("bnh,hk->bnk", xn, params["wq"][l])
                    kn_ = jnp.einsum("bnh,hk->bnk", xn, params["wk"][l])
                    vn_ = jnp.einsum("bnh,hk->bnk", xn, params["wv"][l])
                kn = kn_.reshape(b, 1, NH, D).transpose(0, 2, 3, 1)  # (b,NH,D,1)
                vn = vn_.reshape(b, 1, NH, D).transpose(0, 2, 1, 3)
                ck = lax.dynamic_update_slice(ck, kn, (0, 0, 0, j))
                cv = lax.dynamic_update_slice(cv, vn, (0, 0, j, 0))
                qh = q.reshape(b, 1, NH, D).transpose(0, 2, 1, 3) * (D ** -0.5)
                o = decode_attention(qh, ck, cv, sa_bias).transpose(0, 2, 1, 3).reshape(b, 1, H)
                h = h + jnp.einsum("bnh,hk->bnk", o, params["wo"][l])
                xn = ln(h, params["ln2"][l])
                if not fused:
                    qc = jnp.einsum("bnh,hk->bnk", xn, params["cq"][l])
                qch = qc.reshape(b, 1, NH, D).transpose(0, 2, 1, 3) * (D ** -0.5)
                o = decode_attention(qch, ca_kt[l], ca_vp[l], ca_bias
                                     ).transpose(0, 2, 1, 3).reshape(b, 1, H)
                h = h + jnp.einsum("bnh,hk->bnk", o, params["co"][l])
                h = h + ff(ln(h, params["ln3"][l]), params["f1"][l], params["f2"][l])
                new_caches.append((ck, cv))
            return (h, tuple(new_caches)), None

          caches = tuple((jnp.zeros((b, NH, D, tot), dt),
                          jnp.zeros((b, NH, tot, D), dt)) for _ in range(L))
          (h, _), _ = lax.scan(step, (x0, caches), jnp.arange(args.steps))
          return h

        return fn

    variants = {
        "stacked": make_stacked,
        "unrolled": lambda: make_unrolled(),
        "fusedqkv": lambda: make_unrolled(fused=True),
        "shortcache": lambda: make_unrolled(tot=256),
        "noattn": lambda: make_unrolled(attn=False),
        "pallasattn": make_pallas,
    }

    # analytic stream bytes per step (bf16): weights (no embeds) + avg cache
    w_bytes = 2 * L * (4 * H * H + 2 * H * H + 2 * H * F)
    results = {"args": vars(args), "w_bytes_per_step": w_bytes, "rows": []}
    for name in args.variants.split(","):
        fn = jax.jit(variants[name]())
        out = fn(params, ca_k, ca_v, x0)
        jax.block_until_ready(out)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(params, ca_k, ca_v, x0)
            s = float(jnp.sum(out.astype(jnp.float32)))
        dtw = (time.perf_counter() - t0) / args.iters
        assert np.isfinite(s)
        step_us = dtw / args.steps * 1e6
        tot = (256 if name == "shortcache"
               else -(-total // 128) * 128 if name == "pallasattn" else total)
        cache_bytes = 2 * L * 2 * b * NH * tot * D  # full padded cache read (k+v)
        bound_us = (w_bytes + (cache_bytes if name != "noattn" else 0)) / HBM_BW * 1e6
        row = {"variant": name, "step_us": round(step_us, 1),
               "bound_us": round(bound_us, 1),
               "bw_eff": round(bound_us / step_us, 3)}
        results["rows"].append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
