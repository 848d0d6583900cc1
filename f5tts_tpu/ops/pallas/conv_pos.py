"""Fused grouped conv-position-embedding kernel (Pallas/Mosaic).

The DiT/UNetT input embedding applies two grouped Conv1d(k=31, groups=16)
with Mish between/after (reference ``model/modules.py:167-190``). The XLA
serving path block-diagonal-densifies the kernels so the MXU sees full-width
matmuls — 16x the true FLOPs. This kernel does the true-FLOP grouped math at
full MXU depth instead:

- grid cell = (batch row, group-cluster): ``m`` channel groups per cell with
  ``m*cg`` a multiple of 128 (Mosaic block-shape rule); for the Base models
  (dim 1024, 16 groups) that's m=2 -> 128-channel cells.
- im2col inside VMEM: 31 shifted cg-wide slices concatenated to
  ``(tile, 31*cg)``, so each group's conv becomes ONE matmul with contraction
  31*64 = 1984 (full systolic depth) instead of 31 shifted K=64 matmuls (or
  densified K=1024 at 16x FLOPs).
- both convs + both Mish activations fuse into the one kernel; the first
  conv's output stays in a VMEM scratch ref and is re-im2col'ed for the
  second conv without touching HBM.
- long rows are processed in static-unrolled tiles of <= 1024 frames so the
  im2col buffer stays ~4 MB.

Weights are pre-flattened to ``(groups/m, m, k*cg, cg)``, rows t-major then
in-channel, matching the im2col column order (``flatten_grouped_weights``).

Training takes the XLA formulation: callers wrap this in a
``jax.custom_vjp`` whose backward differentiates the reference conv (see
``models/modules.py:_conv_pos_fused``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILES = (1024, 768, 512, 384, 256, 128, 64, 32, 16, 8)


def pick_tile(n: int) -> int | None:
    # n >= 4096: the whole-row x/out/scratch VMEM blocks reach ~3 MB and a
    # 1024-wide tile's im2col buffers (tile x 31*cg) push Mosaic past VMEM —
    # the remote compile-helper process dies (observed on the 4096 serving
    # bucket, round 3). A 512 tile compiles and runs; smaller buckets keep
    # the wider tiles.
    cap = 512 if n >= 4096 else _TILES[0]
    return next((t for t in _TILES if t <= cap and n % t == 0), None)


def pick_cluster(groups: int, cg: int) -> int | None:
    """Smallest m with groups % m == 0 and (m*cg) % 128 == 0."""
    for m in range(1, groups + 1):
        if groups % m == 0 and (m * cg) % 128 == 0:
            return m
    return None


def tap_phases(k: int, phase: int) -> list[list[int]]:
    """Taps grouped by sublane phase: starts within one lane-concat must agree
    mod the sublane tile (16 for bf16, 8 for f32) or Mosaic rejects the concat
    ("result/input offset mismatch on non-concat dimension")."""
    return [[t for t in range(r, k, phase)] for r in range(min(phase, k))]


def flatten_grouped_weights(w: jnp.ndarray, groups: int, cluster: int, phase: int) -> jnp.ndarray:
    """``(k, cg, c_out)`` grouped kernel -> ``(groups/m, m, k*cg, cg)`` with
    rows ordered phase-major (matching ``tap_phases``) then in-channel."""
    k, cg, c_out = w.shape
    co_g = c_out // groups
    perm = [t for group in tap_phases(k, phase) for t in group]
    # (k, cg, groups, co_g) -> (groups, k, cg, co_g), taps reordered
    wg = jnp.transpose(w.reshape(k, cg, groups, co_g), (2, 0, 1, 3))[:, jnp.asarray(perm)]
    return wg.reshape(groups // cluster, cluster, k * cg, co_g)


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _conv_pos_kernel(x_ref, l_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, y1_ref,
                     *, k: int, n: int, tn: int, m: int, phase: int):
    pad = k // 2
    cg = w1_ref.shape[-1]
    phases = tap_phases(k, phase)
    # lens rides whole in SMEM (Mosaic rejects size-1 blocks); pick this row's
    row_len = l_ref[pl.program_id(0), 0]

    def conv_tiles(read_tile, w_ref, b_ref, write_tile, mask_rows: bool):
        """read_tile(lo, hi) returns padded rows [lo, hi) of (., m*cg) input."""
        for i in range(n // tn):
            xp = read_tile(i * tn, i * tn + tn + 2 * pad)  # (tn + 2*pad, m*cg)
            outs = []
            for j in range(m):
                xg = xp[:, j * cg : (j + 1) * cg]
                acc = b_ref[0, j].astype(jnp.float32)
                row = 0
                for taps in phases:  # phase-aligned lane concats; K = len(taps)*cg
                    cols = (
                        xg[taps[0] : taps[0] + tn]
                        if len(taps) == 1
                        else jnp.concatenate([xg[t : t + tn] for t in taps], axis=1)
                    )
                    w = w_ref[0, j, row : row + len(taps) * cg]
                    acc = acc + jax.lax.dot_general(
                        cols, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                    )
                    row += len(taps) * cg
                outs.append(_mish(acc))
            y = jnp.concatenate(outs, axis=1)  # (tn, m*cg)
            if mask_rows:
                # zero the intermediate past the row's valid length so conv2's
                # taps see the same zero boundary the reference's batch-1
                # (unpadded) call sees — row output becomes bucket-invariant
                rows = jax.lax.broadcasted_iota(jnp.int32, (tn, 1), 0) + i * tn
                y = jnp.where(rows < row_len, y, 0.0)
            write_tile(i * tn, y)

    zeros = jnp.zeros((pad, m * cg), x_ref.dtype)
    xp_full = jnp.concatenate([zeros, x_ref[0], zeros], axis=0)  # (n + 2*pad, m*cg)

    # conv1 -> scratch (stored padded so conv2 reads need no edge logic)
    y1_ref[0:pad] = jnp.zeros((pad, m * cg), y1_ref.dtype)
    y1_ref[pad + n : 2 * pad + n] = jnp.zeros((pad, m * cg), y1_ref.dtype)
    conv_tiles(
        lambda lo, hi: xp_full[lo:hi],
        w1_ref, b1_ref,
        lambda lo, y: y1_ref.__setitem__(slice(pad + lo, pad + lo + tn), y.astype(y1_ref.dtype)),
        mask_rows=True,
    )
    # conv2 -> output
    conv_tiles(
        lambda lo, hi: y1_ref[lo:hi],
        w2_ref, b2_ref,
        lambda lo, y: o_ref.__setitem__((0, slice(lo, lo + tn)), y.astype(o_ref.dtype)),
        mask_rows=False,
    )


@functools.partial(jax.jit, static_argnames=("groups", "kernel_size", "interpret"))
def conv_pos_pallas(
    x: jnp.ndarray,  # (b, n, c)
    w1: jnp.ndarray,  # (k, cg, c) grouped kernel
    b1: jnp.ndarray,  # (c,)
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    groups: int = 16,
    kernel_size: int = 31,
    interpret: bool | None = None,
    lens: jnp.ndarray | None = None,  # (b,) int32 valid prefix per row
) -> jnp.ndarray:
    b, n, c = x.shape
    cg = c // groups
    tn = pick_tile(n)
    m = pick_cluster(groups, cg)
    assert tn is not None and m is not None, (n, groups, cg)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    gm = groups // m
    phase = 16 if x.dtype.itemsize == 2 else 8  # sublane tile height
    w1f = flatten_grouped_weights(w1.astype(x.dtype), groups, m, phase)
    w2f = flatten_grouped_weights(w2.astype(x.dtype), groups, m, phase)
    bg1 = b1.reshape(gm, m, 1, cg)
    bg2 = b2.reshape(gm, m, 1, cg)
    pad = kernel_size // 2
    kcg = kernel_size * cg
    if lens is None:
        lens = jnp.full((b,), n, jnp.int32)
    # 2-D grid (batch, group-cluster); channel clusters sliced in-place by
    # block specs — no HBM re-layout of x or the output
    grid = (b, gm)
    out = pl.pallas_call(
        functools.partial(_conv_pos_kernel, k=kernel_size, n=n, tn=tn, m=m, phase=phase),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, m * cg), lambda bi, g: (bi, 0, g), memory_space=pltpu.VMEM),
            # whole (b, 1) lens array in SMEM; the kernel indexes by program_id
            pl.BlockSpec((b, 1), lambda bi, g: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m, kcg, cg), lambda bi, g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 1, cg), lambda bi, g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, kcg, cg), lambda bi, g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 1, cg), lambda bi, g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, m * cg), lambda bi, g: (bi, 0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((n + 2 * pad, m * cg), x.dtype)],
        interpret=interpret,
    )(x, lens.astype(jnp.int32).reshape(b, 1), w1f, bg1, w2f, bg2)
    return out
