"""Variable-length segment concatenation as ONE Pallas pass.

The windowed extraction in ops/lz77_jax.py produces, per block, `NW` window-
local compacted segments (sequence rows / literal bytes) that must be
concatenated at cumsum offsets into one dense array. Doing that with NW
`place` rotates costs NW full-width passes over the output buffer (measured
~30 ms at (128, 32K..128K) x 48 calls on v5e — it ate the savings of the
windowed extraction sort), and a chunked-copy kernel was no better (~500 ns
per dynamic 128-lane read-modify-write). This kernel moves each segment with
ONE whole-tile flat rotate plus ONE static-size masked read-modify-write at
a dynamic row offset:

    out[S + i] = src[o + i]  for i < cnt

Rolling the source tile right by (S - o) mod 128 makes out row (S >> 7) + r
equal rolled row r exactly, so the merge is `buf[R0 : R0 + WR + 1] =
select(mask, rolled, buf[...])` — all static-shape vector work, two dynamic
sublane offsets per segment total.

The reference has no equivalent op (CUDA scatters handle varlen compaction,
reference src/cuda_zstd_manager.cu:2688-2745 gathers per-block sizes with
prefix sums); this is TPU-specific plumbing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


def _flat_roll(x: jax.Array, s: jax.Array) -> jax.Array:
    """Right-roll the flattened (Q, 128) tile by s elements (row-major)."""
    Q, L = x.shape
    s_l = s % L
    s_q = s // L
    a = pltpu.roll(x, s_l, 1)
    b = pltpu.roll(a, s_q, 0)
    c = pltpu.roll(a, s_q + 1, 0)
    lane = jax.lax.broadcasted_iota(I32, (Q, L), 1)
    return jnp.where(lane < s_l, c, b)


def _pad_rows(wr: int) -> int:
    """Tile rows: >= wr + 1 (overshoot row), 8-row aligned for Mosaic's
    sublane dynamic_rotate."""
    return -(-(wr + 1) // 8) * 8


def _kern(off_ref, cnt_ref, x_ref, o_ref, buf, *, NW: int, WR: int, OR: int):
    b = pl.program_id(0)
    T = _pad_rows(WR)
    buf[:, :] = jnp.zeros((OR + T, 128), I32)
    lane = jax.lax.broadcasted_iota(I32, (T, 128), 1)
    row = jax.lax.broadcasted_iota(I32, (T, 128), 0)
    flat = row * 128 + lane

    def win_body(w, S):
        cnt = jnp.minimum(cnt_ref[b, w], OR * 128 - S)
        o = off_ref[b, w]
        R0 = S >> 7
        a = S & 127
        tile = x_ref[0, w]                      # (T, 128)
        rolled = _flat_roll(tile, (a - o) % (T * 128))
        mask = (flat >= a) & (flat < a + cnt)
        cur = buf[pl.ds(R0, T), :]
        buf[pl.ds(R0, T), :] = jnp.where(mask, rolled, cur)
        return S + cnt

    jax.lax.fori_loop(0, NW, win_body, 0)
    o_ref[0] = buf[:OR, :]


def _batched(x: jax.Array, src_off: jax.Array, counts: jax.Array, out_len: int):
    """x: (B, NW, W) int32; counts/src_off: (B, NW). Segment w of block b is
    x[b, w, src_off[b,w] : src_off[b,w] + counts[b,w]]; segments concatenate
    in window order at exclusive-cumsum offsets. Requires W % 128 == 0,
    out_len % 128 == 0, sum(counts[b]) <= out_len, src_off + counts <= W.
    Note: a + cnt <= 128 + W < T * 128 keeps the mask range inside the tile."""
    B, NW, W = x.shape
    WR = W // 128
    OR = out_len // 128
    T = _pad_rows(WR)
    xp = jnp.pad(x.reshape(B, NW, WR, 128), ((0, 0), (0, 0), (0, T - WR), (0, 0)))
    kern = functools.partial(_kern, NW=NW, WR=WR, OR=OR)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, NW, T, 128), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, OR, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, OR, 128), I32),
        scratch_shapes=[pltpu.VMEM((OR + T, 128), I32)],
        interpret=jax.default_backend() != "tpu",
    )(src_off.astype(I32), counts.astype(I32), xp)
    return out.reshape(B, out_len)


@functools.lru_cache(maxsize=None)
def _concat_fn(out_len: int):
    @jax.custom_batching.custom_vmap
    def f(x, src_off, counts):
        return _batched(x[None], src_off[None], counts[None], out_len)[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, x, src_off, counts):
        xb, ob, cb = in_batched
        if not xb:
            x = jnp.broadcast_to(x, (axis_size,) + x.shape)
        if not ob:
            src_off = jnp.broadcast_to(src_off, (axis_size,) + src_off.shape)
        if not cb:
            counts = jnp.broadcast_to(counts, (axis_size,) + counts.shape)
        return _batched(x, src_off, counts, out_len), True

    return f


def concat_varlen(
    x: jax.Array, src_off: jax.Array, counts: jax.Array, out_len: int
) -> jax.Array:
    """Concatenate NW variable-length segments of x (NW, W) int32 into one
    (out_len,) array (zeros beyond the total). vmap-compatible (batch axes
    collapse into the kernel grid)."""
    return _concat_fn(out_len)(x, src_off, counts)
