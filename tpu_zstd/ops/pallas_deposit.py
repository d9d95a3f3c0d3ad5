"""Pallas TPU kernel for bit deposit (experimental alternative to the XLA
scatter in ops/bitpack.py).

Motivation (measured, see SURVEY §7.3 hard-part 1): XLA scatter-add moves
~130M elem/s on v5e, making the two deposit scatters the largest single cost
of both the FSE sequence section and the Huffman literal streams. Bit offsets
are MONOTONE, so 128 consecutive fields span a bounded word window; this
kernel materializes each chunk's window with a one-hot multiply-accumulate
(pure VPU) and read-modify-writes it at a 128-word-aligned dynamic offset —
no per-lane scatter anywhere.

Exactness: u32 contributions are split into 16-bit halves accumulated in
float32 (a word's half receives < 2^7 field contributions of < 2^16 each,
well inside f32's 24-bit exact-integer range); disjoint bit ranges mean no
carries between halves.

Layout: fields reshaped to (B, M/128, 128) (Mosaic tiling); the word
accumulator lives in VMEM as (NW/128, 128) rows; each chunk's 512-word local
window targets 4 aligned rows. Grid = (num_blocks,).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
F32 = jnp.float32
U32 = jnp.uint32

CHUNK_F = 128          # fields per inner iteration
W_LOC = 512            # aligned local window: 128 (alignment) + <=130 span, padded
W_ROWS = W_LOC // 128


def _deposit_kernel(vals_ref, lens_ref, offs_ref, words_ref, acc_lo, acc_hi):
    """One block: vals/lens/offs (1, M/128, 128); words (1, NW/128, 128)."""
    nchunks = vals_ref.shape[1]
    nwrows = words_ref.shape[1]

    acc_lo[...] = jnp.zeros_like(acc_lo)
    acc_hi[...] = jnp.zeros_like(acc_hi)

    def body(k, _):
        v = vals_ref[0, k, :].astype(U32)
        ln = lens_ref[0, k, :]
        off = offs_ref[0, k, :]
        mask = jnp.where(
            ln >= 32, U32(0xFFFFFFFF),
            (U32(1) << jnp.minimum(ln, 31).astype(U32)) - U32(1),
        )
        v = v & mask
        live = ln > 0
        row0 = jnp.minimum(off[0] >> 12, nwrows - W_ROWS)  # 128-word-aligned base
        wrel = (off >> 5) - row0 * 128                     # < 128 + 130 < W_LOC
        sh = (off & 31).astype(U32)
        lo = v << sh
        hi = (v >> U32(1)) >> (U32(31) - sh)

        lane = jax.lax.broadcasted_iota(I32, (CHUNK_F, 128), 1)
        tgt_lo = jnp.where(live, wrel, W_LOC)  # dead fields fall outside
        tgt_hi = jnp.where(live, wrel + 1, W_LOC)

        # Mosaic lacks direct u32<->f32 casts; parts are <= 0xFFFF so the
        # i32 hop is exact. One (CHUNK_F, 128) one-hot sum per window row.
        def acc_part(part_u32, tgt, r):
            pf = part_u32.astype(I32).astype(F32)
            hit = ((tgt[:, None] - r * 128) == lane).astype(F32)
            return jnp.sum(hit * pf[:, None], axis=0)

        lo_lo, lo_hi = lo & U32(0xFFFF), lo >> 16
        hi_lo, hi_hi = hi & U32(0xFFFF), hi >> 16
        # Only rows [rmin, rmax] receive hits (offsets are monotone, typical
        # chunks span 1-2 rows); skip the rest.
        last_live = jnp.max(jnp.where(live, wrel, 0))
        rmin = wrel[0] // 128
        rmax = (last_live + 1) // 128
        for r in range(W_ROWS):
            @pl.when((r >= rmin) & (r <= rmax))
            def _():
                row_lo = acc_part(lo_lo, tgt_lo, r) + acc_part(hi_lo, tgt_hi, r)
                row_hi = acc_part(lo_hi, tgt_lo, r) + acc_part(hi_hi, tgt_hi, r)
                sl = pl.ds(row0 + r, 1)
                acc_lo[sl, :] = acc_lo[sl, :] + row_lo[None, :]
                acc_hi[sl, :] = acc_hi[sl, :] + row_hi[None, :]
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    # f32 -> u32 via the i32 hop (halves are < 2^24, so the cast is exact).
    words_ref[0, :, :] = (
        acc_lo[...].astype(I32).astype(U32)
        + (acc_hi[...].astype(I32).astype(U32) << U32(16))
    )


@functools.partial(jax.jit, static_argnums=(3, 4))
def deposit_bits_pallas(
    values: jax.Array,   # (B, M) uint32/int32
    lengths: jax.Array,  # (B, M) int32
    offsets: jax.Array,  # (B, M) int32, monotone per row
    num_words: int,
    interpret: bool = False,
) -> jax.Array:
    """Batched Pallas bit deposit. Returns (B, num_words_padded) uint32 where
    num_words_padded rounds num_words up to a multiple of 128 (+ window
    margin). Requires M % 128 == 0; zero-length pad fields must repeat the
    last real offset so chunk bases stay monotone."""
    B, M = values.shape
    assert M % CHUNK_F == 0
    nw = -(-max(num_words, W_LOC) // 128) * 128 + W_LOC
    v3 = values.astype(U32).reshape(B, M // CHUNK_F, CHUNK_F)
    l3 = lengths.astype(I32).reshape(B, M // CHUNK_F, CHUNK_F)
    o3 = offsets.astype(I32).reshape(B, M // CHUNK_F, CHUNK_F)
    out = pl.pallas_call(
        _deposit_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, M // CHUNK_F, CHUNK_F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M // CHUNK_F, CHUNK_F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M // CHUNK_F, CHUNK_F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nw // 128, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nw // 128, 128), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((nw // 128, 128), F32),
            pltpu.VMEM((nw // 128, 128), F32),
        ],
        interpret=interpret,
    )(v3, l3, o3)
    return out.reshape(B, nw)
