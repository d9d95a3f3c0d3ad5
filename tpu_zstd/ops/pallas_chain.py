"""Pallas TPU kernel for the triple FSE encoder state chain (batched rows).

Drop-in accelerator for ops/fse_jax._state_chain3_cf (same fixpoint algorithm,
same outputs). v2 ran grid=(B,) with one (8, 128) tile live per block — the
serial fori_loop overhead dominated (~940 cycles/step for ~60 cycles of vector
work; measured 49.5 ms at B=128, msb=12288). v3 flattens ALL blocks' stream
rows into one row axis and walks row-GROUPS of 64 per grid step, so every
serial step advances (64, 128) lanes at once: the loop overhead amortizes 8x
and the taa bank lookups stay per-sublane-row (each row carries its own
tables, so different blocks/streams coexist in one vector op).

Layout:
  - CHUNK = 128 serial steps per chunk; nc = msb // CHUNK chunks per stream.
  - Row r = (block*3 + stream)*RS + j with RS = ceil(nc/128) (1 for
    msb <= 16 K, 2 up to 32 K); chunk c of a stream sits at
    (row base + c // 128, lane c % 128). RS=2 keeps the two rows of a stream
    ADJACENT, so the cross-row entry shift is a roll along the row axis.
  - Rows pad up to a multiple of GROUP (=64); grid iterates over groups.
  - The chunk-entry fixpoint (see _state_chain3_cf's derivation comment)
    iterates: walk all chunks from guessed entries, then shift finals right by
    one chunk until entries stop changing. A final recording walk writes
    per-step (pre_state | nb << 6) and finals.

Counterpart of the reference's sequential per-chunk FSE state pre-pass
(reference src/cuda_zstd_fse_chunk_kernel.cuh:22-70), re-designed for lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32

CHUNK = 128  # serial steps per chunk (fits nc <= 256 in <= 2 rows/stream)
GROUP = 32   # rows per grid step (sym+out i32 blocks double-buffer in VMEM)


def _chain_kernel(sym_ref, banks_ref, out_ref, fin_ref, *, RS: int, nc: int):
    st_b = banks_ref[0]
    dnb_b = banks_ref[1]
    dfs_b = banks_ref[2]
    ts_b = banks_ref[3]
    init_b = banks_ref[4]
    live = banks_ref[5] == 0  # 0 = live row; 1 = RLE stream or pad row
    nseq_b = banks_ref[6]

    R = st_b.shape[0]
    row = jax.lax.broadcasted_iota(I32, (R, 128), 0)
    lane = jax.lax.broadcasted_iota(I32, (R, 128), 1)
    c = (row & (RS - 1)) * 128 + lane  # chunk id within the row's stream
    base_t = c * CHUNK
    first = ((row & (RS - 1)) == 0) & (lane == 0)

    def taa(bank, idx):
        return jnp.take_along_axis(bank, jnp.clip(idx, 0, 127), axis=1)

    def walk(entries, record: bool):
        def body(i, state):
            sym = sym_ref[i]
            valid = (base_t + i + 1 < nseq_b) & live
            value = ts_b + state
            nb = jnp.clip((value + taa(dnb_b, sym)) >> 16, 0, 31)
            idx = (value >> nb) + taa(dfs_b, sym)
            nxt = taa(st_b, idx) - ts_b
            if record:
                out_ref[pl.ds(i, 1)] = (state | (jnp.where(valid, nb, 0) << 6))[None]
            return jnp.where(valid, nxt, state)

        return jax.lax.fori_loop(0, CHUNK, body, entries)

    def shift_entries(f):
        e = jnp.roll(f, 1, axis=1)  # entry[c] = final[c-1] within a row
        if RS == 2:
            # Odd rows continue their stream's even row: lane 0 takes the
            # previous row's lane 127. (Stream row-pairs are adjacent and
            # group sizes are even, so pairs never straddle group bounds.)
            cross = jnp.roll(jnp.roll(f, 1, axis=0), 1, axis=1)
            e = jnp.where((lane == 0) & ((row & 1) == 1), cross, e)
        return jnp.where(first, init_b, e)

    real = (base_t + 1 < nseq_b) & live  # chunk has at least one live step

    def cond(carry):
        it, _, done = carry
        return (done == 0) & (it < nc + 1)

    def body(carry):
        it, e, _ = carry
        e_new = shift_entries(walk(e, record=False))
        # i32 flag (a bool scalar in the while carry trips Mosaic's
        # truncation lowering).
        done = jnp.min(jnp.where(real, (e_new == e).astype(I32), 1))
        return it + 1, e_new, done

    _, entries, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), I32), init_b, jnp.zeros((), I32))
    )
    fin_ref[:] = walk(entries, record=True)


@functools.partial(jax.jit, static_argnums=(8, 9))
def state_chain3_pallas(
    st3: jax.Array,    # (B, 3, 64) state tables (values in [ts, 2ts))
    dnb3: jax.Array,   # (B, 3, S) per-symbol deltaNbBits
    dfs3: jax.Array,   # (B, 3, S) per-symbol deltaFindState
    init3: jax.Array,  # (B, 3, S) per-symbol init states
    tl3: jax.Array,    # (B, 3) table logs
    rle3: jax.Array,   # (B, 3) bool RLE-stream mask
    rsym3: jax.Array,  # (B, 3, msb) symbols in encoder order
    nseq: jax.Array,   # (B,) sequence counts
    msb: int,
    interpret: bool = False,
):
    """Batched triple state chain. Returns (pre (B,3,msb), fin (B,3),
    nb (B,3,msb)) with _state_chain3_cf semantics."""
    B = rsym3.shape[0]
    assert msb % CHUNK == 0
    nc = msb // CHUNK
    RS = -(-nc // 128)
    assert RS in (1, 2), msb

    R0 = B * 3 * RS
    R = -(-R0 // GROUP) * GROUP
    ngroups = R // GROUP

    def bank_of(a):  # (B, 3, W<=128) -> (R, 128)
        a = jnp.pad(a, ((0, 0), (0, 0), (0, 128 - a.shape[2])))
        a = jnp.repeat(a.reshape(B * 3, 128), RS, axis=0) if RS == 2 else a.reshape(
            B * 3, 128
        )
        return jnp.pad(a, ((0, R - R0), (0, 0)))

    def bank_scalar(a):  # (B, 3) -> (R, 128)
        a = a.reshape(B * 3)
        if RS == 2:
            a = jnp.repeat(a, RS, axis=0)
        return jnp.pad(
            jnp.broadcast_to(a[:, None], (R0, 128)), ((0, R - R0), (0, 0))
        )

    ts3 = (1 << tl3).astype(I32)
    # Init state of each stream = init3[k, first symbol].
    init_k = jnp.take_along_axis(init3, rsym3[:, :, :1].astype(I32), axis=2)[..., 0]
    init_k = jnp.where(rle3, 0, init_k)
    # Pad rows are dead (flag 1) so they never iterate nor record.
    dead_pad = jnp.concatenate(
        [jnp.zeros((R0,), I32), jnp.ones((R - R0,), I32)]
    )
    rle_row = bank_scalar(rle3.astype(I32)) | dead_pad[:, None]
    banks = jnp.stack(
        [
            bank_of(st3.astype(I32)),
            bank_of(dnb3.astype(I32)),
            bank_of(dfs3.astype(I32)),
            bank_scalar(ts3),
            bank_scalar(init_k),
            rle_row,
            bank_scalar(jnp.broadcast_to(nseq.astype(I32)[:, None], (B, 3))),
        ],
        axis=0,
    )  # (7, R, 128)

    # Step symbols: step s consumes rsym[s+1]; lay out as (CHUNK, R, 128).
    st_sym = jnp.roll(rsym3.astype(I32), -1, axis=2).reshape(B, 3, nc, CHUNK)
    st_sym = jnp.pad(st_sym, ((0, 0), (0, 0), (0, RS * 128 - nc), (0, 0)))
    st_sym = st_sym.reshape(B * 3 * RS, 128, CHUNK)
    st_sym = jnp.pad(st_sym, ((0, R - R0), (0, 0), (0, 0)))
    sym = jnp.transpose(st_sym, (2, 0, 1))  # (CHUNK, R, 128)

    kern = functools.partial(_chain_kernel, RS=RS, nc=nc)
    packed, finals = pl.pallas_call(
        kern,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec((CHUNK, GROUP, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, GROUP, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, GROUP, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((CHUNK, R, 128), I32),
            jax.ShapeDtypeStruct((R, 128), I32),
        ],
        interpret=interpret,
    )(sym, banks)

    # (CHUNK, R, 128) -> (B, 3, msb) in step order, then the t = s+1 roll.
    pk = jnp.transpose(packed, (1, 2, 0))[:R0]  # (R0, 128, CHUNK)
    pk = pk.reshape(B, 3, RS * 128 * CHUNK)[:, :, : nc * CHUNK]
    pre = jnp.roll(pk & 63, 1, axis=2)
    nb = jnp.roll(pk >> 6, 1, axis=2)
    pre = jnp.where(rle3[:, :, None], 0, pre)

    # Flush state = final of the last real chunk (init when nseq <= 1).
    c_last = jnp.maximum(nseq.astype(I32) - 2, 0) // CHUNK  # (B,)
    k_ar = jnp.arange(3)
    rows = (jnp.arange(B)[:, None] * 3 + k_ar[None, :]) * RS + c_last[:, None] // 128
    lanes = jnp.broadcast_to((c_last % 128)[:, None], rows.shape)
    fin = finals[rows, lanes]
    fin = jnp.where(rle3, 0, fin)
    return pre, fin, nb
