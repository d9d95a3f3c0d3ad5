"""Pallas TPU kernel for the triple FSE encoder state chain.

Drop-in accelerator for ops/fse_jax._state_chain3_cf (same fixpoint algorithm,
same outputs): the XLA formulation spends ~30 ms per 64x128KB batch because
every closed-form transition has to emulate the shared state-table lookup with
a 16-way packed-word select sweep inside a lax.scan, and the fixpoint repeats
that scan 2-4x. Inside a Mosaic kernel the lookup is ONE per-lane
`take_along_axis` from a (8, 128) bank (~17-cycle VREG op — the same primitive
that carries ops/pallas_decode.py), so the whole chain collapses to a few
vector ops per serial step.

Layout (per block, grid over the batch):
  - CHUNK = 128 serial steps per chunk; nc = msb // CHUNK chunks per stream.
  - 8 sublane rows x 128 lanes; stream k owns rows [k*RS, (k+1)*RS) with
    RS = ceil(nc / 128) (1 for msb <= 16 K, 2 up to 32 K); chunk c of a stream
    sits at (row k*RS + c // 128, lane c % 128). One row never mixes streams,
    so each row carries its own state/dnb/dfs table bank (tables are <= 64
    entries: custom tables are built at TL=6 and the predefined logs are <= 6).
  - The chunk-entry fixpoint (see _state_chain3_cf's derivation comment)
    iterates: walk all chunks from guessed entries, then shift finals right by
    one chunk (a lane rotate + row-boundary fixup) until entries stop changing.
    A final recording walk writes per-step (pre_state | nb << 6) and finals.

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


def _chain_kernel(nseq_ref, sym_ref, banks_ref, out_ref, fin_ref, *, RS: int, nc: int):
    b = pl.program_id(0)
    nseq = nseq_ref[b]
    st_b = banks_ref[0, 0]
    dnb_b = banks_ref[0, 1]
    dfs_b = banks_ref[0, 2]
    ts_b = banks_ref[0, 3]
    init_b = banks_ref[0, 4]
    live = banks_ref[0, 5] == 0  # 0 = live row; 1 = RLE stream or pad row

    row = jax.lax.broadcasted_iota(I32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(I32, (8, 128), 1)
    c = (row & (RS - 1)) * 128 + lane  # chunk id within the row's stream
    base_t = c * CHUNK
    first = ((row & (RS - 1)) == 0) & (lane == 0)

    def taa(bank, idx):
        return jnp.take_along_axis(bank, jnp.clip(idx, 0, 127), axis=1)

    def walk(entries, record: bool):
        def body(i, state):
            sym = sym_ref[0, i]
            valid = (base_t + i + 1 < nseq) & live
            value = ts_b + state
            nb = jnp.clip((value + taa(dnb_b, sym)) >> 16, 0, 31)
            idx = (value >> nb) + taa(dfs_b, sym)
            nxt = taa(st_b, idx) - ts_b
            if record:
                out_ref[0, pl.ds(i, 1)] = (state | (jnp.where(valid, nb, 0) << 6))[None]
            return jnp.where(valid, nxt, state)

        return jax.lax.fori_loop(0, CHUNK, body, entries)

    def shift_entries(f):
        e = jnp.roll(f, 1, axis=1)  # entry[c] = final[c-1] within a row
        if RS == 2:
            # Odd rows continue their stream's even row: lane 0 takes the
            # previous row's lane 127.
            cross = jnp.roll(jnp.roll(f, 1, axis=0), 1, axis=1)
            e = jnp.where((lane == 0) & ((row & 1) == 1), cross, e)
        return jnp.where(first, init_b, e)

    real = (base_t + 1 < nseq) & live  # chunk has at least one live step

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
    fin_ref[0] = walk(entries, record=True)


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
    S = dnb3.shape[2]

    krow = np.minimum(np.arange(8) // RS, 2)  # row -> stream (pads map to 2)
    dead = (np.arange(8) >= 3 * RS).astype(np.int32)

    def bank_of(a):  # (B, 3, W<=128) -> (B, 8, 128)
        a = jnp.pad(a, ((0, 0), (0, 0), (0, 128 - a.shape[2])))
        return a[:, jnp.asarray(krow), :]

    ts3 = (1 << tl3).astype(I32)
    # Init state of each stream = init3[k, first symbol].
    init_k = jnp.take_along_axis(init3, rsym3[:, :, :1].astype(I32), axis=2)[..., 0]
    init_k = jnp.where(rle3, 0, init_k)
    rle_row = (rle3.astype(I32)[:, jnp.asarray(krow)] | jnp.asarray(dead)[None, :])
    banks = jnp.stack(
        [
            bank_of(st3.astype(I32)),
            bank_of(dnb3.astype(I32)),
            bank_of(dfs3.astype(I32)),
            jnp.broadcast_to(ts3[:, jnp.asarray(krow), None], (B, 8, 128)),
            jnp.broadcast_to(init_k[:, jnp.asarray(krow), None], (B, 8, 128)),
            jnp.broadcast_to(rle_row[:, :, None], (B, 8, 128)),
        ],
        axis=1,
    )

    # Step symbols: step s consumes rsym[s+1]; lay out as (B, CHUNK, 8, 128).
    st_sym = jnp.roll(rsym3.astype(I32), -1, axis=2).reshape(B, 3, nc, CHUNK)
    st_sym = jnp.pad(st_sym, ((0, 0), (0, 0), (0, RS * 128 - nc), (0, 0)))
    st_sym = st_sym.reshape(B, 3 * RS, 128, CHUNK)
    st_sym = jnp.pad(st_sym, ((0, 0), (0, 8 - 3 * RS), (0, 0), (0, 0)))
    sym = jnp.transpose(st_sym, (0, 3, 1, 2))  # (B, CHUNK, 8, 128)

    kern = functools.partial(_chain_kernel, RS=RS, nc=nc)
    packed, finals = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CHUNK, 8, 128), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, 8, 128), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, CHUNK, 8, 128), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, CHUNK, 8, 128), I32),
            jax.ShapeDtypeStruct((B, 8, 128), I32),
        ],
        interpret=interpret,
    )(nseq.astype(I32), sym, banks)

    # (B, CHUNK, 8, 128) -> (B, 3, msb) in step order, then the t = s+1 roll.
    pk = jnp.transpose(packed, (0, 2, 3, 1))  # (B, 8, 128, CHUNK)
    pk = pk[:, : 3 * RS].reshape(B, 3, RS * 128 * CHUNK)[:, :, : nc * CHUNK]
    pre = jnp.roll(pk & 63, 1, axis=2)
    nb = jnp.roll(pk >> 6, 1, axis=2)
    pre = jnp.where(rle3[:, :, None], 0, pre)

    # Flush state = final of the last real chunk (init when nseq <= 1).
    c_last = jnp.maximum(nseq.astype(I32) - 2, 0) // CHUNK  # (B,)
    k_ar = jnp.arange(3)
    rows = k_ar[None, :] * RS + c_last[:, None] // 128  # (B, 3)
    lanes = jnp.broadcast_to((c_last % 128)[:, None], rows.shape)
    fin = finals[jnp.arange(B)[:, None], rows, lanes]
    fin = jnp.where(rle3, 0, fin)
    return pre, fin, nb
