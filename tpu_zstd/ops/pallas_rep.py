"""Exact repeat-offset (repcode) assignment as a Pallas TPU kernel.

RFC 8878 offset-base values may name one of three rolling repeat offsets
instead of spelling the offset (format/sequences.py encode_offset is the
host-side rule; the reference resolves them at sequence.cu:209
`compute_sequence_details_kernel` with init {1,4,8}). Emitting repcodes costs
1-2 offset bits instead of ~log2(offset), but the history is a sequential
3-entry move-to-front state — one step per sequence.

This kernel walks each block's sequence list in VMEM (blocks ride lanes, the
step loop is a fori over sequence rows, like ops/pallas_greedy.py). Blocks
are compressed independently while repcode history persists across blocks in
a frame (RFC §3.1.1.5), so the initial history is UNKNOWN: each entry carries
a known-flag and matches are only taken against entries whose value was
established inside the block. The decoder's history VALUES evolve identically
either way, so emitted frames stay stock-libzstd-decodable.

Input per sequence row, packed i32:  off | has_lit << 21 | valid << 22
Output: offset-base value (1..3 or off + 3), 0 on invalid rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
LANES = 128
GB = 8

M21 = (1 << 21) - 1


def _rep_step(x, state):
    """One encode_offset step on (…,) i32 vectors. state = (v0,v1,v2,k0,k1,k2)
    with k* in {0,1}. Returns (ob, new_state)."""
    v0, v1, v2, k0, k1, k2 = state
    off = x & M21
    has_ll = (x >> 21) & 1
    valid = (x >> 22) & 1

    h0 = (k0 == 1) & (off == v0)
    h1 = (k1 == 1) & (off == v1)
    h2 = (k2 == 1) & (off == v2)
    hm1 = (k0 == 1) & (off == v0 - 1) & (off != 0)  # ll==0 repcode 3

    ll = has_ll == 1
    # Priority chains per the host rule (format/sequences.py:87-103).
    ob_ll = jnp.where(h0, 1, jnp.where(h1, 2, jnp.where(h2, 3, off + 3)))
    ob_nl = jnp.where(h1, 1, jnp.where(h2, 2, jnp.where(hm1, 3, off + 3)))
    ob = jnp.where(ll, ob_ll, ob_nl)

    # History update by case, in the host rule's priority order:
    #   unchanged            : ll>0 naming entry 0
    #   swap01  [v1, v0, v2] : entry-1 hit (either ll case)
    #   rot2    [v2, v0, v1] : entry-2 hit (either ll case)
    #   push    [off, v0, v1]: new offset, and the ll==0 off==v0-1 repcode
    # (pure i1 algebra — Mosaic rejects select over bool vectors)
    unchanged = ll & h0
    swap = (ll & ~h0 & h1) | (~ll & h1)
    rot = (ll & ~h0 & ~h1 & h2) | (~ll & ~h1 & h2)
    n0 = jnp.where(unchanged, v0, jnp.where(swap, v1, jnp.where(rot, v2, off)))
    nk0 = jnp.where(unchanged, k0, jnp.where(swap, k1, jnp.where(rot, k2, 1)))
    n1 = jnp.where(unchanged, v1, v0)
    nk1 = jnp.where(unchanged, k1, k0)
    n2 = jnp.where(unchanged | swap, v2, v1)
    nk2 = jnp.where(unchanged | swap, k2, k1)

    live = valid == 1
    ob = jnp.where(live, ob, 0)
    new_state = tuple(
        jnp.where(live, n, o)
        for n, o in zip((n0, n1, n2, nk0, nk1, nk2), state)
    )
    return ob, new_state


RC = 512  # row chunk: rows stream through VMEM, history in scratch
# (in + out double-buffered: 4 * RC * GB * 128 * 4 B = 8 MB, under the 16 MB
# scoped-vmem limit; RC=1024 measured 16.02 MB — just over.)


def _make_kernel(rc: int):
    def kernel(in_ref, out_ref, st_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            st_ref[...] = jnp.zeros_like(st_ref)

        state = tuple(st_ref[i] for i in range(6))

        def step(t, state):
            ob, new_state = _rep_step(in_ref[t], state)
            out_ref[t] = ob
            return new_state

        state = jax.lax.fori_loop(0, rc, step, state)
        for i, s in enumerate(state):
            st_ref[i] = s

    return kernel


@functools.partial(jax.jit, static_argnums=(1,))
def _rep_impl(packed_t: jax.Array, interpret: bool):
    rows0, S = packed_t.shape
    cells = S // (GB * LANES)
    rc = min(RC, rows0)
    rows = rows0
    if rows % rc:  # pad to a whole row chunk; pad rows carry valid=0 no-ops
        pad = rc - rows % rc
        packed_t = jnp.concatenate(
            [packed_t, jnp.zeros((pad, S), I32)], axis=0
        )
        rows += pad
    spec = pl.BlockSpec(
        (rc, GB, LANES), lambda c, r: (r, c, 0), memory_space=pltpu.VMEM
    )
    # Grid iterates the LAST dim fastest: row chunks run sequentially per
    # lane cell, with the 3-entry history (+ known flags) carried in scratch.
    out = pl.pallas_call(
        _make_kernel(rc),
        out_shape=jax.ShapeDtypeStruct((rows, cells * GB, LANES), I32),
        grid=(cells, rows // rc),
        in_specs=[spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((6, GB, LANES), I32)],
        interpret=interpret,
    )(packed_t.reshape(rows, cells * GB, LANES))
    return out.reshape(rows, S)[:rows0]


@jax.custom_batching.custom_vmap
def rep_codes(packed: jax.Array) -> jax.Array:
    """Offset-base values for (S, rows) packed per-block sequence lists.
    vmap collapses batch axes into S."""
    S, rows = packed.shape
    TILE = GB * LANES
    pad = (-S) % TILE
    if pad:
        packed = jnp.concatenate([packed, jnp.zeros((pad, rows), I32)], axis=0)
    interpret = jax.default_backend() != "tpu"
    out = _rep_impl(packed.T, interpret).T
    return out[:S] if pad else out


@rep_codes.def_vmap
def _rep_codes_vmap(axis_size, in_batched, packed):
    if not in_batched[0]:
        packed = jnp.broadcast_to(packed, (axis_size,) + packed.shape)
    B, S, rows = packed.shape
    return rep_codes(packed.reshape(B * S, rows)).reshape(B, S, rows), True


def rep_codes_scan(packed: jax.Array) -> jax.Array:
    """lax.scan reference implementation: packed (rows,) -> ob (rows,)."""
    z = jnp.zeros((), I32)

    def step(state, x):
        ob, new_state = _rep_step(x, state)
        return new_state, ob

    _, obs = jax.lax.scan(step, (z, z, z, z, z, z), packed)
    return obs
