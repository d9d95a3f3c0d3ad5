"""Greedy-parse segment walk as a Pallas TPU kernel.

The greedy parse is an exact sequential walk over each SEG-byte segment
(ops/lz77_jax.py greedy_parse; the reference does it one thread per position,
reference src/lz77_parallel.cu:177 `greedy_parse_kernel`). As a lax.scan of
SEG steps it costs ~15 ms of the parse stage at 64x128KB — each step does ~12
elementwise ops on a few vregs, so XLA's per-iteration loop overhead
dominates. Here the whole walk runs inside one kernel: segments lie along
(sublane-group, lane) tiles, the step loop is a fori over VMEM rows, and each
step is ~15 vector instructions — ~1 ms for the same batch.

Layout: input is (S, seg) i32 rows-as-segments, packed as
    step | matched << 11 | defer << 12      (step <= seg <= 2048)
transposed host-side to (seg, S) so a step reads one contiguous row tile.
Output packs  take | is_lit << 1  per position as u8 in the same (seg, S)
layout; the wrapper transposes back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
LANES = 128
GB = 8  # sublane group: segments per lane-tile row


def _make_kernel(seg: int):
    def kernel(in_ref, out_ref):
        def step(p, carry):
            na, me = carry  # next-allowed, match-end: (GB, LANES) i32
            x = in_ref[p]
            stp = x & (2 * seg - 1)
            m = (x >> 11) & 1
            d = (x >> 12) & 1
            is_pp = na == p
            take = is_pp & (m == 1) & (d == 0)
            adv = jnp.where(take, stp, 1)
            new_me = jnp.where(take, p + stp, me)
            new_na = jnp.where(is_pp, p + adv, na)
            is_lit = p >= new_me
            # i32 arithmetic, u8 store (Mosaic rejects vector i8 shifts).
            out_ref[p] = (take.astype(I32) + jnp.where(is_lit, 2, 0)).astype(
                jnp.uint8
            )
            return new_na, new_me

        z = jnp.zeros((GB, LANES), I32)
        jax.lax.fori_loop(0, seg, step, (z, z))

    return kernel


@functools.partial(jax.jit, static_argnums=(1,))
def _greedy_impl(packed_t: jax.Array, interpret: bool):
    """packed_t: (seg, S) i32, S a multiple of GB*LANES."""
    seg, S = packed_t.shape
    cells = S // (GB * LANES)
    spec = lambda dt: pl.BlockSpec(  # noqa: E731
        (seg, GB, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _make_kernel(seg),
        out_shape=jax.ShapeDtypeStruct((seg, cells * GB, LANES), jnp.uint8),
        grid=(cells,),
        in_specs=[spec(I32)],
        out_specs=spec(jnp.uint8),
        interpret=interpret,
    )(packed_t.reshape(seg, cells * GB, LANES))
    return out.reshape(seg, S)


@jax.custom_batching.custom_vmap
def greedy_segments(packed: jax.Array) -> jax.Array:
    """Run the greedy walk over (S, seg) packed segments; returns (S, seg) u8
    of take | is_lit << 1. vmap collapses batch axes into the segment rows."""
    S, seg = packed.shape
    TILE = GB * LANES
    pad = (-S) % TILE
    if pad:
        packed = jnp.concatenate(
            [packed, jnp.ones((pad, seg), I32)], axis=0  # step=1, no match
        )
    interpret = jax.default_backend() != "tpu"
    out = _greedy_impl(packed.T, interpret).T
    return out[:S] if pad else out


@greedy_segments.def_vmap
def _greedy_segments_vmap(axis_size, in_batched, packed):
    if not in_batched[0]:
        packed = jnp.broadcast_to(packed, (axis_size,) + packed.shape)
    B, S, seg = packed.shape
    out = greedy_segments(packed.reshape(B * S, seg))
    return out.reshape(B, S, seg), True
