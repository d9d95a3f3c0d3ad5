"""Segment-local optimal parse (BTOPT-style DP) for levels 16-22.

TPU re-design of the reference's optimal-parse kernels (reference
src/cuda_zstd_lz77.cu:627 `optimal_parse_kernel`, :897 v2, bit-cost model at
include/cuda_zstd_lz77.h:201-213 `calculate_match_cost`/`calculate_literal_cost`).

Cost model (round 4): prices are measured per block in 1/16-bit fixed point
(SCALE) from a cheap greedy pre-pass — literal entropy, OF-symbol code bits
by offset class, ML-symbol code bits by length — fed in as a per-block cost
bank (one 128-lane take_along_axis row per block: OF-symbol costs at lanes
[0, 32), per-length match costs at lanes [32, 32 + cap - mm]). The earlier
flat model (6-bit literals / 11-bit match base) mispriced text blocks by
1-2 bits per decision and left L16-22 ratio parity at 85-87%.

Exactness: within a segment the DP is exact over the candidate set (per
position, the single best (ml, off) from find_matches, takeable at ANY length
min_match..ml — shortening a match to line up with a cheaper future match is
what greedy cannot do). Matches are truncated at segment boundaries like the
greedy path; the same-offset merge pass re-joins them.

    cost[p] = min( LIT + cost[p+1],
                   min_{l in [mm, ml_p]} mc_p + MLC[l] + cost[p+l] )

Layout matches ops/pallas_greedy.py: segments ride (sublane-group, lane)
tiles, input transposed to (seg, S); the backward step loop runs in VMEM with
a cost scratch of seg+cap rows. Packed input per position:
    ml | ofc << 7          (ml <= 127, ofc = offset extra bits <= 31)
Output: chosen step per position (1 = literal, else match length), i32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
LANES = 128
GB = 8  # sublane group (Mosaic block shapes need sublane multiples of 8)

SCALE = 16          # fixed-point cost unit: 1/16 bit
LIT_BITS = 6        # default per-literal price when no bank is supplied
MATCH_BASE = 11     # flat LL+ML+OF symbol price (fallback bank)
BIG = 1 << 28


def _mlx(l: int) -> int:
    """Match-length extra bits for length l (RFC 8878 ML code table shape)."""
    if l <= 34:
        return 0
    if l <= 38:
        return 1
    if l <= 46:
        return 2
    if l <= 62:
        return 3
    return 4


def default_cost_bank(mm: int, cap: int):
    """Flat-model bank row (128,): OF-symbol cost at lanes [0, 32) and
    per-length match cost at lanes [32, 32 + cap - mm] (both exclude the
    offset extra bits, added per position from the packed ofc)."""
    import numpy as np

    bank = np.zeros(LANES, np.int32)
    bank[:32] = (MATCH_BASE - 4) * SCALE  # symbol cost w/o length part
    for l in range(mm, cap + 1):
        bank[32 + l - mm] = 4 * SCALE + _mlx(l) * SCALE
    return bank


def _make_kernel(seg: int, mm: int, cap: int):
    lengths = list(range(mm, cap + 1))
    R = cap + 2  # cost ring: slot q%R holds cost[q] for q in [p+1, p+cap+1]

    def kernel(in_ref, lit_ref, bank_ref, out_ref, cost_ref):
        # Ring slots start at 0 == cost beyond the segment end.
        cost_ref[...] = jnp.zeros_like(cost_ref)
        lit_bits = lit_ref[...]  # per-lane (per-block) literal price, scaled
        bank = bank_ref[...]     # (GB, 128) per-sublane(-block) cost bank
        # Hoist the per-length match costs (per-lane): one taa per length.
        mlc = [
            jnp.take_along_axis(
                bank, jnp.full((GB, LANES), 32 + l - mm, I32), axis=1
            )
            for l in lengths
        ]

        def step(i, _):
            p = seg - 1 - i
            x = in_ref[p]
            ml = x & 127
            ofc = (x >> 7) & 31
            ml2 = (x >> 12) & 127
            ofc2 = (x >> 19) & 15
            of_sym = jnp.take_along_axis(bank, ofc, axis=1)
            mc = of_sym + ofc * SCALE
            of_sym2 = jnp.take_along_axis(bank, ofc2, axis=1)
            mc2 = of_sym2 + ofc2 * SCALE
            best = lit_bits + cost_ref[(p + 1) % R]
            chosen = jnp.ones((GB, LANES), I32)
            for li, l in enumerate(lengths):
                ring = cost_ref[(p + l) % R]
                c = jnp.where(ml >= l, mc + mlc[li] + ring, BIG)
                c2 = jnp.where(ml2 >= l, mc2 + mlc[li] + ring, BIG)
                c = jnp.minimum(c, c2)
                take = c < best
                best = jnp.where(take, c, best)
                chosen = jnp.where(take, l, chosen)
            # Slot p%R held cost[p+R] (> p+cap+1: no longer referenced).
            cost_ref[p % R] = best
            out_ref[p] = chosen.astype(jnp.uint8)
            return 0

        jax.lax.fori_loop(0, seg, step, 0)

    return kernel


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _opt_impl(packed_t: jax.Array, lit_bits: jax.Array, bank: jax.Array,
              mm: int, cap: int, interpret: bool):
    seg, S = packed_t.shape
    cells = S // (GB * LANES)
    spec = lambda dt: pl.BlockSpec(  # noqa: E731
        (seg, GB, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _make_kernel(seg, mm, cap),
        out_shape=jax.ShapeDtypeStruct((seg, cells * GB, LANES), jnp.uint8),
        grid=(cells,),
        in_specs=[
            spec(I32),
            pl.BlockSpec((GB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=spec(jnp.uint8),
        scratch_shapes=[pltpu.VMEM((cap + 2, GB, LANES), I32)],
        interpret=interpret,
    )(
        packed_t.reshape(seg, cells * GB, LANES),
        lit_bits.reshape(cells * GB, LANES),
        bank,  # (cells * GB, LANES): one row per 128 segment-rows (= 1 block)
    )
    return out.reshape(seg, S).astype(I32)


def _opt_scan(packed: jax.Array, lit_bits: jax.Array, bank: jax.Array,
              mm: int, cap: int) -> jax.Array:
    """lax.scan reference DP (backend-independent): packed (S, seg) -> steps."""
    S, seg = packed.shape
    x = packed.T  # (seg, S)
    ml = x & 127
    ofc = (x >> 7) & 31
    ml2 = (x >> 12) & 127
    ofc2 = (x >> 19) & 15
    of_sym = jnp.take_along_axis(bank, ofc.T, axis=1).T
    mc = of_sym + ofc * SCALE
    of_sym2 = jnp.take_along_axis(bank, ofc2.T, axis=1).T
    mc2 = of_sym2 + ofc2 * SCALE
    mlc = [bank[:, 32 + l - mm] for l in range(mm, cap + 1)]

    def step(window, inp):
        # window[j] = cost[p + 1 + j] for j in [0, cap]
        ml_p, mc_p, ml2_p, mc2_p = inp
        best = lit_bits + window[0]
        chosen = jnp.ones((S,), I32)
        for li, l in enumerate(range(mm, cap + 1)):
            c = jnp.where(ml_p >= l, mc_p + mlc[li] + window[l - 1], BIG)
            c2 = jnp.where(ml2_p >= l, mc2_p + mlc[li] + window[l - 1], BIG)
            c = jnp.minimum(c, c2)
            take = c < best
            best = jnp.where(take, c, best)
            chosen = jnp.where(take, l, chosen)
        new_window = jnp.concatenate([best[None], window[:-1]], axis=0)
        return new_window, chosen

    w0 = jnp.zeros((cap + 1, S), I32)
    _, steps = jax.lax.scan(step, w0, (ml[::-1], mc[::-1], ml2[::-1], mc2[::-1]))
    return steps[::-1].T  # (S, seg)


@functools.lru_cache(maxsize=None)
def _opt_steps_fn(mm: int, cap: int):
    @jax.custom_batching.custom_vmap
    def f(packed: jax.Array, lit_bits: jax.Array, bank: jax.Array) -> jax.Array:
        S, seg = packed.shape
        if jax.default_backend() != "tpu":
            return _opt_scan(packed, lit_bits, bank, mm, cap)
        TILE = GB * LANES
        pad = (-S) % TILE
        if pad:
            packed = jnp.concatenate([packed, jnp.zeros((pad, seg), I32)], axis=0)
            lit_bits = jnp.concatenate(
                [lit_bits, jnp.full((pad,), LIT_BITS * SCALE, I32)], axis=0
            )
            bank = jnp.concatenate(
                [bank, jnp.broadcast_to(bank[-1:], (pad, LANES))], axis=0
            )
        # One bank row per (GB x LANES) sublane-row of segment rows: rows of
        # one block are contiguous (nseg per block is a multiple of 128 at
        # the shapes that reach the kernel), so every 128th row represents
        # its group.
        out = _opt_impl(packed.T, lit_bits, bank[::LANES], mm, cap, False).T
        return out[:S] if pad else out

    @f.def_vmap
    def _vmap(axis_size, in_batched, packed, lit_bits, bank):
        if not in_batched[0]:
            packed = jnp.broadcast_to(packed, (axis_size,) + packed.shape)
        if not in_batched[1]:
            lit_bits = jnp.broadcast_to(lit_bits, (axis_size,) + lit_bits.shape)
        if not in_batched[2]:
            bank = jnp.broadcast_to(bank, (axis_size,) + bank.shape)
        B, S, seg = packed.shape
        return (
            f(
                packed.reshape(B * S, seg),
                lit_bits.reshape(B * S),
                bank.reshape(B * S, LANES),
            ).reshape(B, S, seg),
            True,
        )

    return f


def opt_steps(packed: jax.Array, mm: int, cap: int,
              lit_bits: jax.Array | None = None,
              cost_bank: jax.Array | None = None) -> jax.Array:
    """DP over (S, seg) packed segments -> (S, seg) chosen steps
    (1 = literal, else take the match at that length).

    lit_bits: per-segment-row literal price in SCALE units (1/16 bit) —
    e.g. measured literal entropy plus amortized LL-symbol cost. Scalar rows
    broadcast. cost_bank: per-row (128,) cost bank (see default_cost_bank);
    rows belonging to one block share one bank.
    """
    import numpy as np

    S = packed.shape[0]
    if lit_bits is None:
        lit_bits = jnp.full((S,), LIT_BITS * SCALE, I32)
    else:
        lit_bits = jnp.broadcast_to(lit_bits.astype(I32), (S,))
    if cost_bank is None:
        cost_bank = jnp.broadcast_to(
            jnp.asarray(default_cost_bank(mm, cap)), (S, LANES)
        )
    else:
        cost_bank = jnp.broadcast_to(cost_bank.astype(I32), (S, LANES))
    return _opt_steps_fn(mm, cap)(packed, lit_bits, cost_bank)
