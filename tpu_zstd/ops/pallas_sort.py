"""Row-wise bitonic sort as a Pallas TPU kernel.

The compress pipeline is built on sorts (match finding, position restore,
extraction/compaction, merge — see ops/lz77_jax.py). XLA's generic TPU sort
moves ~330M rows/s on v5e regardless of row width; a bitonic network runs
entirely in VMEM as lane/sublane rotates + selects on the VPU, with no HBM
round-trips between stages. For the (rows, 8192) match-finder sorts this is
measured ~an order of magnitude faster (tools/psort_micro.py).

Layout: each row of W = 2^LOG elements maps to a (W // 128, 128) VMEM tile
with element index i = sublane * 128 + lane. A compare-exchange at XOR
distance d is then

    d < 128:  partner along lanes     (pltpu.roll axis 1)
    d >= 128: partner along sublanes  (pltpu.roll axis 0)

and the ascending/descending direction of element i at merge level k is bit
k+1 of i. Keys must be DISTINCT within a row (the callers pack a unique
position into the low bits); payload routing follows key comparison, which is
ill-defined under ties.

This mirrors what the reference gets from CUB device radix sorts
(reference src/cuda_zstd_utils.cu:118 `parallel_sort_dmers`, and the hash-
chain ordering it builds per thread at src/lz77_parallel.cu:26): same role —
group equal hashes, restore position order — different machine-native tool.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32

LANES = 128


def _ce_stage(ops: list[jax.Array], d: int, kbit: int, sub_ids, lane_ids):
    """One compare-exchange stage at XOR distance d (STATIC), direction from
    bit `kbit` (static power of two) of the element index. ops[0] is the key;
    every operand is (SUBS, 128) i32.

    Static distances matter: pltpu.roll with a compile-time shift lowers to a
    single lane/sublane shuffle, while a traced shift (the previous fori_loop
    formulation) lowered to a dynamic rotate + per-stage lax.cond — measured
    ~4x slower for the whole network (tools/psort_micro.py)."""
    key = ops[0]
    SUBS = key.shape[0]
    i_flat = sub_ids * LANES + lane_ids

    def roll_pair(x):
        # partner value at index i ^ d: elements with (i & d) == 0 need
        # x[i + d] (roll -d), the rest x[i - d] (roll +d).
        if d < LANES:
            return pltpu.roll(x, (-d) % LANES, 1), pltpu.roll(x, d, 1)
        s = d // LANES
        return pltpu.roll(x, (-s) % SUBS, 0), pltpu.roll(x, s % SUBS, 0)

    bit0 = (i_flat & d) == 0
    p_lo, p_hi = roll_pair(key)
    pkey = jnp.where(bit0, p_lo, p_hi)
    asc = (i_flat & kbit) == 0
    # keep_min = (bit0 == asc); take the partner when (pkey < key) == keep_min
    # (keys are unique, so pkey > key is the complement of pkey < key). XNOR
    # keeps everything in i1 — Mosaic rejects select over bool vectors.
    keep_min = ~(bit0 ^ asc)
    take_partner = ~(keep_min ^ (pkey < key))
    out = [jnp.where(take_partner, pkey, key)]
    for x in ops[1:]:
        q_lo, q_hi = roll_pair(x)
        px = jnp.where(bit0, q_lo, q_hi)
        out.append(jnp.where(take_partner, px, x))
    return out


def _sort_body(ops: list[jax.Array], log_w: int):
    """Full bitonic network over ops (each (SUBS, 128), flat width 2^log_w),
    fully unrolled with static shuffle distances."""
    SUBS = ops[0].shape[0]
    sub_ids = jax.lax.broadcasted_iota(I32, (SUBS, LANES), 0)
    lane_ids = jax.lax.broadcasted_iota(I32, (SUBS, LANES), 1)
    # Final merge (k = log_w - 1) has kbit = 2^log_w: bit always 0 -> ascending.
    for k in range(log_w):
        kbit = 2 << k  # direction bit for merge level k
        for j in range(k + 1):
            d = (1 << k) >> j
            ops = _ce_stage(ops, d, kbit, sub_ids, lane_ids)
    return ops


def _make_kernel(n_ops: int, log_w: int):
    def kernel(*refs):
        ins, outs = refs[:n_ops], refs[n_ops:]
        ops = [r[0] for r in ins]
        ops = _sort_body(ops, log_w)
        for o_ref, val in zip(outs, ops):
            o_ref[0] = val

    return kernel


@functools.partial(jax.jit, static_argnums=(1,))
def _sort_rows_impl(ops: tuple[jax.Array, ...], interpret: bool):
    R, W = ops[0].shape
    log_w = (W - 1).bit_length()
    SUBS = W // LANES
    n = len(ops)
    spec = pl.BlockSpec((1, SUBS, LANES), lambda r: (r, 0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_kernel(n, log_w),
        out_shape=tuple(jax.ShapeDtypeStruct((R, SUBS, LANES), I32) for _ in range(n)),
        grid=(R,),
        in_specs=[spec] * n,
        out_specs=tuple([spec] * n),
        interpret=interpret,
    )(*[x.reshape(R, SUBS, LANES) for x in ops])
    return tuple(o.reshape(R, W) for o in outs)


@jax.custom_batching.custom_vmap
def sort_rows(*ops: jax.Array) -> tuple[jax.Array, ...]:
    """Sort each row of the (R, W) i32 operands ascending by ops[0].

    W must be a power of two and a multiple of 1024 (sublane-aligned tiles).
    Keys must be unique within each row (ties mis-route payloads). Returns
    the reordered operands. vmap collapses batch axes into the row grid.
    """
    W = ops[0].shape[-1]
    assert W & (W - 1) == 0 and W >= 1024, W
    interpret = jax.default_backend() != "tpu"
    return _sort_rows_impl(tuple(o.astype(I32) for o in ops), interpret)


@sort_rows.def_vmap
def _sort_rows_vmap(axis_size, in_batched, *ops):
    ops = [
        o if b else jnp.broadcast_to(o, (axis_size,) + o.shape)
        for o, b in zip(ops, in_batched)
    ]
    W = ops[0].shape[-1]
    flat = sort_rows(*[o.reshape(-1, W) for o in ops])
    shape = ops[0].shape
    return tuple(o.reshape(shape) for o in flat), tuple(True for _ in flat)


def sort_1d(*ops: jax.Array) -> tuple[jax.Array, ...]:
    """sort_rows over 1-D operands (one row); vmap-friendly entry point."""
    outs = sort_rows(*[o[None] for o in ops])
    return tuple(o[0] for o in outs)


def sortable(width: int) -> bool:
    """Whether sort_rows supports this row width."""
    return width >= 1024 and width & (width - 1) == 0
