"""Fused window-local LZ77 match finder as one Pallas TPU kernel.

Replaces the three-dispatch XLA path in ops/lz77_jax.py:find_matches (sort by
hash, depth-d neighbor compares, sort back by position) with a single kernel
per window that never leaves VMEM:

  1. bitonic sort rows by key = hash << plog | pos  (9 operands: key + the
     32-byte suffix words that make chain candidates comparable in-place)
  2. for d in 1..depth: compare with the d-th previous sorted row — equal
     hashes are depth-d chain candidates (the reference walks hash chains one
     thread per position, reference src/lz77_parallel.cu:26-70; sorted-domain
     neighbor compares are the vector-machine equivalent)
  3. bitonic sort (pos, ml << 13 | off) back to position order

The window width W is static (PipelineConfig.mf_win_log); keys are unique
because pos rides the low bits. Sentinel rows (hash == 1 << hash_log marks
positions outside [win_start, n-3)) never produce same-hash pairs: the
compare step requires BOTH hashes below the sentinel, so garbage suffix words
can't manufacture matches even at min_match == 3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sort import _sort_body

I32 = jnp.int32
U32 = jnp.uint32
LANES = 128


def _word_inc_i32(x: jax.Array) -> jax.Array:
    """Matched byte count (0..4) from the XOR of two LE 4-byte words (i32)."""
    xu = x.astype(U32)
    return jnp.where(
        x == 0,
        4,
        ((xu & U32(0xFF)) == 0).astype(I32)
        + ((xu & U32(0xFFFF)) == 0).astype(I32)
        + ((xu & U32(0xFFFFFF)) == 0).astype(I32),
    )


def _prev_flat(x: jax.Array, d: int) -> jax.Array:
    """Value of the d-th previous element in flat (sub*128+lane) order, d < 128.
    First d elements wrap around; callers mask them via hash comparison."""
    a = pltpu.roll(x, d, 1)
    c = pltpu.roll(a, 1, 0)
    lane = jax.lax.broadcasted_iota(I32, x.shape, 1)
    return jnp.where(lane < d, c, a)


def _make_match_kernel(nwords: int, log_w: int, depth: int, plog: int, sentinel: int):
    def kernel(*refs):
        key_ref = refs[0]
        word_refs = refs[1 : 1 + nwords]
        out_ref = refs[1 + nwords]

        ops = [key_ref[0]] + [w[0] for w in word_refs]
        ops = _sort_body(ops, log_w)
        sk = ops[0]
        sw = ops[1:]

        sh = sk >> plog                      # sorted hash (sentinel included)
        sp = sk & ((1 << plog) - 1)          # sorted window-local position

        best_ml = jnp.zeros_like(sk)
        best_off = jnp.zeros_like(sk)
        # Both rows must hold a REAL hash: sentinel rows pair with each other
        # at the top of the key space, and their suffix words are garbage —
        # without this mask they could manufacture matches (min_match == 3
        # would accept the <= 3-byte tail the n-clamp leaves alive).
        my_real = sh < sentinel
        sub_ids = jax.lax.broadcasted_iota(I32, sk.shape, 0)
        lane_ids = jax.lax.broadcasted_iota(I32, sk.shape, 1)
        i_flat = sub_ids * LANES + lane_ids
        for d in range(1, depth + 1):
            ph = _prev_flat(sh, d)
            pp = _prev_flat(sp, d)
            # i_flat >= d: the first d sorted rows have no predecessor (the
            # roll wraps to the window end — same-hash wraps would produce
            # negative offsets).
            same = (ph == sh) & my_real & (i_flat >= d)
            ml = jnp.zeros_like(sk)
            alive = same
            for k in range(nwords):
                x = sw[k] ^ _prev_flat(sw[k], d)
                inc = _word_inc_i32(x)
                ml = ml + jnp.where(alive, inc, 0)
                alive = alive & (x == 0)
            better = ml > best_ml
            best_ml = jnp.where(better, ml, best_ml)
            best_off = jnp.where(better, sp - pp, best_off)

        # Sort back to position order: key = pos, payload = ml<<plog | off.
        packed = (best_ml << plog) | best_off
        _, packed = _sort_body([sp, packed], log_w)
        out_ref[0] = packed

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _match_windows_impl(
    key: jax.Array, words: tuple[jax.Array, ...], depth: int, sentinel: int, interpret: bool
):
    R, W = key.shape
    log_w = (W - 1).bit_length()
    plog = log_w
    SUBS = W // LANES
    nwords = len(words)
    spec = pl.BlockSpec((1, SUBS, LANES), lambda r: (r, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_match_kernel(nwords, log_w, depth, plog, sentinel),
        out_shape=jax.ShapeDtypeStruct((R, SUBS, LANES), I32),
        grid=(R,),
        in_specs=[spec] * (1 + nwords),
        out_specs=spec,
        interpret=interpret,
    )(
        key.reshape(R, SUBS, LANES),
        *[w.reshape(R, SUBS, LANES) for w in words],
    )
    return out.reshape(R, W)


def match_windows(
    key: jax.Array, words: list[jax.Array], depth: int, sentinel: int
) -> tuple[jax.Array, jax.Array]:
    """Per-position best match over (R, W) windows.

    key: (R, W) i32 = hash << log2(W) | window-local pos, with hash ==
    `sentinel` for dead rows (real hashes < sentinel). words: nwords arrays
    (R, W) i32, the 4k-byte-shifted suffix words. Returns (ml, off) in
    position order; ties prefer the most recent occurrence (smallest offset).
    """
    W = key.shape[-1]
    assert W & (W - 1) == 0 and W >= 1024
    interpret = jax.default_backend() != "tpu"
    packed = _match_windows_impl(key, tuple(words), depth, sentinel, interpret)
    plog = (W - 1).bit_length()
    return packed >> plog, packed & ((1 << plog) - 1)
