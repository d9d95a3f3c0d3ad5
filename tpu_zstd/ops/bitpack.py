"""Vectorized bit deposit: pack variable-width bit fields into a u32 word stream.

TPU-native replacement for the reference's sequential GPU bitstream writer
(reference src/gpu_bitstream.cuh:14-50 `BIT_CStream_t`): instead of a serial
LSB-first append loop, every field's absolute bit offset is computed with one
prefix sum and all fields are deposited in parallel with two scatter-adds
(contributions to the same word occupy disjoint bit ranges, so integer add is
equivalent to bitwise OR).

All functions are jittable and shape-static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

U32 = jnp.uint32


def deposit_bits(values: jax.Array, lengths: jax.Array, num_words: int) -> tuple[jax.Array, jax.Array]:
    """Pack bit fields LSB-first at consecutive bit offsets.

    values:  (M,) uint32 field values (only the low `lengths[i]` bits are used)
    lengths: (M,) int32 bit widths (0 <= length <= 32; 0 means "no field")
    num_words: size of the output u32 word buffer (static)

    Returns (words[num_words] uint32, total_bits int32). Field i lands at bit
    offset sum(lengths[:i]) of the stream; byte j of the stream is
    (words[j//4] >> (8*(j%4))) & 0xFF.
    """
    lengths = lengths.astype(jnp.int32)
    offs = jnp.cumsum(lengths) - lengths  # exclusive prefix sum
    total_bits = offs[-1] + lengths[-1]

    if values.shape[0] >= 4096:
        # Large deposits: sort-based path (1.4x the scatter rate on v5e).
        return deposit_bits_at_sorted(values, lengths, offs, num_words), total_bits

    mask = jnp.where(
        lengths >= 32,
        U32(0xFFFFFFFF),
        (U32(1) << jnp.minimum(lengths, 31).astype(U32)) - U32(1),
    )
    v = values.astype(U32) & mask

    word = offs >> 5
    sh = (offs & 31).astype(U32)
    lo = v << sh
    # High spill into the next word; shift by (32 - sh) is undefined at sh==0,
    # so split the shift into two well-defined halves.
    hi = (v >> U32(1)) >> (U32(31) - sh)

    # Drop zero-length fields entirely (their offset may alias a real field).
    live = lengths > 0
    word = jnp.where(live, word, num_words)  # out of range -> dropped
    words = jnp.zeros(num_words, dtype=U32)
    words = words.at[word].add(lo, mode="drop")
    words = words.at[word + 1].add(hi, mode="drop")
    return words, total_bits


def deposit_bits_at(
    values: jax.Array, lengths: jax.Array, offsets: jax.Array, num_words: int
) -> jax.Array:
    """Like deposit_bits but with caller-provided absolute bit offsets.

    Field bit ranges must be disjoint (add == or). Used to deposit several
    independent bitstreams (e.g. the 4 Huffman literal streams) into one word
    buffer in a single scatter pass.
    """
    lengths = lengths.astype(jnp.int32)
    offsets = offsets.astype(jnp.int32)
    mask = jnp.where(
        lengths >= 32,
        U32(0xFFFFFFFF),
        (U32(1) << jnp.minimum(lengths, 31).astype(U32)) - U32(1),
    )
    v = values.astype(U32) & mask
    word = offsets >> 5
    sh = (offsets & 31).astype(U32)
    lo = v << sh
    hi = (v >> U32(1)) >> (U32(31) - sh)
    live = lengths > 0
    word = jnp.where(live, word, num_words)
    words = jnp.zeros(num_words, dtype=U32)
    words = words.at[word].add(lo, mode="drop")
    words = words.at[word + 1].add(hi, mode="drop")
    return words


def deposit_bits_at_sorted(
    values: jax.Array, lengths: jax.Array, offsets: jax.Array, num_words: int
) -> jax.Array:
    """deposit_bits_at via sort + segmented sum instead of scatter-add.

    v5e: XLA sort moves ~330M rows/s with free extra operands, scatter ~130M
    elem/s — so route the word contributions through two sorts and make the
    final scatter one row per OUTPUT word (num_words) instead of one per
    contribution (2x field count): sort contributions by word, prefix-sum,
    keep each word's last row (segment tail), compact tails to the front, and
    difference adjacent tail prefix sums. u32 wraparound cancels in the
    difference; per-word sums are exact (disjoint bit ranges).
    """
    M = values.shape[0]
    lengths = lengths.astype(jnp.int32)
    offsets = offsets.astype(jnp.int32)
    mask = jnp.where(
        lengths >= 32,
        U32(0xFFFFFFFF),
        (U32(1) << jnp.minimum(lengths, 31).astype(U32)) - U32(1),
    )
    v = values.astype(U32) & mask
    word = offsets >> 5
    sh = (offsets & 31).astype(U32)
    lo = v << sh
    hi = (v >> U32(1)) >> (U32(31) - sh)
    live = lengths > 0
    BIG = jnp.int32(num_words + 1)
    w2 = jnp.concatenate([jnp.where(live, word, BIG), jnp.where(live, word + 1, BIG)])
    c2 = jnp.concatenate([lo, hi]).astype(U32)

    sw, sc = jax.lax.sort((w2, c2.astype(jnp.int32)), num_keys=1, is_stable=False)
    csum = jnp.cumsum(sc.astype(U32))
    nxt = jnp.concatenate([sw[1:], jnp.full((1,), -1, jnp.int32)])
    tail = (sw != nxt) & (sw < BIG)
    rank = jnp.arange(2 * M, dtype=jnp.int32)
    key = jnp.where(tail, rank, jnp.int32(2 * M))
    sk, tw, tc = jax.lax.sort((key, sw, csum.astype(jnp.int32)), num_keys=1, is_stable=True)
    K = min(num_words + 1, 2 * M)
    live_t = sk[:K] < jnp.int32(2 * M)  # rows past the real tails carry garbage
    tw = tw[:K]
    tc = tc[:K].astype(U32)
    totals = tc - jnp.roll(tc, 1).at[0].set(U32(0))
    words = jnp.zeros(num_words, dtype=U32)
    idx = jnp.where(live_t & (tw < num_words), tw, num_words)
    return words.at[idx].add(totals, mode="drop")


def words_to_bytes(words: jax.Array) -> jax.Array:
    """u32 word stream -> little-endian byte stream (4x length, uint8)."""
    w = words[:, None]
    shifts = jnp.arange(4, dtype=U32) * U32(8)
    b = (w >> shifts[None, :]) & U32(0xFF)
    return b.reshape(-1).astype(jnp.uint8)


def dynroll(x: jax.Array, shift: jax.Array, max_shift: int) -> jax.Array:
    """Right-roll the last axis by a traced shift in [0, max_shift].

    Decomposed into log2 static rolls + selects: under vmap this stays pure
    VPU work, whereas jnp.roll / dynamic_update_slice with per-lane offsets
    lower to scatters/gathers (~100M elem/s on v5e — the difference is ~30x).
    """
    shift = jnp.asarray(shift, jnp.int32)
    for b in range(max(1, max_shift).bit_length()):
        x = jnp.where((shift >> b) & 1 != 0, jnp.roll(x, 1 << b, axis=-1), x)
    return x


def dynroll_left(x: jax.Array, shift: jax.Array, max_shift: int) -> jax.Array:
    """Left-roll the last axis by a traced shift in [0, max_shift]."""
    n = x.shape[-1]
    return dynroll(x, (n - jnp.asarray(shift, jnp.int32)) % n, n)


def place(x: jax.Array, length: jax.Array, offset: jax.Array, out_len: int, max_offset: int) -> jax.Array:
    """Mask x beyond `length`, zero-extend/trim to out_len, roll right by
    `offset`. Sum of disjoint `place` results == sequential buffer writes."""
    n = x.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    xm = jnp.where(idx < length, x, jnp.zeros((), x.dtype))
    if n < out_len:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, out_len - n)]
        xm = jnp.pad(xm, pad)
    elif n > out_len:
        xm = xm[..., :out_len]
    return dynroll(xm, offset, max_offset)
