"""TPU-parallel LZ77 match finding + greedy parse for one block.

Re-design of the reference's per-thread hash-chain kernels
(reference src/lz77_parallel.cu:26 `find_matches_kernel` — atomicExch hash-table
inserts + bounded chain walks; :177 `greedy_parse_kernel`; :207
`build_sequences_gpu_kernel` single-thread run-length scan) for a vector
machine with no atomics:

- previous-occurrence search: stable sort of (hash, position); the D nearest
  previous positions with the same hash are the D preceding rows of the sorted
  array (== a depth-D hash chain, but race-free and fully parallel).
- match lengths: 4-byte-word gather/XOR compares, capped at `cap` bytes.
- greedy parse: next[] pointer jumping — log2(N) scatter-max rounds of mark
  propagation replace the reference's sequential scan.
- long matches: adjacent parse steps that continue the same offset are merged
  with a segmented sum, recovering full-length matches beyond the cap.
- repcodes: rep0 reuse (offset == previous sequence's offset, lit_length > 0)
  is detected with a shift — no sequential rep-history walk (the TPU encoder
  only ever emits {rep0, literal offset}, which keeps the decoder's rep state
  trivially predictable; see format/sequences.py:encode_offset for the full
  host-side rule).

All shapes static; everything vmaps over blocks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

I32 = jnp.int32
U32 = jnp.uint32

HASH_PRIME = 2654435761


class BlockSequences(NamedTuple):
    """Fixed-capacity per-block parse result (entries >= nseq are zero)."""

    ll: jax.Array        # (MS,) int32 literal lengths
    ml: jax.Array        # (MS,) int32 match lengths (>= min_match)
    ob: jax.Array        # (MS,) int32 offset-base values (off+3 or repcode 1)
    starts: jax.Array    # (MS,) int32 match start positions
    nseq: jax.Array      # () int32
    is_lit: jax.Array    # (N,) bool literal mask over block positions
    nlit: jax.Array      # () int32 total literal count (== n - sum(ml))


def _hash_words(block: jax.Array, n: jax.Array, hash_log: int) -> tuple[jax.Array, jax.Array]:
    """4-byte words + Fibonacci hashes per position (positions >= n-3 invalid)."""
    b = block.astype(U32)
    w = (
        b
        | (jnp.roll(b, -1) << U32(8))
        | (jnp.roll(b, -2) << U32(16))
        | (jnp.roll(b, -3) << U32(24))
    )
    h = (w * U32(HASH_PRIME)) >> U32(32 - hash_log)
    return w, h.astype(I32)


def _candidates(h: jax.Array, n: jax.Array, depth: int) -> jax.Array:
    """(N, depth) previous positions sharing each position's hash (-1 = none).

    Column d is the (d+1)-th most recent previous occurrence, so column 0 has
    the smallest offset.
    """
    N = h.shape[0]
    pos = jnp.arange(N, dtype=I32)
    key = jnp.where(pos < n - 3, h, jnp.iinfo(jnp.int32).max)
    sk, sp = jax.lax.sort((key, pos), num_keys=1, is_stable=True)
    cols = []
    for d in range(1, depth + 1):
        psk = jnp.roll(sk, d).at[:d].set(-1)
        psp = jnp.roll(sp, d).at[:d].set(-1)
        cols.append(jnp.where(psk == sk, psp, -1))
    cand_sorted = jnp.stack(cols, axis=1)
    return jnp.zeros((N, depth), dtype=I32).at[sp].set(cand_sorted)


def _capped_matchlen(
    words_pad: jax.Array, pos: jax.Array, cand: jax.Array, n: jax.Array, cap: int
) -> jax.Array:
    """Common-prefix length of block[pos:] vs block[cand:], capped at `cap`.

    words_pad is the 4-byte word array padded with `cap` zero words so gathers
    past the block stay in range; lengths are clamped to n - pos afterwards,
    which also cancels any false matches into the zero padding.
    """
    ml = jnp.zeros(pos.shape, dtype=I32)
    alive = cand >= 0
    safe_cand = jnp.maximum(cand, 0)
    for k in range(cap // 4):
        wi = words_pad[pos + 4 * k]
        wj = words_pad[safe_cand + 4 * k]
        x = wi ^ wj
        inc = jnp.where(
            x == 0,
            4,
            ((x & U32(0xFF)) == 0).astype(I32)
            + ((x & U32(0xFFFF)) == 0).astype(I32)
            + ((x & U32(0xFFFFFF)) == 0).astype(I32),
        )
        ml = ml + jnp.where(alive, inc, 0)
        alive = alive & (x == 0)
    return jnp.minimum(ml, jnp.maximum(n - pos, 0))


def parse_block(
    block: jax.Array,
    n: jax.Array,
    *,
    max_seqs: int,
    hash_log: int = 16,
    depth: int = 2,
    cap: int = 32,
    min_match: int = 4,
) -> BlockSequences:
    """Greedy-parse one (padded) block into sequences. block: (N,) uint8/int32."""
    N = block.shape[0]
    pos = jnp.arange(N, dtype=I32)
    words, h = _hash_words(block, n, hash_log)
    words_pad = jnp.concatenate([words, jnp.zeros(cap + 4, dtype=U32)])

    cand = _candidates(h, n, depth)

    # Best match per position: smallest offset wins ties (column 0 first).
    best_ml = jnp.zeros(N, dtype=I32)
    best_j = jnp.full(N, -1, dtype=I32)
    for d in range(depth):
        ml_d = _capped_matchlen(words_pad, pos, cand[:, d], n, cap)
        better = ml_d > best_ml
        best_ml = jnp.where(better, ml_d, best_ml)
        best_j = jnp.where(better, cand[:, d], best_j)

    matched = (best_ml >= min_match) & (best_j >= 0) & (pos < n)
    step = jnp.where(matched, best_ml, 1)

    # Greedy parse: pointer-jumping mark propagation from position 0.
    hop = jnp.concatenate([jnp.minimum(pos + step, N), jnp.array([N], dtype=I32)])
    mark = jnp.zeros(N + 1, dtype=I32).at[0].set(1)
    for _ in range(int(N).bit_length() + 1):
        prop = jnp.zeros(N + 1, dtype=I32).at[hop].max(mark, mode="drop")
        mark = jnp.maximum(mark, prop)
        hop = hop[hop]

    is_seq = (mark[:N] == 1) & matched
    rank = jnp.cumsum(is_seq.astype(I32)) - 1
    nseq = jnp.sum(is_seq.astype(I32))

    sidx = jnp.where(is_seq, rank, max_seqs)
    starts = jnp.zeros(max_seqs, dtype=I32).at[sidx].set(pos, mode="drop")
    mls = jnp.zeros(max_seqs, dtype=I32).at[sidx].set(best_ml, mode="drop")
    offs = jnp.zeros(max_seqs, dtype=I32).at[sidx].set(pos - best_j, mode="drop")

    k = jnp.arange(max_seqs, dtype=I32)
    valid = k < nseq
    ends = starts + mls
    prev_end = jnp.roll(ends, 1).at[0].set(0)
    lls = jnp.where(valid, starts - prev_end, 0)

    # Merge contiguous same-offset sequences (recovers matches beyond `cap`).
    prev_off = jnp.roll(offs, 1).at[0].set(0)
    cont = valid & (k > 0) & (lls == 0) & (offs == prev_off) & (offs > 0)
    head = valid & ~cont
    seg = jnp.cumsum(head.astype(I32)) - 1
    seg_ml = jax.ops.segment_sum(
        jnp.where(valid, mls, 0), jnp.where(valid, seg, max_seqs - 1), num_segments=max_seqs
    )
    rank2 = jnp.cumsum(head.astype(I32)) - 1
    midx = jnp.where(head, rank2, max_seqs)
    nseq2 = jnp.sum(head.astype(I32))
    hrank = jnp.cumsum(head.astype(I32)) - 1  # segment id of each head == its rank
    ll2 = jnp.zeros(max_seqs, dtype=I32).at[midx].set(lls, mode="drop")
    ml2 = jnp.zeros(max_seqs, dtype=I32).at[midx].set(seg_ml[hrank], mode="drop")
    off2 = jnp.zeros(max_seqs, dtype=I32).at[midx].set(offs, mode="drop")
    starts2 = jnp.zeros(max_seqs, dtype=I32).at[midx].set(starts, mode="drop")

    # Offset-base values: rep0 when the offset repeats with literals in between.
    k2 = jnp.arange(max_seqs, dtype=I32)
    valid2 = k2 < nseq2
    prev_off2 = jnp.roll(off2, 1).at[0].set(1)  # initial rep[0] == 1
    use_rep0 = valid2 & (ll2 > 0) & (off2 == prev_off2)
    ob = jnp.where(valid2, jnp.where(use_rep0, 1, off2 + 3), 0)

    # Literal mask from match coverage.
    cov_idx = jnp.where(valid2, starts2, N)
    cov = jnp.zeros(N + 1, dtype=I32).at[cov_idx].add(jnp.where(valid2, 1, 0), mode="drop")
    cov_end = jnp.where(valid2, starts2 + ml2, N)
    cov = cov.at[cov_end].add(jnp.where(valid2, -1, 0), mode="drop")
    inside = jnp.cumsum(cov[:N]) > 0
    is_lit = ~inside & (pos < n)
    nlit = jnp.sum(is_lit.astype(I32))

    return BlockSequences(ll2, ml2, ob, starts2, nseq2, is_lit, nlit)
