"""Pallas TPU sequence executor: sequential per-block match copies in VMEM.

TPU-native counterpart of the reference's Pass-3 sequential executor
(reference src/cuda_zstd_sequence.cu:347 `sequential_block_execute_sequences_kernel`
— one thread walks the sequence list copying literal runs and match runs).
The XLA executor in ops/decode_jax.py resolves copy chains with per-byte
pointer doubling — ~8 full-HBM gather rounds at ~130M elem/s, the dominant
cost of device decompression. This module splits the work by what each
machine does best:

- XLA prepass (`_prepass`, vector ops only): place literal bytes at their
  final output positions (a single cheap gather — no chains involved) and
  compact the match runs to (dst, len, off) triples;
- Pallas kernel (`_exec_kernel`): execute each block's match copies IN
  ORDER inside VMEM with 128-byte vector copies, the way a CPU/GPU decoder
  would, while blocks stream through the grid.

Mosaic mechanics (probed on v5e, tools/mosaic_probe.py):
- the block's bytes live as ONE VALUE PER i32 LANE in a (rows, 128) VMEM
  scratch, prefixed by the history window — i32 supports ARBITRARY dynamic
  sublane offsets (u8 needs 8-row alignment), so an unaligned 128-byte copy
  is a 2-row load + dynamic lane rotate + masked 2-row read-modify-write;
- match triples stage HBM -> SMEM in 1024-aligned DMA chunks (the 1-D HBM
  tiling is (1024,)), then read as scalars for the copy control flow;
- self-overlapping matches (off < length) copy with a PERIOD-DOUBLING
  cursor: copy P = off bytes from distance P, then double P each full-P
  copy — division-free, log2(len/off) steps, the classic overlap trick
  (the reference meets the same case byte-serially in its sequential
  kernel).

Total work is O(match bytes / 128) vector ops + O(nmatch) scalar steps per
block, vs the XLA path's O(log depth) full-output gather rounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
CH = 128    # copy chunk (one lane row)
CHS = 1024  # match triples staged per DMA (1-D HBM tiling = 1024 elements)


def _exec_kernel(nmatch_ref, skel_ref, win_ref, mpack_hbm, out_ref,
                 buf, dst_s, len_s, off_s, sem, *, W: int, N: int, MSP: int):
    """One block per grid step: walk the match list, copying runs into buf.

    buf layout (i32, one byte value per lane): rows [0, W/128) = history
    window, rows [W/128, (W+N)/128 + 2) = output + chunk-overshoot margin.
    """
    WROWS = W // CH
    NROWS = N // CH
    lane = jax.lax.broadcasted_iota(I32, (1, CH), 1)
    b = pl.program_id(0)

    def read128(p):
        """128 buf bytes starting at byte-position p (any alignment)."""
        r0 = p >> 7
        a = p & (CH - 1)
        two = buf[pl.ds(r0, 2), :]
        ra = pltpu.roll(two, -a, 1)
        return jnp.where(lane < CH - a, ra[0:1], ra[1:2])

    def write128(p, d, c):
        """Write the first c (<= 128) bytes of d (1, CH) at byte-position p."""
        r0 = p >> 7
        a = p & (CH - 1)
        rolled = pltpu.roll(d, a, 1)
        two = buf[pl.ds(r0, 2), :]
        new0 = jnp.where((lane >= a) & (lane < a + c), rolled, two[0:1])
        new1 = jnp.where(lane < a + c - CH, rolled, two[1:2])
        buf[pl.ds(r0, 2), :] = jnp.concatenate([new0, new1], 0)

    # Window + literal-skeleton load (static, aligned, u8 -> one-per-lane i32).
    if W > 0:
        buf[:WROWS, :] = win_ref[0].astype(I32)
    buf[WROWS:WROWS + NROWS, :] = skel_ref[0].astype(I32)

    nm = nmatch_ref[b]
    base = b * 3 * MSP

    def chunk_body(ck, _):
        for f, st in ((0, dst_s), (1, len_s), (2, off_s)):
            pltpu.make_async_copy(
                mpack_hbm.at[pl.ds(base + f * MSP + ck * CHS, CHS)], st, sem.at[f]
            ).start()
        for f, st in ((0, dst_s), (1, len_s), (2, off_s)):
            pltpu.make_async_copy(
                mpack_hbm.at[pl.ds(base + f * MSP + ck * CHS, CHS)], st, sem.at[f]
            ).wait()

        def seq_body(s, _):
            dst = dst_s[s]
            ln = len_s[s]
            ofv = jnp.maximum(off_s[s], 1)
            fast = (ln <= CH) & (ofv >= ln)

            # Fast path — the overwhelmingly common case (average match is
            # ~10-30 bytes, offsets usually exceed the length): ONE unguarded
            # 128-byte copy, no loop machinery.
            @pl.when(fast)
            def _():
                data = read128(W + dst - ofv)
                write128(W + dst, data, ln)

            @pl.when(jnp.logical_not(fast))
            def _():
                def copy_body(st):
                    d, rem, P = st
                    c = jnp.minimum(jnp.minimum(rem, CH), P)
                    data = read128(W + d - P)
                    write128(W + d, data, c)
                    # Double the period multiple only after a FULL-P copy (the
                    # periodic region then provably extends past d - 2P).
                    return (d + c, rem - c, jnp.where(c == P, P + P, P))

                jax.lax.while_loop(
                    lambda st: st[1] > 0, copy_body, (dst, ln, ofv)
                )

            return 0

        n_here = jnp.clip(nm - ck * CHS, 0, CHS)
        jax.lax.fori_loop(0, n_here, seq_body, 0)
        return 0

    jax.lax.fori_loop(0, (nm + CHS - 1) // CHS, chunk_body, 0)
    out_ref[0] = buf[WROWS:WROWS + NROWS, :].astype(jnp.uint8)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def execute_sequences_pallas(
    lits: jax.Array,     # (B, L) uint8 literal bytes (front-compacted)
    nlit: jax.Array,     # (B,)
    ll: jax.Array,       # (B, MS)
    ml: jax.Array,       # (B, MS)
    off: jax.Array,      # (B, MS) resolved offsets (>= 1 where ml > 0)
    nseq: jax.Array,     # (B,)
    window: jax.Array,   # (B, W) uint8 history (dictionary / prior blocks)
    out_size: int,
    win_size: int,
    interpret: bool = False,
    lit_src: tuple | None = None,
):
    """Sequence execution: XLA literal placement + Pallas match copies.

    Drop-in replacement for ops/decode_jax.execute_sequences_device —
    returns (out (B, out_size) uint8, out_len (B,)); bytes beyond out_len[b]
    are unspecified. Offsets are clamped to the available history (corrupt
    frames produce garbage output, never out-of-bounds access; checksums
    catch them downstream).

    lit_src = (syms (B*4, SEGC) uint8, regen (B,)): read literals straight
    out of the 4-stream Huffman decoder's per-stream symbol rows instead of a
    pre-assembled (B, L) buffer — index arithmetic replaces the whole
    assemble_literals_4stream gather (one fewer full-output gather pass).
    """
    from .scanops import cumsum_i32

    B, MS = ll.shape
    N = _round_up(out_size, 4096)
    W = _round_up(win_size, 4096) if win_size > 1 else 0
    k = jnp.arange(MS, dtype=I32)
    valid = k < nseq[:, None]
    llv = jnp.where(valid, ll, 0)
    mlv = jnp.where(valid, ml, 0)

    adv = llv + mlv
    out_start = cumsum_i32(adv) - adv
    match_start = out_start + llv
    total_seq_out = out_start[:, -1] + adv[:, -1]
    total_lits_used = cumsum_i32(llv)[:, -1]

    # --- Literal skeleton: every non-match output position takes its literal
    # (tail literals after the last sequence included); match positions hold
    # junk that the kernel overwrites.
    pos = jnp.arange(N, dtype=I32)
    rows = jnp.arange(B, dtype=I32)[:, None]
    is_m = valid & (mlv > 0)
    ms_idx = jnp.where(is_m, match_start, N)
    diff = jnp.zeros((B, N + 1), I32)
    diff = diff.at[rows, ms_idx].add(jnp.where(is_m, 1, 0), mode="drop")
    diff = diff.at[rows, jnp.where(is_m, match_start + mlv, N)].add(
        jnp.where(is_m, -1, 0), mode="drop"
    )
    in_match = cumsum_i32(diff[:, :N]) > 0
    match_before = cumsum_i32(in_match.astype(I32)) - in_match.astype(I32)
    lit_idx = pos[None, :] - match_before
    if lit_src is not None:
        syms, regen = lit_src
        SEGC = syms.shape[1]
        seg_b = jnp.maximum((regen.astype(I32) + 3) >> 2, 1)[:, None]
        s = jnp.minimum(lit_idx // seg_b, 3)
        j = jnp.clip(lit_idx - s * seg_b, 0, SEGC - 1)
        srow = (jnp.arange(B, dtype=I32)[:, None] * 4 + s)
        skel = jnp.take(
            syms.reshape(-1), (srow * SEGC + j).reshape(-1)
        ).reshape(B, N).astype(jnp.uint8)
    else:
        L = lits.shape[1]
        row_base_l = (jnp.arange(B, dtype=I32) * L)[:, None]
        skel = jnp.take(
            lits.reshape(-1), (jnp.clip(lit_idx, 0, L - 1) + row_base_l).reshape(-1)
        ).reshape(B, N).astype(jnp.uint8)

    # --- Compact match triples to the front; offsets clamped to history.
    MSP = _round_up(max(MS, CHS), CHS)
    rank = cumsum_i32(is_m.astype(I32)) - 1
    sidx = jnp.where(is_m, rank, MSP)
    nmatch = jnp.sum(is_m.astype(I32), axis=1)
    off_c = jnp.clip(off, 1, match_start + (W if W > 0 else 0))
    mdst = jnp.zeros((B, MSP), I32).at[rows, sidx].set(match_start, mode="drop")
    mlen = jnp.zeros((B, MSP), I32).at[rows, sidx].set(mlv, mode="drop")
    moff = jnp.ones((B, MSP), I32).at[rows, sidx].set(
        jnp.where(is_m, off_c, 1), mode="drop"
    )
    mpack = jnp.concatenate(
        [mdst[:, None, :], mlen[:, None, :], moff[:, None, :]], axis=1
    ).reshape(-1)

    win_w = W if W > 0 else CH
    win_p = jnp.zeros((B, win_w), jnp.uint8)
    if W > 0:
        # history is right-aligned in `window`; keep it right-aligned in the
        # padded buffer so offsets keep meaning "bytes back from the block".
        win_p = win_p.at[:, W - window.shape[1]:].set(window)

    kern = functools.partial(_exec_kernel, W=W, N=N, MSP=MSP)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N // CH, CH), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win_w // CH if W else 1, CH), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, N // CH, CH), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N // CH, CH), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM(((W + N) // CH + 2, CH), I32),
            pltpu.SMEM((CHS,), I32),
            pltpu.SMEM((CHS,), I32),
            pltpu.SMEM((CHS,), I32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(
        nmatch,
        skel.reshape(B, N // CH, CH),
        win_p.reshape(B, win_w // CH if W else 1, CH),
        mpack,
    )

    out = out.reshape(B, N)[:, :out_size]
    out_len = total_seq_out + (nlit.astype(I32) - total_lits_used)
    return out, out_len
