"""Pallas TPU sequence executor: sequential per-block run copies in VMEM.

TPU-native counterpart of the reference's Pass-3 sequential executor
(reference src/cuda_zstd_sequence.cu:347 `sequential_block_execute_sequences_kernel`
— one thread walks the sequence list copying literal runs and match runs).
The XLA executor in ops/decode_jax.py resolves copy chains with per-byte
pointer doubling — ~8 full-HBM gather rounds at ~130M elem/s. The first
Pallas executor here kept an XLA prepass that pre-placed literals with a
full-output gather plus in-match interval cumsums and match-triple
compaction scatters — measured at more than half of the executor's cost.
This version walks BOTH run kinds inside the kernel, so the XLA side does
no per-byte work at all:

- the raw (ll, ml, off) sequence arrays stream HBM -> SMEM in 1024-aligned
  DMA chunks, no compaction needed (the walk reads exactly nseq entries);
- literal bytes live front-compacted in VMEM; each sequence copies its ll
  literal bytes (cursor-ordered, 128-byte vector chunks) then its ml match
  bytes; tail literals after the last sequence are one chunked copy;
- self-overlapping matches (off < length) copy with a PERIOD-DOUBLING
  cursor: copy P = off bytes from distance P, then double P each full-P
  copy — division-free, log2(len/off) steps (the reference meets the same
  case byte-serially in its sequential kernel).

Mosaic mechanics (probed on v5e, tools/mosaic_probe.py): block bytes live
one value per i32 lane in (rows, 128) VMEM scratch — i32 supports ARBITRARY
dynamic sublane offsets (u8 needs 8-row alignment), so an unaligned 128-byte
copy is a 2-row load + dynamic lane rotate + masked 2-row read-modify-write.

Total work is O(output bytes / 128) vector ops + O(nseq) scalar steps per
block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
CH = 128    # copy chunk (one lane row)
CHS = 1024  # sequence entries staged per DMA (1-D HBM tiling = 1024 elements)


def _exec_kernel(nseq_ref, nlit_ref, lit_ref, win_ref, spack_hbm, out_ref,
                 buf, lbuf, ll_s, ml_s, of_s, sem, *, W: int, N: int, MSP: int,
                 LR: int):
    """One block per grid step: walk the sequence list, copying runs into buf.

    buf layout (i32, one byte value per lane): rows [0, W/128) = history
    window, rows [W/128, (W+N)/128 + 2) = output + chunk-overshoot margin.
    lbuf: literal bytes, one per lane, LR rows + 2 overshoot rows.

    v4 write path (measured on v5e, tools/exec_micro.py + ablation): the v3
    kernel read-modified-wrote TWO buf rows per copy (~70 cyc) and realigned
    with dynamic pltpu.roll (~75 cyc). This version:
    - carries the CURRENT OUTPUT ROW in a loop register ("pend"): a copy is
      one combined-rotate gather from the source + a masked merge; buf gets
      exactly one aligned row-store per completed 128 output bytes;
    - reads literals from a 2-row register window ("lwin"), refilled by a
      lax.cond only when the literal cursor crosses a row;
    - realigns with lane-indexed take_along_axis (~15 cyc, vs ~75 for a
      dynamic roll);
    - runs both copy kinds as while_loops whose zero-trip case (ll == 0 /
      ml == 0) costs only the loop-condition check.
    All mutable state (cursors, pend, lwin) flows through loop carries and
    stays in vector registers — no scratch spills, no RMW.
    """
    WROWS = W // CH
    NROWS = N // CH
    lane = jax.lax.broadcasted_iota(I32, (1, CH), 1)
    lane2 = jax.lax.broadcasted_iota(I32, (2, CH), 1)
    b = pl.program_id(0)

    def _gather_copy(two, p_src, a2):
        """128 source bytes starting at byte p_src, aligned to target lane
        a2: out[l] = src[p_src + ((l - a2) & 127)] — one taa on the pair."""
        off_l = (lane2 - a2) & (CH - 1)
        srcpos = (p_src & (CH - 1)) + off_l
        g2 = jnp.take_along_axis(two, srcpos & (CH - 1), axis=1)
        return jnp.where(srcpos[0:1] < CH, g2[0:1], g2[1:2])

    def append(two, p_src, po, c, pend):
        """Merge c bytes (read from rows `two` at p_src) into pend at output
        byte po; flush the completed row to buf when the copy crosses it.
        Returns the new pend. c <= CH."""
        a2 = po & (CH - 1)
        g = _gather_copy(two, p_src, a2)
        mask_main = (lane >= a2) & (lane < a2 + c)
        pend_new = jnp.where(mask_main, g, pend)
        crossed = a2 + c >= CH

        @pl.when(crossed)
        def _():
            buf[pl.ds(po >> 7, 1), :] = pend_new

        return jax.lax.select(
            crossed, jnp.where(lane < a2 + c - CH, g, pend_new), pend_new
        )

    # Window load (static, aligned, u8 -> one-per-lane i32).
    if W > 0:
        buf[:WROWS, :] = win_ref[0].astype(I32)
    lbuf[:LR, :] = lit_ref[0].astype(I32)

    ns = nseq_ref[b]
    # Clamp the literal count to the staged buffer width (malformed frames
    # must never drive the literal cursor past lbuf).
    nl = jnp.minimum(nlit_ref[b], LR * CH)
    base = b * 3 * MSP

    def lit_refill(lc, lrow, lwin):
        return jax.lax.cond(
            (lc >> 7) != lrow,
            lambda: (lc >> 7, lbuf[pl.ds(lc >> 7, 2), :]),
            lambda: (lrow, lwin),
        )

    def copy_lits(n, lc, po, pend, lrow, lwin):
        """Copy n literal bytes lbuf[lc:lc+n] -> output at po (n >= 0)."""

        def body(st):
            lc, po, rem, pend, lrow, lwin = st
            lrow, lwin = lit_refill(lc, lrow, lwin)
            c = jnp.minimum(rem, CH)
            pend = append(lwin, lc, po, c, pend)
            return (lc + c, po + c, rem - c, pend, lrow, lwin)

        lc, po, _, pend, lrow, lwin = jax.lax.while_loop(
            lambda st: st[2] > 0, body, (lc, po, n, pend, lrow, lwin)
        )
        return lc, po, pend, lrow, lwin

    def chunk_body(ck, carry):
        for f, st in ((0, ll_s), (1, ml_s), (2, of_s)):
            pltpu.make_async_copy(
                spack_hbm.at[pl.ds(base + f * MSP + ck * CHS, CHS)], st, sem.at[f]
            ).start()
        for f, st in ((0, ll_s), (1, ml_s), (2, of_s)):
            pltpu.make_async_copy(
                spack_hbm.at[pl.ds(base + f * MSP + ck * CHS, CHS)], st, sem.at[f]
            ).wait()

        def seq_body(s, st):
            lc, po, pend, lrow, lwin = st
            llv = jnp.clip(jnp.minimum(ll_s[s], nl - lc), 0, W + N - po)
            lc, po, pend, lrow, lwin = copy_lits(llv, lc, po, pend, lrow, lwin)

            mlv = jnp.clip(ml_s[s], 0, W + N - po)
            # Degenerate history (po == 0): no bytes exist to match from;
            # drop the match so the copy loop cannot spin at P == 0.
            mlv = jnp.where(po == 0, 0, mlv)
            ofv = jnp.maximum(jnp.minimum(of_s[s], po), 1)

            def mbody(st2):
                d, rem, P, pend = st2
                c = jnp.minimum(jnp.minimum(rem, CH), P)
                p_src = d - P
                r0 = p_src >> 7
                two = buf[pl.ds(r0, 2), :]
                # Overlay the unflushed current row from pend.
                orow = d >> 7
                o0 = jax.lax.select(r0 == orow, pend, two[0:1])
                o1 = jax.lax.select(r0 + 1 == orow, pend, two[1:2])
                two = jnp.concatenate([o0, o1], 0)
                pend = append(two, p_src, d, c, pend)
                # Double the period multiple only after a FULL-P copy (the
                # periodic region then provably extends past d - 2P).
                return (d + c, rem - c, jnp.where(c == P, P + P, P), pend)

            po, _, _, pend = jax.lax.while_loop(
                lambda st2: st2[1] > 0, mbody, (po, mlv, ofv, pend)
            )
            return (lc, po, pend, lrow, lwin)

        n_here = jnp.clip(ns - ck * CHS, 0, CHS)
        return jax.lax.fori_loop(0, n_here, seq_body, carry)

    pend0 = jnp.zeros((1, CH), I32)
    lwin0 = lbuf[0:2, :]
    carry = (jnp.int32(0), jnp.int32(W), pend0, jnp.int32(0), lwin0)
    lc, po, pend, lrow, lwin = jax.lax.fori_loop(
        0, (ns + CHS - 1) // CHS, chunk_body, carry
    )
    # Tail literals after the last sequence, then flush the partial row.
    lc, po, pend, lrow, lwin = copy_lits(
        jnp.clip(nl - lc, 0, W + N - po), lc, po, pend, lrow, lwin
    )
    buf[pl.ds(po >> 7, 1), :] = pend
    out_ref[0] = buf[WROWS:WROWS + NROWS, :].astype(jnp.uint8)



def _exec_kernel_mb(nseq_ref, nlit_ref, lit_ref, win_ref, spack_hbm, out_ref,
                    buf, lbuf, *scratch, W: int, N: int, MSP: int, LR: int,
                    G: int):
    """G blocks per grid step: the v4 walk (one block per step) is bound by
    the LATENCY of each sequence's dependent vector chain (~169 cyc/seq for
    ~40 cyc of issue), so v5 interleaves G independent blocks' chains in one
    straight-line body per sequence step — the scheduler overlaps them and
    the per-seq cost amortizes toward issue rate.

    Per sequence and block the body is: inline first literal chunk (<= 128
    B), inline first match chunk (size 0 by arithmetic when literals remain
    or at overlap periods < the chunk), then two zero-trip remainder
    while_loops that almost never run. All remainder control flow sits AFTER
    the G interleavable inline segments.
    """
    sts = [scratch[g * 3 + f] for g in range(G) for f in range(3)]
    sts = [sts[g * 3:(g + 1) * 3] for g in range(G)]
    sem = scratch[3 * G]
    WROWS = W // CH
    NROWS = N // CH
    lane = jax.lax.broadcasted_iota(I32, (1, CH), 1)
    lane2 = jax.lax.broadcasted_iota(I32, (2, CH), 1)
    n = pl.program_id(0)

    def _gather_copy(two, p_src, a2):
        off_l = (lane2 - a2) & (CH - 1)
        srcpos = (p_src & (CH - 1)) + off_l
        g2 = jnp.take_along_axis(two, srcpos & (CH - 1), axis=1)
        return jnp.where(srcpos[0:1] < CH, g2[0:1], g2[1:2])

    def mk_append(g):
        def append(two, p_src, po, c, pend):
            a2 = po & (CH - 1)
            gg = _gather_copy(two, p_src, a2)
            mask_main = (lane >= a2) & (lane < a2 + c)
            pend_new = jnp.where(mask_main, gg, pend)
            crossed = a2 + c >= CH
            # BRANCHLESS flush: row po>>7 is carried in pend, so storing the
            # partial row early is idempotent (a later flush overwrites it);
            # removing the pl.when keeps the G-block inline phase one
            # straight-line block the scheduler can interleave.
            buf[g, pl.ds(po >> 7, 1), :] = pend_new
            return jax.lax.select(
                crossed, jnp.where(lane < a2 + c - CH, gg, pend_new), pend_new
            )
        return append

    appends = [mk_append(g) for g in range(G)]

    for g in range(G):
        if W > 0:
            buf[g, :WROWS, :] = win_ref[g].astype(I32)
        lbuf[g, :LR, :] = lit_ref[g].astype(I32)

    ns = [nseq_ref[n * G + g] for g in range(G)]
    nl = [jnp.minimum(nlit_ref[n * G + g], LR * CH) for g in range(G)]
    base = [(n * G + g) * 3 * MSP for g in range(G)]

    ns_max = ns[0]
    for g in range(1, G):
        ns_max = jnp.maximum(ns_max, ns[g])

    def match_two(g, d, P, pend):
        """2 source rows for a match read at p_src = d - P, pend-overlaid."""
        r0 = jnp.maximum((d - P) >> 7, 0)
        two = buf[g, pl.ds(r0, 2), :]
        orow = d >> 7
        o0 = jax.lax.select(r0 == orow, pend, two[0:1])
        o1 = jax.lax.select(r0 + 1 == orow, pend, two[1:2])
        return jnp.concatenate([o0, o1], 0), d - P

    def chunk_body(ck, carry):
        for g in range(G):
            for f in range(3):
                pltpu.make_async_copy(
                    spack_hbm.at[pl.ds(base[g] + f * MSP + ck * CHS, CHS)],
                    sts[g][f], sem.at[g * 3 + f]
                ).start()
        for g in range(G):
            for f in range(3):
                pltpu.make_async_copy(
                    spack_hbm.at[pl.ds(base[g] + f * MSP + ck * CHS, CHS)],
                    sts[g][f], sem.at[g * 3 + f]
                ).wait()

        def seq_body(s, st):
            # --- inline phase: G independent straight-line segments ---
            mid = []
            for g in range(G):
                lc, po, pend = st[g]
                live = s + ck * CHS < ns[g]
                llv = jnp.where(live, sts[g][0][s], 0)
                llv = jnp.clip(jnp.minimum(llv, nl[g] - lc), 0, W + N - po)
                mlv = jnp.where(live & (po + llv > 0), sts[g][1][s], 0)
                mlv = jnp.clip(mlv, 0, W + N - (po + llv))
                ofv = jnp.maximum(jnp.minimum(sts[g][2][s], po + llv), 1)
                # first literal chunk
                c1 = jnp.minimum(llv, CH)
                lwin = lbuf[g, pl.ds(lc >> 7, 2), :]
                pend = appends[g](lwin, lc, po, c1, pend)
                lc = lc + c1
                po = po + c1
                lrem = llv - c1
                # first match chunk (0 when literals remain)
                cm1 = jnp.where(lrem > 0, 0, jnp.minimum(jnp.minimum(mlv, CH), ofv))
                two, p_src = match_two(g, po, ofv, pend)
                pend = appends[g](two, p_src, po, cm1, pend)
                po = po + cm1
                P2 = jnp.where(cm1 == ofv, ofv + ofv, ofv)
                mid.append((lc, po, pend, lrem, mlv - cm1, P2))

            # --- remainder phase: ONE rare branch for the whole group ---
            # (2G per-block while-checks were measured to eat the inline
            # phase's interleaving win — branch bubbles, not work.)
            any_rem = mid[0][3] + mid[0][4]
            for g in range(1, G):
                any_rem = jnp.maximum(any_rem, mid[g][3] + mid[g][4])

            def fast(mid_st):
                return tuple((lc, po, pend) for lc, po, pend, _, _, _ in mid_st)

            def slow(mid_st):
                out = []
                for g in range(G):
                    lc, po, pend, lrem, mrem, P = mid_st[g]

                    def lbody(st2, _g=g):
                        lc, po, rem, pend = st2
                        lwin = lbuf[_g, pl.ds(lc >> 7, 2), :]
                        c = jnp.minimum(rem, CH)
                        pend = appends[_g](lwin, lc, po, c, pend)
                        return (lc + c, po + c, rem - c, pend)

                    lc, po, _, pend = jax.lax.while_loop(
                        lambda st2: st2[2] > 0, lbody, (lc, po, lrem, pend)
                    )

                    def mbody(st2, _g=g):
                        d, rem, P, pend = st2
                        c = jnp.minimum(jnp.minimum(rem, CH), P)
                        two, p_src = match_two(_g, d, P, pend)
                        pend = appends[_g](two, p_src, d, c, pend)
                        return (d + c, rem - c, jnp.where(c == P, P + P, P), pend)

                    po, _, _, pend = jax.lax.while_loop(
                        lambda st2: st2[1] > 0, mbody, (po, mrem, P, pend)
                    )
                    out.append((lc, po, pend))
                return tuple(out)

            return jax.lax.cond(any_rem > 0, slow, fast, tuple(mid))

        n_here = jnp.clip(ns_max - ck * CHS, 0, CHS)
        return jax.lax.fori_loop(0, n_here, seq_body, carry)

    pend0 = jnp.zeros((1, CH), I32)
    carry0 = tuple((jnp.int32(0), jnp.int32(W), pend0) for _ in range(G))
    carry = jax.lax.fori_loop(0, (ns_max + CHS - 1) // CHS, chunk_body, carry0)

    # Tail literals after the last sequence, then flush the partial row.
    for g in range(G):
        lc, po, pend = carry[g]
        rem0 = jnp.clip(nl[g] - lc, 0, W + N - po)

        def lbody(st2, _g=g):
            lc, po, rem, pend = st2
            lwin = lbuf[_g, pl.ds(lc >> 7, 2), :]
            c = jnp.minimum(rem, CH)
            pend = appends[_g](lwin, lc, po, c, pend)
            return (lc + c, po + c, rem - c, pend)

        lc, po, _, pend = jax.lax.while_loop(
            lambda st2: st2[2] > 0, lbody, (lc, po, rem0, pend)
        )
        buf[g, pl.ds(po >> 7, 1), :] = pend
        out_ref[g] = buf[g, WROWS:WROWS + NROWS, :].astype(jnp.uint8)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def assemble_literals_rotates(
    syms: jax.Array, regen: jax.Array, out_cap: int
) -> jax.Array:
    """4-stream symbol rows -> front-compacted (B, out_cap) literal bytes.

    Gather-free counterpart of decode_jax.assemble_literals_4stream: stream s
    of block b holds seg = ceil(regen/4) symbols (the 4th the remainder), so
    the output is 4 per-row rotates summed (Pallas one-pass rotate on TPU) —
    O(out_cap) vector work instead of a per-byte gather.
    """
    from .bitpack import dynroll

    B4, SEGC = syms.shape
    B = B4 // 4
    x = syms.reshape(B, 4, SEGC).astype(I32)
    seg = jnp.maximum((regen.astype(I32) + 3) >> 2, 1)
    # Per-stream counts clamped so they sum to regen (tiny regen <= 2 would
    # otherwise place 3 garbage stream symbols past the true literal count).
    rg = regen.astype(I32)
    cnts = jnp.stack(
        [jnp.clip(rg - s * seg, 0, seg) for s in range(4)], 1
    )
    offs = jnp.concatenate(
        [jnp.zeros((B, 1), I32), jnp.cumsum(cnts, axis=1)[:, :3]], axis=1
    )
    idx = jnp.arange(SEGC, dtype=I32)[None, :]
    out = jnp.zeros((B, out_cap), I32)
    for s in range(4):
        xm = jnp.where(idx < cnts[:, s, None], x[:, s], 0)
        if SEGC < out_cap:
            xm = jnp.pad(xm, ((0, 0), (0, out_cap - SEGC)))
        else:
            xm = xm[:, :out_cap]
        out = out + dynroll(xm, offs[:, s, None], out_cap)
    return out.astype(jnp.uint8)


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
    """Sequence execution fully inside the Pallas kernel.

    Drop-in replacement for ops/decode_jax.execute_sequences_device —
    returns (out (B, out_size) uint8, out_len (B,)); bytes beyond out_len[b]
    are unspecified. Offsets are clamped to the available history (corrupt
    frames produce garbage output, never out-of-bounds access; checksums
    catch them downstream).

    lit_src = (syms (B*4, SEGC) uint8, regen (B,)): literals come from the
    4-stream Huffman decoder's per-stream symbol rows; they are assembled
    with 4 cheap per-row rotates (assemble_literals_rotates), not a gather.
    """
    B, MS = ll.shape
    N = _round_up(out_size, 4096)
    W = _round_up(win_size, 4096) if win_size > 1 else 0

    if lit_src is not None:
        syms, regen = lit_src
        lits = assemble_literals_rotates(syms, regen, N)
        nlit = regen.astype(I32)
    L = _round_up(max(lits.shape[1], CH), CH)
    if lits.shape[1] < L:
        lits = jnp.pad(lits, ((0, 0), (0, L - lits.shape[1])))
    LR = L // CH

    # Raw sequence triples, padded to the DMA chunk grid — no compaction.
    MSP = _round_up(max(MS, CHS), CHS)
    padw = ((0, 0), (0, MSP - MS))
    spack = jnp.concatenate(
        [jnp.pad(ll, padw)[:, None, :], jnp.pad(ml, padw)[:, None, :],
         jnp.pad(off, padw)[:, None, :]], axis=1
    ).reshape(-1)

    k = jnp.arange(MS, dtype=I32)
    valid = k < nseq[:, None]
    out_len = nlit.astype(I32) + jnp.sum(jnp.where(valid, ml, 0), axis=1)

    win_w = W if W > 0 else CH
    win_p = jnp.zeros((B, win_w), jnp.uint8)
    if W > 0:
        # history is right-aligned in `window`; keep it right-aligned in the
        # padded buffer so offsets keep meaning "bytes back from the block".
        win_p = win_p.at[:, W - window.shape[1]:].set(window)

    kern = functools.partial(_exec_kernel, W=W, N=N, MSP=MSP, LR=LR)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, LR, CH), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win_w // CH if W else 1, CH), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, N // CH, CH), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N // CH, CH), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM(((W + N) // CH + 2, CH), I32),
            pltpu.VMEM((LR + 2, CH), I32),
            pltpu.SMEM((CHS,), I32),
            pltpu.SMEM((CHS,), I32),
            pltpu.SMEM((CHS,), I32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(
        nseq.astype(I32),
        nlit.astype(I32),
        lits.reshape(B, LR, CH),
        win_p.reshape(B, win_w // CH if W else 1, CH),
        spack,
    )

    out = out.reshape(B, N)[:, :out_size]
    return out, out_len


@functools.partial(
    jax.jit,
    static_argnums=(7, 8),
    static_argnames=("out_size", "win_size", "group", "interpret"),
)
def execute_sequences_pallas_mb(
    lits: jax.Array,     # (B, L) uint8 literal bytes (front-compacted)
    nlit: jax.Array,     # (B,)
    ll: jax.Array,       # (B, MS)
    ml: jax.Array,       # (B, MS)
    off: jax.Array,      # (B, MS) resolved offsets (>= 1 where ml > 0)
    nseq: jax.Array,     # (B,)
    window: jax.Array,   # (B, W) uint8 history (dictionary / prior blocks)
    out_size: int,
    win_size: int,
    group: int = 4,
    interpret: bool = False,
    lit_src: tuple | None = None,
):
    """Multi-block sequence executor (see _exec_kernel_mb). Same contract as
    execute_sequences_pallas; `group` blocks share each grid step.

    Blocks are regrouped in nseq order (outputs un-permuted on return): a
    grid step costs its group's MAX sequence count and goes slow-path when
    ANY member needs a remainder loop, so similar blocks must share steps."""
    B0, MS = ll.shape
    G = group
    order = jnp.argsort(nseq)
    inv = jnp.argsort(order)
    lits = jnp.take(lits, order, axis=0)
    nlit = jnp.take(nlit, order, axis=0)
    ll = jnp.take(ll, order, axis=0)
    ml = jnp.take(ml, order, axis=0)
    off = jnp.take(off, order, axis=0)
    nseq = jnp.take(nseq, order, axis=0)
    window = jnp.take(window, order, axis=0)
    if lit_src is not None:
        syms, regen = lit_src
        R4 = syms.shape[0]
        o4 = (order[:, None] * 4 + jnp.arange(4)[None, :]).reshape(-1)
        lit_src = (jnp.take(syms, o4, axis=0), jnp.take(regen, order, axis=0))
    B = _round_up(B0, G)
    if B != B0:
        padb = ((0, B - B0), (0, 0))
        lits = jnp.pad(lits, padb)
        ll = jnp.pad(ll, padb)
        ml = jnp.pad(ml, padb)
        off = jnp.pad(off, padb, constant_values=1)
        window = jnp.pad(window, padb)
        nlit = jnp.pad(nlit, (0, B - B0))
        nseq = jnp.pad(nseq, (0, B - B0))
    N = _round_up(out_size, 4096)
    W = _round_up(win_size, 4096) if win_size > 1 else 0

    if lit_src is not None:
        syms, regen = lit_src
        lits = assemble_literals_rotates(syms, regen, N)
        nlit = regen.astype(I32)
        if B != B0:
            lits = jnp.pad(lits, ((0, B - B0), (0, 0)))
            nlit = jnp.pad(nlit, (0, B - B0))
    L = _round_up(max(lits.shape[1], CH), CH)
    if lits.shape[1] < L:
        lits = jnp.pad(lits, ((0, 0), (0, L - lits.shape[1])))
    LR = L // CH

    MSP = _round_up(max(MS, CHS), CHS)
    padw = ((0, 0), (0, MSP - MS))
    spack = jnp.concatenate(
        [jnp.pad(ll, padw)[:, None, :], jnp.pad(ml, padw)[:, None, :],
         jnp.pad(off, padw)[:, None, :]], axis=1
    ).reshape(-1)

    k = jnp.arange(MS, dtype=I32)
    valid = k < nseq[:, None]
    out_len = (nlit.astype(I32) + jnp.sum(jnp.where(valid, ml, 0), axis=1))[:B0]

    win_w = W if W > 0 else CH
    win_p = jnp.zeros((B, win_w), jnp.uint8)
    if W > 0:
        win_p = win_p.at[:, W - window.shape[1]:].set(window)

    kern = functools.partial(_exec_kernel_mb, W=W, N=N, MSP=MSP, LR=LR, G=G)
    out = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((G, LR, CH), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, win_w // CH if W else 1, CH), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((G, N // CH, CH), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N // CH, CH), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((G, (W + N) // CH + 2, CH), I32),
            pltpu.VMEM((G, LR + 2, CH), I32),
        ] + [pltpu.SMEM((CHS,), I32) for _ in range(3 * G)] + [
            pltpu.SemaphoreType.DMA((3 * G,)),
        ],
        interpret=interpret,
    )(
        nseq.astype(I32),
        nlit.astype(I32),
        lits.reshape(B, LR, CH),
        win_p.reshape(B, win_w // CH if W else 1, CH),
        spack,
    )

    out = jnp.take(out.reshape(B, N)[:B0], inv, axis=0)[:, :out_size]
    return out, jnp.take(out_len, inv, axis=0)
