"""Lane-parallel Pallas decode kernels: Huffman literals (and helpers).

TPU-native counterpart of the reference's GPU 4-stream Huffman decoder
(reference src/cuda_zstd_huffman.cu:1676 `huffman_decode_rfc8878_kernel`,
:2204 host driver) — but organized around the v5e's measured cost model
(tools/base_micro.py, /tmp probes recorded in README):

- XLA-level element gathers run at ~120-140M elem/s — a per-symbol decode
  table gather caps the whole decoder near 100 MB/s.
- Inside a Mosaic kernel, `take_along_axis` along the 128-lane axis is a
  ~17-cycle VREG op — a REAL per-lane table gather, as long as the table
  row fits 128 lanes.

So this kernel puts one bitstream CHUNK PER LANE (the decode-acceleration
metadata of format/accel.py gives every chunk of `stride` literal symbols
an exact starting bit cursor), holds each chunk's stream words in a
transposed VMEM slice bank, and decodes one symbol per chunk per step:

  peek(tl bits)  -> funnel shift from a 3-word register window (per-lane
                    variable shifts are native)
  table lookup   -> two 128-lane take_along_axis banks (table_log <= 8,
                    guaranteed by the encoder for accel frames)
  window slide   -> at most one new word per TWO steps (<= 16 bits), fetched
                    with a compare-select sweep over the slice rows

Per-symbol cost ~0.25 cycles across 1024 lanes/tile — ~50x the XLA scan
(decode_jax.decode_huffman_device), which remains the fallback for foreign
frames (table_log up to 11) and non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
U32 = jnp.uint32

TILE = 1024  # chunks per grid step (8 sublane-rows x 128 lanes)


def _taa8(bank: jax.Array, idx: jax.Array) -> jax.Array:
    """Per-lane gather from a (8, 128) bank: out[s, l] = bank[s, idx[s, l]]."""
    return jnp.take_along_axis(bank, idx & 127, axis=1)


def _huf_lanes_kernel(slices_ref, bits_ref, nsym_ref, tl_ref, banks_ref,
                      out_ref, *, stride: int, wmax: int, nbanks: int):
    """One (8, 128)-chunk tile per grid step; `stride` symbols per chunk.

    nbanks 128-lane banks cover a 2^tl-entry table (16 banks = the full
    11-bit MAX_BITS codes; round 4 capped accel frames at 8-bit codes for a
    2-bank table, costing ~5.6% compressed size — the executor dominates the
    decode wall, so the wider bank select is effectively free)."""
    n = tl_ref[...]
    ns = nsym_ref[...]

    def fetch(widx):
        """widx (8,128) -> slice words (8,128); out-of-range -> 0."""
        acc = jnp.zeros((8, 128), I32)
        for w in range(wmax):
            acc = jnp.where(widx == w, slices_ref[w], acc)
        return acc

    bp0 = bits_ref[...]
    wlo0 = jnp.maximum(((bp0 - 1) >> 5) - 1, 0)

    def pair_body(u, carry):
        bp, wlo, w0, w1, w2 = carry
        base = wlo << 5
        for h in range(2):
            j = u * 2 + h
            active = j < ns
            have = jnp.clip(bp, 0, n)
            nl = bp - have
            rel = nl - base
            rsel = rel >> 5
            sh = (rel & 31).astype(U32)
            lo = jnp.where(rsel == 0, w0, w1).astype(U32)
            hi = jnp.where(rsel == 0, w1, w2).astype(U32)
            v = (lo >> sh) | ((hi << U32(1)) << (U32(31) - sh))
            raw = (v & ((U32(1) << have.astype(U32)) - U32(1))).astype(I32)
            idx = raw << (n - have)
            g = _taa8(banks_ref[:, 0, :], idx)
            for w in range(1, nbanks):
                g = jnp.where(
                    (idx >> 7) == w, _taa8(banks_ref[:, w, :], idx), g
                )
            nb = g & 15
            sym = g >> 4
            bp = jnp.where(active, bp - nb, bp)
            out_ref[pl.ds(j, 1)] = jnp.where(active, sym, 0)[None]
        # Slide the 3-word window (<= 16 bits consumed per pair -> <= 1 word).
        want = jnp.maximum(((bp - 1) >> 5) - 1, 0)
        moved = want < wlo
        neww = fetch(jnp.where(moved, want, -1))
        w2 = jnp.where(moved, w1, w2)
        w1 = jnp.where(moved, w0, w1)
        w0 = jnp.where(moved, neww, w0)
        return bp, want, w0, w1, w2

    init = (bp0, wlo0, fetch(wlo0), fetch(wlo0 + 1), fetch(wlo0 + 2))
    jax.lax.fori_loop(0, stride // 2, pair_body, init)


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def decode_huffman_lanes(
    slices: jax.Array,   # (wmax, R//128, 128) int32 — per-chunk stream words
    bits0: jax.Array,    # (R//128, 128) int32 initial bit cursor (slice-rel)
    nsym: jax.Array,     # (R//128, 128) int32 symbols per chunk
    tl: jax.Array,       # (R//128, 128) int32 per-chunk table_log (<= 11)
    banks: jax.Array,    # (R//128, NB, 128) int32 packed (symbol<<4 | nb)
    stride: int,
    wmax: int,
    interpret: bool = False,
) -> jax.Array:
    """Decode literal symbols, one chunk per lane. Returns (R, stride) uint8.

    Each 128-lane row of chunks must share one block's decode table (the
    prepare step lays chunks out block-major with per-block padding to a
    multiple of 128 rows).
    """
    R8 = slices.shape[1]
    NB = banks.shape[1]
    assert R8 % 8 == 0 and stride % 2 == 0
    grid = R8 // 8
    kern = functools.partial(
        _huf_lanes_kernel, stride=stride, wmax=wmax, nbanks=NB
    )
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((wmax, 8, 128), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, banks.shape[1], 128), lambda t: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((stride, 8, 128), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((stride, R8, 128), I32),
        interpret=interpret,
    )(slices, bits0, nsym, tl, banks)
    # (stride, R//128, 128) -> (R, stride) symbol-major rows.
    R = R8 * 128
    return jnp.transpose(out, (1, 2, 0)).reshape(R, stride).astype(jnp.uint8)


def build_litlane_inputs(block_litdevs, lit_cks, ncl_pad: int, stride: int):
    """Host-side staging for decode_huffman_lanes.

    block_litdevs: per block (streams[4] bytes, tbits[4], nsym[4],
    packed (2048,) i32 dtable, table_log, regen) — from decompress._parse_litdev.
    lit_cks: per block (4, nck) uint32 checkpoint bit cursors (chunk c -> c-1).
    ncl_pad: chunks per stream, padded (multiple of 32 so 4*ncl_pad % 128 == 0).
    stride: literal symbols per chunk.

    Returns (slices (wmax, R//128, 128) i32, bits0, nsym, tl, banks, wmax, R)
    with R = nblocks * 4 * ncl_pad rows ordered (block, stream, chunk).
    """
    nb = len(block_litdevs)
    rows_per_block = 4 * ncl_pad
    R = nb * rows_per_block
    # 11 = MAX_BITS: a chunk's stream span is bounded by stride * max code
    # length (the 8-bit accel cap is gone; see huffman_jax.ACCEL_MAX_BITS).
    wmax = stride * 11 // 32 + 4
    slices = np.zeros((wmax, R), np.int32)
    bits0 = np.zeros(R, np.int32)
    nsym = np.zeros(R, np.int32)
    tlv = np.zeros(R, np.int32)
    max_tl = max(max(int(litdev[4]) for litdev, _ in zip(block_litdevs, lit_cks)), 8)
    NB = max(-(-(1 << max_tl) // 128), 2)
    banks = np.zeros((R // 128, NB, 128), np.int32)
    for bi, (litdev, lck) in enumerate(zip(block_litdevs, lit_cks)):
        streams, tbits, nsyms, packed, tl, _regen = litdev
        size = 1 << tl
        brow0 = bi * rows_per_block // 128
        for j in range(brow0, brow0 + rows_per_block // 128):
            for w in range(-(-size // 128)):
                e = min(size - w * 128, 128)
                banks[j, w, :e] = packed[w * 128 : w * 128 + e]
        for s in range(4):
            sb = np.frombuffer(streams[s], np.uint8)
            pad = (-len(sb)) % 4
            words = np.pad(sb, (0, pad)).view(np.uint32)
            ncl = -(-int(nsyms[s]) // stride)
            cks = lck[s].astype(np.int64)
            for c in range(ncl):
                r = (bi * 4 + s) * ncl_pad + c
                s_c = int(tbits[s]) if c == 0 else int(cks[c - 1])
                e_c = int(cks[c]) if c < len(cks) else 0
                lo = max(0, (e_c >> 5) - 1)
                hi = min((max(s_c - 1, 0) >> 5) + 2, len(words))
                nw = hi - lo
                if nw > 0:
                    slices[:nw, r] = words[lo:hi].view(np.int32)
                bits0[r] = s_c - lo * 32
                nsym[r] = min(stride, int(nsyms[s]) - c * stride)
                tlv[r] = tl
    return (
        slices.reshape(wmax, R // 128, 128),
        bits0.reshape(R // 128, 128),
        nsym.reshape(R // 128, 128),
        tlv.reshape(R // 128, 128),
        banks,
        wmax,
        R,
    )


# ---------------------------------------------------------------------------
# FSE sequence decode, one chunk per lane.
# ---------------------------------------------------------------------------

_LL_PACKED_NP = None
_ML_PACKED_NP = None


def _value_banks():
    """(8, 128) constant banks: LL/ML baseline | bits<<17 (sublane-replicated)."""
    global _LL_PACKED_NP, _ML_PACKED_NP
    if _LL_PACKED_NP is None:
        from ..constants import LL_BASELINE, LL_BITS, ML_BASELINE, ML_BITS

        ll = np.zeros(128, np.int64)
        ml = np.zeros(128, np.int64)
        ll[: len(LL_BASELINE)] = LL_BASELINE.astype(np.int64) | (
            LL_BITS.astype(np.int64) << 17
        )
        ml[: len(ML_BASELINE)] = ML_BASELINE.astype(np.int64) | (
            ML_BITS.astype(np.int64) << 17
        )
        _LL_PACKED_NP = np.tile(ll.astype(np.int32), (8, 1))
        _ML_PACKED_NP = np.tile(ml.astype(np.int32), (8, 1))
    return _LL_PACKED_NP, _ML_PACKED_NP


def _seq_lanes_kernel(slices_ref, bits_ref, st_ref, rep_ref, nloc_ref,
                      nupd_ref, banks_ref, llv_ref, mlv_ref,
                      oll_ref, oml_ref, ooff_ref, *, stride: int, wmax: int):
    """One (8, 128)-chunk tile per grid step; `stride` sequences per chunk.

    banks_ref: (8, 12, 128) — per sublane-row, 3 streams (LL, OF, ML) x 4
    banks of 128 packed FSE entries (symbol | nb<<6 | new_state<<10).
    State/bit plumbing mirrors ops/decode_jax._decode_seqs_core; see that
    docstring for the RFC mapping and the repcode rules.
    """
    ns = nloc_ref[...]
    nu = nupd_ref[...]
    llb = llv_ref[...]
    mlb = mlv_ref[...]

    def fetch3(base):
        """3 consecutive slice words per lane in ONE row sweep."""
        a0 = jnp.zeros((8, 128), I32)
        a1 = jnp.zeros((8, 128), I32)
        a2 = jnp.zeros((8, 128), I32)
        for w in range(wmax):
            row = slices_ref[w]
            a0 = jnp.where(base == w, row, a0)
            a1 = jnp.where(base == w - 1, row, a1)
            a2 = jnp.where(base == w - 2, row, a2)
        return a0, a1, a2

    def tab(stream: int, state):
        """FSE table lookup from 4 taa banks (state < 512)."""
        g = _taa8(banks_ref[:, stream * 4, :], state)
        for k in range(1, 4):
            gk = _taa8(banks_ref[:, stream * 4 + k, :], state)
            g = jnp.where((state >> 7) == k, gk, g)
        return g

    bp0 = bits_ref[...]
    st0 = st_ref[...]
    st_ll0 = st0 & 0x3FF
    st_of0 = (st0 >> 10) & 0x3FF
    st_ml0 = (st0 >> 20) & 0x3FF
    r0_0 = rep_ref[0]
    r1_0 = rep_ref[1]
    r2_0 = rep_ref[2]
    wlo0 = jnp.maximum(((bp0 - 1) >> 5) - 4, 0)
    f0, f1, f2 = fetch3(wlo0)
    f3, f4, f5 = fetch3(wlo0 + 3)

    def read(win, base, bp, n):
        """Read n (<= 31) bits below cursor bp; returns (value, new bp)."""
        nl = bp - n
        rel = nl - base
        rsel = jnp.clip(rel >> 5, 0, 4)
        sh = (rel & 31).astype(U32)
        lo = win[0]
        hi = win[1]
        for k in range(1, 5):
            lo = jnp.where(rsel == k, win[k], lo)
            hi = jnp.where(rsel == k, win[k + 1], hi)
        lo = lo.astype(U32)
        hi = hi.astype(U32)
        v = (lo >> sh) | ((hi << U32(1)) << (U32(31) - sh))
        mask = (U32(1) << jnp.clip(n, 0, 31).astype(U32)) - U32(1)
        return (v & mask).astype(I32), nl

    def step(t, carry):
        bp, s_ll, s_of, s_ml, r0, r1, r2, wlo, w0, w1, w2, w3, w4, w5 = carry
        active = t < ns
        p_ll = tab(0, s_ll)
        p_of = tab(1, s_of)
        p_ml = tab(2, s_ml)
        ofc = p_of & 63
        llc = p_ll & 63
        mlc = p_ml & 63
        mlv_p = _taa8(mlb, mlc)
        llv_p = _taa8(llb, llc)
        win = (w0, w1, w2, w3, w4, w5)
        base = wlo << 5
        ofx, bl = read(win, base, bp, jnp.where(active, ofc, 0))
        ofv = jnp.where(ofc > 0, (1 << jnp.minimum(ofc, 30)) + ofx, 1)
        mlx, bl = read(win, base, bl, jnp.where(active, mlv_p >> 17, 0))
        ml = (mlv_p & 0x1FFFF) + mlx
        llx, bl = read(win, base, bl, jnp.where(active, llv_p >> 17, 0))
        ll = (llv_p & 0x1FFFF) + llx
        # Repcode resolution (RFC 8878 §3.1.1.5).
        idx = ofv - 1 + (ll == 0).astype(I32)
        off_rep = jnp.where(
            idx == 0, r0,
            jnp.where(idx == 1, r1, jnp.where(idx == 2, r2, jnp.maximum(r0 - 1, 1))),
        )
        is_lit = ofv > 3
        off = jnp.where(is_lit, ofv - 3, off_rep)
        n1 = jnp.where(is_lit, r0, jnp.where(idx == 0, r1, r0))
        n2 = jnp.where(is_lit, r1, jnp.where(idx <= 1, r2, r1))
        r0 = jnp.where(active, off, r0)
        r1 = jnp.where(active, n1, r1)
        r2 = jnp.where(active, n2, r2)
        # Combined state refill: LL | ML | OF fields, top-down (<= 27 bits).
        upd = t < nu
        nb_ll = (p_ll >> 6) & 15
        nb_ml = (p_ml >> 6) & 15
        nb_of = (p_of >> 6) & 15
        ntot = jnp.where(upd, nb_ll + nb_ml + nb_of, 0)
        vall, bl = read(win, base, bl, ntot)
        v_of = vall & ((1 << nb_of) - 1)
        v_ml = (vall >> nb_of) & ((1 << nb_ml) - 1)
        v_ll = vall >> (nb_of + nb_ml)
        s_ll = jnp.where(upd, (p_ll >> 10) + v_ll, s_ll)
        s_ml = jnp.where(upd, (p_ml >> 10) + v_ml, s_ml)
        s_of = jnp.where(upd, (p_of >> 10) + v_of, s_of)
        bp = jnp.where(active, bl, bp)
        oll_ref[pl.ds(t, 1)] = jnp.where(active, ll, 0)[None]
        oml_ref[pl.ds(t, 1)] = jnp.where(active, ml, 0)[None]
        ooff_ref[pl.ds(t, 1)] = jnp.where(active, off, 0)[None]
        # Slide the 6-word window (<= 89 bits consumed -> <= 3 words).
        want = jnp.maximum(((bp - 1) >> 5) - 4, 0)
        delta = jnp.clip(wlo - want, 0, 3)
        n0, n1w, n2w = fetch3(want)
        # new w_k = old w_{k-delta} for k >= delta, fetched word k otherwise
        w0n = jnp.where(delta == 0, w0, n0)
        w1n = jnp.where(delta == 0, w1, jnp.where(delta == 1, w0, n1w))
        w2n = jnp.where(
            delta == 0, w2,
            jnp.where(delta == 1, w1, jnp.where(delta == 2, w0, n2w)),
        )
        w3n = jnp.where(
            delta == 0, w3,
            jnp.where(delta == 1, w2, jnp.where(delta == 2, w1, w0)),
        )
        w4n = jnp.where(
            delta == 0, w4,
            jnp.where(delta == 1, w3, jnp.where(delta == 2, w2, w1)),
        )
        w5n = jnp.where(
            delta == 0, w5,
            jnp.where(delta == 1, w4, jnp.where(delta == 2, w3, w2)),
        )
        return (bp, s_ll, s_of, s_ml, r0, r1, r2, want,
                w0n, w1n, w2n, w3n, w4n, w5n)

    init = (bp0, st_ll0, st_of0, st_ml0, r0_0, r1_0, r2_0, wlo0,
            f0, f1, f2, f3, f4, f5)
    jax.lax.fori_loop(0, stride, step, init)


@functools.partial(jax.jit, static_argnums=(9, 10, 11))
def decode_sequences_lanes(
    slices: jax.Array,  # (wmax, R//128, 128) int32 per-chunk stream words
    bits0: jax.Array,   # (R//128, 128) int32 start cursor (slice-relative)
    st0: jax.Array,     # (R//128, 128) int32 packed ll | of<<10 | ml<<20
    rep0: jax.Array,    # (3, R//128, 128) int32 rep triple at chunk start
    nloc: jax.Array,    # (R//128, 128) int32 sequences in this chunk
    nupd: jax.Array,    # (R//128, 128) int32 state-update count (nloc or -1)
    banks: jax.Array,   # (R//128, 12, 128) int32 FSE entries, 3 streams x 4
    llb: jax.Array,     # (8, 128) int32 LL baseline|bits<<17 bank
    mlb: jax.Array,     # (8, 128) int32 ML baseline|bits<<17 bank
    stride: int,
    wmax: int,
    interpret: bool = False,
):
    """Chunk-parallel FSE sequence decode, one chunk per lane.

    Lane-parallel counterpart of decode_jax.decode_sequences_device_chunked
    (same checkpoint semantics — reference src/cuda_zstd_fse.cu:2674
    chunk-parallel decode, exact instead of speculative). Returns
    (ll, ml, off) each (R, stride) int32.
    """
    R8 = slices.shape[1]
    assert R8 % 8 == 0
    grid = R8 // 8
    kern = functools.partial(_seq_lanes_kernel, stride=stride, wmax=wmax)
    outs = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((wmax, 8, 128), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 8, 128), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 12, 128), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((stride, 8, 128), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((stride, 8, 128), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((stride, 8, 128), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((stride, R8, 128), I32),
            jax.ShapeDtypeStruct((stride, R8, 128), I32),
            jax.ShapeDtypeStruct((stride, R8, 128), I32),
        ],
        interpret=interpret,
    )(slices, bits0, st0, rep0, nloc, nupd, banks, llb, mlb)
    R = R8 * 128
    return tuple(
        jnp.transpose(o, (1, 2, 0)).reshape(R, stride) for o in outs
    )


def _np_read_bits(words: np.ndarray, bp: int, n: int) -> tuple[int, int]:
    """Host mirror of decode_jax._read_bits on one stream (LE u32 words)."""
    nl = bp - n
    w = max(min(nl >> 5, len(words) - 2), 0)
    sh = max(nl, 0) & 31
    w0 = int(words[w])
    w1 = int(words[w + 1]) if w + 1 < len(words) else 0
    v = ((w0 >> sh) | (w1 << (32 - sh) if sh else 0)) & 0xFFFFFFFF
    return v & ((1 << n) - 1), nl


def build_seqlane_inputs(blocks, nc_pad: int, stride: int):
    """Host-side staging for decode_sequences_lanes.

    blocks: per block dicts with keys:
      stream (bytes), tbits (int), nseq (int),
      tables (sym, nb, ns, logs) dense numpy from decompress._dense_tables,
      ckb/cks/ckr (numpy checkpoint arrays, chunk c -> record c-1).
    nc_pad: chunks per block, padded to a multiple of 128.
    stride: sequences per chunk.

    Returns (slices, bits0, st0, rep0, nloc, nupd, banks, wmax, R).
    """
    nb = len(blocks)
    R = nb * nc_pad
    # wmax from the actual worst chunk span (bits), bucketed.
    span_max = 1
    for blk in blocks:
        if blk is None or blk["nseq"] == 0:
            continue
        curs = [blk["tbits"]] + [int(x) for x in blk["ckb"]] + [0]
        nck = -(-blk["nseq"] // stride)
        for c in range(nck):
            e = curs[c + 1] if c + 1 <= len(curs) - 1 else 0
            span_max = max(span_max, curs[c] - e)
    wmax = min(-(-(span_max + 64) // 32 // 8) * 8, stride * 3 + 8)
    slices = np.zeros((wmax, R), np.int32)
    bits0 = np.zeros(R, np.int32)
    st0 = np.zeros(R, np.int32)
    rep0 = np.ones((3, R), np.int32)
    nloc = np.zeros(R, np.int32)
    nupd = np.zeros(R, np.int32)
    banks = np.zeros((R // 128, 12, 128), np.int32)
    for bi, blk in enumerate(blocks):
        if blk is None or blk["nseq"] == 0:
            continue
        sym, nbt, nst, logs = blk["tables"]
        packed = (
            np.clip(sym, 0, 63) | (np.clip(nbt, 0, 15) << 6) | (nst << 10)
        ).astype(np.int32)  # (3, 512)
        brow0 = bi * nc_pad // 128
        for j in range(brow0, brow0 + nc_pad // 128):
            for k in range(3):
                banks[j, k * 4 : k * 4 + 4] = packed[k].reshape(4, 128)
        sb = np.frombuffer(blk["stream"], np.uint8)
        pad = (-len(sb)) % 4
        words = np.pad(sb, (0, pad + 4)).view(np.uint32)
        nseq = blk["nseq"]
        nck = -(-nseq // stride)
        # chunk 0 initial states: read 3 table_log fields from the top.
        bp = blk["tbits"]
        s_ll, bp = _np_read_bits(words, bp, int(logs[0]))
        s_of, bp = _np_read_bits(words, bp, int(logs[1]))
        s_ml, bp = _np_read_bits(words, bp, int(logs[2]))
        curs = [bp] + [int(x) for x in blk["ckb"]]
        sts = [s_ll | (s_of << 10) | (s_ml << 20)] + [int(x) for x in blk["cks"]]
        reps = [(1, 4, 8)] + [tuple(int(v) for v in row) for row in blk["ckr"]]
        for c in range(nck):
            r = bi * nc_pad + c
            s_c = curs[c] if c < len(curs) else 0
            e_c = curs[c + 1] if c + 1 < len(curs) else 0
            lo = max(0, (e_c >> 5) - 1)
            hi = min((max(s_c - 1, 0) >> 5) + 2, len(words))
            nw = min(hi - lo, wmax)
            if nw > 0:
                slices[:nw, r] = words[lo : lo + nw].view(np.int32)
            bits0[r] = s_c - lo * 32
            st0[r] = sts[c] if c < len(sts) else 0
            rp = reps[c] if c < len(reps) else (1, 4, 8)
            rep0[:, r] = rp
            nl_c = min(stride, nseq - c * stride)
            nloc[r] = nl_c
            nupd[r] = nl_c - 1 if c == nck - 1 else nl_c
    return (
        slices.reshape(wmax, R // 128, 128),
        bits0.reshape(R // 128, 128),
        st0.reshape(R // 128, 128),
        rep0.reshape(3, R // 128, 128),
        nloc.reshape(R // 128, 128),
        nupd.reshape(R // 128, 128),
        banks,
        wmax,
        R,
    )
