"""Micro-benchmark: Pallas sequential executor vs XLA pointer-doubling executor.

Builds a realistic decode workload by compressing the bench corpus with
libzstd and decoding the sequence lists on device, then times ONLY the
sequence-execution stage both ways. Verifies bit-identity first.

Run on the real chip: python -u tools/exec_micro.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_corpus  # noqa: E402
from tpu_zstd.ops.decode_jax import execute_sequences_device  # noqa: E402
from tpu_zstd.ops.pallas_exec import execute_sequences_pallas  # noqa: E402

BS = 128 * 1024
B = 64


def build_workload():
    """Parse the corpus into per-block sequence lists with the host decoder."""
    import zstandard

    from tpu_zstd.constants import REPCODE_INIT
    from tpu_zstd.format.frame import decode_literals_section, parse_frame_header
    from tpu_zstd.format.sequences import decode_sequences_section, resolve_offset

    corpus = make_corpus(B * BS)
    MS = 32768
    L = BS
    ll = np.zeros((B, MS), np.int32)
    ml = np.zeros((B, MS), np.int32)
    off = np.ones((B, MS), np.int32)
    nseq = np.zeros(B, np.int32)
    nlit = np.zeros(B, np.int32)
    lits = np.zeros((B, L), np.uint8)
    cctx = zstandard.ZstdCompressor(level=3)
    for b in range(B):
        blk = corpus[b * BS : (b + 1) * BS]
        fz = cctx.compress(blk)
        hdr = parse_frame_header(fz)
        pos = hdr.header_size
        bh = int.from_bytes(fz[pos : pos + 3], "little")
        btype, bsize = (bh >> 1) & 3, bh >> 3
        if btype != 2 or not (bh & 1):
            # raw/rle or multi-block at this level: feed literals only
            nlit[b] = len(blk)
            lits[b, : len(blk)] = np.frombuffer(blk, np.uint8)
            continue
        body = fz[pos + 3 : pos + 3 + bsize]
        lit = decode_literals_section(body, None)
        seqs, _, _ = decode_sequences_section(body[lit.consumed :], None)
        if seqs is None:
            nlit[b] = len(lit.data)
            lits[b, : len(lit.data)] = np.frombuffer(lit.data, np.uint8)
            continue
        rep = list(REPCODE_INIT)
        ns = len(seqs.lit_lengths)
        for i in range(ns):
            o, rep = resolve_offset(
                int(seqs.off_bases[i]), int(seqs.lit_lengths[i]), rep
            )
            off[b, i] = o
        nseq[b] = ns
        ll[b, :ns] = seqs.lit_lengths
        ml[b, :ns] = seqs.match_lengths
        nlit[b] = len(lit.data)
        lits[b, : len(lit.data)] = np.frombuffer(lit.data, np.uint8)
    window = np.zeros((B, 1), np.uint8)
    return lits, nlit, ll, ml, off, nseq, window, corpus


def main() -> None:
    lits, nlit, ll, ml, off, nseq, window, corpus = build_workload()
    print(f"workload: B={B} avg nseq={nseq.mean():.0f} avg nlit={nlit.mean():.0f}")
    args = tuple(jnp.asarray(x) for x in (lits, nlit, ll, ml, off, nseq, window))

    fx = jax.jit(lambda *a: execute_sequences_device(*a, out_size=BS, win_size=1))
    fp = jax.jit(
        lambda *a: execute_sequences_pallas(*a, out_size=BS, win_size=1)
    )

    for name, fn in (("xla", fx), ("pallas", fp)):
        out, out_len = jax.block_until_ready(fn(*args))
        o = np.asarray(out)
        olen = np.asarray(out_len)
        ok = all(
            bytes(o[b, : olen[b]]) == corpus[b * BS : b * BS + int(olen[b])]
            for b in range(B)
        )
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            o2, l2 = fn(*args)
            jax.device_get(l2)          # axon: block_until_ready does not sync
            jax.device_get(o2[0, :1])
            best = min(best, time.perf_counter() - t0)
        gbps = B * BS / best / 1e9
        print(f"{name:7s} correct={ok}  best={best*1e3:8.2f} ms  {gbps:6.3f} GB/s")


if __name__ == "__main__":
    main()
