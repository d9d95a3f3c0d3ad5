"""Sweep windowed match finding (mf_win_log) x compare cap: EXACT sizes.

Parses blocks on CPU with each setting, entropy-codes with the host codec
(custom FSE + package-merge Huffman) — exact bytes. Compare against libzstd -3
and the current full-window config.
"""

from __future__ import annotations

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import zstandard  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_corpus  # noqa: E402
from tpu_zstd.format import frame as fr  # noqa: E402
from tpu_zstd.format import sequences as fseq  # noqa: E402
from tpu_zstd.format.sequences import Sequences  # noqa: E402
from tpu_zstd.ops.lz77_jax import parse_block  # noqa: E402
from ratio_decompose import encode_sequences_custom  # noqa: E402

BS = 131072
IDX = (0, 8, 12, 20, 33, 40, 52, 60)


def main() -> None:
    corpus = make_corpus(64 * BS)
    blocks = [np.frombuffer(corpus[i * BS : (i + 1) * BS], np.uint8) for i in IDX]
    cctx = zstandard.ZstdCompressor(level=3)
    zbytes = sum(len(cctx.compress(b.tobytes())) for b in blocks)

    configs = [
        # (mf_win_log, cap, depth)
        (0, 32, 8),    # current L3-4
        (0, 16, 8),
        (13, 32, 8),
        (13, 16, 8),
        (13, 16, 12),
        (13, 8, 8),
        (14, 16, 8),
        (12, 16, 8),
    ]
    for wl, cap, depth in configs:
        parse = jax.jit(
            lambda b, l, wl=wl, cap=cap, depth=depth: parse_block(
                b, l, max_seqs=32768, hash_log=17, depth=depth, cap=cap,
                min_match=4, lazy=True, of_gate=(8, 12), mf_win_log=wl,
            )
        )
        total = 0
        nseq_tot = 0
        for b in blocks:
            bs = jax.device_get(parse(jnp.asarray(b), jnp.asarray(BS)))
            ns = int(bs.nseq)
            nl = int(bs.nlit)
            nseq_tot += ns
            lits = np.asarray(bs.lits[:nl], dtype=np.uint8).tobytes()
            last_lit = int(BS - np.sum(bs.ml[:ns]) - np.sum(bs.ll[:ns]))
            seqs = Sequences(
                lit_lengths=np.asarray(bs.ll[:ns], dtype=np.int64),
                match_lengths=np.asarray(bs.ml[:ns], dtype=np.int64),
                off_bases=np.asarray(bs.ob[:ns], dtype=np.int64),
                last_literals=last_lit,
            )
            lit_sec = fr.compress_literals_section(lits, enable_huffman=True)
            seq_pre = fseq.encode_sequences_section(seqs)
            seq_cus = encode_sequences_custom(seqs)
            total += len(lit_sec) + min(len(seq_cus), len(seq_pre)) + 3
        print(
            f"win_log={wl:2d} cap={cap:2d} d={depth:2d}  bytes={total:8d}  "
            f"ratio={len(IDX)*BS/total:5.3f}  nseq={nseq_tot:6d}  "
            f"(libzstd {zbytes} -> {len(IDX)*BS/zbytes:5.3f})"
        )


if __name__ == "__main__":
    main()
