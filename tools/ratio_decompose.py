"""Ratio decomposition: where does our gap vs libzstd L3 come from?

Encodes the SAME device-parse output with progressively better entropy stages:
  A. device encode (predefined FSE + device Huffman)     = today's ratio
  B. host encode, predefined FSE + package-merge Huffman = Huffman-quality gain
  C. host encode, custom FSE tables + pm Huffman         = custom-table gain
  D. libzstd -3 on the same blocks                       = parse-quality remainder
Run on CPU backend (fast for a handful of blocks).
"""

from __future__ import annotations

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from bench import make_corpus  # noqa: E402
from tpu_zstd.constants import LL_DEFAULT_NORM, ML_DEFAULT_NORM, OF_DEFAULT_NORM  # noqa: E402
from tpu_zstd.constants import SEQ_FSE, SEQ_PREDEFINED, ll_code, ml_code, of_code  # noqa: E402
from tpu_zstd.format import frame as fr  # noqa: E402
from tpu_zstd.format import sequences as fseq  # noqa: E402
from tpu_zstd.format.sequences import Sequences, build_fse_ctable_for_codes  # noqa: E402
from tpu_zstd.ops.pipeline import DEFAULT_CONFIG, compress_blocks  # noqa: E402
from tpu_zstd.ops.lz77_jax import parse_block  # noqa: E402

import zstandard  # noqa: E402

BS = DEFAULT_CONFIG.block_size
NBLOCKS = 16


def encode_sequences_custom(seqs: Sequences) -> bytes:
    """Sequence section with per-block FSE tables where they beat predefined."""
    n = len(seqs)
    if n == 0:
        return fseq.write_nbseq(0)
    pre_ll, pre_of, pre_ml = fseq.predefined_ctables()
    specs = [
        (ll_code(seqs.lit_lengths), 35, 9, pre_ll),
        (of_code(seqs.off_bases), 31, 8, pre_of),
        (ml_code(seqs.match_lengths), 52, 9, pre_ml),
    ]
    modes = []
    tables = []
    headers = []
    for codes, max_sym, max_log, pre in specs:
        r = build_fse_ctable_for_codes(codes, max_sym, max_log, None)
        if r is None:
            modes.append(SEQ_PREDEFINED)
            tables.append(pre)
            headers.append(b"")
        else:
            ct, hdr = r
            modes.append(SEQ_FSE)
            tables.append(ct)
            headers.append(hdr)
    mode_byte = (modes[0] << 6) | (modes[1] << 4) | (modes[2] << 2)
    bits = fseq.encode_sequences_bitstream(seqs, tables[0], tables[1], tables[2])
    return fseq.write_nbseq(n) + bytes([mode_byte]) + b"".join(headers) + bits


def main() -> None:
    import jax.numpy as jnp

    corpus = make_corpus(NBLOCKS * BS)
    blocks = np.frombuffer(corpus, dtype=np.uint8)[: NBLOCKS * BS].reshape(NBLOCKS, BS)
    lengths = np.full(NBLOCKS, BS, dtype=np.int32)
    cfg = DEFAULT_CONFIG

    contents, clens, btypes = jax.device_get(
        compress_blocks(jnp.asarray(blocks), jnp.asarray(lengths), cfg)
    )
    size_A = int(np.sum(clens)) + 3 * NBLOCKS

    parse = jax.jit(
        lambda b, l: parse_block(
            b, l, max_seqs=cfg.max_seqs, hash_log=cfg.hash_log, depth=cfg.depth,
            cap=cfg.cap, min_match=cfg.min_match, lazy=cfg.lazy,
        )
    )
    size_B = size_C = size_D = 0
    lit_tot = seq_tot_pre = seq_tot_cus = 0
    nseq_tot = 0
    cctx = zstandard.ZstdCompressor(level=3)
    for i in range(NBLOCKS):
        bs = jax.device_get(parse(jnp.asarray(blocks[i]), jnp.asarray(BS)))
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
        seq_sec_pre = fseq.encode_sequences_section(seqs)
        seq_sec_cus = encode_sequences_custom(seqs)
        lit_tot += len(lit_sec)
        seq_tot_pre += len(seq_sec_pre)
        seq_tot_cus += min(len(seq_sec_cus), len(seq_sec_pre))
        size_B += len(lit_sec) + len(seq_sec_pre) + 3
        size_C += len(lit_sec) + min(len(seq_sec_cus), len(seq_sec_pre)) + 3
        size_D += len(cctx.compress(blocks[i].tobytes()))

    total = NBLOCKS * BS
    print(f"nseq total {nseq_tot}, lit bytes {lit_tot}, seq pre {seq_tot_pre}, seq custom {seq_tot_cus}")
    for name, sz in (("A device today ", size_A), ("B host pm-huff ", size_B),
                     ("C + custom FSE ", size_C), ("D libzstd -3   ", size_D)):
        print(f"{name}: {sz:8d} bytes  ratio {total / sz:.3f}")


if __name__ == "__main__":
    main()
