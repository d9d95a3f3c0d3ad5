"""Per-stage wall timing of the compress pipeline on the real chip.

Each stage is jitted separately and timed with device_get (the axon tunnel
ignores block_until_ready); numbers overlap (later stages include no earlier
work — inputs are device-resident results fetched once).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_corpus
from tpu_zstd.ops.pipeline import DEFAULT_CONFIG, _fse_bucketed, _assemble_one, _parse_one

cfg = DEFAULT_CONFIG
N = cfg.block_size
B = int(sys.argv[1]) if len(sys.argv) > 1 else 64

data = make_corpus(B * N)
blocks = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(B, N))
lengths = jnp.asarray(np.full(B, N, dtype=np.int32))


_reduce = jax.jit(lambda out: jax.tree.reduce(
    lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out)
))


def timed(name, fn, *args):
    """Time fn; force completion by fetching a scalar reduction of its output
    (fetching the full output would pay the 30 MB/s tunnel transfer)."""
    out = fn(*args)
    jax.device_get(_reduce(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(_reduce(out))
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {min(ts)*1000:8.1f} ms")
    return out


parse = jax.jit(lambda b, l: jax.vmap(lambda bb, ll: _parse_one(bb, ll, cfg))(b, l))
seqs = timed("parse (lz77+greedy)", parse, blocks, lengths)

fse = jax.jit(lambda s: _fse_bucketed(s.ll, s.ml, s.ob, s.nseq, cfg))
seq_out = timed("fse sections (custom)", fse, seqs)

from dataclasses import replace

cfg_pre = replace(cfg, custom_fse=False)
fse_pre = jax.jit(lambda s: _fse_bucketed(s.ll, s.ml, s.ob, s.nseq, cfg_pre))
timed("fse sections (predef)", fse_pre, seqs)

assemble = jax.jit(
    lambda b, l, s, sb, sl: jax.vmap(
        lambda bb, ll, li, nl, ns, sbb, sll: _assemble_one(bb, ll, li, nl, ns, sbb, sll, cfg)
    )(b, l, s.lits, s.nlit, s.nseq, sb, sl)
)
timed("assemble (incl huffman)", assemble, blocks, lengths, seqs, *seq_out)

cfg_nh = replace(cfg, huffman_literals=False)
assemble_nh = jax.jit(
    lambda b, l, s, sb, sl: jax.vmap(
        lambda bb, ll, li, nl, ns, sbb, sll: _assemble_one(bb, ll, li, nl, ns, sbb, sll, cfg_nh)
    )(b, l, s.lits, s.nlit, s.nseq, sb, sl)
)
timed("assemble (raw lits)", assemble_nh, blocks, lengths, seqs, *seq_out)
