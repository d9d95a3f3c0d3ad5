"""Micro-profile of parse_block sub-stages (current path) on the chip."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_corpus
from tpu_zstd.ops.lz77_jax import (
    _sort_unique,
    find_matches,
    greedy_parse,
    parse_block,
)
from tpu_zstd.ops.pipeline import DEFAULT_CONFIG

cfg = DEFAULT_CONFIG
N = cfg.block_size
B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
I32 = jnp.int32

data = make_corpus(B * N)
blocks = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(B, N))
lengths = jnp.asarray(np.full(B, N, dtype=np.int32))

_reduce = jax.jit(lambda out: jax.tree.reduce(
    lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out)
))


def timed(name, fn, *args):
    out = fn(*args)
    jax.device_get(_reduce(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(_reduce(out))
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1000:8.1f} ms")
    return out


@jax.jit
def full_parse(blocks, lengths):
    return jax.vmap(
        lambda b, l: parse_block(
            b, l, max_seqs=cfg.max_seqs, hash_log=cfg.hash_log, depth=cfg.depth,
            cap=cfg.cap, min_match=cfg.min_match, lazy=cfg.lazy,
            seg_log=cfg.seg_log, of_gate=cfg.of_gate, mf_win_log=cfg.eff_mf_win_log,
        )
    )(blocks, lengths)


@jax.jit
def fm(blocks, lengths):
    return jax.vmap(
        lambda b, l: find_matches(
            b, l, hash_log=cfg.hash_log, depth=cfg.depth, cap=cfg.cap,
            mf_win_log=cfg.eff_mf_win_log,
        )
    )(blocks, lengths)


@jax.jit
def greedy(bml):
    def one(ml):
        pos = jnp.arange(N, dtype=I32)
        seg = 1 << cfg.seg_log
        room = seg - (pos & (seg - 1))
        ml_t = jnp.minimum(ml, room)
        matched = ml_t >= 4
        step = jnp.where(matched, ml_t, 1)
        return greedy_parse(step, matched, None, seg=seg)
    return jax.vmap(one)(bml)


@jax.jit
def extract_sort(blocks):
    def one(block):
        pos = jnp.arange(N, dtype=I32)
        sel_key = pos ^ 0x5A5A5  # fake unique key
        pk_pb = (pos << 8) | block.astype(I32)
        pk_mo = pos * 3
        return _sort_unique(sel_key, pk_pb, pk_mo)
    return jax.vmap(one)(blocks)


@jax.jit
def merge_sort(blocks):
    MS = cfg.max_seqs
    def one(block):
        k = jnp.arange(MS, dtype=I32)
        mkey = k ^ 0x55
        a = block[:MS].astype(I32)
        return _sort_unique(mkey, a, a + 1, a + 2, a + 3)
    return jax.vmap(one)(blocks)


timed("full parse_block", full_parse, blocks, lengths)
bml, boff = timed("  find_matches (pallas)", fm, blocks, lengths)
timed("  greedy scan", greedy, bml)
timed("  extraction sort (N, 3ops)", extract_sort, blocks)
timed("  merge sort (MS, 5ops)", merge_sort, blocks)
