"""Micro-profile of parse_block sub-stages on the chip."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_corpus
from tpu_zstd.ops.lz77_jax import SEG, _hash_words, find_matches, greedy_parse
from tpu_zstd.ops.pipeline import DEFAULT_CONFIG

cfg = DEFAULT_CONFIG
N = cfg.block_size
B = 64
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
    print(f"{name:28s} {min(ts)*1000:8.1f} ms")
    return out


hl, depth, cap = cfg.hash_log, cfg.depth, cfg.cap
nwords = cap // 4


@jax.jit
def sort1(blocks, lengths):
    def one(block, n):
        pos = jnp.arange(N, dtype=I32)
        w, h = _hash_words(block, hl)
        big = jnp.iinfo(jnp.int32).max
        key = jnp.where((pos < n - 3), h, big)
        ops = [key, pos] + [jnp.roll(w, -4 * k).astype(I32) for k in range(nwords)]
        return jax.lax.sort(tuple(ops), num_keys=1, is_stable=True)
    return jax.vmap(one)(blocks, lengths)


s1 = timed("sort1 (hash, 10 ops)", sort1, blocks, lengths)


@jax.jit
def compares(s1):
    def one(ops):
        sk, sp = ops[0], ops[1]
        sw = ops[2:]
        big = jnp.iinfo(jnp.int32).max
        best_ml = jnp.zeros(N, dtype=I32)
        best_off = jnp.zeros(N, dtype=I32)
        for d in range(1, depth + 1):
            pk = jnp.roll(sk, d).at[:d].set(big - 1)
            pp = jnp.roll(sp, d).at[:d].set(0)
            same = (pk == sk) & (sk != big)
            ml = jnp.zeros(N, dtype=I32)
            alive = same
            for k in range(nwords):
                x = sw[k].astype(jnp.uint32) ^ jnp.roll(sw[k], d).astype(jnp.uint32)
                inc = jnp.where(x == 0, 4, ((x & 0xFF) == 0).astype(I32)
                                + ((x & 0xFFFF) == 0).astype(I32) + ((x & 0xFFFFFF) == 0).astype(I32))
                ml = ml + jnp.where(alive, inc, 0)
                alive = alive & (x == 0)
            better = ml > best_ml
            best_ml = jnp.where(better, ml, best_ml)
            best_off = jnp.where(better, sp - pp, best_off)
        return best_ml, best_off
    return jax.vmap(one)(s1)


cmp_out = timed("chain compares (d=4)", compares, s1)


@jax.jit
def sort2(s1, cmp_out):
    def one(ops, mlo):
        sp = ops[1]
        best_ml, best_off = mlo
        return jax.lax.sort((sp, best_ml, best_off), num_keys=1, is_stable=True)
    return jax.vmap(one)(s1, cmp_out)


timed("sort2 (pos restore)", sort2, s1, cmp_out)


@jax.jit
def full_find(blocks, lengths):
    return jax.vmap(lambda b, l: find_matches(b, l, hash_log=hl, depth=depth, cap=cap))(
        blocks, lengths
    )


fm = timed("find_matches total", full_find, blocks, lengths)


@jax.jit
def greedy(blocks, lengths, fm):
    def one(block, n, bml, boff):
        pos = jnp.arange(N, dtype=I32)
        room = SEG - (pos & (SEG - 1))
        ml_t = jnp.minimum(bml, room)
        matched = (ml_t >= cfg.min_match) & (boff > 0) & (pos < n)
        step = jnp.where(matched, ml_t, 1)
        return greedy_parse(step, matched)
    return jax.vmap(one)(blocks, lengths, *fm)


gp = timed("greedy scan", greedy, blocks, lengths, fm)


@jax.jit
def extraction(blocks, lengths, fm, gp):
    def one(block, n, bml, boff, is_seq, is_lit):
        pos = jnp.arange(N, dtype=I32)
        sel_key = jnp.where(is_seq, pos, N)
        _, e_pos, e_ml, e_off = jax.lax.sort(
            (sel_key, pos, bml, boff), num_keys=1, is_stable=True
        )
        lkey = jnp.where(is_lit, pos, N)
        _, lits = jax.lax.sort((lkey, block.astype(I32)), num_keys=1, is_stable=True)
        return e_pos[: cfg.max_seqs], lits
    return jax.vmap(one)(blocks, lengths, *fm, *gp)


timed("extract+lits sorts", extraction, blocks, lengths, fm, gp)
