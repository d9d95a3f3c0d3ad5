"""Micro-compare: sort-based vs tree-based bit deposit on chip (Huffman/FSE scale)."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tpu_zstd.ops.bitpack import deposit_bits_at_sorted, deposit_bits_tree

I32 = jnp.int32
U32 = jnp.uint32

B = 64
M = 65536           # fields per block (Huffman pair fields, 4 streams merged)
NW = 45056 // 4     # output words

rng = np.random.default_rng(2)
vals = jnp.asarray(rng.integers(0, 1 << 22, (B, M)).astype(np.uint32))
lens = jnp.asarray(rng.integers(4, 23, (B, M)).astype(np.int32))

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


NWH = M * 24 // 32 + 2


@jax.jit
def dep_sorted(vals, lens):
    def one(v, l):
        offs = jnp.cumsum(l) - l
        return deposit_bits_at_sorted(v, l, offs, NWH)
    return jax.vmap(one)(vals, lens)


@jax.jit
def dep_tree(vals, lens):
    def one(v, l):
        return deposit_bits_tree(v, l, NWH, max_field_bits=22)[0]
    return jax.vmap(one)(vals, lens)


@jax.jit
def dep_tree4(vals, lens):
    # 4 independent streams of M/4 fields (the real Huffman shape)
    def one(v, l):
        vv = v.reshape(4, M // 4)
        ll = l.reshape(4, M // 4)
        return jax.vmap(lambda a, b: deposit_bits_tree(a, b, NWH // 4 + 2, 22)[0])(vv, ll)
    return jax.vmap(one)(vals, lens)


r1 = timed("deposit sorted (65536 fields)", dep_sorted, vals, lens)
r2 = timed("deposit tree   (65536 fields)", dep_tree, vals, lens)
timed("deposit tree 4-stream (4x16384)", dep_tree4, vals, lens)
print("equal:", bool(jnp.all(r1 == r2)))

# FSE scale: 3*32768 fields, <=32 bits
M2 = 98304
NW2 = (32768 * 40) // 32 + 32
vals2 = jnp.asarray(rng.integers(0, 1 << 30, (B, M2)).astype(np.uint32))
lens2 = jnp.asarray(rng.integers(0, 18, (B, M2)).astype(np.int32))


@jax.jit
def dep2_sorted(vals, lens):
    def one(v, l):
        offs = jnp.cumsum(l) - l
        return deposit_bits_at_sorted(v, l, offs, NW2)
    return jax.vmap(one)(vals, lens)


@jax.jit
def dep2_tree(vals, lens):
    def one(v, l):
        return deposit_bits_tree(v, l, NW2, max_field_bits=17)[0]
    return jax.vmap(one)(vals, lens)


r3 = timed("fse deposit sorted (98304 flds)", dep2_sorted, vals2, lens2)
r4 = timed("fse deposit tree   (98304 flds)", dep2_tree, vals2, lens2)
print("equal:", bool(jnp.all(r3 == r4)))
