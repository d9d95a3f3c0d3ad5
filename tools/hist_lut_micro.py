"""Micro-compare: literal histogram variants and 256-entry LUT variants on chip."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_corpus

I32 = jnp.int32
F32 = jnp.float32
BF16 = jnp.bfloat16

N = 128 * 1024
B = 64
data = make_corpus(B * N)
lits = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(B, N))
nlit = jnp.asarray(np.full(B, N - 7, dtype=np.int32))

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
    print(f"{name:36s} {min(ts)*1000:8.1f} ms")
    return out


# --- histogram variants ------------------------------------------------------

@jax.jit
def hist_sort(lits, nlit):
    def one(l, n):
        pos = jnp.arange(N, dtype=I32)
        vals = jnp.where(pos < n, l.astype(I32), 256)
        sv = jnp.sort(vals)
        edges = jnp.searchsorted(sv, jnp.arange(257, dtype=I32), method="scan_unrolled")
        return (edges[1:] - edges[:-1]).astype(I32)
    return jax.vmap(one)(lits, nlit)


@jax.jit
def hist_cmp(lits, nlit):
    def one(l, n):
        pos = jnp.arange(N, dtype=I32)
        v = jnp.where(pos < n, l.astype(I32), 256)
        # (257, N) compare fused into a reduce over N
        k = jnp.arange(257, dtype=I32)
        return jnp.sum((v[None, :] == k[:, None]).astype(I32), axis=1)[:256]
    return jax.vmap(one)(lits, nlit)


@jax.jit
def hist_cmp2d(lits, nlit):
    # reshape to (R, 128): compare per value k, reduce both axes
    def one(l, n):
        pos = jnp.arange(N, dtype=I32)
        v = jnp.where(pos < n, l.astype(I32), 256).reshape(-1, 128)
        k = jnp.arange(257, dtype=I32)
        return jnp.sum((v[None] == k[:, None, None]).astype(I32), axis=(1, 2))[:256]
    return jax.vmap(one)(lits, nlit)


@jax.jit
def hist_matmul(lits, nlit):
    def one(l, n):
        pos = jnp.arange(N, dtype=I32)
        v = jnp.where(pos < n, l.astype(I32), 256)
        oh = (v[:, None] == jnp.arange(256, dtype=I32)[None, :]).astype(BF16)
        ones = jnp.ones((N,), BF16)
        return jax.lax.dot_general(
            ones, oh, (((0,), (0,)), ((), ())), preferred_element_type=F32
        ).astype(I32)
    return jax.vmap(one)(lits, nlit)


h1 = timed("hist sort+searchsorted", hist_sort, lits, nlit)
h2 = timed("hist compare-reduce 1d", hist_cmp, lits, nlit)
h3 = timed("hist compare-reduce 2d", hist_cmp2d, lits, nlit)
h4 = timed("hist onehot matmul bf16", hist_matmul, lits, nlit)
print("agree:", bool(jnp.all(h1 == h2)), bool(jnp.all(h1 == h3)), bool(jnp.all(h1 == h4)))

# --- 256-entry LUT variants --------------------------------------------------

tbl = jnp.asarray((np.arange(256, dtype=np.int32) * 211) % (1 << 16))  # 16-bit values
tblB = jnp.tile(tbl[None], (B, 1))


@jax.jit
def lut_2level_f32(tblB, lits):
    def one(table, idx8):
        idx = idx8.astype(I32)
        t = table.astype(F32).reshape(16, 16)
        hi = idx >> 4
        lo = idx & 15
        oh_hi = (hi[:, None] == jnp.arange(16, dtype=I32)[None, :]).astype(F32)
        rows = jnp.matmul(oh_hi, t, precision=jax.lax.Precision.HIGHEST)
        oh_lo = (lo[:, None] == jnp.arange(16, dtype=I32)[None, :]).astype(F32)
        return jnp.sum(rows * oh_lo, axis=1).astype(I32)
    return jax.vmap(one)(tblB, lits)


@jax.jit
def lut_2level_bf16_planes(tblB, lits):
    def one(table, idx8):
        idx = idx8.astype(I32)
        hi = idx >> 4
        lo = idx & 15
        oh_hi = (hi[:, None] == jnp.arange(16, dtype=I32)[None, :]).astype(BF16)
        oh_lo = (lo[:, None] == jnp.arange(16, dtype=I32)[None, :]).astype(BF16)
        out = jnp.zeros(idx.shape, I32)
        for shift in (0, 8):
            t = ((table >> shift) & 0xFF).astype(BF16).reshape(16, 16)
            rows = jnp.matmul(oh_hi, t)  # bf16 exact <=255
            v = jnp.sum(rows * oh_lo, axis=1).astype(I32)
            out = out | (v << shift)
        return out
    return jax.vmap(one)(tblB, lits)


@jax.jit
def lut_select16(tblB, lits):
    # 16-way select tree on 4-bit halves: rows via 16 selects, col via 16 selects
    def one(table, idx8):
        idx = idx8.astype(I32)
        hi = idx >> 4
        lo = idx & 15
        t = table.reshape(16, 16)
        row = jnp.zeros(idx.shape, I32)
        for r in range(16):
            # gather col within row r lazily: first select the row vector value per lane
            pass
        # two-stage: value = sum over r,c of t[r,c] * (hi==r) * (lo==c) — pure VPU select/add
        out = jnp.zeros(idx.shape, I32)
        for r in range(16):
            sel = jnp.zeros(idx.shape, I32)
            for c in range(16):
                sel = jnp.where(lo == c, t[r, c], sel)
            out = jnp.where(hi == r, sel, out)
        return out
    return jax.vmap(one)(tblB, lits)


l1 = timed("lut 2-level f32 HIGHEST", lut_2level_f32, tblB, lits)
l2 = timed("lut 2-level bf16 byte-planes", lut_2level_bf16_planes, tblB, lits)
l3 = timed("lut select 256-way", lut_select16, tblB, lits)
print("agree:", bool(jnp.all(l1 == l2)), bool(jnp.all(l1 == l3)))
