"""Micro: XLA sort cost vs operand count/width + dispatch RTT on the chip."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B, N = 64, 1 << 17
rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 1 << 31, (B, N), dtype=np.int32))
pay = [jnp.asarray(rng.integers(0, 1 << 31, (B, N), dtype=np.int32)) for _ in range(9)]

_reduce = jax.jit(lambda out: jax.tree.reduce(
    lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out)))


def timed(name, fn, *args):
    out = fn(*args)
    jax.device_get(_reduce(out))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(_reduce(out))
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1000:8.1f} ms")
    return out


# RTT floor: trivial kernel.
timed("rtt (x+1 scalar)", jax.jit(lambda x: x + 1.0), jnp.float32(1.0))
timed("rtt (8MB elementwise)", jax.jit(lambda x: x + 1), keys)

for nops in (1, 2, 3, 5, 9):
    f = jax.jit(lambda k, *p: jax.lax.sort((k, *p), num_keys=1, is_stable=True))
    timed(f"sort N=128K x64, 1k+{nops-1}p i32", f, keys, *pay[: nops - 1])

# u64-ish: two keys
f2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False))
timed("sort 2 keys (u64-ish)", f2, keys, pay[0])

# smaller segments: sort 16 windows of 8K per block
kw = keys.reshape(B * 16, N // 16)
pw = [p.reshape(B * 16, N // 16) for p in pay[:4]]
f3 = jax.jit(lambda k, *p: jax.lax.sort((k, *p), num_keys=1, is_stable=True))
timed("sort 8K-windows x1024, 1k+4p", f3, kw, *pw)

# unstable vs stable
f4 = jax.jit(lambda k, *p: jax.lax.sort((k, *p), num_keys=1, is_stable=False))
timed("unstable 1k+4p", f4, keys, *pay[:4])

# argsort-then-gather alternative
def ag(k, *p):
    idx = jnp.argsort(k, axis=-1, stable=True)
    return tuple(jnp.take_along_axis(x, idx, axis=-1) for x in (k, *p))
timed("argsort+gather 1k+4p", jax.jit(ag), keys, *pay[:4])

# scatter alternative for pos-restore: values scattered to given perm
perm = jnp.asarray(np.argsort(rng.integers(0, 1 << 31, (B, N)), axis=-1).astype(np.int32))
def sc(perm, *p):
    outs = []
    for x in p:
        o = jnp.zeros_like(x)
        outs.append(o.at[jnp.arange(B)[:, None], perm].set(x))
    return tuple(outs)
timed("scatter-restore 2 arrays", jax.jit(sc), perm, *pay[:2])

# 16-bit payload sort
k16 = keys
p16 = [p.astype(jnp.int16) for p in pay[:4]]
f5 = jax.jit(lambda k, *p: jax.lax.sort((k, *p), num_keys=1, is_stable=True))
timed("sort 1k(i32)+4p(i16)", f5, k16, *p16)
