"""Micro: windowed vs full-axis extraction sort + pallas concat cost."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

I32 = jnp.int32
B, N, W = 128, 131072, 8192
NW = N // W

rng = np.random.default_rng(0)
key_full = jnp.asarray(rng.permutation(np.arange(B * N)).reshape(B, N).astype(np.int32))
pk = jnp.asarray(rng.integers(0, 1 << 30, (B, N), dtype=np.int32))
keyw = jnp.asarray(
    np.stack([rng.permutation(np.arange(NW * W)).reshape(NW, W) for _ in range(B)]).astype(np.int32)
)
pkw = pk.reshape(B, NW, W)
cnt = jnp.asarray(rng.integers(100, 1500, (B, NW), dtype=np.int32))
zero = jnp.zeros((B, NW), jnp.int32)

_r = jax.jit(lambda t: jax.tree.reduce(lambda a, b: a + b, jax.tree.map(
    lambda x: jnp.sum(x.astype(jnp.float32)), t)))


def timed(name, fn, *a):
    out = fn(*a)
    jax.device_get(_r(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.device_get(_r(out))
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1000:8.1f} ms")
    return out


@jax.jit
def full_sort(k, p):
    return jax.lax.sort((k, p), num_keys=1, is_stable=False)


@jax.jit
def win_sort(k, p):
    return jax.lax.sort((k, p), num_keys=1, is_stable=False)


@jax.jit
def concat3(p, c):
    from tpu_zstd.ops.pallas_concat import concat_varlen

    f = jax.vmap(lambda x, o, n: concat_varlen(x, o, n, N))
    lits = f(p, zero, c)
    s = jax.vmap(lambda x, o, n: concat_varlen(x[:, :2048], o, n, 32768))
    return lits, s(p, zero, c), s(p + 1, zero, c)


timed("full-axis sort (B,N) 2ops", full_sort, key_full, pk)
timed("windowed sort (B,NW,W) 2ops", win_sort, keyw, pkw)
timed("pallas concat x3", concat3, pkw, cnt)
