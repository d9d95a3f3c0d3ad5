"""Micro: staged (host bucket fetch) vs single-dispatch (lax.switch) pipeline."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_corpus
from tpu_zstd.ops.pipeline import (
    DEFAULT_CONFIG,
    compress_blocks,
    compress_blocks_staged,
    compress_blocks_staged_many,
)

cfg = DEFAULT_CONFIG
N = cfg.block_size
B = 64
data = make_corpus(B * N)
blocks = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(B, N))
lengths = jnp.asarray(np.full(B, N, dtype=np.int32))

_reduce = jax.jit(lambda out: jax.tree.reduce(
    lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out)))


def timed(name, fn, *args, reps=5):
    out = fn(*args)
    jax.device_get(_reduce(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(_reduce(out))
        ts.append(time.perf_counter() - t0)
    gbps = B * N / min(ts) / 1e9
    print(f"{name:34s} {min(ts)*1000:8.1f} ms  {gbps*1000:7.1f} MB/s")
    return out


timed("staged (2 dispatch + bmax RTT)", lambda: compress_blocks_staged(blocks, lengths, cfg))
timed("single dispatch (lax.switch)", lambda: compress_blocks(blocks, lengths, cfg))

# pipelined many: steady-state per batch
for fn, name in ((compress_blocks_staged_many, "staged_many x8"),):
    outs = fn([(blocks, lengths)] * 2, cfg)
    for o in outs:
        jax.device_get(o[1])
    t0 = time.perf_counter()
    outs = fn([(blocks, lengths)] * 8, cfg)
    for o in outs:
        jax.device_get(o[1])
    dt = (time.perf_counter() - t0) / 8
    print(f"{name:34s} {dt*1000:8.1f} ms  {B*N/dt/1e6:7.1f} MB/s")

# single-dispatch pipelined: issue all 8, fetch lens at end
outs = [compress_blocks(blocks, lengths, cfg) for _ in range(2)]
for o in outs:
    jax.device_get(o[1])
t0 = time.perf_counter()
outs = [compress_blocks(blocks, lengths, cfg) for _ in range(8)]
for o in outs:
    jax.device_get(o[1])
dt = (time.perf_counter() - t0) / 8
print(f"{'switch x8 async':34s} {dt*1000:8.1f} ms  {B*N/dt/1e6:7.1f} MB/s")
