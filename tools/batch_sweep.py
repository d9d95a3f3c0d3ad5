"""Throughput vs batch size for the staged pipeline on the real chip."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_corpus
from tpu_zstd.ops.pipeline import DEFAULT_CONFIG, compress_blocks_staged_many

cfg = DEFAULT_CONFIG
N = cfg.block_size

for B in [int(x) for x in (sys.argv[1:] or ["32", "64", "128", "256"])]:
    data = make_corpus(B * N)
    jb = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(B, N))
    jl = jnp.asarray(np.full(B, N, dtype=np.int32))
    outs = compress_blocks_staged_many([(jb, jl)] * 2, cfg)  # warm
    for o in outs:
        jax.device_get(o[1])
    REPS = 4
    t0 = time.perf_counter()
    outs = compress_blocks_staged_many([(jb, jl)] * REPS, cfg)
    for o in outs:
        jax.device_get(o[1])
    dt = (time.perf_counter() - t0) / REPS
    print(f"B={B:4d}  {B * N / dt / 1e9:7.4f} GB/s  {dt * 1000:8.2f} ms/batch", flush=True)
