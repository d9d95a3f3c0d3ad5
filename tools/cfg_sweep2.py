"""On-chip (speed, ratio) sweep over parse knobs at the bench config."""

from __future__ import annotations

import itertools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_corpus
from tpu_zstd.ops.pipeline import PipelineConfig, compress_blocks_staged_many

B = 64
N = 131072
data = make_corpus(B * N)
jb = jnp.asarray(np.frombuffer(data, np.uint8).reshape(B, N))
jl = jnp.asarray(np.full(B, N, np.int32))

variants = [
    dict(),                       # default: cap=32 depth=8 win=13 ldm=True
    dict(ldm=False),
    dict(cap=24),
    dict(cap=16),
    dict(depth=6),
    dict(depth=4),
    dict(cap=24, depth=6),
    dict(cap=16, depth=4),
    dict(mf_win_log=12),
    dict(cap=24, depth=6, mf_win_log=12),
]

for kw in variants:
    cfg = PipelineConfig(**kw)
    outs = compress_blocks_staged_many([(jb, jl)] * 2, cfg)
    for o in outs:
        jax.device_get(o[1])
    total = int(np.asarray(outs[0][1]).sum())
    t0 = time.perf_counter()
    outs = compress_blocks_staged_many([(jb, jl)] * 4, cfg)
    for o in outs:
        jax.device_get(o[1])
    dt = (time.perf_counter() - t0) / 4
    print(
        f"{str(kw):44s} {dt * 1000:7.1f} ms  {B * N / dt / 1e9:6.4f} GB/s"
        f"  ratio {B * N / total:6.4f}",
        flush=True,
    )
