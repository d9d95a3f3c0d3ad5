"""Sweep PipelineConfig knobs on the chip: staged-pipeline time + ratio."""

from __future__ import annotations

import sys
import time
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_corpus
from tpu_zstd.ops.pipeline import DEFAULT_CONFIG, compress_blocks_staged

N = DEFAULT_CONFIG.block_size
B = 64
data = make_corpus(B * N)
blocks = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(B, N))
lengths = jnp.asarray(np.full(B, N, dtype=np.int32))

_reduce = jax.jit(lambda out: jax.tree.reduce(
    lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out)))


def run(name, cfg):
    out = compress_blocks_staged(blocks, lengths, cfg)
    jax.device_get(_reduce(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = compress_blocks_staged(blocks, lengths, cfg)
        jax.device_get(_reduce(out))
        ts.append(time.perf_counter() - t0)
    clens = np.asarray(jax.device_get(out[1]))
    btypes = np.asarray(jax.device_get(out[2]))
    total = int(np.sum(clens + 3))
    ratio = B * N / total
    print(f"{name:28s} {min(ts)*1000:8.1f} ms  ratio {ratio:.3f}  "
          f"types {np.bincount(btypes, minlength=3)}")


variants = {
    "base (cap32 hl17 d4)": DEFAULT_CONFIG,
    "cap16": replace(DEFAULT_CONFIG, cap=16),
    "cap16 d6": replace(DEFAULT_CONFIG, cap=16, depth=6),
    "cap16 hl15": replace(DEFAULT_CONFIG, cap=16, hash_log=15),
    "cap8 d6": replace(DEFAULT_CONFIG, cap=8, depth=6),
    "cap16 lazy": replace(DEFAULT_CONFIG, cap=16, lazy=True),
}
only = sys.argv[1] if len(sys.argv) > 1 else None
for name, cfg in variants.items():
    if only is None or only in name:
        run(name, cfg)
