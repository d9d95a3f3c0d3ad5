"""Direct timing of the two staged dispatches at the bench shape (B=128),
with a toggle for the Pallas chain kernel (TPU_ZSTD_NO_PALLAS_CHAIN=1)."""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_corpus
from tpu_zstd.ops.pipeline import (
    DEFAULT_CONFIG,
    _encode_grouped,
    _parse_prep_stage,
)

cfg = DEFAULT_CONFIG
N = cfg.block_size
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128

import jax.numpy as jnp

data = make_corpus(B * N)
blocks = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(B, N))
lengths = jnp.asarray(np.full(B, N, dtype=np.int32))

_reduce = jax.jit(lambda out: jax.tree.reduce(
    lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out)
))


def sync(out):
    jax.device_get(_reduce(out))


# Warm both stages.
seqs, nseq_dev = _parse_prep_stage(blocks, lengths, cfg)
nseq_host = np.asarray(jax.device_get(nseq_dev))
out = _encode_grouped(blocks, lengths, seqs, nseq_host, cfg)
sync(out)

# Sync-floor measurement.
t0 = time.perf_counter()
sync(out)
floor = time.perf_counter() - t0
print(f"sync floor                    {floor*1000:8.1f} ms")

for name, fn in (
    ("parse_prep", lambda: _parse_prep_stage(blocks, lengths, cfg)[0]),
    ("encode (chains+deposit+asm)", lambda: _encode_grouped(blocks, lengths, seqs, nseq_host, cfg)),
):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {min(ts)*1000:8.1f} ms")

# Chained (parse -> encode) like the real pipeline, one sync.
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    s2, nd = _parse_prep_stage(blocks, lengths, cfg)
    nh = np.asarray(jax.device_get(nd))
    sync(_encode_grouped(blocks, lengths, s2, nh, cfg))
    ts.append(time.perf_counter() - t0)
print(f"{'full staged (1 batch)':28s} {min(ts)*1000:8.1f} ms")
