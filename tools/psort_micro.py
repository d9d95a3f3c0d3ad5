"""Micro: Pallas bitonic sort_rows vs jax.lax.sort on match-finder shapes."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tpu_zstd.ops.pallas_sort import sort_rows

rng = np.random.default_rng(0)


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1000:8.2f} ms", flush=True)
    return out


def run_case(R, W, n_payload):
    key = jnp.asarray(rng.permuted(np.tile(np.arange(W, dtype=np.int32), (R, 1)), axis=1))
    pays = [jnp.asarray(rng.integers(0, 1 << 30, (R, W), dtype=np.int32)) for _ in range(n_payload)]

    xla = jax.jit(lambda *o: jax.lax.sort(o, num_keys=1, is_stable=False))
    plk = jax.jit(lambda *o: sort_rows(*o))

    o1 = timed(f"xla  sort ({R}x{W}, {1+n_payload} ops)", xla, key, *pays)
    o2 = timed(f"plas sort ({R}x{W}, {1+n_payload} ops)", plk, key, *pays)
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("  match OK", flush=True)


if __name__ == "__main__":
    run_case(64, 8192, 1)       # small sanity
    run_case(1024, 8192, 8)     # match-finder hash sort (64 blocks, W=8K, cap=32)
    run_case(1024, 8192, 1)     # position-restore sort
    run_case(64, 131072, 2)     # extraction/compaction sort (full block axis)
