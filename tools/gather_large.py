"""Microbenchmark: LARGE one-shot gather/scatter rates (executor shapes).

The decompress executor fundamentally needs ~N data-dependent byte reads
(N = output bytes). This measures the achievable rate for big flat gathers
at executor scale, amortizing the ~25 ms dispatch floor by repeating the op
K times inside one jit (chained so XLA can't dedup).

Run on the real chip: python -u tools/gather_large.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32


def timed(name, fn, *args, n_elems=0, reps=3):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    rate = n_elems / dt / 1e6 if n_elems else 0
    print(f"{name:46s} {dt * 1e3:9.2f} ms   {rate:8.0f} M elem/s")
    return dt


def main():
    rng = np.random.default_rng(0)
    N = 1 << 24  # 16M
    K = 4        # chained repeats inside one jit

    vals8 = jnp.asarray(rng.integers(0, 256, N, np.uint8))
    vals32 = jnp.asarray(rng.integers(0, 1 << 30, N // 4, np.int32))
    idx = jnp.asarray(rng.integers(0, N - 1, N, np.int32))
    idx4 = jnp.asarray(rng.integers(0, N // 4 - 2, N // 4, np.int32))

    def take_u8(idx):
        v = vals8
        for _ in range(K):
            v = jnp.take(v, idx)
            idx = idx ^ (v.astype(I32) & 1)
        return v

    timed(f"flat take u8   {N>>20}M elems x{K}", take_u8, idx, n_elems=K * N)

    def take_u32(idx):
        v = vals32
        for _ in range(K):
            v = jnp.take(v, idx)
            idx = (idx ^ (v & 1)) & (N // 4 - 2)
        return v

    timed(f"flat take i32  {N>>22}M elems x{K}", take_u32, idx4, n_elems=K * N // 4)

    # 2D batched take_along_axis at executor shape (B=128, 128K)
    B, W = 128, 1 << 17
    v2 = jnp.asarray(rng.integers(0, 256, (B, W), np.uint8))
    i2 = jnp.asarray(rng.integers(0, W - 1, (B, W), np.int32))

    def taa(i2):
        v = v2
        for _ in range(K):
            v = jnp.take_along_axis(v, i2, axis=1)
            i2 = i2 ^ (v.astype(I32) & 1)
        return v

    timed(f"take_along_axis u8 (128,128K) x{K}", taa, i2, n_elems=K * B * W)

    # scatter-add at same scale
    def scat(i):
        o = jnp.zeros(N, jnp.int32)
        for _ in range(K):
            o = o.at[i].add(1, mode="drop")
            i = (i + o[:1]) & (N - 1)
        return o

    timed(f"scatter-add i32 {N>>20}M x{K}", scat, idx, n_elems=K * N)

    # pointer-doubling round shape: i32 position chase on 16M
    pos = jnp.asarray(rng.integers(-(1 << 20), N, N, np.int32))

    def chase(src):
        for _ in range(8):
            chased = jnp.take(src, jnp.clip(src, 0, N - 1))
            src = jnp.where(src >= 0, chased, src)
        return src

    timed("chase 8 rounds i32 16M (executor core)", chase, pos, n_elems=8 * N)

    # one-hot matmul gather: 16M gathers from 256-entry tables (128 blocks)
    Bq, Nq = 128, N // 128
    st = jnp.asarray(rng.integers(0, 256, (Bq, Nq), np.int32))
    tabs = jnp.asarray(rng.integers(0, 1 << 20, (Bq, 256), np.int32))

    def onehot(st):
        oh = (st[:, :, None] == jnp.arange(256, dtype=I32)[None, None, :])
        return jnp.einsum(
            "bns,bs->bn", oh.astype(jnp.bfloat16), tabs.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32).astype(I32)

    timed("one-hot bf16 matmul 16M from (128,256)", onehot, st, n_elems=N)

    def onehot_f32(st):
        oh = (st[:, :, None] == jnp.arange(256, dtype=I32)[None, None, :])
        return jnp.einsum(
            "bns,bs->bn", oh.astype(jnp.float32), tabs.astype(jnp.float32),
            preferred_element_type=jnp.float32).astype(I32)

    timed("one-hot f32 matmul 16M from (128,256)", onehot_f32, st, n_elems=N)


if __name__ == "__main__":
    main()
