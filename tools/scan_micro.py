"""Microbenchmark: scan-step overhead + in-place carry updates + compare rate.

Sizes the tile-frontier executor design: a 1024-step scan whose carry is the
(B, N) output being built via dynamic_update_slice, plus MXU one-hot row
gathers. Run: python -u tools/scan_micro.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32


def timed(name, fn, *args, reps=3):
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
    print(f"{name:52s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)

    # 1. trivial 1024-step scan (pure step overhead)
    x = jnp.zeros((8, 128), jnp.int32)

    def scan_trivial(x):
        def body(c, _):
            return c + 1, None

        c, _ = jax.lax.scan(body, x, None, length=1024)
        return c

    timed("scan 1024 steps, trivial body", scan_trivial, x)

    # 2. scan with (B, N) u8 carry + dynamic_update_slice of (B, 128)/step
    B, N = 128, 1 << 17
    big = jnp.zeros((B, N), jnp.uint8)
    tiles = jnp.asarray(rng.integers(0, 256, (B, 128), np.uint8))

    def scan_dus(big):
        def body(c, t):
            c = jax.lax.dynamic_update_slice(c, tiles + t.astype(jnp.uint8), (0, t * 128))
            return c, None

        c, _ = jax.lax.scan(body, big, jnp.arange(N // 128, dtype=I32))
        return c

    timed(f"scan {N // 128} steps, dus (B,128) into (B,{N}) u8 carry", scan_dus, big)

    # 3. same but also READ a (B, 256) slice each step (frontier read)
    def scan_dus_read(big):
        def body(c, t):
            r = jax.lax.dynamic_slice(c, (0, jnp.maximum(t - 2, 0) * 128), (B, 256))
            c = jax.lax.dynamic_update_slice(
                c, tiles + r[:, :128] + t.astype(jnp.uint8), (0, t * 128)
            )
            return c, None

        c, _ = jax.lax.scan(big.__class__ == type(big) and body, big, jnp.arange(N // 128, dtype=I32))
        return c

    timed("   + dynamic_slice read (B,256)/step", scan_dus_read, big)

    # 4. MXU row-gather per step: (B,128,ROWS) onehot @ (B,ROWS,128)
    ROWS = 1024  # carry rows of 128 bytes
    carry_rows = jnp.asarray(rng.integers(0, 128, (B, ROWS, 128), np.int8))
    ridx = jnp.asarray(rng.integers(0, ROWS, (B, 128), np.int32))

    def mxu_rowgather(ridx):
        oh = (ridx[:, :, None] == jnp.arange(ROWS, dtype=I32)[None, None, :])
        out = jnp.einsum(
            "bpr,brl->bpl", oh.astype(jnp.bfloat16),
            carry_rows.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return out.astype(jnp.int32)

    dt = timed("MXU row-gather (B,128) rows from (B,1024,128) x1", mxu_rowgather, ridx)

    def scan_mxu(ridx):
        def body(c, _):
            oh = (c[:, :, None] == jnp.arange(ROWS, dtype=I32)[None, None, :])
            out = jnp.einsum(
                "bpr,brl->bpl", oh.astype(jnp.bfloat16),
                carry_rows.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            c = (c + out[:, :, 0]) % ROWS
            return c, None

        c, _ = jax.lax.scan(body, ridx, None, length=64)
        return c

    dt = timed("scan 64 steps MXU row-gather/step", scan_mxu, ridx)
    print(f"    -> {64 * B * 128 / dt / 1e6:.1f} M row-gathers/s "
          f"({64 * B * 128 * 128 / dt / 1e9:.0f} M byte/s equiv)")

    # 5. compare-throughput: build (16M, 32) onehot-like compares
    st = jnp.asarray(rng.integers(0, 32, (B, N), np.int32))

    def cmp32(st):
        oh = (st[:, :, None] == jnp.arange(32, dtype=I32)[None, None, :])
        return oh.sum(axis=(1, 2), dtype=jnp.int32)

    dt = timed("compare 16M x 32-wide + reduce", cmp32, st)
    print(f"    -> {B * N * 32 / dt / 1e9:.0f} G cmp/s")


if __name__ == "__main__":
    main()
