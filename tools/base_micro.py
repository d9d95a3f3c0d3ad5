"""Isolate: per-call base cost vs real op cost. All arrays passed as args."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32


def timed(name, f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:56s} {min(ts) * 1e3:9.3f} ms")
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]

    # tiny op, no big arrays
    f0 = jax.jit(lambda x: x + 1)
    x0 = jax.device_put(jnp.zeros((8, 128), I32), dev)
    timed("tiny add (8,128)", f0, x0)

    # small gather, args device-resident
    words = jax.device_put(jnp.asarray(rng.integers(0, 1 << 30, 720896, np.int32)), dev)
    idx = jax.device_put(jnp.asarray(rng.integers(0, 720000, 8192, np.int32)), dev)
    f1 = jax.jit(lambda w, i: jnp.take(w, i))
    timed("take 8192 from 720K (args)", f1, words, idx)

    f1b = jax.jit(lambda w, i: jnp.take(w, i[:128]))
    timed("take 128 from 720K (args)", f1b, words, idx)

    # medium gather
    idx2 = jax.device_put(jnp.asarray(rng.integers(0, 720000, 1 << 20, np.int32)), dev)
    f2 = jax.jit(lambda w, i: jnp.take(w, i))
    timed("take 1M from 720K (args)", f2, words, idx2)

    # big input array, trivial op (reduce)
    big = jax.device_put(jnp.asarray(rng.integers(0, 256, (1 << 24,), np.uint8)), dev)
    f3 = jax.jit(lambda b: b[::65536].astype(I32).sum())
    timed("strided sum over 16MB (args)", f3, big)

    # 64-step scan with ONLY a gather (no mod), args device-resident
    def scan_take(w, i):
        def body(c, _):
            v = jnp.take(w, c)
            return (c + (v & 3)) & 0xFFFF, None

        c, _ = jax.lax.scan(body, i, None, length=64)
        return c

    f4 = jax.jit(scan_take)
    dt = timed("scan64 take 8192/step (no mod, args)", f4, words, idx)
    print(f"    -> {64 * 8192 / dt / 1e6:.0f} M elem/s")

    def scan_take5(w, i):
        off = jnp.arange(5, dtype=I32)[None, :]

        def body(c, _):
            v = jnp.take(w, c[:, None] + off)
            return (c + (v.sum(1) & 3)) & 0xFFFF, None

        c, _ = jax.lax.scan(body, i, None, length=64)
        return c

    f5 = jax.jit(scan_take5)
    dt = timed("scan64 take (8192,5)/step (no mod, args)", f5, words, idx)
    print(f"    -> {64 * 8192 * 5 / dt / 1e6:.0f} M elem/s")

    # 64-step scan, one-hot einsum lookup (512-wide), args
    tab = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 19, (64, 512), np.int32)), dev
    )
    st = jax.device_put(jnp.asarray(rng.integers(0, 512, (64, 128), np.int32)), dev)

    def scan_oh(tab, st):
        iota = jnp.arange(512, dtype=I32)[None, None, :]
        tf = tab.astype(jnp.float32)

        def body(c, _):
            oh = (c[:, :, None] == iota)
            v = jnp.einsum("bns,bs->bn", oh.astype(jnp.float32), tf,
                           preferred_element_type=jnp.float32).astype(I32)
            return v & 511, None

        c, _ = jax.lax.scan(body, st, None, length=64)
        return c

    f6 = jax.jit(scan_oh)
    dt = timed("scan64 one-hot 512 lookup 8192/step (args)", f6, tab, st)
    print(f"    -> {64 * 8192 / dt / 1e6:.0f} M lookups/s")

    # big flat take 16M (executor single round), args
    idx3 = jax.device_put(jnp.asarray(rng.integers(0, 1 << 24, 1 << 24, np.int32)), dev)
    f7 = jax.jit(lambda b, i: jnp.take(b, i))
    dt = timed("take 16M u8 from 16MB (args)", f7, big, idx3)
    print(f"    -> {(1 << 24) / dt / 1e6:.0f} M elem/s")

    big32 = jax.device_put(jnp.asarray(rng.integers(0, 1 << 30, 1 << 22, np.int32)), dev)
    idx4 = jax.device_put(jnp.asarray(rng.integers(0, 1 << 22, 1 << 22, np.int32)), dev)
    f8 = jax.jit(lambda b, i: jnp.take(b, i))
    dt = timed("take 4M i32 from 16MB (args)", f8, big32, idx4)
    print(f"    -> {(1 << 22) / dt / 1e6:.0f} M elem/s")


if __name__ == "__main__":
    main()
