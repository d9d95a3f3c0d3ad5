"""Microbenchmark: TPU gather-pattern costs relevant to the decode scans.

Measures, at decode-scan shapes (R rows gathering from a words table):
  - flat jnp.take of R elements
  - flat jnp.take of (R,5) window indices (the current _fetch_window)
  - lax.gather with slice_sizes=(1,5) (contiguous-slice gather)
  - one-hot matmul table lookup (R,512)@(512,) per block
  - a full scan of 64 steps doing each, to include loop effects

Run on the real chip: python -u tools/gather_micro.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32


def timed(name, fn, *args, reps=5):
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
    print(f"{name:44s} {dt * 1e3:9.3f} ms")
    return dt


def main():
    B, NC = 64, 128
    R = B * NC            # 8192 rows
    SW = 11264            # words per block stream (45KB block)
    STEPS = 64
    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 1 << 30, (B, SW), np.int32))
    words_flat = words.reshape(-1)
    idx = jnp.asarray(rng.integers(0, SW - 8, R, np.int32))
    row_of = jnp.repeat(jnp.arange(B, dtype=np.int32), NC)
    base = row_of * SW

    # --- single-shot shapes ---
    timed("take R elems (flat)", lambda i: jnp.take(words_flat, base + i), idx)
    timed(
        "take (R,5) window (flat)",
        lambda i: jnp.take(
            words_flat, (base + i)[:, None] + jnp.arange(5, dtype=I32)[None, :]
        ),
        idx,
    )

    def slice_gather(i):
        # lax.gather of 5 contiguous words per row from (B, SW)
        starts = jnp.stack([row_of, i], axis=1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0, 1)
        )
        return jax.lax.gather(
            words, starts, dn, slice_sizes=(1, 5), mode="clip"
        )

    timed("lax.gather slice (1,5)", slice_gather, idx)

    def slice_gather16(i):
        starts = jnp.stack([row_of, i], axis=1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0, 1)
        )
        return jax.lax.gather(
            words, starts, dn, slice_sizes=(1, 16), mode="clip"
        )

    timed("lax.gather slice (1,16)", slice_gather16, idx)

    # one-hot matmul lookup: (B, NC, 512) onehot @ (B, 512) tables
    tab = jnp.asarray(rng.integers(0, 1 << 20, (B, 512), np.int32))
    st = jnp.asarray(rng.integers(0, 512, (B, NC), np.int32))

    def onehot_lookup(st):
        oh = (st[:, :, None] == jnp.arange(512, dtype=I32)[None, None, :])
        return jnp.einsum(
            "bns,bs->bn", oh.astype(jnp.float32), tab.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(I32)

    timed("one-hot matmul lookup (R from B tables)", onehot_lookup, st)

    def take_lookup(st):
        return jnp.take(
            tab.reshape(-1), (jnp.arange(B, dtype=I32)[:, None] * 512 + st)
        )

    timed("take lookup (R from B tables)", take_lookup, st)

    # --- inside a 64-step scan (decode-loop shape) ---
    def scan_take5(idx):
        def body(c, _):
            i = c
            w = jnp.take(
                words_flat, (base + i)[:, None] + jnp.arange(5, dtype=I32)[None, :]
            )
            c = (i + (w.sum(1) & 3)) % (SW - 8)
            return c, None

        c, _ = jax.lax.scan(body, idx, None, length=STEPS)
        return c

    dt = timed("scan64: take (R,5)/step", scan_take5, idx)
    print(f"    -> {R * 5 * STEPS / dt / 1e6:.0f} M elems/s")

    def scan_slice(idx):
        def body(c, _):
            i = c
            starts = jnp.stack([row_of, i], axis=1)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0, 1)
            )
            w = jax.lax.gather(words, starts, dn, slice_sizes=(1, 5), mode="clip")
            c = (i + (w.sum(1) & 3)) % (SW - 8)
            return c, None

        c, _ = jax.lax.scan(body, idx, None, length=STEPS)
        return c

    dt = timed("scan64: lax.gather (1,5)/step", scan_slice, idx)
    print(f"    -> {R * 5 * STEPS / dt / 1e6:.0f} M elems/s")

    def scan_take1(idx):
        def body(c, _):
            i = c
            w = jnp.take(words_flat, base + i)
            c = (i + (w & 3)) % (SW - 8)
            return c, None

        c, _ = jax.lax.scan(body, idx, None, length=STEPS)
        return c

    dt = timed("scan64: take R elems/step", scan_take1, idx)
    print(f"    -> {R * STEPS / dt / 1e6:.0f} M elems/s")

    def scan_onehot(st):
        def body(c, _):
            oh = (c[:, :, None] == jnp.arange(512, dtype=I32)[None, None, :])
            v = jnp.einsum(
                "bns,bs->bn", oh.astype(jnp.float32), tab.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ).astype(I32)
            return (v & 511), None

        c, _ = jax.lax.scan(body, st, None, length=STEPS)
        return c

    dt = timed("scan64: one-hot lookup/step", scan_onehot, st)
    print(f"    -> {R * STEPS / dt / 1e6:.0f} M lookups/s")

    # vector-op baseline: same scan with NO gather at all
    def scan_novec(idx):
        def body(c, _):
            c = (c * 5 + 1) % (SW - 8)
            return c, None

        c, _ = jax.lax.scan(body, idx, None, length=STEPS)
        return c

    timed("scan64: no gather (loop overhead)", scan_novec, idx)


if __name__ == "__main__":
    main()
