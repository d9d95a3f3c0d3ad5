"""Ablate _decode_seqs_core cost components at bench group shape.

Times the full scan and variants with pieces stubbed out, at the n=58-group
shape from the bench (B=64, NC=128, stride=64). Sync via device_get.
Run: python -u tools/seqdec_ablate.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import tpu_zstd.ops.decode_jax as DJ

I32 = jnp.int32


def timed(name, f, *args, reps=3):
    r = f(*args)
    jax.device_get(jax.tree.leaves(r)[0][:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        jax.device_get(jax.tree.leaves(r)[0][:1])
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts) * 1e3:9.2f} ms")
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    B, NC, stride = 64, 128, 64
    SW = 11264
    R = B * NC
    words = jnp.asarray(rng.integers(0, 1 << 31, (B, SW), np.uint32).astype(np.uint32))
    total_bits = jnp.asarray(np.full(B, SW * 32 - 7, np.int32))
    nseq = jnp.asarray(np.full(B, NC * stride - 13, np.int32))
    tables = DJ.SeqTables(
        jnp.asarray(rng.integers(0, 52, (B, 3, 512), np.int32)),
        jnp.asarray(rng.integers(0, 9, (B, 3, 512), np.int32)),
        jnp.asarray(rng.integers(0, 500, (B, 3, 512), np.int32)),
        jnp.asarray(np.full((B, 3), 9, np.int32)),
    )
    ck_bits = jnp.asarray(
        np.sort(rng.integers(64, SW * 32 - 64, (B, NC - 1), np.int64))[:, ::-1].astype(np.int32)
    )
    ck_states = jnp.asarray(rng.integers(0, 1 << 29, (B, NC - 1), np.int32))
    rep0 = jnp.ones((R, 3), I32)

    core = jax.jit(
        lambda w, tb, t, ns, r0, cb, cs: DJ._decode_seqs_core(
            w, tb, t, ns, r0, cb, cs, stride, NC
        )
    )
    timed("full core (B=64,NC=128,stride=64)", core, words, total_bits, tables,
          nseq, rep0, ck_bits, ck_states)

    # variant: no tab3 (constant packed entries)
    orig_onehot = DJ._onehot_lookup
    DJ._onehot_lookup = lambda st, tf: (st & 0) + (5 | (4 << 6) | (100 << 10))
    core2 = jax.jit(
        lambda w, tb, t, ns, r0, cb, cs: DJ._decode_seqs_core(
            w, tb, t, ns, r0, cb, cs, stride, NC
        )
    )
    timed("  no FSE-table lookups", core2, words, total_bits, tables,
          nseq, rep0, ck_bits, ck_states)
    DJ._onehot_lookup = orig_onehot

    # variant: no const (LL/ML) lookups
    orig_c = DJ._onehot_lookup_const
    DJ._onehot_lookup_const = lambda idx, tf: (idx & 0) + 3
    core3 = jax.jit(
        lambda w, tb, t, ns, r0, cb, cs: DJ._decode_seqs_core(
            w, tb, t, ns, r0, cb, cs, stride, NC
        )
    )
    timed("  no LL/ML const lookups", core3, words, total_bits, tables,
          nseq, rep0, ck_bits, ck_states)
    DJ._onehot_lookup_const = orig_c

    # variant: both lookups stubbed
    DJ._onehot_lookup = lambda st, tf: (st & 0) + (5 | (4 << 6) | (100 << 10))
    DJ._onehot_lookup_const = lambda idx, tf: (idx & 0) + 3
    core4 = jax.jit(
        lambda w, tb, t, ns, r0, cb, cs: DJ._decode_seqs_core(
            w, tb, t, ns, r0, cb, cs, stride, NC
        )
    )
    timed("  no lookups at all", core4, words, total_bits, tables,
          nseq, rep0, ck_bits, ck_states)
    DJ._onehot_lookup = orig_onehot
    DJ._onehot_lookup_const = orig_c

    # gather-based tab3 (flat take) for comparison
    def take_lookup(st, tf):
        Bq = tf.shape[0]
        flat = tf.reshape(-1)
        base = (jnp.arange(Bq, dtype=I32) * (3 * 512))[:, None, None]
        k = jnp.arange(3, dtype=I32)[None, :, None] * 512
        return jnp.take(flat, base + k + jnp.clip(st, 0, 511)).astype(I32)

    DJ._onehot_lookup = take_lookup
    core5 = jax.jit(
        lambda w, tb, t, ns, r0, cb, cs: DJ._decode_seqs_core(
            w, tb, t, ns, r0, cb, cs, stride, NC
        )
    )
    timed("  gather-based FSE lookups", core5, words, total_bits, tables,
          nseq, rep0, ck_bits, ck_states)
    DJ._onehot_lookup = orig_onehot


if __name__ == "__main__":
    main()
