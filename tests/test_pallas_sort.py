"""Pallas bitonic sort + fused match-finder kernels vs their XLA oracles
(CPU interpret mode; the TPU route is exercised by bench.py on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_zstd.ops.pallas_sort import sort_rows
from tpu_zstd.ops.pallas_match import match_windows


@pytest.mark.parametrize("R,W,P", [(2, 1024, 0), (2, 2048, 1), (1, 8192, 3)])
def test_sort_rows_matches_xla(rng, R, W, P):
    key = jnp.asarray(
        rng.permuted(np.tile(np.arange(W, dtype=np.int32), (R, 1)), axis=1)
    )
    pays = [
        jnp.asarray(rng.integers(0, 1 << 30, (R, W), dtype=np.int32))
        for _ in range(P)
    ]
    got = sort_rows(key, *pays)
    want = jax.lax.sort((key,) + tuple(pays), num_keys=1)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _xla_best(key, words, depth, sentinel, plog):
    """Reference: sort by key, depth-d neighbor compares, restore by pos."""
    from tpu_zstd.ops.lz77_jax import _word_inc

    sorted_ops = jax.lax.sort(tuple([key] + words), num_keys=1, is_stable=False)
    sk = (sorted_ops[0] >> plog).astype(jnp.int32)
    sp = (sorted_ops[0] & ((1 << plog) - 1)).astype(jnp.int32)
    sw = sorted_ops[1:]

    def _prev(x, d, fill):
        return jnp.roll(x, d, axis=-1).at[:, :d].set(fill)

    best_ml = jnp.zeros_like(sk)
    best_off = jnp.zeros_like(sk)
    for d in range(1, depth + 1):
        same = (_prev(sk, d, -1) == sk) & (sk < sentinel)
        pp = _prev(sp, d, 0)
        ml = jnp.zeros_like(sk)
        alive = same
        for k in range(len(sw)):
            x = sw[k].astype(jnp.uint32) ^ _prev(sw[k], d, 0).astype(jnp.uint32)
            inc = _word_inc(x)
            ml = ml + jnp.where(alive, inc, 0)
            alive = alive & (x == 0)
        better = ml > best_ml
        best_ml = jnp.where(better, ml, best_ml)
        best_off = jnp.where(better, sp - pp, best_off)
    packed = (best_ml << plog) | best_off
    _, opk = jax.lax.sort((sp, packed), num_keys=1, is_stable=False)
    return opk >> plog, opk & ((1 << plog) - 1)


@pytest.mark.parametrize("depth,nwords", [(2, 2), (8, 8)])
def test_match_windows_matches_xla(rng, depth, nwords):
    R, W, hash_log = 2, 1024, 12
    plog = 10
    sentinel = 1 << hash_log
    # Low-entropy byte source so hashes collide like real text.
    data = rng.integers(0, 7, (R, W + 64), dtype=np.uint8)
    b = data.astype(np.uint32)
    w = b[:, :-3] | (b[:, 1:-2] << 8) | (b[:, 2:-1] << 16) | (b[:, 3:] << 24)
    h = ((w * 2654435761) >> (32 - hash_log)).astype(np.int32)
    words = [jnp.asarray(w[:, 4 * k : 4 * k + W].astype(np.int32)) for k in range(nwords)]
    lpos = np.tile(np.arange(W, dtype=np.int32), (R, 1))
    live = lpos < W - 3
    hw = np.where(live, h[:, :W], sentinel)
    key = jnp.asarray((hw << plog) | lpos)

    got_ml, got_off = match_windows(key, words, depth, sentinel)
    want_ml, want_off = _xla_best(key, words, depth, sentinel, plog)
    np.testing.assert_array_equal(np.asarray(got_ml), np.asarray(want_ml))
    np.testing.assert_array_equal(np.asarray(got_off), np.asarray(want_off))
