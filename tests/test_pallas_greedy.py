"""Pallas greedy-parse kernel vs the lax.scan reference walk."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_zstd.ops.lz77_jax import greedy_parse
from tpu_zstd.ops.pallas_greedy import greedy_segments

I32 = jnp.int32


def _scan_reference(step, matched, defer, seg):
    """The lax.scan path of greedy_parse (backend-independent)."""
    N = step.shape[0]
    nseg = N // seg
    st = step.reshape(nseg, seg).T
    mt = matched.reshape(nseg, seg).T
    df = defer.reshape(nseg, seg).T

    import jax

    def body(carry, xs):
        na, me = carry
        p, (stp, m, d) = xs
        is_pp = na == p
        take = is_pp & m & ~d
        adv = jnp.where(take, stp, 1)
        new_me = jnp.where(take, p + stp, me)
        new_na = jnp.where(is_pp, p + adv, na)
        is_lit = p >= new_me
        return (new_na, new_me), (take, is_lit)

    p_idx = jnp.arange(seg, dtype=I32)
    init = (jnp.zeros(nseg, I32), jnp.zeros(nseg, I32))
    _, (is_seq_t, is_lit_t) = jax.lax.scan(body, init, (p_idx, (st, mt, df)))
    return np.asarray(is_seq_t.T.reshape(-1)), np.asarray(is_lit_t.T.reshape(-1))


@pytest.mark.parametrize("seg,nseg", [(512, 4), (1024, 8)])
def test_kernel_matches_scan(rng, seg, nseg):
    N = seg * nseg
    rng = np.random.default_rng(42)
    step = rng.integers(1, seg + 1, N).astype(np.int32)
    matched = (rng.random(N) < 0.3) & (step >= 4)
    defer = (rng.random(N) < 0.1) & matched
    # truncate at segment boundaries like parse_block does
    pos = np.arange(N)
    room = seg - (pos % seg)
    step = np.minimum(step, room)

    ref_seq, ref_lit = _scan_reference(
        jnp.asarray(step), jnp.asarray(matched), jnp.asarray(defer), seg
    )
    packed = jnp.asarray(step | (matched.astype(np.int32) << 11) | (defer.astype(np.int32) << 12))
    out = np.asarray(greedy_segments(packed.reshape(nseg, seg)).reshape(-1))
    np.testing.assert_array_equal((out & 1) == 1, ref_seq)
    np.testing.assert_array_equal((out & 2) == 2, ref_lit)


def test_vmap_collapse(rng):
    import jax

    seg, nseg, B = 512, 2, 3
    N = seg * nseg
    rng = np.random.default_rng(7)
    step = rng.integers(1, 5, (B, N)).astype(np.int32)
    pos = np.arange(N)
    step = np.minimum(step, seg - (pos % seg))
    matched = (rng.random((B, N)) < 0.5) & (step >= 4)
    packed = jnp.asarray(step | (matched.astype(np.int32) << 11)).reshape(B, nseg, seg)
    batched = jax.vmap(greedy_segments)(packed)
    single = jnp.stack([greedy_segments(packed[b]) for b in range(B)])
    np.testing.assert_array_equal(np.asarray(batched), np.asarray(single))
