"""Repcode kernel vs the host encode_offsets oracle (unknown-init variant)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_zstd.format.sequences import encode_offset
from tpu_zstd.ops.pallas_rep import rep_codes, rep_codes_scan

I32 = jnp.int32


def _oracle(offs, lls):
    """Host walk with UNKNOWN initial history (value, known) pairs."""
    rep = [(0, False), (0, False), (0, False)]

    def known_eq(e, v):
        return e[1] and e[0] == v

    obs = []
    for off, ll in zip(offs, lls):
        off = int(off)
        if ll > 0:
            if known_eq(rep[0], off):
                ob = 1
            elif known_eq(rep[1], off):
                ob, rep = 2, [rep[1], rep[0], rep[2]]
            elif known_eq(rep[2], off):
                ob, rep = 3, [rep[2], rep[0], rep[1]]
            else:
                ob, rep = off + 3, [(off, True), rep[0], rep[1]]
        else:
            if known_eq(rep[1], off):
                ob, rep = 1, [rep[1], rep[0], rep[2]]
            elif known_eq(rep[2], off):
                ob, rep = 2, [rep[2], rep[0], rep[1]]
            elif rep[0][1] and off == rep[0][0] - 1 and off != 0:
                ob, rep = 3, [(off, True), rep[0], rep[1]]
            else:
                ob, rep = off + 3, [(off, True), rep[0], rep[1]]
        obs.append(ob)
    return np.array(obs)


def _pack(offs, lls, valid):
    return jnp.asarray(
        np.where(valid, offs | ((lls > 0) << 21) | (1 << 22), 0), I32
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_scan_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 256
    # Few distinct offsets -> lots of rep hits; mixed ll==0 rows.
    offs = rng.choice([5, 9, 17, 400, 401], n).astype(np.int64)
    lls = rng.integers(0, 3, n)
    valid = np.ones(n, bool)
    got = np.asarray(rep_codes_scan(_pack(offs, lls, valid)))
    want = _oracle(offs, lls)
    np.testing.assert_array_equal(got, want)
    assert (want <= 3).sum() > 20  # the case actually exercises repcodes


def test_kernel_matches_scan():
    rng = np.random.default_rng(7)
    S, rows = 3, 1024
    offs = rng.choice([4, 8, 100, 101, 7], (S, rows)).astype(np.int64)
    lls = rng.integers(0, 2, (S, rows))
    valid = rng.random((S, rows)) < 0.9
    packed = _pack(offs, lls, valid)
    got = np.asarray(rep_codes(packed))
    for s in range(S):
        want = np.asarray(rep_codes_scan(packed[s]))
        np.testing.assert_array_equal(got[s], want)


def test_updates_agree_with_rfc_resolution():
    """Resolving our emitted ob stream with the RFC decoder recovers offsets."""
    rng = np.random.default_rng(3)
    n = 200
    offs = rng.choice([6, 12, 30, 31], n).astype(np.int64)
    lls = rng.integers(0, 3, n)
    obs = _oracle(offs, lls)
    from tpu_zstd.format.sequences import resolve_offset

    rep = [1, 4, 8]
    for ob, off, ll in zip(obs, offs, lls):
        got, rep = resolve_offset(int(ob), int(ll), rep)
        assert got == off
