"""Tests for device-side custom FSE sequence tables (ops/fse_tables_jax.py).

Oracle chain: device builders vs format/fse.py host implementations (which are
themselves validated against stock libzstd), plus full-frame round-trips
through the zstandard package.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import zstandard

from tpu_zstd.format.fse import write_ncount
from tpu_zstd.ops.bitpack import deposit_bits, words_to_bytes
from tpu_zstd.ops.fse_jax import EncTables, encode_sequences_auto
from tpu_zstd.ops.fse_tables_jax import (
    TL,
    TS,
    build_dense_tables,
    desc_cap,
    histogram_codes,
    ncount_fields,
    normalize_64,
)


def _random_counts(rng: np.random.Generator, nsym: int) -> np.ndarray:
    cnt = np.zeros(nsym, dtype=np.int64)
    npres = int(rng.integers(2, nsym + 1))
    idxs = rng.choice(nsym, npres, replace=False)
    cnt[idxs] = rng.integers(1, 1000, npres)
    if rng.integers(0, 3) == 0:
        cnt[idxs[0]] = int(rng.integers(1, 200000))
    return cnt


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_normalize_ncount_tables_vs_host(seed):
    rng = np.random.default_rng(seed)
    for _ in range(15):
        nsym = int(rng.integers(2, 54))
        cnt = _random_counts(rng, nsym)
        total = int(cnt.sum())
        norm = np.asarray(
            jax.device_get(normalize_64(jnp.asarray(cnt, jnp.int32), jnp.asarray(total)))
        )
        assert norm.sum() == TS
        assert not np.any((cnt > 0) & (norm < 1))
        assert not np.any((cnt == 0) & (norm != 0))

        host_nc = write_ncount(norm.astype(np.int32), TL)
        vals, lens, nbytes = jax.device_get(ncount_fields(jnp.asarray(norm, jnp.int32)))
        words = deposit_bits(jnp.asarray(vals), jnp.asarray(lens), desc_cap(nsym) // 4)[0]
        dev_nc = bytes(np.asarray(jax.device_get(words_to_bytes(words)))[: int(nbytes)])
        assert dev_nc == host_nc

        nxt, nb, init = jax.device_get(build_dense_tables(jnp.asarray(norm, jnp.int32)))
        host = EncTables(norm.astype(np.int32), TL)
        pres = norm > 0
        assert np.array_equal(nxt[pres], host.next2d[pres])
        assert np.array_equal(nb[pres], host.nb2d[pres])
        assert np.array_equal(init[pres], host.init_state[pres])


def test_histogram_codes():
    codes = jnp.asarray([1, 1, 5, 2, 1, 9, 9, 0, 0, 0], jnp.int32)
    h = np.asarray(jax.device_get(histogram_codes(codes, jnp.asarray(7), 12)))
    assert h.tolist() == [0, 3, 1, 0, 0, 1, 0, 0, 0, 2, 0, 0]


def _decode_section(section: bytes, nseq_expect: int):
    from tpu_zstd.format.sequences import decode_sequences_section

    seqs, consumed, _tabs = decode_sequences_section(section, None)
    assert len(seqs) == nseq_expect
    return seqs


@pytest.mark.parametrize("case", ["mixed", "rle_streams", "small", "skewed"])
def test_encode_sequences_auto_section(case):
    rng = np.random.default_rng(hash(case) & 0xFFFF)
    ms = 2048
    if case == "mixed":
        n = 700
        ll = rng.integers(0, 40, n)
        ml = rng.integers(3, 80, n)
        ob = np.where(rng.random(n) < 0.2, 1, rng.integers(1, 60000, n) + 3)
    elif case == "rle_streams":
        n = 300
        ll = np.full(n, 4)
        ml = np.full(n, 8)
        ob = np.full(n, 1000 + 3)
    elif case == "small":
        n = 3
        ll = np.array([1, 0, 7])
        ml = np.array([4, 5, 6])
        ob = np.array([11, 11, 1])
    else:  # skewed
        n = 1500
        ll = np.minimum(rng.geometric(0.5, n) - 1, 30)
        ml = 3 + np.minimum(rng.geometric(0.3, n) - 1, 40)
        ob = rng.integers(1, 200, n) + 3
    ll = ll.astype(np.int64)
    ml = ml.astype(np.int64)
    ob = ob.astype(np.int64)
    # Guard: first sequence must not be a repcode (encoder invariant).
    if ob[0] < 4:
        ob[0] = 7

    pad = lambda x: jnp.asarray(np.pad(x, (0, ms - len(x))), jnp.int32)
    cap = ms * 5 + 1024
    out, slen = jax.jit(
        lambda a, b, c, d: encode_sequences_auto(a, b, c, d, ms, cap)
    )(pad(ll), pad(ml), pad(ob), jnp.asarray(len(ll)))
    section = bytes(np.asarray(jax.device_get(out))[: int(jax.device_get(slen))])
    seqs = _decode_section(section, len(ll))
    assert np.array_equal(seqs.lit_lengths, ll)
    assert np.array_equal(seqs.match_lengths, ml)
    assert np.array_equal(seqs.off_bases, ob)


def test_fse_weights_payload_vs_host_decoder():
    """Device FSE-compressed Huffman weights decode on the host oracle."""
    from tpu_zstd.format.fse import fse_decompress_weights
    from tpu_zstd.ops.huffman_jax import build_lengths, weights_fse_payload

    rng = np.random.default_rng(11)
    f = jax.jit(weights_fse_payload)
    checked = 0
    for trial in range(12):
        span = int(rng.integers(20, 257))
        nlit = int(rng.integers(300, 5000))
        if trial % 3 == 0:
            lits = np.minimum(rng.geometric(0.05, nlit) - 1, span - 1).astype(np.int32)
        else:
            lits = rng.integers(0, span, nlit).astype(np.int32)
        hist = np.bincount(lits, minlength=256).astype(np.int32)
        L, okl = jax.device_get(
            jax.jit(build_lengths)(jnp.asarray(hist), jnp.asarray(nlit))
        )
        if not okl:
            continue
        pay, plen, ok = jax.device_get(f(jnp.asarray(L)))
        if not ok:
            continue
        w = fse_decompress_weights(bytes(np.asarray(pay)[: int(plen)]), max_weights=255)
        tl = int(L[L > 0].max())
        num = int(np.max(np.nonzero(L)[0]))
        expect = np.where(L > 0, tl + 1 - L, 0)[:num]
        assert np.array_equal(np.asarray(w[:num]), expect), trial
        checked += 1
    assert checked >= 5


def test_high_symbol_literals_roundtrip_zstd():
    """Blocks whose literals use symbols >128 now take Huffman via FSE weights."""
    rng = np.random.default_rng(13)
    data = np.clip(128 + (rng.geometric(0.08, 250000) - 1), 0, 255).astype(np.uint8).tobytes()
    from tpu_zstd.ops.pipeline import DEFAULT_CONFIG, compress

    frame = compress(data, DEFAULT_CONFIG, checksum=True)
    out = zstandard.ZstdDecompressor().decompress(frame, max_output_size=len(data) + 16)
    assert out == data
    assert len(frame) < len(data)  # Huffman literals engaged (raw would be ~1:1)


def test_pipeline_custom_fse_roundtrip_zstd():
    from bench import make_corpus
    from tpu_zstd.ops.pipeline import DEFAULT_CONFIG, compress

    data = make_corpus(3 * DEFAULT_CONFIG.block_size)
    frame = compress(data, DEFAULT_CONFIG, checksum=True)
    out = zstandard.ZstdDecompressor().decompress(frame, max_output_size=len(data) + 16)
    assert out == data
    # Custom tables should beat the predefined-only encoding.
    from dataclasses import replace

    frame_pre = compress(data, replace(DEFAULT_CONFIG, custom_fse=False), checksum=True)
    assert len(frame) < len(frame_pre)
