"""Unit tests for FSE and Huffman primitives (counterpart of the reference's
tests/test_fse_*.cu and tests/test_huffman_*.cu suites)."""

import numpy as np
import pytest

from tpu_zstd.constants import (
    LL_DEFAULT_LOG,
    LL_DEFAULT_NORM,
    ML_DEFAULT_LOG,
    ML_DEFAULT_NORM,
    OF_DEFAULT_LOG,
    OF_DEFAULT_NORM,
    ll_code,
    ml_code,
)
from tpu_zstd.format import fse, huffman
from tpu_zstd.format.bitstream import BackwardBitReader, BackwardBitWriter
from tpu_zstd.format.xxhash import xxh32, xxh64


def test_bitstream_roundtrip():
    w = BackwardBitWriter()
    fields = [(0b101, 3), (0xFFFF, 16), (0, 1), (42, 7), (1, 1), (0x12345, 20)]
    for v, n in fields:
        w.add_bits(v, n)
        w.flush()
    data = w.close()
    r = BackwardBitReader(data)
    for v, n in reversed(fields):
        assert r.read(n) == v & ((1 << n) - 1)
    assert r.bits_consumed_ok()


def test_spread_predefined_tables():
    for norm, log in [
        (LL_DEFAULT_NORM, LL_DEFAULT_LOG),
        (ML_DEFAULT_NORM, ML_DEFAULT_LOG),
        (OF_DEFAULT_NORM, OF_DEFAULT_LOG),
    ]:
        spread = fse.spread_symbols(norm, log)
        counts = np.bincount(spread, minlength=len(norm))
        expect = np.where(norm == -1, 1, np.maximum(norm, 0))
        assert (counts == expect).all()


def test_ncount_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(30):
        nsym = int(rng.integers(2, 50))
        counts = rng.integers(0, 1000, nsym).astype(np.int64)
        counts[rng.integers(0, nsym)] += 1000  # ensure a dominant symbol
        total = int(counts.sum())
        log = fse.optimal_table_log(0, total, nsym - 1)
        norm = fse.normalize_counts(counts, log, total)
        hdr = fse.write_ncount(norm, log)
        norm2, log2, _ = fse.read_ncount(hdr, max_symbol=nsym)
        assert log2 == log
        assert list(norm2) == list(norm[: len(norm2)])
        assert (norm[len(norm2):] == 0).all()


def test_fse_state_encode_decode_roundtrip():
    """Single-state FSE stream over a random distribution."""
    rng = np.random.default_rng(3)
    probs = np.array([50, 30, 10, 5, 3, 2], dtype=np.float64)
    symbols = rng.choice(6, size=500, p=probs / probs.sum())
    counts = np.bincount(symbols, minlength=6).astype(np.int64)
    log = 7
    norm = fse.normalize_counts(counts, log, len(symbols))
    ct = fse.build_ctable(norm, log)
    dt = fse.build_dtable(norm, log)
    w = BackwardBitWriter()
    st = fse.EncState(ct)
    st.init(int(symbols[-1]))
    for s in symbols[-2::-1]:
        st.encode(int(s), w)
    st.flush(w)
    data = w.close()
    r = BackwardBitReader(data)
    ds = fse.DecState(dt, r)
    out = []
    for _ in range(len(symbols) - 1):
        out.append(ds.update(r))
    out.append(ds.peek_symbol())
    assert out == list(symbols)
    assert r.bits_consumed_ok()


def test_huffman_weights_roundtrip_direct_and_fse():
    rng = np.random.default_rng(11)
    for trial in range(20):
        nsym = int(rng.integers(3, 40))
        freqs = np.zeros(256, dtype=np.int64)
        freqs[:nsym] = rng.integers(1, 1000, nsym)
        ct = huffman.build_ctable(freqs)
        assert ct is not None
        weights, consumed = huffman.parse_weights(ct.header)
        assert consumed == len(ct.header)
        lengths, table_log = huffman.weights_to_lengths(weights)
        assert (lengths[: len(ct.lengths)] == ct.lengths[: len(lengths)]).all()


def test_huffman_stream_roundtrip():
    rng = np.random.default_rng(5)
    for size in (7, 64, 500, 4000):
        data = rng.choice(
            np.arange(16), size=size, p=np.arange(16, 0, -1) / np.arange(16, 0, -1).sum()
        ).astype(np.uint8).tobytes()
        freqs = np.bincount(np.frombuffer(data, dtype=np.uint8), minlength=256).astype(np.int64)
        ct = huffman.build_ctable(freqs)
        weights, _ = huffman.parse_weights(ct.header)
        dt = huffman.build_dtable(weights)
        enc = huffman.encode_stream(data, ct)
        assert huffman.decode_stream(enc, dt, len(data)) == data
        enc4 = huffman.encode_literals_4stream(data, ct)
        if enc4 is not None:
            assert huffman.decode_literals_4stream(enc4, dt, len(data)) == data


def test_kraft_equality():
    rng = np.random.default_rng(13)
    for _ in range(10):
        freqs = np.zeros(256, dtype=np.int64)
        n = int(rng.integers(2, 256))
        freqs[rng.choice(256, n, replace=False)] = rng.integers(1, 10000, n)
        lengths = huffman.package_merge_lengths(freqs, 11)
        present = lengths[lengths > 0]
        assert np.isclose(np.sum(2.0 ** -present), 1.0)
        assert present.max() <= 11


def test_code_value_tables():
    assert int(ll_code(0)) == 0 and int(ll_code(15)) == 15
    assert int(ll_code(16)) == 16 and int(ll_code(17)) == 16
    assert int(ll_code(64)) == 25 and int(ll_code(65535)) == 34
    assert int(ml_code(3)) == 0 and int(ml_code(34)) == 31
    assert int(ml_code(35)) == 32 and int(ml_code(131)) == 43


def test_xxhash_vectors():
    # Known-answer tests (XXH reference vectors).
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    rng = np.random.default_rng(1)
    blob = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
    # Cross-check long-input path against zstandard's frame checksum by
    # building a frame with checksum and verifying decode (done in frame tests).
    assert isinstance(xxh64(blob), int)


def test_deposit_bits_tree_matches_scatter():
    """Tree-concatenation deposit is bit-exact vs the scatter reference."""
    import jax.numpy as jnp

    from tpu_zstd.ops.bitpack import deposit_bits_at, deposit_bits_tree

    rng = np.random.default_rng(7)
    for M, lmax in [(2, 5), (37, 32), (1023, 22), (4096, 17), (9000, 11)]:
        lens = rng.integers(0, lmax + 1, M).astype(np.int32)
        vals = rng.integers(0, 1 << 32, M, dtype=np.uint64).astype(np.uint32)
        nw = int(lens.sum()) // 32 + 2
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int32)
        ref = deposit_bits_at(jnp.asarray(vals), jnp.asarray(lens), jnp.asarray(offs), nw)
        got, bits = deposit_bits_tree(jnp.asarray(vals), jnp.asarray(lens), nw, lmax)
        assert int(bits) == int(lens.sum())
        assert np.array_equal(np.asarray(ref), np.asarray(got)), (M, lmax)


def test_shift_words_places_streams():
    """shift_words at byte offsets composes streams like sequential writes."""
    import jax.numpy as jnp

    from tpu_zstd.ops.bitpack import shift_words, words_to_bytes

    rng = np.random.default_rng(8)
    a = rng.integers(0, 1 << 32, 8, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, 8, dtype=np.uint64).astype(np.uint32)
    nbytes_a = 13  # a occupies 13 bytes (content beyond must be zero)
    a[4:] = 0
    a[3] &= 0xFF
    out_words = 20
    placed = shift_words(jnp.asarray(a), 0, out_words) + shift_words(
        jnp.asarray(b), nbytes_a * 8, out_words
    )
    got = np.asarray(words_to_bytes(placed))
    exp = np.zeros(out_words * 4, np.uint8)
    ab = np.asarray(words_to_bytes(jnp.asarray(a)))
    bb = np.asarray(words_to_bytes(jnp.asarray(b)))
    exp[:nbytes_a] = ab[:nbytes_a]
    exp[nbytes_a : nbytes_a + 32] = bb
    assert np.array_equal(got, exp)
