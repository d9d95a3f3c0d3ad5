"""Round-trip and libzstd-interop tests for the host reference codec.

Mirrors the reference's test strategy (tests/test_roundtrip.cu,
tests/test_correctness.cu, external-decoder oracle in
tests/test_pipeline_integration.cu — here the oracle is the `zstandard`
package instead of the zstd CLI)."""

import numpy as np
import pytest
import zstandard as zstd

from tpu_zstd.format.frame import CompressParams, compress, decompress


@pytest.fixture(scope="module")
def dctx():
    return zstd.ZstdDecompressor()


def test_roundtrip_all_cases(corpus, dctx):
    for name, data in corpus.items():
        c = compress(data, CompressParams(checksum=True))
        # Oracle 1: stock libzstd decodes our frames.
        d = dctx.decompress(c, max_output_size=max(len(data), 1))
        assert d == data, f"libzstd decode mismatch for {name}"
        # Oracle 2: our own decoder round-trips bit-exactly.
        assert decompress(c) == data, f"self decode mismatch for {name}"


def test_decode_libzstd_frames(corpus):
    """Our decoder handles frames produced by stock libzstd (all block kinds)."""
    for level in (1, 3, 9, 19):
        for name, data in corpus.items():
            c = zstd.ZstdCompressor(level=level, write_checksum=True).compress(data)
            assert decompress(c) == data, f"decode of libzstd L{level} {name}"


def test_decode_libzstd_no_huffman_small(corpus):
    c = zstd.ZstdCompressor(level=1).compress(b"tiny")
    assert decompress(c) == b"tiny"


def test_compressed_size_bound(corpus):
    for name, data in corpus.items():
        c = compress(data)
        # Raw-block guarantee: header + per-block overhead only.
        nblocks = max(1, (len(data) + 128 * 1024 - 1) // (128 * 1024))
        assert len(c) <= len(data) + 18 + 4 * nblocks, name


def test_determinism(corpus):
    for data in corpus.values():
        assert compress(data) == compress(data)


def test_checksum_detects_corruption():
    data = b"the checksum guards this payload" * 100
    c = bytearray(compress(data, CompressParams(checksum=True)))
    c[len(c) // 2] ^= 0xFF
    with pytest.raises(Exception):
        decompress(bytes(c))


def test_skippable_frame_passthrough():
    data = b"payload after skippable"
    c = compress(data)
    skip = (0x184D2A50).to_bytes(4, "little") + (5).to_bytes(4, "little") + b"abcde"
    assert decompress(skip + c) == data


def test_ratio_sanity(corpus):
    """Compressed size within 2x of libzstd level 1 on compressible data."""
    for name in ("repetitive", "text", "multiblock", "mixed"):
        data = corpus[name]
        ours = len(compress(data))
        theirs = len(zstd.ZstdCompressor(level=1).compress(data))
        assert ours <= 2 * theirs + 64, f"{name}: {ours} vs libzstd L1 {theirs}"
