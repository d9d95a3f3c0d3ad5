"""Dictionary training + dictionary compression tests.

Mirrors the reference's tests/test_dictionary*.cu coverage: training from
samples, compression improvement on small records, decode with the same
dictionary (libzstd raw-content oracle), structured envelope round-trip.
"""

import numpy as np
import pytest
import zstandard as zstd

from tpu_zstd.api.config import CompressionConfig
from tpu_zstd.dictionary import (
    CoverParams,
    Dictionary,
    compress_with_dict,
    decompress_with_dict,
    read_dictionary,
    train_dictionary,
    write_structured_dictionary,
)

CFG = CompressionConfig.from_level(3)
CFG.block_size = 4096
CFG.hash_log = 13


@pytest.fixture(scope="module")
def samples(rng=np.random.default_rng(7)):
    base = [
        b'{"user": "%s", "role": "editor", "active": true, "quota_mb": %d}'
        % (bytes(rng.integers(97, 123, 8, dtype=np.uint8)), rng.integers(1, 999))
        for _ in range(200)
    ]
    return base


def test_train_produces_dictionary(samples):
    d = train_dictionary(samples, dict_size=4096)
    assert 256 <= len(d.content) <= 4096
    assert d.dict_id != 0
    # Common substrings should appear in the dictionary.
    assert b'"role": "editor"' in d.content or b'active' in d.content


def test_dict_compression_improves_ratio(samples):
    d = train_dictionary(samples, dict_size=4096)
    records = samples[:16]
    with_dict = compress_with_dict(records, d, CFG)
    from tpu_zstd.api.manager import compress_items_tpu

    without = compress_items_tpu(records, CFG)
    assert sum(map(len, with_dict)) < sum(map(len, without)), (
        "dictionary should shrink small-record output"
    )


def test_dict_frames_decode_with_libzstd(samples):
    d = train_dictionary(samples, dict_size=4096)
    records = samples[:8]
    outs = compress_with_dict(records, d, CFG)
    dctx = zstd.ZstdDecompressor(dict_data=d.as_zstandard())
    for c, orig in zip(outs, records):
        assert dctx.decompress(c, max_output_size=len(orig)) == orig


def test_decompress_with_dict_helper(samples):
    d = train_dictionary(samples, dict_size=2048)
    rec = samples[0]
    c = compress_with_dict([rec], d, CFG)[0]
    assert decompress_with_dict(c, d) == rec
    # host fallback path with window
    from tpu_zstd.format.frame import decompress_frame_with_window

    assert decompress_frame_with_window(c, d.content) == rec


def test_structured_envelope_roundtrip(samples):
    d = train_dictionary(samples, dict_size=1024)
    blob = write_structured_dictionary(d)
    d2 = read_dictionary(blob)
    assert d2.content == d.content and d2.dict_id == d.dict_id
    assert read_dictionary(d.content).dict_id == 0  # raw passthrough


def test_training_edge_cases():
    with pytest.raises(ValueError):
        train_dictionary([])
    d = train_dictionary([b"tiny"], dict_size=512)
    assert len(d.content) >= 1
    d2 = train_dictionary([b"\x00" * 10000], dict_size=512)
    assert len(d2.content) >= 256 or len(d2.content) > 0
