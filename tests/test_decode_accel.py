"""Decode-acceleration metadata (format/accel.py) + chunk-parallel decode.

The encoder publishes FSE decoder checkpoints in a TRAILING skippable frame;
stock libzstd must keep decoding the frames unchanged, and the chunked device
decoder must reproduce the serial decoder's output bit-exactly.
"""

from dataclasses import replace

import numpy as np
import pytest
import zstandard

from tpu_zstd.api.config import CompressionConfig
from tpu_zstd.api.decompress import decompress_batch_to_device
from tpu_zstd.api.manager import compress_items_tpu
from tpu_zstd.format.accel import parse_accel_tail, write_accel_frame

N = 16384


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0xACCE1)
    words = [b"alpha", b"beta", b"gamma", b"delta-delta", b"epsilon"]
    items = []
    for _ in range(3):
        parts = [words[int(x) % 5] for x in rng.integers(0, 5, 2200)]
        items.append(b" ".join(parts)[:N])
    items.append(rng.integers(0, 256, N, dtype=np.uint8).tobytes())  # raw block
    items.append(b"abcd" * (N // 4))  # periodic
    items.append(b"z" * N)  # RLE block
    items.append(b"short payload")
    # rep0-heavy: fixed motif at a constant period with varying literal gaps,
    # so rep0 sequences land on chunk boundaries (regression: chunk decoders
    # must seed r0 from the checkpoint, not the default history).
    rep = bytearray()
    while len(rep) < N:
        rep += bytes(rng.integers(0, 256, 10, dtype=np.uint8)) + b"MOTIF-MOTIF-XY"
    items.append(bytes(rep[:N]))
    return items


@pytest.fixture(scope="module")
def accel_frames(corpus):
    cfg = replace(CompressionConfig.from_level(3), block_size=N, decode_accel=True)
    return compress_items_tpu(corpus, cfg)


def test_metadata_roundtrip():
    bits = np.asarray([100, 200, 300], np.uint32)
    states = np.asarray([7 | (9 << 10) | (11 << 20)] * 3, np.uint32)
    reps = np.asarray([[17, 42, 9000], [1, 4, 8], [5, 17, 42]], np.uint32)
    frame = write_accel_frame(
        64, [(777, bits, states, reps), (0, bits[:0], states[:0], reps[:0])]
    )
    meta, end = parse_accel_tail(b"PREFIX" + frame)
    assert meta is not None and end == 6
    assert meta.stride == 64
    assert len(meta.blocks) == 2
    nseq, b, s, r = meta.blocks[0]
    assert nseq == 777 and np.array_equal(b, bits) and np.array_equal(s, states)
    assert np.array_equal(r, reps)
    assert meta.blocks[1][0] == 0 and len(meta.blocks[1][1]) == 0
    # Not-our-data tails parse as absent, not as errors.
    assert parse_accel_tail(b"")[0] is None
    assert parse_accel_tail(b"\x00" * 40)[0] is None
    assert parse_accel_tail(frame[:-1])[0] is None


def test_libzstd_ignores_trailing_metadata(corpus, accel_frames):
    d = zstandard.ZstdDecompressor()
    for item, frame in zip(corpus, accel_frames):
        meta, end = parse_accel_tail(frame)
        if len(item) > 64:  # tiny items may skip the TPU path's metadata
            assert meta is not None
        assert d.decompress(frame, max_output_size=len(item)) == item


def test_chunked_device_decode_bit_exact(corpus, accel_frames):
    out, lens = decompress_batch_to_device(accel_frames, max_block=N)
    out = np.asarray(out)
    lens = np.asarray(lens)
    for i, item in enumerate(corpus):
        assert lens[i] == len(item)
        assert bytes(out[i][: len(item)]) == item


def test_serial_path_unchanged(corpus):
    cfg = replace(CompressionConfig.from_level(3), block_size=N, decode_accel=False)
    frames = compress_items_tpu(corpus, cfg)
    for f in frames:
        assert parse_accel_tail(f)[0] is None
    out, lens = decompress_batch_to_device(frames, max_block=N)
    out = np.asarray(out)
    for i, item in enumerate(corpus):
        assert bytes(out[i][: len(item)]) == item
