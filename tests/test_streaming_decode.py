"""Streaming decompression (StreamingDecompressor / StreamingManager
.decompress_chunk) — mirrors the reference's test_streaming.cu scenarios:
multi-chunk frames, history mode, reset/reuse, arbitrary chunk boundaries,
back-to-back frames, checksum and error paths."""

import numpy as np
import pytest
import zstandard

from tpu_zstd import StreamingDecompressor, StreamingManager
from tpu_zstd.api.config import ChecksumPolicy, CompressionConfig
from tpu_zstd.format.xxhash import XXH64State, xxh64


@pytest.fixture(scope="module")
def payload():
    rng = np.random.default_rng(0x57E4)
    parts = [
        b"streaming payload with repeats " * 400,
        rng.integers(0, 256, 20000, dtype=np.uint8).tobytes(),
        b"A" * 5000,
        bytes(rng.integers(0, 64, 30000, dtype=np.uint8)),
    ]
    return b"".join(parts)


def test_xxh64_streaming_matches_oneshot(payload):
    st = XXH64State()
    for i in range(0, len(payload), 977):  # odd-sized updates cross stripes
        st.update(payload[i : i + 977])
    assert st.digest() == xxh64(payload)
    st2 = XXH64State(seed=123)
    st2.update(payload[:31])  # below one stripe
    assert st2.digest() == xxh64(payload[:31], seed=123)


def test_streaming_decode_libzstd_frames(payload):
    frame = zstandard.ZstdCompressor(level=9).compress(payload)
    for step in (1 + len(frame) // 7, 4096, len(frame)):
        dec = StreamingDecompressor()
        out = bytearray()
        for i in range(0, len(frame), step):
            out += dec.decompress_chunk(frame[i : i + step])
        assert dec.flush() == b""
        assert bytes(out) == payload
        assert dec.frames_completed == 1


def test_streaming_decode_own_streaming_frames(payload):
    cfg = CompressionConfig.from_level(3)
    cfg.block_size = 8192
    cfg.hash_log = 14
    cfg.checksum = ChecksumPolicy.COMPUTE
    sm = StreamingManager(config=cfg)
    comp = bytearray()
    for i in range(0, len(payload), 10000):
        comp += sm.compress_chunk(payload[i : i + 10000])
    comp += sm.flush()

    # decode through the SAME manager's decompress half
    sm2 = StreamingManager(config=cfg)
    out = bytearray()
    for i in range(0, len(comp), 3001):
        out += sm2.decompress_chunk(bytes(comp[i : i + 3001]))
    assert sm2.decompress_flush() == b""
    assert bytes(out) == payload


def test_streaming_decode_window_history(payload):
    """Frames produced with cross-chunk window history decode correctly
    (matches reach into previous chunks)."""
    cfg = CompressionConfig.from_level(3)
    cfg.block_size = 4096
    cfg.hash_log = 13
    sm = StreamingManager(config=cfg, window_history=True)
    data = payload[:30000] + payload[:30000]  # long-range repeat
    comp = sm.compress_chunk(data[:30000]) + sm.compress_chunk(data[30000:]) + sm.flush()
    dec = StreamingDecompressor()
    out = dec.decompress_chunk(comp)
    assert dec.flush() == b""
    assert out == data


def test_streaming_decode_back_to_back_frames(payload):
    f1 = zstandard.ZstdCompressor(level=3).compress(payload[:10000])
    f2 = zstandard.ZstdCompressor(level=19).compress(payload[10000:40000])
    skip = (0x184D2A50).to_bytes(4, "little") + (4).to_bytes(4, "little") + b"meta"
    stream = f1 + skip + f2
    dec = StreamingDecompressor()
    out = bytearray()
    for i in range(0, len(stream), 500):
        out += dec.decompress_chunk(stream[i : i + 500])
    assert bytes(out) == payload[:40000]
    assert dec.frames_completed == 2
    assert dec.at_frame_boundary


def test_streaming_decode_reset_reuse(payload):
    frame = zstandard.ZstdCompressor(level=3).compress(payload[:5000])
    dec = StreamingDecompressor()
    dec.decompress_chunk(frame[: len(frame) // 2])
    assert not dec.at_frame_boundary
    with pytest.raises(ValueError):
        dec.flush()
    dec.reset()
    out = dec.decompress_chunk(frame)
    assert out == payload[:5000]
    assert dec.flush() == b""


def test_streaming_decode_checksum_mismatch(payload):
    frame = bytearray(zstandard.ZstdCompressor(level=3).compress(payload[:5000]))
    # zstandard writes a checksum only with write_checksum; force our own frame
    cfg = CompressionConfig.from_level(1)
    cfg.block_size = 4096
    cfg.checksum = ChecksumPolicy.COMPUTE
    sm = StreamingManager(config=cfg)
    frame = bytearray(sm.compress_chunk(payload[:5000]) + sm.flush())
    frame[-1] ^= 0xFF  # corrupt stored checksum
    dec = StreamingDecompressor()
    with pytest.raises(ValueError, match="checksum"):
        dec.decompress_chunk(bytes(frame))


def test_streaming_decode_bad_magic():
    dec = StreamingDecompressor()
    with pytest.raises(ValueError, match="magic"):
        dec.decompress_chunk(b"\x00\x01\x02\x03\x04\x05\x06\x07")


def test_streaming_history_honors_window_log():
    """With config.window_log=19 the streaming compressor keeps 512 KB of
    history (round-4 review weak #8: it used to trim at 64 KB regardless of
    the header's promise), so a repeat ~330 KB back compresses as matches
    and round-trips."""
    rng = np.random.default_rng(11)
    cfg = CompressionConfig.from_level(1)
    cfg.block_size = 16384
    cfg.hash_log = 14
    cfg.window_log = 19

    marker = bytes(rng.integers(0, 256, 24576, dtype=np.uint8))
    # Patterned filler occupies only ~16 hash buckets, so the marker's hash
    # chains stay shallow and the second copy finds the first at level-1
    # search depth — the test isolates window REACH, not chain depth.
    filler = b"-filler-pattern." * (304 * 64)

    sm = StreamingManager(config=cfg, window_history=True)
    comp = bytearray(sm.compress_chunk(marker))
    for i in range(0, len(filler), 76 * 1024):
        comp += sm.compress_chunk(filler[i : i + 76 * 1024])
    c_repeat = sm.compress_chunk(marker)  # ~330 KB after the original
    comp += c_repeat
    comp += sm.flush()

    # The repeated random marker is incompressible locally; only a cross-chunk
    # match at ~330 KB distance can shrink it.
    assert len(c_repeat) < len(marker) // 2, len(c_repeat)

    dec = StreamingDecompressor()
    out = dec.decompress_chunk(bytes(comp))
    assert dec.flush() == b""
    assert out == marker + filler + marker
