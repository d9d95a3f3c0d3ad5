"""TPU (device-side) decompression tests.

Mirrors the reference's decompression coverage (tests/test_roundtrip.cu,
test_fse_sequence_decode.cu, sequence execution in test_sequence_encoder.cu):
device FSE sequence decode + parallel sequence execution, validated on frames
from BOTH our encoder and stock libzstd (all table modes, huffman literals,
cross-block matches, repcode carry)."""

import jax
import numpy as np
import pytest
import zstandard as zstd

from tpu_zstd.api.decompress import decompress_batch_tpu
from tpu_zstd.ops.pipeline import PipelineConfig, compress

CFG = PipelineConfig(block_size=4096, hash_log=13)


def test_own_frames_batch(corpus):
    names = [n for n in corpus if n != "multiblock"]
    frames = [compress(corpus[n], CFG, checksum=True) for n in names]
    outs = decompress_batch_tpu(frames, max_block=4096, window_cap=4096)
    for n, o in zip(names, outs):
        assert o == corpus[n], n


def test_own_multiblock(corpus):
    data = corpus["multiblock"]
    frames = [compress(data, CFG)]
    outs = decompress_batch_tpu(frames, max_block=4096, window_cap=4096)
    assert outs[0] == data


def test_libzstd_frames_all_levels(rng):
    data = (
        b"cross-block window test: " * 3000
        + rng.integers(0, 256, 30000, dtype=np.uint8).tobytes()
        + b"tail repetition " * 1000
    )
    for level in (1, 3, 9, 19, 22):
        c = zstd.ZstdCompressor(level=level, write_checksum=True).compress(data)
        out = decompress_batch_tpu([c])[0]
        assert out == data, f"level {level}"


def test_libzstd_small_inputs():
    for data in (b"", b"a", b"ab" * 40):
        c = zstd.ZstdCompressor(level=3).compress(data)
        assert decompress_batch_tpu([c])[0] == data


def test_checksum_verification(corpus):
    data = corpus["text"]
    c = bytearray(compress(data, CFG, checksum=True))
    c[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        decompress_batch_tpu([bytes(c)], max_block=4096, window_cap=4096)


def test_mixed_batch_sizes(rng):
    datas = [
        rng.integers(0, 16, int(n), dtype=np.uint8).tobytes()
        for n in rng.integers(1, 12000, 7)
    ]
    frames = [compress(d, CFG) for d in datas]
    outs = decompress_batch_tpu(frames, max_block=4096, window_cap=4096)
    for d, o in zip(datas, outs):
        assert o == d


def test_rep_offset_rich_stream():
    """Stress repcode resolution: alternate two offsets with tiny literals."""
    unit = b"AAAABBBBCCCCDDDD"
    data = (unit + b"x" + unit + unit + b"y" + unit) * 200
    c = zstd.ZstdCompressor(level=5).compress(data)
    assert decompress_batch_tpu([c])[0] == data


def test_prepared_plan_multiblock_frames():
    """Multi-block frames no longer raise in prepare_decompress_batch: block
    rounds chain on device with window/repcode carry (round-3 review
    missing #5; reference decompress_batch_preallocated handles arbitrary
    frames, manager.h:193-273)."""
    import zstandard

    from tpu_zstd.api.decompress import prepare_decompress_batch

    rng = np.random.default_rng(5)
    items = []
    for k in range(3):
        base = (b"multi block frame payload %d " % k) * 6000
        items.append((base + rng.integers(0, 256, 50000, np.uint8).tobytes())[
            : 300_000 + k * 1000])
    items.append(b"small single block " * 100)  # mixed batch
    frames = [zstandard.ZstdCompressor(level=3).compress(it) for it in items]
    plan = prepare_decompress_batch(frames)
    out, lens = jax.device_get(plan.execute())
    for i, it in enumerate(items):
        assert lens[i] == len(it)
        assert out[i, : len(it)].tobytes() == it


def test_prepared_plan_rejects_long_window():
    """A frame whose window exceeds the prepared-plan 4 MiB carry cap must
    raise (round-4 review weak #4: it previously clamped silently and could
    decode to garbage), pointing at decompress_batch_tpu instead."""
    from tpu_zstd.api.decompress import prepare_decompress_batch
    from tpu_zstd.format.frame import write_frame_header

    # Multi-block frame declaring an 8 MiB window (content size unknown).
    frame = bytearray(write_frame_header(None, window_log=23))
    frame += ((5 << 3) | (0 << 1) | 0).to_bytes(3, "little") + b"hello"  # raw
    frame += ((3 << 3) | (0 << 1) | 1).to_bytes(3, "little") + b"end"  # last
    with pytest.raises(ValueError, match="window"):
        prepare_decompress_batch([bytes(frame)])


def test_prepared_plan_checksum_verify():
    """DecompressPlan.execute(verify_checksum=True) checks stored XXH64
    checksums and raises on mismatch (round-4 review weak #4)."""
    from tpu_zstd.api.decompress import prepare_decompress_batch

    data = b"checksum verified payload " * 200
    frame = compress(data, CFG, checksum=True)
    plan = prepare_decompress_batch([frame], max_block=8192)
    out, lens = jax.device_get(plan.execute(verify_checksum=True))
    assert out[0, : len(data)].tobytes() == data

    bad = bytearray(frame)
    bad[-1] ^= 0xFF  # corrupt the stored checksum
    plan2 = prepare_decompress_batch([bytes(bad)], max_block=8192)
    with pytest.raises(ValueError, match="checksum"):
        plan2.execute(verify_checksum=True)


def test_prepared_plan_checksum_verify_multiblock():
    data = (b"multi-block checksum payload " * 700)[: 3 * 4096 + 123]
    frame = compress(data, CFG, checksum=True)
    from tpu_zstd.api.decompress import prepare_decompress_batch

    plan = prepare_decompress_batch([frame], max_block=4096)
    out, lens = jax.device_get(plan.execute(verify_checksum=True))
    assert lens[0] == len(data)

    bad = bytearray(frame)
    bad[-2] ^= 0x55
    plan2 = prepare_decompress_batch([bytes(bad)], max_block=4096)
    with pytest.raises(ValueError, match="checksum"):
        plan2.execute(verify_checksum=True)
