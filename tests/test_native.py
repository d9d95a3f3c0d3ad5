"""Native C++ runtime tests (csrc/tpu_zstd_native.cpp via ctypes).

Counterpart of the reference's xxhash tests and BlockBufferWriter staging
(reference src/cuda_zstd_xxhash.cu, manager.cu:467-588)."""

import numpy as np
import pytest

from tpu_zstd.format.xxhash import content_checksum, xxh32 as py_xxh32, xxh64 as py_xxh64
from tpu_zstd.utils.native import assemble_frames, get_native, xxh32, xxh64

pytestmark = pytest.mark.skipif(get_native() is None, reason="native lib unavailable")


def test_xxh64_parity(rng):
    for n in (0, 1, 4, 7, 8, 31, 32, 33, 1000, 65537):
        d = rng.integers(0, 256, n, np.uint8).tobytes()
        assert xxh64(d) == py_xxh64(d)
        assert xxh64(d, 99) == py_xxh64(d, 99)
        assert xxh32(d) == py_xxh32(d)


def test_known_vectors():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh32(b"") == 0x02CC5D05


def test_content_checksum_uses_native(rng):
    d = rng.integers(0, 256, 10000, np.uint8).tobytes()
    assert content_checksum(d) == py_xxh64(d, 0) & 0xFFFFFFFF


def test_assemble_frames_matches_python():
    contents = np.zeros((3, 16), np.uint8)
    contents[0, :4] = [1, 2, 3, 4]
    contents[1, :1] = [0xAB]
    contents[2, :5] = [9, 8, 7, 6, 5]
    lens = np.array([4, 1, 5], np.int32)
    types = np.array([0, 1, 2], np.int32)  # Raw, RLE, Compressed
    raw_lens = np.array([4, 100, 5], np.int32)
    firsts = np.array([0, 2], np.int32)
    counts = np.array([2, 1], np.int32)
    headers = [b"HDRA", b"HB"]
    blob = assemble_frames(contents, lens, types, raw_lens, firsts, counts, headers, None)
    expect = bytearray()
    expect += b"HDRA"
    expect += ((4 << 3) | (0 << 1) | 0).to_bytes(3, "little") + bytes([1, 2, 3, 4])
    expect += ((100 << 3) | (1 << 1) | 1).to_bytes(3, "little") + bytes([0xAB])
    expect += b"HB"
    expect += ((5 << 3) | (2 << 1) | 1).to_bytes(3, "little") + bytes([9, 8, 7, 6, 5])
    assert blob == bytes(expect)


def test_batch_path_uses_native_and_matches(corpus):
    """Batch output must be identical with and without the native assembler."""
    import tpu_zstd.api.manager as mgr_mod
    from tpu_zstd.api.config import CompressionConfig

    cfg = CompressionConfig.from_level(3)
    cfg.block_size = 4096
    cfg.hash_log = 13
    items = [corpus["text"], corpus["rle"], corpus["mixed"]]
    fast = mgr_mod.compress_items_tpu(items, cfg)
    orig = mgr_mod._assemble_native
    mgr_mod._assemble_native = lambda *a, **k: None
    try:
        slow = mgr_mod.compress_items_tpu(items, cfg)
    finally:
        mgr_mod._assemble_native = orig
    assert fast == slow


def test_native_engine_roundtrip_and_interop():
    """The C engine (csrc/tpu_zstd_engine.cpp, the reference's C-API-surface
    counterpart) round-trips through stock libzstd in both directions."""
    import zstandard

    from tpu_zstd.utils.native import NativeEngine

    eng = NativeEngine.create(3, checksum=True)
    if eng is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(5)
    cases = [
        b"native engine payload " * 2000,
        rng.integers(0, 256, 50000, dtype=np.uint8).tobytes(),
        b"R" * 9000,
        b"x",
        b"",
    ]
    d = zstandard.ZstdDecompressor()
    for data in cases:
        frame = eng.compress(data)
        assert frame is not None
        assert d.decompress(frame, max_output_size=max(len(data), 1)) == data
        for lvl in (1, 19):
            z = zstandard.ZstdCompressor(level=lvl, write_checksum=True).compress(data)
            assert eng.decompress(z, max(len(data), 1)) == data
    in_b, out_b, calls, last_err = eng.stats()
    assert calls == len(cases) and in_b == sum(len(c) for c in cases)
    # corrupt input comes back None, not a crash
    bad = bytearray(eng.compress(cases[0]))
    bad[len(bad) // 2] ^= 0x40
    assert eng.decompress(bytes(bad), len(cases[0])) is None


def test_manager_cpu_path_uses_engine(corpus):
    """Manager's CPU route must not fall back to the pure-Python codec when
    the native engine is available (round-2 review weak #10)."""
    import zstandard

    from tpu_zstd.api.config import CompressionConfig
    from tpu_zstd.api.manager import Manager
    from tpu_zstd.utils.native import NativeEngine

    if NativeEngine.create(3) is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    cfg = CompressionConfig.from_level(3)
    m = Manager(config=cfg)
    data = corpus["text"]
    frame = m._compress_cpu(data)
    assert zstandard.ZstdDecompressor().decompress(
        frame, max_output_size=len(data)
    ) == data


def test_decompressed_size_walks_all_frames():
    """Multi-frame inputs report the SUM (reference get_decompressed_size
    walks frames, types.cpp:1058); round-3 review flagged first-frame-only."""
    zstandard = pytest.importorskip("zstandard")
    from tpu_zstd.utils.native import get_native

    lib = get_native()
    if lib is None:
        pytest.skip("native engine unavailable")
    c = zstandard.ZstdCompressor(level=3)
    a = b"hello world " * 100
    b = b"abcdef" * 500
    blob = c.compress(a) + c.compress(b)
    assert lib.tz_engine_decompressed_size(blob, len(blob)) == len(a) + len(b)
    one = c.compress(a)
    assert lib.tz_engine_decompressed_size(one, len(one)) == len(a)
