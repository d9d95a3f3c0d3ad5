"""Error handling and corrupt-input coverage.

Mirrors the reference's tests/test_error_handling.cu (892 LoC: status codes,
corrupt frames, callbacks) and test_c_api_edge_cases.cu: every malformed
input must produce a clean Python exception or an error Status — never an
interpreter crash or silent garbage when checksums are on.
"""

import numpy as np
import pytest
import zstandard as zstd

import tpu_zstd
from tpu_zstd import BatchManager, CompressionConfig, ChecksumPolicy, Manager, Status
from tpu_zstd.api.decompress import decompress_batch_tpu, decompress_batch_to_device
from tpu_zstd.format.frame import decompress as host_decompress

CFG = CompressionConfig.from_level(3)
CFG.block_size = 4096
CFG.hash_log = 13
CFG.checksum = ChecksumPolicy.COMPUTE_AND_VERIFY


def _frame(data: bytes) -> bytes:
    with Manager(config=CFG) as m:
        return m.compress(data)


@pytest.fixture(scope="module")
def good():
    return _frame(b"the payload we will corrupt " * 200)


def test_empty_input_decoders():
    # Concatenated-frames semantics: zero frames -> empty output (host);
    # the frame-oriented batch API rejects it.
    assert host_decompress(b"") == b""
    with pytest.raises(Exception):
        decompress_batch_tpu([b""])


def test_bad_magic(good):
    bad = b"\x00\x00\x00\x00" + good[4:]
    with pytest.raises(ValueError):
        host_decompress(bad)
    with pytest.raises(Exception):
        decompress_batch_tpu([bad])


def test_truncated_everywhere(good):
    for cut in (3, 5, len(good) // 2, len(good) - 1):
        with pytest.raises(Exception):
            host_decompress(good[:cut])


def test_bitflips_detected_with_checksum(good):
    rng = np.random.default_rng(0)
    data = b"the payload we will corrupt " * 200
    hits = 0
    for _ in range(12):
        bad = bytearray(good)
        bad[int(rng.integers(9, len(bad)))] ^= 1 << int(rng.integers(0, 8))
        try:
            out = host_decompress(bytes(bad), verify_checksum=True)
            assert out == data  # flip was in a dont-care bit (e.g. padding)
        except Exception:
            hits += 1
    assert hits >= 8, "checksum should catch most bit flips"


def test_reserved_block_type():
    from tpu_zstd.format.frame import write_frame_header

    frame = write_frame_header(10) + ((10 << 3) | (3 << 1) | 1).to_bytes(3, "little") + b"x" * 10
    with pytest.raises(ValueError, match="reserved"):
        host_decompress(frame)


def test_batch_partial_failure(good):
    bad = bytearray(good)
    bad[0] ^= 0xFF
    with BatchManager(config=CFG) as bm:
        res = bm.decompress_batch([good, bytes(bad), good])
    assert res[0].status == Status.SUCCESS
    assert res[1].status == Status.ERROR_CORRUPT_DATA and res[1].output is None
    assert res[2].status == Status.SUCCESS


def test_content_size_mismatch():
    good = _frame(b"abc" * 100)
    # Patch the frame header's content size field (single byte FCS here is
    # unlikely; instead truncate the last block's payload).
    with pytest.raises(Exception):
        decompress_batch_tpu([good[:-6]])


def test_skippable_frame_passthrough(good):
    data = b"the payload we will corrupt " * 200
    skip = (0x184D2A50).to_bytes(4, "little") + (4).to_bytes(4, "little") + b"meta"
    assert host_decompress(skip + good) == data
    assert decompress_batch_tpu([skip + good])[0] == data


def test_to_device_handles_multiblock():
    """Multi-block frames now decode through the chained-round device plan
    (round-4; they used to raise ValueError)."""
    import jax

    data = b"m" * 9000  # 3 blocks at 4096
    big = _frame(data)
    out, lens = jax.device_get(decompress_batch_to_device([big], max_block=4096))
    assert lens[0] == len(data)
    assert out[0, : len(data)].tobytes() == data


def test_to_device_roundtrip(rng):
    datas = [rng.integers(0, 40, int(n), np.uint8).tobytes() for n in (100, 3000, 4096)]
    frames = [_frame(d) for d in datas]
    out, lens = decompress_batch_to_device(frames, max_block=4096)
    out = np.asarray(out)
    lens = np.asarray(lens)
    for i, d in enumerate(datas):
        assert lens[i] == len(d)
        assert out[i, : len(d)].tobytes() == d


def test_compress_batch_async(rng):
    items = [rng.integers(0, 8, 2000, np.uint8).tobytes() for _ in range(5)]
    with BatchManager(config=CFG) as bm:
        resolve = bm.compress_batch_async(items)
        res = resolve()
    dctx = zstd.ZstdDecompressor()
    for it, d in zip(res, items):
        assert dctx.decompress(it.output, max_output_size=len(d)) == d


def test_batch_oom_degradation(monkeypatch):
    """Accelerator OOM degrades to split-and-retry, then host fallback
    (reference memory-pool degradation ladder, pool.h:26-97)."""
    import zstandard

    from tpu_zstd.api import manager as M
    from tpu_zstd.api.config import CompressionConfig
    from tpu_zstd.api.manager import BatchManager

    items = [b"degradation payload %d " % i * 500 for i in range(4)]

    real = M.compress_items_tpu
    calls = {"n": 0}

    def flaky(its, cfg, history=None):
        calls["n"] += 1
        if len(its) > 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory on device")
        return real(its, cfg, history)

    monkeypatch.setattr(M, "compress_items_tpu", flaky)
    bm = BatchManager(config=CompressionConfig.from_level(1))
    outs = bm.compress_batch(items)
    assert bm.degradations >= 3  # 4 -> 2+2 -> 1x4
    d = zstandard.ZstdDecompressor()
    for it, src in zip(outs, items):
        assert it.output is not None
        assert d.decompress(it.output, max_output_size=len(src)) == src


def test_batch_non_oom_errors_propagate(monkeypatch):
    from tpu_zstd.api import manager as M
    from tpu_zstd.api.config import CompressionConfig
    from tpu_zstd.api.manager import BatchManager

    def broken(its, cfg, history=None):
        raise ValueError("unrelated failure")

    monkeypatch.setattr(M, "compress_items_tpu", broken)
    bm = BatchManager(config=CompressionConfig.from_level(1))
    with pytest.raises(ValueError, match="unrelated"):
        bm.compress_batch([b"x" * 100])
