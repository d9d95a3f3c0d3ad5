"""Decode-acceleration metadata: skippable frames carrying FSE decoder
checkpoints.

A TPU decoder spends its time in a bit-serial FSE chain (RFC 8878 §4.1.1:
each sequence's bit consumption depends on the previous state). Our encoder
already knows every intermediate decoder state, so it can publish
checkpoints — (unread-bit cursor, LL/OF/ML states) every `stride` sequences —
letting the device decoder start every chunk independently and run
chunk-parallel (ops/decode_jax.py:decode_sequences_device_chunked).

The checkpoints ride in a SKIPPABLE frame (magic 0x184D2A5?, RFC 8878 §3.2)
APPENDED to the real frame: stock libzstd's one-shot decompress stops at the
first frame end and streaming decoders skip it, so accelerated frames remain
fully interoperable (a PREPENDED skippable frame breaks the common one-shot
API, measured with python-zstandard). The reference uses the same mechanism
for its nvCOMP container metadata (reference src/cuda_zstd_nvcomp.cpp:31).

Payload layout (little-endian):
  u32 tag 'TZCK' (0x4B435A54)   - distinguishes our metadata from other
  u8  version = 1                 skippable payloads
  u8  flags (bit 0: rep0-only stream — the only repcode read is rep0 with
      ll > 0, so chunk decoders seed rep = [record.r0, *, *])
  u16 stride (sequences per chunk)
  u16 nblocks
  per block:
    u32 nseq
    u16 nchunks (= number of checkpoint records; chunk 0 has no record)
    nchunks x { u32 bits ; u32 states (ll | of<<10 | ml<<20) ; u32 r0 }
    (r0 = resolved offset of the sequence before the chunk — the only repcode
    slot a rep0-only encoder makes a decoder read)
  u32 total accel-frame size (self-locating trailer: the metadata is parsed
      from the END of the byte string, where the zstd frame's own end offset
      is not known without walking its blocks)
"""

from __future__ import annotations

import struct

import numpy as np

SKIPPABLE_MAGIC = 0x184D2A50
ACCEL_TAG = 0x4B435A54  # 'TZCK'
# The stream's only repcode usage is rep0 with ll > 0 (off == previous
# sequence's offset); chunk decoders may seed rep = [r0, *, *].
FLAG_REP0_ONLY = 1
FLAG_NO_REPCODES = 1  # legacy alias (rep0-only superset covers it)


class AccelMetadata:
    __slots__ = ("stride", "flags", "blocks")

    def __init__(self, stride: int, flags: int, blocks: list):
        self.stride = stride
        self.flags = flags
        # blocks: list of (nseq, bits, states, r0) u32 arrays per chunk
        self.blocks = blocks


def write_accel_frame(
    stride: int,
    blocks: list[tuple[int, np.ndarray, np.ndarray, np.ndarray]],
    flags: int = FLAG_REP0_ONLY,
) -> bytes:
    """Serialize checkpoints for one frame's blocks as a skippable frame.

    blocks: per block (nseq, ck_bits, ck_states, ck_r0) — arrays already
    trimmed to the chunk count for that block (may be empty for Raw/RLE/
    no-seq blocks).
    """
    parts = [struct.pack("<IBBHH", ACCEL_TAG, 1, flags, stride, len(blocks))]
    for nseq, bits, states, r0s in blocks:
        nck = len(bits)
        parts.append(struct.pack("<IH", nseq, nck))
        if nck:
            rec = np.empty(3 * nck, np.uint32)
            rec[0::3] = bits.astype(np.uint32)
            rec[1::3] = states.astype(np.uint32)
            rec[2::3] = r0s.astype(np.uint32)
            parts.append(rec.tobytes())
    body = b"".join(parts)
    total = 8 + len(body) + 4
    return struct.pack("<II", SKIPPABLE_MAGIC, len(body) + 4) + body + struct.pack("<I", total)


def parse_accel_tail(data: bytes) -> tuple[AccelMetadata | None, int]:
    """Parse a TRAILING accel skippable frame.

    Returns (metadata, frame_end) where data[:frame_end] is the original zstd
    frame; (None, len(data)) when no valid metadata trailer is present.
    """
    n = len(data)
    if n < 22:
        return None, n
    (total,) = struct.unpack_from("<I", data, n - 4)
    if total < 22 or total > n:
        return None, n
    start = n - total
    magic, size = struct.unpack_from("<II", data, start)
    if not (0x184D2A50 <= magic <= 0x184D2A5F) or size != total - 8:
        return None, n
    payload = data[start + 8 : n - 4]
    if len(payload) < 10:
        return None, n
    tag, version, flags, stride, nblocks = struct.unpack_from("<IBBHH", payload, 0)
    if tag != ACCEL_TAG or version != 1:
        return None, n
    pos = 10
    blocks = []
    for _ in range(nblocks):
        if pos + 6 > len(payload):
            return None, n
        nseq, nck = struct.unpack_from("<IH", payload, pos)
        pos += 6
        if pos + 12 * nck > len(payload):
            return None, n
        rec = np.frombuffer(payload, np.uint32, 3 * nck, pos)
        pos += 12 * nck
        blocks.append((nseq, rec[0::3].copy(), rec[1::3].copy(), rec[2::3].copy()))
    return AccelMetadata(stride, flags, blocks), start
