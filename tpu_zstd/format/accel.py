"""Decode-acceleration metadata: skippable frames carrying FSE decoder
checkpoints.

A TPU decoder spends its time in a bit-serial FSE chain (RFC 8878 §4.1.1:
each sequence's bit consumption depends on the previous state). Our encoder
already knows every intermediate decoder state, so it can publish
checkpoints — (unread-bit cursor, LL/OF/ML states, full repcode triple)
every `stride` sequences — letting the device decoder start every chunk
independently and run chunk-parallel
(ops/decode_jax.py:decode_sequences_device_chunked).

The checkpoints ride in a SKIPPABLE frame (magic 0x184D2A5?, RFC 8878 §3.2)
APPENDED to the real frame: stock libzstd's one-shot decompress stops at the
first frame end and streaming decoders skip it, so accelerated frames remain
fully interoperable (a PREPENDED skippable frame breaks the common one-shot
API, measured with python-zstandard). The reference uses the same mechanism
for its nvCOMP container metadata (reference src/cuda_zstd_nvcomp.cpp:31).

Payload layout (little-endian), version 3:
  u32 tag 'TZCK' (0x4B435A54)   - distinguishes our metadata from other
  u8  version = 3                 skippable payloads
  u8  flags (reserved, 0)
  u16 stride (sequences per chunk)
  u16 lit_stride (literal symbols per chunk — literals are ~10-40x more
      numerous than sequences, so their chunks are coarser to keep the
      metadata small and the decode rows wide)
  u16 nblocks
  per block:
    u32 nseq
    u16 nchunks (= number of checkpoint records; chunk 0 has no record)
    nchunks x { u32 bits ; u32 states (ll | of<<10 | ml<<20) ;
                u32 rep0 ; u32 rep1 ; u32 rep2 }
    (rep0..2 = the decoder's EXACT repeat-offset triple before the chunk's
    first sequence — RFC 8878 §3.1.1.5 — so chunk decoders are correct for
    arbitrary repcode usage, not just rep0-only streams)
    u16 nck_lit (Huffman-literal checkpoint records per stream; 0 when the
        block's literals are not device-decodable 4-stream Huffman)
    4 x nck_lit x u32 (stream-major unread-bit cursors: the decoder's
        bit cursor before forward literal symbol c*stride of stream s —
        drives the chunk-parallel device Huffman decode,
        ops/decode_jax.py decode_huffman_device)
  u32 total accel-frame size (self-locating trailer: the metadata is parsed
      from the END of the byte string, where the zstd frame's own end offset
      is not known without walking its blocks)

Older versions are no longer parsed (v1's rep0-only contract was invalidated
when the encoder gained full rep1/rep2 emission); old frames simply decode
through the serial path.
"""

from __future__ import annotations

import struct

import numpy as np

SKIPPABLE_MAGIC = 0x184D2A50
ACCEL_TAG = 0x4B435A54  # 'TZCK'
ACCEL_VERSION = 3

_EMPTY_LIT = np.zeros((4, 0), np.uint32)


class AccelMetadata:
    __slots__ = ("stride", "lit_stride", "flags", "blocks")

    def __init__(self, stride: int, lit_stride: int, flags: int, blocks: list):
        self.stride = stride
        self.lit_stride = lit_stride
        self.flags = flags
        # blocks: list of (nseq, bits u32[nck], states u32[nck],
        #                  rep u32[nck,3], lit_ck u32[4, nck_lit])
        self.blocks = blocks


def write_accel_frame(
    stride: int,
    blocks: list,
    flags: int = 0,
    lit_stride: int = 512,
) -> bytes:
    """Serialize checkpoints for one frame's blocks as a skippable frame.

    blocks: per block (nseq, ck_bits, ck_states, ck_rep[, lit_ck]) —
    bits/states shaped (nck,), ck_rep shaped (nck, 3), lit_ck shaped
    (4, nck_lit); all trimmed to the chunk count for that block (may be
    empty for Raw/RLE/no-seq blocks).
    """
    parts = [
        struct.pack(
            "<IBBHHH", ACCEL_TAG, ACCEL_VERSION, flags, stride, lit_stride, len(blocks)
        )
    ]
    for blk in blocks:
        nseq, bits, states, reps = blk[:4]
        lit_ck = blk[4] if len(blk) > 4 else _EMPTY_LIT
        nck = len(bits)
        parts.append(struct.pack("<IH", nseq, nck))
        if nck:
            reps = np.asarray(reps, np.uint32).reshape(nck, 3)
            rec = np.empty(5 * nck, np.uint32)
            rec[0::5] = bits.astype(np.uint32)
            rec[1::5] = states.astype(np.uint32)
            rec[2::5] = reps[:, 0]
            rec[3::5] = reps[:, 1]
            rec[4::5] = reps[:, 2]
            parts.append(rec.tobytes())
        lit_ck = np.asarray(lit_ck, np.uint32).reshape(4, -1)
        parts.append(struct.pack("<H", lit_ck.shape[1]))
        if lit_ck.shape[1]:
            parts.append(np.ascontiguousarray(lit_ck).tobytes())
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
    if len(payload) < 12:
        return None, n
    tag, version, flags, stride, lit_stride, nblocks = struct.unpack_from(
        "<IBBHHH", payload, 0
    )
    if tag != ACCEL_TAG or version != ACCEL_VERSION:
        return None, n
    pos = 12
    blocks = []
    for _ in range(nblocks):
        if pos + 6 > len(payload):
            return None, n
        nseq, nck = struct.unpack_from("<IH", payload, pos)
        pos += 6
        if pos + 20 * nck + 2 > len(payload):
            return None, n
        rec = np.frombuffer(payload, np.uint32, 5 * nck, pos)
        pos += 20 * nck
        reps = np.stack(
            [rec[2::5], rec[3::5], rec[4::5]], axis=1
        ) if nck else np.zeros((0, 3), np.uint32)
        (nck_lit,) = struct.unpack_from("<H", payload, pos)
        pos += 2
        if pos + 16 * nck_lit > len(payload):
            return None, n
        lit_ck = (
            np.frombuffer(payload, np.uint32, 4 * nck_lit, pos).reshape(4, nck_lit).copy()
            if nck_lit
            else _EMPTY_LIT
        )
        pos += 16 * nck_lit
        blocks.append((nseq, rec[0::5].copy(), rec[1::5].copy(), reps, lit_ck))
    return AccelMetadata(stride, lit_stride, flags, blocks), start
