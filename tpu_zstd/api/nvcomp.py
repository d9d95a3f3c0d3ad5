"""nvCOMP-v5-compatible batch interface (chunked container + metadata).

Counterpart of the reference's nvCOMP compatibility layer
(reference include/cuda_zstd_nvcomp.h:85-137 `NvcompV5BatchManager`, impl
src/cuda_zstd_nvcomp.cpp:207-648: compress_async/decompress_async over chunk
arrays, temp-size queries, metadata container via a skippable frame with
magic 0x184D2A50 :31). The container layout here mirrors that scheme:

  [skippable frame: magic, size, {version, chunk_count, chunk sizes}]
  [zstd frame chunk 0] [zstd frame chunk 1] ...

Stock libzstd can decode the whole container directly (skippable frames are
skipped by spec), and this class can re-split it into chunks exactly.
The CUDA temp-workspace queries become capacity estimates (XLA owns device
memory), kept for API-shape parity with nvcomp_zstd_*_v5.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ..constants import SKIPPABLE_MAGIC_MIN
from .config import CompressionConfig, Status, estimate_compressed_size
from .manager import _decompress_host, compress_items_tpu

_META_VERSION = 1
_META_MAGIC = SKIPPABLE_MAGIC_MIN | 0x5  # 0x184D2A55, one of the 16 skippable magics


@dataclass
class NvcompMetadata:
    version: int
    chunk_count: int
    uncompressed_sizes: list[int]
    compressed_sizes: list[int]

    @property
    def total_uncompressed(self) -> int:
        return sum(self.uncompressed_sizes)


class NvcompV5BatchManager:
    """Chunk-array batch compression into a single self-describing container."""

    def __init__(self, level: int = 3, config: CompressionConfig | None = None):
        self.config = config or CompressionConfig.from_level(level)

    # -- capacity queries (API parity with nvcomp.cpp:207-251) ----------------
    def get_compress_temp_size(self, chunk_count: int, max_chunk_size: int) -> int:
        return 0  # XLA owns workspace memory

    def get_max_compressed_chunk_size(self, max_chunk_size: int) -> int:
        return estimate_compressed_size(max_chunk_size)

    def get_decompress_temp_size(self, chunk_count: int, max_chunk_size: int) -> int:
        return 0

    # -- compress -------------------------------------------------------------
    def compress(self, chunks: list[bytes]) -> bytes:
        frames = compress_items_tpu([bytes(c) for c in chunks], self.config)
        meta = self._build_metadata_frame(
            [len(c) for c in chunks], [len(f) for f in frames]
        )
        return meta + b"".join(frames)

    def compress_async(self, chunks: list[bytes]):
        """Async-shaped variant: returns a zero-arg resolver (JAX dispatch is
        asynchronous already; the resolver materializes the container)."""
        frames = compress_items_tpu([bytes(c) for c in chunks], self.config)

        def resolve() -> bytes:
            meta = self._build_metadata_frame(
                [len(c) for c in chunks], [len(f) for f in frames]
            )
            return meta + b"".join(frames)

        return resolve

    # -- decompress -----------------------------------------------------------
    def decompress(self, container: bytes) -> list[bytes]:
        meta, pos = self.get_metadata(container)
        out = []
        for usize, csize in zip(meta.uncompressed_sizes, meta.compressed_sizes):
            frame = container[pos : pos + csize]
            out.append(_decompress_host(frame, max_output_size=max(usize, 1)))
            pos += csize
        return out

    def decompress_chunk(self, container: bytes, index: int) -> bytes:
        """Random access to one chunk (the point of the chunked container)."""
        meta, pos = self.get_metadata(container)
        if not (0 <= index < meta.chunk_count):
            raise IndexError(index)
        pos += sum(meta.compressed_sizes[:index])
        frame = container[pos : pos + meta.compressed_sizes[index]]
        return _decompress_host(frame, max_output_size=max(meta.uncompressed_sizes[index], 1))

    # -- metadata -------------------------------------------------------------
    @staticmethod
    def _build_metadata_frame(usizes: list[int], csizes: list[int]) -> bytes:
        payload = struct.pack("<II", _META_VERSION, len(usizes))
        payload += b"".join(struct.pack("<QQ", u, c) for u, c in zip(usizes, csizes))
        return struct.pack("<II", _META_MAGIC, len(payload)) + payload

    @staticmethod
    def get_metadata(container: bytes) -> tuple[NvcompMetadata, int]:
        """Parse the metadata frame; returns (metadata, offset_of_first_chunk)."""
        if len(container) < 8:
            raise ValueError("container too small")
        magic, size = struct.unpack_from("<II", container, 0)
        if magic != _META_MAGIC:
            raise ValueError(f"not an nvcomp-style container (magic 0x{magic:08X})")
        payload = container[8 : 8 + size]
        version, count = struct.unpack_from("<II", payload, 0)
        if version != _META_VERSION:
            raise ValueError(f"unsupported container version {version}")
        usizes, csizes = [], []
        off = 8
        for _ in range(count):
            u, c = struct.unpack_from("<QQ", payload, off)
            usizes.append(u)
            csizes.append(c)
            off += 16
        return NvcompMetadata(version, count, usizes, csizes), 8 + size

    @staticmethod
    def status_to_nvcomp_error(status: Status) -> int:
        """Status mapping kept for parity (reference nvcomp.cpp:75-127)."""
        table = {
            Status.SUCCESS: 0,
            Status.ERROR_INVALID_PARAMETER: 1,
            Status.ERROR_OUT_OF_MEMORY: 2,
            Status.ERROR_CORRUPT_DATA: 3,
            Status.ERROR_BUFFER_TOO_SMALL: 4,
        }
        return table.get(status, 5)
