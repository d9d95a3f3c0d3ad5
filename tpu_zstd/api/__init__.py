"""Public API package: managers, hybrid engine, config, status codes.

Mirrors the reference's L0 surface (reference include/cuda_zstd_manager.h,
include/cuda_zstd_hybrid.h, python/cuda_zstd/__init__.py)."""

from .config import (
    ChecksumPolicy,
    CompressionConfig,
    CompressionStats,
    ExecutionPath,
    Status,
    Strategy,
    estimate_compressed_size,
)
from .hybrid import (
    Backend,
    DataLocation,
    HybridConfig,
    HybridEngine,
    HybridResult,
    RoutingMode,
    detect_location,
)
from .decompress import (
    DecompressPlan,
    decompress_batch_to_device,
    prepare_decompress_batch,
)
from .manager import (
    BatchItem,
    BatchManager,
    Manager,
    StreamingDecompressor,
    StreamingManager,
    compress_items_tpu,
)

__all__ = [
    "Backend",
    "BatchItem",
    "DecompressPlan",
    "decompress_batch_to_device",
    "prepare_decompress_batch",
    "BatchManager",
    "ChecksumPolicy",
    "CompressionConfig",
    "CompressionStats",
    "DataLocation",
    "ExecutionPath",
    "HybridConfig",
    "HybridEngine",
    "HybridResult",
    "Manager",
    "RoutingMode",
    "Status",
    "Strategy",
    "StreamingDecompressor",
    "StreamingManager",
    "compress_items_tpu",
    "detect_location",
    "estimate_compressed_size",
]
