"""Multi-host (pod-slice) batch compression over ICI + DCN.

The reference is single-GPU (multi-GPU listed as Future Work,
reference README.md:1648); SURVEY §2.6 specifies the new distributed layer:
shard independent frames data-parallel across all chips of all hosts,
broadcast dictionaries once, and gather variable-length compressed outputs in
frame order (size-prefix + prefix-sum offsets — the same scheme the reference
applies per-block on one GPU at manager.cu:2688-2745).

Design:
- `initialize()` wraps jax.distributed.initialize (no-op single-process).
- Each process feeds its local shard of the item list; blocks are padded into
  the global (B, N) batch with a NamedSharding over a 1-D 'batch' mesh that
  spans every chip in the slice — ICI carries the intra-host axis, DCN the
  inter-host axis, and the compression itself needs ZERO collectives.
- Ordered gather: per-block content lengths travel first (tiny), then the
  payload all-gather ships contents TRIMMED to the smallest bucket covering
  the longest compressed block (sharding.compress_blocks_sharded) — DCN
  volume stays within ~1.5x of the total compressed bytes instead of the
  padded batch size.
"""

from __future__ import annotations

import numpy as np

from ..ops.pipeline import DEFAULT_CONFIG, PipelineConfig
from .sharding import compress_blocks_sharded, make_mesh


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize multi-host JAX (no-op when single-process)."""
    import jax

    if jax.process_count() > 1 or coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def compress_batch_distributed(
    items: list[bytes],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    checksum: bool = False,
) -> list[bytes]:
    """Compress items across every chip of the current slice; returns frames
    in item order on every process.

    All processes must pass the SAME item list (the standard jax SPMD data
    contract); the mesh shards the block batch so each chip compresses
    B/num_devices blocks. Works unchanged single-host (mesh over local chips).
    """
    import jax

    from ..api.config import CompressionConfig
    from ..api.manager import compress_items_tpu

    # Single-process path delegates to the local batch (same math, no DCN).
    if jax.process_count() == 1 and len(jax.devices()) == 1:
        ccfg = CompressionConfig.from_level(3)
        ccfg.block_size = cfg.block_size
        return compress_items_tpu(items, ccfg)

    from ..format.frame import write_frame_header
    from ..format.xxhash import content_checksum
    from ..constants import BLOCK_RLE

    N = cfg.block_size
    spans = []
    rows = []
    lens = []
    for data in items:
        n = len(data)
        nb = max(1, -(-n // N))
        spans.append((len(rows), nb))
        arr = np.frombuffer(data, np.uint8)
        for b in range(nb):
            chunk = arr[b * N : min((b + 1) * N, n)]
            buf = np.zeros(N, np.uint8)
            buf[: len(chunk)] = chunk
            rows.append(buf)
            lens.append(len(chunk))
    blocks = np.stack(rows) if rows else np.zeros((1, N), np.uint8)
    lengths = np.asarray(lens if lens else [0], np.int32)

    mesh = make_mesh()
    contents, clens, btypes = compress_blocks_sharded(blocks, lengths, cfg, mesh)

    outs = []
    for (first, nb), data in zip(spans, items):
        parts = [write_frame_header(len(data), checksum=checksum)]
        for k in range(nb):
            b = first + k
            last = 1 if k == nb - 1 else 0
            btype, clen = int(btypes[b]), int(clens[b])
            if btype == BLOCK_RLE:
                parts.append(((int(lengths[b]) << 3) | (BLOCK_RLE << 1) | last).to_bytes(3, "little"))
                parts.append(contents[b, :1].tobytes())
            else:
                parts.append(((clen << 3) | (btype << 1) | last).to_bytes(3, "little"))
                parts.append(contents[b, :clen].tobytes())
        if checksum:
            parts.append(content_checksum(data).to_bytes(4, "little"))
        outs.append(b"".join(parts))
    return outs
