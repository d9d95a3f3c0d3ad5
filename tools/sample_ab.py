"""On-chip A/B: sample_log 0 vs 1 (with left-extension) at the L3 shape.

Measures staged-pipeline throughput and ratio on the bench corpus.
"""

from __future__ import annotations

import sys
import time
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import zstandard

sys.path.insert(0, "/root/repo")

from bench import make_corpus
from tpu_zstd.ops.pipeline import DEFAULT_CONFIG, compress_blocks_staged_many, compress_blocks_staged

B = 128
N = DEFAULT_CONFIG.block_size
data = make_corpus(B * N)
blocks = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(B, N))
lengths = jnp.asarray(np.full(B, N, dtype=np.int32))

for slog in (0, 1):
    cfg = replace(DEFAULT_CONFIG, sample_log=slog)
    contents, clens, btypes = jax.device_get(compress_blocks_staged(blocks, lengths, cfg))
    total = sum(int(clens[b]) + 3 for b in range(B)) + 18
    # decode-validate 4 probes via a host frame wrap
    from tpu_zstd.format.frame import write_frame_header
    for b in (0, 37, 64, B - 1):
        bt = int(btypes[b]); cl = int(clens[b])
        hdr = write_frame_header(N)
        body = (cl << 3 | bt << 1 | 1).to_bytes(3, "little") + contents[b, :cl].tobytes()
        out = zstandard.ZstdDecompressor().decompress(hdr + body, max_output_size=N)
        assert out == data[b * N : (b + 1) * N], (slog, b)
    REPS = 5
    outs = compress_blocks_staged_many([(blocks, lengths)] * 2, cfg)
    for o in outs:
        jax.device_get(o[1])
    t0 = time.perf_counter()
    outs = compress_blocks_staged_many([(blocks, lengths)] * REPS, cfg)
    for o in outs:
        jax.device_get(o[1])
    dt = (time.perf_counter() - t0) / REPS
    print(f"sample_log={slog}: {B*N/dt/1e9:.4f} GB/s  ratio={B*N/total:.3f}  ms={dt*1000:.1f}")
