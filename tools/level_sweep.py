"""L1-22 ratio sweep vs libzstd on the mixed corpus; emits LEVELS.md.

Run on the real chip: python tools/level_sweep.py [size_mb]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import zstandard

sys.path.insert(0, "/root/repo")

from bench import make_corpus
from tpu_zstd.api.config import CompressionConfig
from tpu_zstd.api.manager import compress_items_tpu

MB = int(sys.argv[1]) if len(sys.argv) > 1 else 2
data = make_corpus(MB << 20)
n = len(data)

rows = []
d = zstandard.ZstdDecompressor()
for level in range(1, 23):
    cfg = CompressionConfig.from_level(level)
    t0 = time.perf_counter()
    frame = compress_items_tpu([data], cfg)[0]
    dt = time.perf_counter() - t0
    assert d.decompress(frame, max_output_size=n) == data, f"L{level} roundtrip"
    z = zstandard.ZstdCompressor(level=level).compress(data)
    ours, ref = n / len(frame), n / len(z)
    rows.append((level, ours, ref, ours / ref * 100, dt))
    print(f"L{level:2d}  ours {ours:6.3f}  libzstd {ref:6.3f}  parity {ours/ref*100:5.1f}%  {dt*1000:7.0f} ms", flush=True)

with open("/root/repo/LEVELS.md", "w") as f:
    f.write("# Compression-ratio parity by level (mixed Silesia-like corpus, "
            f"{MB} MB)\n\n")
    f.write("Measured on the real chip by `tools/level_sweep.py`; every frame "
            "is validated by stock libzstd before being counted. `parity` = "
            "our ratio / libzstd ratio at the same level.\n\n")
    f.write("| Level | ours | libzstd | parity |\n|---|---|---|---|\n")
    for level, ours, ref, par, _ in rows:
        f.write(f"| {level} | {ours:.3f} | {ref:.3f} | {par:.1f}% |\n")
    f.write("\nStructural notes: single-chip blocks compress independently at "
            "<= 128 KB (the reference GPU does the same); libzstd's full-"
            "window ratio at higher levels additionally exploits cross-block "
            "history, which our windowed mode (enable_ldm) provides at a "
            "throughput cost.\n")
print("wrote LEVELS.md")
