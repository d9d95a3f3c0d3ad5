"""Wall-time breakdown of decompress_batch_to_device on the real chip."""

from __future__ import annotations

import sys
import time
from dataclasses import replace

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_corpus
from tpu_zstd.api.config import CompressionConfig
from tpu_zstd.api import decompress as D
from tpu_zstd.api.manager import compress_items_tpu

N = 128 * 1024
B = int(sys.argv[1]) if len(sys.argv) > 1 else 64

data = make_corpus(B * N)
cfg = replace(CompressionConfig.from_level(3), decode_accel=True)
frames = compress_items_tpu([data[i * N : (i + 1) * N] for i in range(B)], cfg)
csize = sum(len(f) for f in frames)
print(f"frames built: {csize / 1e6:.2f} MB compressed")


def timed(name, fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {min(ts) * 1000:8.1f} ms")


# stage 1: host parse only (litdev lazy; no literal decode)
from tpu_zstd.format.accel import parse_accel_tail
from tpu_zstd.format.frame import parse_frame_header


def host_parse():
    for f in frames:
        meta, end = parse_accel_tail(f)
        f2 = f[:end]
        hdr = parse_frame_header(f2)
        pos = hdr.header_size
        bh = int.from_bytes(f2[pos : pos + 3], "little")
        btype, bsize = (bh >> 1) & 3, bh >> 3
        body = f2[pos + 3 : pos + 3 + bsize]
        if btype == 2:
            D._parse_block_plan(body, None, None, device_literals=True)


timed("host parse (lazy lits)", host_parse)

# full path, single-shot
def full():
    out, lens = D.decompress_batch_to_device(frames, max_block=N)
    jax.device_get(lens)


timed("full to-device (1-shot)", full)

# steady state, 3 in flight
def steady():
    pending = [D.decompress_batch_to_device(frames, max_block=N) for _ in range(3)]
    for _, lens in pending:
        jax.device_get(lens)


steady()
t0 = time.perf_counter()
steady()
dt = (time.perf_counter() - t0) / 3
print(f"{'steady (3 deep)':28s} {dt * 1000:8.1f} ms/batch")
print(f"total {B * N / 1e6:.0f} MB -> {B * N / dt / 1e9:.4f} GB/s")

# bytes gate
out, lens = D.decompress_batch_to_device(frames, max_block=N)
out_h = np.asarray(out)
for i in range(B):
    assert bytes(out_h[i][:N]) == data[i * N : (i + 1) * N], i
print("verified bit-exact")
