"""On-chip timing of DecompressPlan.execute() sub-stages (device-resident)."""

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
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128

data = make_corpus(B * N)
cfg = replace(CompressionConfig.from_level(3), decode_accel=True)
frames = compress_items_tpu([data[i * N : (i + 1) * N] for i in range(B)], cfg)
plan = D.prepare_decompress_batch(frames, max_block=N)
print(f"groups: {len(plan._runners)}  sizes: {[c for _, c in plan._runners]}")


def timed(name, fn, reps=3, K=4):
    """Pipelined timing: K dispatches in flight, one device_get sync of a
    tiny slice at the end (block_until_ready does not sync on this axon
    platform — see tools/base_micro.py). Reported per-dispatch."""
    out = fn()
    jax.device_get(np.asarray(jax.tree.leaves(out)[0][:1]).ravel()[:4])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(K)]
        for o in outs:
            jax.device_get(np.asarray(jax.tree.leaves(o)[0][:1]).ravel()[:4])
        ts.append((time.perf_counter() - t0) / K)
    print(f"{name:28s} {min(ts) * 1000:8.1f} ms")
    return out


def full():
    out, lens = plan.execute()
    return lens


timed("execute (full)", full)

# Probe the first (largest) group's internals by re-running its closure's
# cell contents: time seq decode and lit decode separately via a fresh plan
# built with instrumented runners is overkill — instead, time the public
# decode fns on the staged arrays by monkey-grabbing them from the closure.
import inspect

for run, cnt in plan._runners:
    cells = {}
    for n, c in zip(run.__code__.co_freevars, run.__closure__):
        try:
            cells[n] = c.cell_contents
        except ValueError:
            pass
    ds = cells.get("_decode_seqs")
    dl = cells.get("_decode_lits")
    if ds is not None:
        timed(f"  seq decode (n={cnt})", lambda: ds()[0])
    if dl is not None:
        timed(f"  lit decode (n={cnt})", lambda: dl())
    timed(f"  run() full (n={cnt})", lambda: run()[1])

# Pipelined steady state (the bench's own protocol): K executes in flight,
# one sync at the end — amortizes the ~25 ms host round-trip.
K = 4
plan.execute()
t0 = time.perf_counter()
pend = [plan.execute() for _ in range(K)]
for _, lens in pend:
    jax.device_get(lens[:1])
dt = (time.perf_counter() - t0) / K
print(f"pipelined execute x{K}: {dt * 1e3:8.1f} ms/exec  "
      f"{B * N / dt / 1e9:6.3f} GB/s")
