"""Capture a jax.profiler trace of the staged pipeline and rank device ops.

Usage: python -u tools/trace_profile.py [stage]  (stage: all|parse|encode)
Writes /tmp/jtrace and prints the top device ops by total duration.
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_corpus
from tpu_zstd.ops.pipeline import (
    DEFAULT_CONFIG,
    _encode_stage,
    _parse_prep_stage,
    _pick_bucket,
)

cfg = DEFAULT_CONFIG
N = cfg.block_size
B = 64
stage = sys.argv[1] if len(sys.argv) > 1 else "all"

data = make_corpus(B * N)
blocks = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(B, N))
lengths = jnp.asarray(np.full(B, N, dtype=np.int32))

_reduce = jax.jit(
    lambda out: jax.tree.reduce(
        lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out)
    )
)

# Warm up (compile) outside the trace.
seqs, bmax_dev = _parse_prep_stage(blocks, lengths, cfg)
bmax = int(jax.device_get(bmax_dev).max())
msb = _pick_bucket(bmax, cfg.max_seqs)
out = _encode_stage(blocks, lengths, seqs, cfg, msb)
jax.device_get(_reduce(out))

with jax.profiler.trace("/tmp/jtrace"):
    if stage in ("all", "parse"):
        seqs, bmax_dev = _parse_prep_stage(blocks, lengths, cfg)
        jax.device_get(_reduce(seqs))
    if stage in ("all", "encode"):
        out = _encode_stage(blocks, lengths, seqs, cfg, msb)
        jax.device_get(_reduce(out))

# Parse the trace: find the newest trace.json.gz and rank complete events on
# device tracks by summed duration.
paths = sorted(glob.glob("/tmp/jtrace/**/*.trace.json.gz", recursive=True))
assert paths, "no trace written"
with gzip.open(paths[-1], "rt") as f:
    tr = json.load(f)

events = tr["traceEvents"]
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")

dur_by_op = defaultdict(float)
cnt_by_op = defaultdict(int)
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pid_names.get(e.get("pid"), "")
    if "TPU" not in pname and "tpu" not in pname:
        continue
    # Skip the top-level module event (it spans everything).
    name = e.get("name", "")
    d = e.get("dur", 0) / 1e3  # ms
    dur_by_op[name] += d
    cnt_by_op[name] += 1
    total += d

rows = sorted(dur_by_op.items(), key=lambda kv: -kv[1])
print(f"tracks: {set(pid_names.values())}")
print(f"{'op':64s} {'ms':>9s} {'n':>5s}")
for name, d in rows[:45]:
    print(f"{name[:64]:64s} {d:9.2f} {cnt_by_op[name]:5d}")
