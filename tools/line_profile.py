"""Trace the staged pipeline and aggregate device time by SOURCE LINE.

Joins the jax.profiler device trace (op-name -> duration) with the compiled
HLO's per-op metadata (op-name -> source_file:line) so hot Python lines are
ranked directly.  Usage: python -u tools/line_profile.py [parse|encode|all]
"""

from __future__ import annotations

import glob
import gzip
import json
import re
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
stage = sys.argv[1] if len(sys.argv) > 1 else "encode"

data = make_corpus(B * N)
blocks = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(B, N))
lengths = jnp.asarray(np.full(B, N, dtype=np.int32))

_reduce = jax.jit(
    lambda out: jax.tree.reduce(
        lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out)
    )
)

seqs, bmax_dev = _parse_prep_stage(blocks, lengths, cfg)
bmax = int(jax.device_get(bmax_dev).max())
msb = _pick_bucket(bmax, cfg.max_seqs)
out = _encode_stage(blocks, lengths, seqs, cfg, msb)
jax.device_get(_reduce(out))

# op name -> source line, from compiled HLO metadata.
if stage == "encode":
    lowered = jax.jit(lambda *a: _encode_stage(*a, cfg, msb)).lower(
        blocks, lengths, seqs
    )
else:
    lowered = jax.jit(lambda *a: _parse_prep_stage(*a, cfg)).lower(blocks, lengths)
hlo = lowered.compile().as_text()
op_src: dict[str, str] = {}
op_shape: dict[str, str] = {}
pat = re.compile(
    r"%?([\w.-]+) = ([^ ]+) .*?metadata=\{[^}]*?source_file=\"([^\"]+)\"[^}]*?source_line=(\d+)"
)
for m in pat.finditer(hlo):
    op_src[m.group(1)] = f"{m.group(3).split('/')[-1]}:{m.group(4)}"
    op_shape[m.group(1)] = m.group(2)[:40]

with jax.profiler.trace("/tmp/jtrace_l"):
    if stage == "encode":
        out = _encode_stage(blocks, lengths, seqs, cfg, msb)
        jax.device_get(_reduce(out))
    else:
        sp = _parse_prep_stage(blocks, lengths, cfg)
        jax.device_get(_reduce(sp))

paths = sorted(glob.glob("/tmp/jtrace_l/**/*.trace.json.gz", recursive=True))
with gzip.open(paths[-1], "rt") as f:
    tr = json.load(f)
events = tr["traceEvents"]
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")

dur_by_line = defaultdict(float)
cnt_by_line = defaultdict(int)
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    if "TPU" not in pid_names.get(e.get("pid"), ""):
        continue
    name = e.get("name", "")
    if name.startswith("jit"):
        continue
    d = e.get("dur", 0) / 1e3
    src = op_src.get(name)
    if src is None and "." in name:
        src = op_src.get(name, "?" + name.split(".")[0])
    dur_by_line[src or name] += d
    cnt_by_line[src or name] += 1
    total += d

rows = sorted(dur_by_line.items(), key=lambda kv: -kv[1])
print(f"total device ms (excl. jit spans): {total:.2f}")
print(f"{'source line':52s} {'ms':>9s} {'n':>6s}")
for name, d in rows[:40]:
    print(f"{str(name)[:52]:52s} {d:9.2f} {cnt_by_line[name]:6d}")

# Shape breakdown for the hottest source line.
hot = rows[0][0]
dur_by_shape = defaultdict(float)
cnt_by_shape = defaultdict(int)
for e in events:
    if e.get("ph") != "X" or "TPU" not in pid_names.get(e.get("pid"), ""):
        continue
    name = e.get("name", "")
    if op_src.get(name) != hot:
        continue
    sh = op_shape.get(name, "?")
    dur_by_shape[sh] += e.get("dur", 0) / 1e3
    cnt_by_shape[sh] += 1
print(f"\nshapes at {hot}:")
for sh, d in sorted(dur_by_shape.items(), key=lambda kv: -kv[1])[:15]:
    print(f"  {sh:44s} {d:9.2f} {cnt_by_shape[sh]:5d}")
