"""Per-kernel device timing of the decompress-to-device path."""

from __future__ import annotations

import sys
import time
from dataclasses import replace

import jax
import jax.numpy as jnp
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

# Monkey-patch timers around the kernels by staging the inputs like the real
# driver, then timing each jitted stage with device-resident inputs.
from tpu_zstd.ops.decode_jax import (
    SeqTables,
    assemble_literals_4stream,
    decode_huffman_device,
    decode_sequences_device_chunked,
)
from tpu_zstd.format.accel import parse_accel_tail
from tpu_zstd.format.frame import parse_frame_header

# Reuse the driver to build all host-side arrays by instrumenting internals:
# simplest is to re-run its logic via decompress_batch_to_device with hooks —
# instead we re-create the batch arrays by calling internal parse helpers.
plans, metas = [], []
C = CL = None
for f in frames:
    meta, end = parse_accel_tail(f)
    f2 = f[:end]
    rec = meta.blocks[0]
    C, CL = meta.stride, meta.lit_stride
    hdr = parse_frame_header(f2)
    pos = hdr.header_size
    bh = int.from_bytes(f2[pos : pos + 3], "little")
    btype, bsize = (bh >> 1) & 3, bh >> 3
    if btype != 2:
        continue  # Raw/RLE blocks don't exercise the decode kernels
    body = f2[pos + 3 : pos + 3 + bsize]
    plan, _, _ = D._parse_block_plan(body, None, None, device_literals=True)
    if plan.litdev is None:
        continue
    plans.append(plan)
    metas.append(rec)
B = len(plans)

from tpu_zstd.api.manager import _bucket

TS = D.TSIZE_MAX
Bp = _bucket(B, lo=1)
swidth = _bucket(max(max(len(p.stream) for p in plans), 64), lo=64)
streams = np.zeros((Bp, swidth), np.uint8)
tbits = np.zeros(Bp, np.int32)
sym = np.zeros((Bp, 3, TS), np.int32)
nb = np.zeros((Bp, 3, TS), np.int32)
ns = np.zeros((Bp, 3, TS), np.int32)
logs = np.zeros((Bp, 3), np.int32)
nseq = np.zeros(Bp, np.int32)
nlit = np.zeros(Bp, np.int32)
for i, p in enumerate(plans):
    streams[i, : len(p.stream)] = np.frombuffer(p.stream, np.uint8)
    tbits[i] = p.total_bits
    nseq[i] = p.nbseq
    nlit[i] = p.nlit
    sym[i], nb[i], ns[i], logs[i] = p.tables
tables = SeqTables(*map(jnp.asarray, (sym, nb, ns, logs)))

NC = _bucket(max(-(-int(nseq.max()) // C), 1), lo=1)
ckb = np.zeros((Bp, max(NC - 1, 1)), np.int32)
cks = np.zeros((Bp, max(NC - 1, 1)), np.int32)
ckr = np.ones((Bp, max(NC - 1, 1), 3), np.int32)
for i, rec in enumerate(metas):
    bits_a, st_a, rep_a = rec[1], rec[2], rec[3]
    n = min(len(bits_a), NC - 1)
    ckb[i, :n] = bits_a[:n].astype(np.int64)
    cks[i, :n] = st_a[:n].astype(np.int64)
    ckr[i, :n] = rep_a[:n].astype(np.int64)

R0 = Bp * 4
lsw = _bucket(max(max(len(s) for p in plans for s in p.litdev[0]), 64), lo=64)
max_sym = max(max(p.litdev[2]) for p in plans)
NCL = _bucket(max(-(-max_sym // CL), 1), lo=1)
lstreams = np.zeros((R0, lsw), np.uint8)
ltbits = np.zeros(R0, np.int32)
lnsym = np.zeros(R0, np.int32)
dtab = np.zeros((Bp, 2048), np.int32)
tlog = np.zeros(Bp, np.int32)
lck = np.zeros((R0, max(NCL - 1, 1)), np.int32)
regen = np.zeros(Bp, np.int32)
for i, p in enumerate(plans):
    sts, tb, nsy, packed, tl_b, rg = p.litdev
    dtab[i] = packed
    tlog[i] = tl_b
    regen[i] = rg
    lc = metas[i][4]
    for s in range(4):
        r = i * 4 + s
        lstreams[r, : len(sts[s])] = np.frombuffer(sts[s], np.uint8)
        ltbits[r] = tb[s]
        lnsym[r] = nsy[s]
        n = min(lc.shape[1], NCL - 1)
        if n:
            lck[r, :n] = lc[s, :n].astype(np.int64)

print(f"B={Bp} NC={NC} NCL={NCL} swidth={swidth} lsw={lsw} C={C} CL={CL}")
up = {
    "streams": jnp.asarray(streams), "tbits": jnp.asarray(tbits),
    "nseq": jnp.asarray(nseq), "ckb": jnp.asarray(ckb), "cks": jnp.asarray(cks),
    "ckr": jnp.asarray(ckr), "lstreams": jnp.asarray(lstreams),
    "ltbits": jnp.asarray(ltbits), "lnsym": jnp.asarray(lnsym),
    "dtab": jnp.asarray(dtab), "tlog": jnp.asarray(tlog),
    "lck": jnp.asarray(lck), "regen": jnp.asarray(regen),
    "nlit": jnp.asarray(nlit),
}
jax.block_until_ready(list(up.values()))

_r = jax.jit(lambda t: jax.tree.reduce(lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), t)))


def timed(name, fn):
    out = fn()
    jax.device_get(_r(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        jax.device_get(_r(out))
        ts.append(time.perf_counter() - t0)
    print(f"{name:30s} {min(ts) * 1000:8.1f} ms")
    return out


seqdec = timed("seq decode (chunked)", lambda: decode_sequences_device_chunked(
    up["streams"], up["tbits"], tables, up["nseq"], up["ckb"], up["cks"], up["ckr"],
    C, NC, D.MAX_SEQS_DEC))

syms = timed("huffman literal decode", lambda: decode_huffman_device(
    up["lstreams"], up["ltbits"], up["dtab"], up["tlog"], up["lnsym"], CL, NCL, up["lck"]))

lits = timed("assemble literals", lambda: assemble_literals_4stream(syms, up["regen"], N))

exec_fn = D._pick_executor(N)
ll, ml, off, _ = seqdec
timed("execute sequences", lambda: exec_fn(
    lits, up["nlit"], ll, ml, off, up["nseq"], jnp.zeros((Bp, 1), jnp.uint8), N, 1))
