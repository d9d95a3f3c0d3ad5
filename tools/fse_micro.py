"""Micro-profile of the CURRENT custom-FSE encode path sub-stages on the chip.

Splits _parse_prep_stage's prep from encode_prepared's internals
(state chains / bit-field build / deposit / section assembly) at the real
bucket for the bench corpus, and prints the nseq distribution.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_corpus
from tpu_zstd.ops.pipeline import DEFAULT_CONFIG, _parse_one, _pick_bucket
from tpu_zstd.ops.fse_jax import _state_chain3_cf, encode_prepared, prepare_sequences_auto
from tpu_zstd.constants import SEQ_RLE

cfg = DEFAULT_CONFIG
N = cfg.block_size
B = 64
I32 = jnp.int32

data = make_corpus(B * N)
blocks = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(B, N))
lengths = jnp.asarray(np.full(B, N, dtype=np.int32))

_reduce = jax.jit(lambda out: jax.tree.reduce(
    lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out)
))


def timed(name, fn, *args):
    out = fn(*args)
    jax.device_get(_reduce(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(_reduce(out))
        ts.append(time.perf_counter() - t0)
    print(f"{name:32s} {min(ts)*1000:8.1f} ms", flush=True)
    return out


parse = jax.jit(lambda b, l: jax.vmap(lambda bb, ll: _parse_one(bb, ll, cfg))(b, l))
seqs = parse(blocks, lengths)
nseq_h = np.asarray(jax.device_get(seqs.nseq))
print("nseq: min %d  p50 %d  p90 %d  max %d" % (
    nseq_h.min(), np.percentile(nseq_h, 50), np.percentile(nseq_h, 90), nseq_h.max()
), flush=True)
msb = _pick_bucket(int(nseq_h.max()), cfg.max_seqs)
print("bucket msb =", msb, " max_seqs =", cfg.max_seqs, flush=True)

prep_fn = jax.jit(lambda s: jax.vmap(
    lambda a, b, c, n: prepare_sequences_auto(a[:msb], b[:msb], c[:msb], n, msb)
)(s.ll, s.ml, s.ob, s.nseq))
prep = timed("prepare (rev+codes+tables)", prep_fn, seqs)

chains_fn = jax.jit(lambda p, ns: jax.vmap(
    lambda pp, n: _state_chain3_cf(
        pp["st3"], pp["dnb3"], pp["dfs3"], pp["init3"], pp["tl3"],
        pp["mode3"] == SEQ_RLE, pp["rsym3"][:, :msb], n, msb,
    )
)(p, ns))
timed("state chains (cf triple)", chains_fn, prep, seqs.nseq)

enc_fn = jax.jit(lambda p, ns: jax.vmap(
    lambda pp, n: encode_prepared(pp, n, msb, cfg.seq_cap_for(msb))
)(p, ns))
timed("encode_prepared (full)", enc_fn, prep, seqs.nseq)

