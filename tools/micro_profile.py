"""Micro-profile of FSE-section and Huffman-literal sub-stages on the chip."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_corpus
from tpu_zstd.ops.pipeline import DEFAULT_CONFIG, _parse_one

cfg = DEFAULT_CONFIG
N = cfg.block_size
B = 64
MSB = 8192

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
    print(f"{name:32s} {min(ts)*1000:8.1f} ms")
    return out


parse = jax.jit(lambda b, l: jax.vmap(lambda bb, ll: _parse_one(bb, ll, cfg))(b, l))
seqs = parse(blocks, lengths)
jax.device_get(_reduce(seqs))

ll = seqs.ll[:, :MSB]
ml = seqs.ml[:, :MSB]
ob = seqs.ob[:, :MSB]
nseq = seqs.nseq

from tpu_zstd.ops.fse_jax import (
    _small_lut, _state_chain_rt, ll_code_jnp, ml_code_jnp, of_code_jnp,
)
from tpu_zstd.ops.bitpack import deposit_bits, dynroll
from tpu_zstd.ops.fse_tables_jax import choose_stream_tables, stream_specs

spec_ll, spec_of, spec_ml = stream_specs()


@jax.jit
def codes_stage(ll, ml, ob, nseq):
    def one(ll, ml, ob, nseq):
        rev = lambda x: dynroll(jnp.flip(x), (nseq - MSB) % MSB, MSB)
        return ll_code_jnp(rev(ll)), ml_code_jnp(rev(ml)), of_code_jnp(rev(ob))
    return jax.vmap(one)(ll, ml, ob, nseq)


r_llc, r_mlc, r_ofc = timed("codes (rev+map)", codes_stage, ll, ml, ob, nseq)


@jax.jit
def tables_stage(r_llc, r_ofc, r_mlc, nseq):
    def one(a, b, c, n):
        return (choose_stream_tables(a, n, spec_ll),
                choose_stream_tables(b, n, spec_of),
                choose_stream_tables(c, n, spec_ml))
    return jax.vmap(one)(r_llc, r_ofc, r_mlc, nseq)


tabs = timed("table build x3", tables_stage, r_llc, r_ofc, r_mlc, nseq)
t_ll, t_of, t_ml = tabs


@jax.jit
def chains_stage(t_ll, t_of, t_ml, r_llc, r_ofc, r_mlc, nseq):
    def one(tl_, to_, tm_, a, b, c, n):
        pl_, fl = _state_chain_rt(tl_["next2d"], tl_["init"], a, n, MSB)
        po_, fo = _state_chain_rt(to_["next2d"], to_["init"], b, n, MSB)
        pm_, fm = _state_chain_rt(tm_["next2d"], tm_["init"], c, n, MSB)
        return pl_, po_, pm_, fl, fo, fm
    return jax.vmap(one)(t_ll, t_of, t_ml, r_llc, r_ofc, r_mlc, nseq)


chains = timed("state chains x3", chains_stage, t_ll, t_of, t_ml, r_llc, r_ofc, r_mlc, nseq)


@jax.jit
def deposit_stage(r_llc, r_mlc, r_ofc, nseq):
    def one(a, b, c, n):
        # representative 3-field deposit of the same field count
        lens = jnp.stack([jnp.minimum(a + 6, 20), b % 16, c % 18], axis=1).reshape(-1)
        vals = jnp.stack([a, b, c], axis=1).reshape(-1).astype(jnp.uint32)
        t = jnp.arange(MSB, dtype=jnp.int32)
        lens = jnp.where(jnp.repeat(t < n, 3), lens, 0)
        return deposit_bits(vals, lens, (MSB * 40) // 8 // 4)
    return jax.vmap(one)(r_llc, r_mlc, r_ofc, nseq)


timed("deposit (3 fields/seq)", deposit_stage, r_llc, r_mlc, r_ofc, nseq)

# Huffman sub-stages
lits = seqs.lits
nlit = seqs.nlit
from tpu_zstd.ops.huffman_jax import (
    build_lengths, canonical_codes, encode_literals_4stream, huff_payload_cap,
    literal_histogram, weights_header,
)

hcap = huff_payload_cap(N)


@jax.jit
def huff_hist(lits, nlit):
    return jax.vmap(literal_histogram)(lits, nlit)


hist = timed("huff histogram", huff_hist, lits, nlit)


@jax.jit
def huff_build(hist, nlit):
    def one(h, n):
        lengths, ok = build_lengths(h, n)
        return lengths, canonical_codes(lengths), ok
    return jax.vmap(one)(hist, nlit)


lengths_codes = timed("huff build lengths+codes", huff_build, hist, nlit)
hlengths, hcodes, _ = lengths_codes


@jax.jit
def huff_stream(lits, nlit, hlengths, hcodes):
    return jax.vmap(lambda a, b, c, d: encode_literals_4stream(a, b, c, d, hcap))(
        lits, nlit, hlengths, hcodes
    )


timed("huff 4-stream encode+deposit", huff_stream, lits, nlit, hlengths, hcodes)
