"""Micro: which part of the executor's XLA prepass costs what on-chip."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tpu_zstd.ops.scanops import cumsum_i32

I32 = jnp.int32
B, MS, N, L = 64, 32768, 131072, 131072

rng = np.random.default_rng(0)
nseq = np.full(B, 7000, np.int32)
ml = np.zeros((B, MS), np.int32)
ll = np.zeros((B, MS), np.int32)
for b in range(B):
    ml[b, :7000] = rng.integers(4, 30, 7000)
    ll[b, :7000] = rng.integers(0, 20, 7000)
off = np.maximum(rng.integers(1, 4096, (B, MS)), 1).astype(np.int32)
lits = rng.integers(0, 256, (B, L), dtype=np.uint8)

up = dict(
    ml=jnp.asarray(ml), ll=jnp.asarray(ll), off=jnp.asarray(off),
    nseq=jnp.asarray(nseq), lits=jnp.asarray(lits),
)
jax.block_until_ready(list(up.values()))

_r = jax.jit(lambda t: jax.tree.reduce(lambda a, b: a + b, jax.tree.map(
    lambda x: jnp.sum(x.astype(jnp.float32)), t)))


def timed(name, fn, *a):
    out = fn(*a)
    jax.device_get(_r(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.device_get(_r(out))
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts) * 1000:8.1f} ms")


@jax.jit
def starts(ml, ll, nseq):
    k = jnp.arange(MS, dtype=I32)
    valid = k < nseq[:, None]
    llv = jnp.where(valid, ll, 0)
    mlv = jnp.where(valid, ml, 0)
    adv = llv + mlv
    out_start = cumsum_i32(adv) - adv
    return out_start, out_start + llv, valid, mlv


@jax.jit
def diff_scatters(ml, ll, nseq):
    out_start, match_start, valid, mlv = starts(ml, ll, nseq)
    rows = jnp.arange(B, dtype=I32)[:, None]
    is_m = valid & (mlv > 0)
    ms_idx = jnp.where(is_m, match_start, N)
    diff = jnp.zeros((B, N + 1), I32)
    diff = diff.at[rows, ms_idx].add(jnp.where(is_m, 1, 0), mode="drop")
    diff = diff.at[rows, jnp.where(is_m, match_start + mlv, N)].add(
        jnp.where(is_m, -1, 0), mode="drop")
    return diff


@jax.jit
def full_inmatch(ml, ll, nseq):
    diff = diff_scatters(ml, ll, nseq)
    in_match = cumsum_i32(diff[:, :N]) > 0
    match_before = cumsum_i32(in_match.astype(I32)) - in_match.astype(I32)
    return match_before


@jax.jit
def skel_gather(ml, ll, nseq, lits):
    match_before = full_inmatch(ml, ll, nseq)
    pos = jnp.arange(N, dtype=I32)
    lit_idx = pos[None, :] - match_before
    row_base_l = (jnp.arange(B, dtype=I32) * L)[:, None]
    return jnp.take(
        lits.reshape(-1), (jnp.clip(lit_idx, 0, L - 1) + row_base_l).reshape(-1)
    ).reshape(B, N)


timed("cumsums/starts only", starts, up["ml"], up["ll"], up["nseq"])
timed("+ diff scatters", diff_scatters, up["ml"], up["ll"], up["nseq"])
timed("+ in_match cumsums", full_inmatch, up["ml"], up["ll"], up["nseq"])
timed("+ skeleton gather (full prepass)", skel_gather, up["ml"], up["ll"], up["nseq"], up["lits"])
