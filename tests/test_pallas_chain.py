"""Batched Pallas FSE state-chain kernel vs the XLA reference implementation.

state_chain3_pallas (ops/pallas_chain.py) must be bit-identical to
fse_jax._state_chain3_cf on the valid region (steps 1..nseq-1 per block, plus
the flush states) — the staged encode path swaps between them by backend.
Counterpart of the reference's sequential chunk state pre-pass
(reference src/cuda_zstd_fse_chunk_kernel.cuh:22-70).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_zstd.constants import SEQ_RLE
from tpu_zstd.ops.fse_jax import _state_chain3_cf, prepare_sequences_auto
from tpu_zstd.ops.pallas_chain import state_chain3_pallas


def _mk_prep(rng, msb, B):
    cols = []
    nseqs = []
    for _ in range(B):
        n = int(rng.integers(1, msb))
        ll = np.zeros(msb, np.int32)
        ml = np.zeros(msb, np.int32)
        ob = np.zeros(msb, np.int32)
        ll[:n] = rng.integers(0, 40, n)
        ml[:n] = rng.integers(3, 80, n)
        ob[:n] = rng.integers(1, 6000, n)
        cols.append((ll, ml, ob, n))
        nseqs.append(n)
    stacked = [jnp.asarray(np.stack([c[i] for c in cols])) for i in range(3)]
    nseq = jnp.asarray(nseqs, jnp.int32)
    prep = jax.vmap(lambda a, b, c, n: prepare_sequences_auto(a, b, c, n, msb))(
        *stacked, nseq
    )
    return prep, nseq, nseqs


@pytest.mark.parametrize("msb,B", [(256, 4), (1024, 2), (16896, 1), (32768, 1)])
def test_chain_matches_cf(msb, B):
    """RS=1 (msb<=16384) and RS=2 (msb<=32768) layouts, interpret mode."""
    rng = np.random.default_rng(msb)
    prep, nseq, nseqs = _mk_prep(rng, msb, B)
    rle3 = prep["mode3"] == SEQ_RLE
    ref = jax.vmap(
        lambda st, dnb, dfs, init, tl, rl, rs, n: _state_chain3_cf(
            st, dnb, dfs, init, tl, rl, rs, n, msb
        )
    )(
        prep["st3"], prep["dnb3"], prep["dfs3"], prep["init3"], prep["tl3"],
        rle3, prep["rsym3"], nseq,
    )
    interpret = jax.default_backend() != "tpu"
    got = state_chain3_pallas(
        prep["st3"], prep["dnb3"], prep["dfs3"], prep["init3"], prep["tl3"],
        rle3, prep["rsym3"], nseq, msb, interpret,
    )
    r = jax.device_get(ref)
    g = jax.device_get(got)
    for b in range(B):
        n = nseqs[b]
        np.testing.assert_array_equal(r[0][b][:, 1:n], g[0][b][:, 1:n])
        np.testing.assert_array_equal(r[1][b], g[1][b])
        np.testing.assert_array_equal(r[2][b][:, 1:n], g[2][b][:, 1:n])
