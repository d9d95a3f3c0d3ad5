"""Pallas deposit kernel: bit-exactness vs the XLA scatter reference.

Runs in Pallas interpret mode on the CPU backend (the compiled Mosaic kernel
is validated on-chip; see ops/pallas_deposit.py header for measured numbers).
"""

import numpy as np
import pytest

from tpu_zstd.ops.bitpack import deposit_bits_at
from tpu_zstd.ops.pallas_deposit import CHUNK_F, deposit_bits_pallas


@pytest.mark.parametrize("seed,maxlen", [(0, 20), (1, 32), (2, 6)])
def test_matches_scatter_reference(seed, maxlen):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    B, M = 3, 8 * CHUNK_F
    lens = rng.integers(0, maxlen + 1, (B, M)).astype(np.int32)
    vals = rng.integers(0, 1 << 31, (B, M)).astype(np.uint32)
    offs = (np.cumsum(lens, axis=1) - lens).astype(np.int32)
    NW = int(offs.max() // 32) + 64
    ref = np.stack(
        [
            np.asarray(
                deposit_bits_at(jnp.asarray(vals[b]), jnp.asarray(lens[b]), jnp.asarray(offs[b]), NW)
            )
            for b in range(B)
        ]
    )
    out = np.asarray(
        deposit_bits_pallas(jnp.asarray(vals), jnp.asarray(lens), jnp.asarray(offs), NW, True)
    )
    assert np.array_equal(ref, out[:, :NW])


def test_sparse_fields():
    import jax.numpy as jnp

    B, M = 1, 2 * CHUNK_F
    lens = np.zeros((B, M), np.int32)
    lens[0, 5] = 13
    lens[0, 200] = 32
    vals = np.full((B, M), 0xDEADBEEF, np.uint32)
    offs = (np.cumsum(lens, axis=1) - lens).astype(np.int32)
    NW = 200
    ref = np.asarray(
        deposit_bits_at(jnp.asarray(vals[0]), jnp.asarray(lens[0]), jnp.asarray(offs[0]), NW)
    )
    out = np.asarray(
        deposit_bits_pallas(jnp.asarray(vals), jnp.asarray(lens), jnp.asarray(offs), NW, True)
    )
    assert np.array_equal(ref, out[0, :NW])
