"""Probe Mosaic capabilities needed by the sequence-executor kernel:
1. dynamic-sublane 2-row loads/stores on (ROWS,128) u8 and i32 VMEM
2. pltpu.roll with a traced (dynamic) shift along lanes
3. HBM (ANY) -> SMEM sliced DMA + scalar reads from the staged chunk
Run: python -u tools/mosaic_probe.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


def probe_dyn_sublane(dtype, name):
    ROWS = 64

    def kern(p_ref, x_ref, o_ref):
        p = p_ref[0]
        r0 = p >> 7
        a = p & 127
        two = x_ref[pl.ds(r0, 2), :].astype(I32)
        ra = pltpu.roll(two, -a, 1)
        lane = jax.lax.broadcasted_iota(I32, (1, 128), 1)
        got = jnp.where(lane < 128 - a, ra[0:1], ra[1:2])
        o_ref[0:1, :] = got.astype(o_ref.dtype)

    x = np.arange(ROWS * 128, dtype=np.int32) % 251
    xd = x.reshape(ROWS, 128).astype(dtype)
    for p in (0, 1, 127, 777, 4000):
        out = pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), dtype),
        )(jnp.asarray([p], I32), jnp.asarray(xd))
        want = x[p : p + 128].astype(np.int32)
        ok = np.array_equal(np.asarray(out)[0].astype(np.int32), want)
        print(f"  dyn-sublane read {name} p={p}: {'OK' if ok else 'MISMATCH'}")


def probe_dyn_write(dtype, name):
    ROWS = 64

    def kern(p_ref, d_ref, x_ref, o_ref):
        o_ref[...] = x_ref[...]
        p = p_ref[0]
        c = p_ref[1]
        r0 = p >> 7
        a = p & 127
        d = d_ref[0:1, :].astype(I32)
        rolled = pltpu.roll(d, a, 1)
        lane = jax.lax.broadcasted_iota(I32, (1, 128), 1)
        two = o_ref[pl.ds(r0, 2), :].astype(I32)
        new0 = jnp.where((lane >= a) & (lane < a + c), rolled, two[0:1])
        new1 = jnp.where(lane < a + c - 128, rolled, two[1:2])
        o_ref[pl.ds(r0, 2), :] = jnp.concatenate([new0, new1], 0).astype(o_ref.dtype)

    x = (np.arange(ROWS * 128, dtype=np.int32) % 97).astype(dtype).reshape(ROWS, 128)
    d = (np.arange(128, dtype=np.int32) % 89 + 100).astype(dtype).reshape(1, 128)
    for p, c in ((5, 128), (130, 40), (1000, 128), (254, 100)):
        out = pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), dtype),
        )(jnp.asarray([p, c], I32), jnp.asarray(d), jnp.asarray(x))
        want = x.reshape(-1).astype(np.int32).copy()
        want[p : p + c] = d.reshape(-1).astype(np.int32)[:c]
        ok = np.array_equal(np.asarray(out).reshape(-1).astype(np.int32), want)
        print(f"  dyn-sublane write {name} p={p} c={c}: {'OK' if ok else 'MISMATCH'}")


def probe_smem_dma():
    MS = 4096
    CHS = 512

    def kern(x_hbm, o_ref, st, sem):
        def body(ck, acc):
            dma = pltpu.make_async_copy(
                x_hbm.at[1, pl.ds(ck * CHS, CHS)], st, sem
            )
            dma.start()
            dma.wait()

            def inner(i, a):
                return a + st[i]

            return jax.lax.fori_loop(0, CHS, inner, acc)

        total = jax.lax.fori_loop(0, MS // CHS, body, jnp.int32(0))
        o_ref[0] = total

    x = np.arange(2 * MS, dtype=np.int32).reshape(2, MS) % 1000
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), I32),
        scratch_shapes=[pltpu.SMEM((CHS,), I32), pltpu.SemaphoreType.DMA(())],
    )(jnp.asarray(x))
    want = int(x[1].sum())
    print(f"  hbm->smem dma + scalar reads: {'OK' if int(out[0]) == want else 'MISMATCH'} ({int(out[0])} vs {want})")


if __name__ == "__main__":
    for dt, nm in ((jnp.int32, "i32"), (jnp.uint8, "u8")):
        try:
            probe_dyn_sublane(dt, nm)
        except Exception as e:
            print(f"  dyn-sublane read {nm}: FAIL {str(e)[:200]}")
        try:
            probe_dyn_write(dt, nm)
        except Exception as e:
            print(f"  dyn-sublane write {nm}: FAIL {str(e)[:200]}")
    try:
        probe_smem_dma()
    except Exception as e:
        print(f"  smem dma: FAIL {str(e)[:300]}")
