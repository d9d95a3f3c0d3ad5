"""Variable-length segment concatenation as ONE Pallas pass.

The windowed extraction in ops/lz77_jax.py produces, per block, `NW` window-
local compacted segments (sequence rows / literal bytes) that must be
concatenated at cumsum offsets into one dense array. Doing that with NW
`place` rotates costs NW full-width passes over the output buffer (measured
~30 ms at (128, 32K..128K) x 48 calls on v5e — it ate the savings of the
windowed extraction sort). This kernel does all NW copies in a single pass:
the output buffer lives in VMEM, each segment is copied with 128-lane
vector chunks at arbitrary element alignment (2-row read + lane rotate +
masked read-modify-write — same mechanics as ops/pallas_exec.py), and only
the final buffer is written out.

The reference has no equivalent op (CUDA scatters handle varlen compaction,
reference src/cuda_zstd_manager.cu:2688-2745 gathers per-block sizes with
prefix sums); this is TPU-specific plumbing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


def _kern(off_ref, cnt_ref, x_ref, o_ref, buf, *, NW: int, WR: int, OR: int):
    b = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(I32, (1, 128), 1)
    buf[:, :] = jnp.zeros((OR + 1, 128), I32)

    def read_seg(w, q):
        """128 elements of window w starting at element q (any alignment)."""
        r0 = q >> 7
        a = q & 127
        two = x_ref[0, w, pl.ds(r0, 2), :]
        ra = pltpu.roll(two, -a, 1)
        return jnp.where(lane < 128 - a, ra[0:1], ra[1:2])

    def write_seg(p, d, c):
        """Write the first c (<= 128) elements of d (1, 128) at position p."""
        r0 = p >> 7
        a = p & 127
        rolled = pltpu.roll(d, a, 1)
        two = buf[pl.ds(r0, 2), :]
        new0 = jnp.where((lane >= a) & (lane < a + c), rolled, two[0:1])
        new1 = jnp.where(lane < a + c - 128, rolled, two[1:2])
        buf[pl.ds(r0, 2), :] = jnp.concatenate([new0, new1], 0)

    def win_body(w, S):
        cnt = cnt_ref[b, w]
        o = off_ref[b, w]
        for r in range(WR):
            # Clamp to the output capacity as well (overflowing totals drop
            # their tail instead of writing past the scratch buffer).
            c = jnp.clip(jnp.minimum(cnt, OR * 128 - S) - r * 128, 0, 128)

            @pl.when(c > 0)
            def _():
                write_seg(S + r * 128, read_seg(w, o + r * 128), c)

        return S + cnt

    jax.lax.fori_loop(0, NW, win_body, 0)
    o_ref[0] = buf[:OR, :]


def _batched(x: jax.Array, src_off: jax.Array, counts: jax.Array, out_len: int):
    """x: (B, NW, W) int32; counts/src_off: (B, NW). Segment w of block b is
    x[b, w, src_off[b,w] : src_off[b,w] + counts[b,w]]; segments concatenate
    in window order at exclusive-cumsum offsets. Requires W % 128 == 0,
    out_len % 128 == 0, sum(counts[b]) <= out_len, src_off + counts <= W."""
    B, NW, W = x.shape
    WR = W // 128
    OR = out_len // 128
    xp = jnp.pad(x.reshape(B, NW, WR, 128), ((0, 0), (0, 0), (0, 1), (0, 0)))
    kern = functools.partial(_kern, NW=NW, WR=WR, OR=OR)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, NW, WR + 1, 128), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, OR, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, OR, 128), I32),
        scratch_shapes=[pltpu.VMEM((OR + 1, 128), I32)],
        interpret=jax.default_backend() != "tpu",
    )(src_off.astype(I32), counts.astype(I32), xp)
    return out.reshape(B, out_len)


@functools.lru_cache(maxsize=None)
def _concat_fn(out_len: int):
    @jax.custom_batching.custom_vmap
    def f(x, src_off, counts):
        return _batched(x[None], src_off[None], counts[None], out_len)[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, x, src_off, counts):
        xb, ob, cb = in_batched
        if not xb:
            x = jnp.broadcast_to(x, (axis_size,) + x.shape)
        if not ob:
            src_off = jnp.broadcast_to(src_off, (axis_size,) + src_off.shape)
        if not cb:
            counts = jnp.broadcast_to(counts, (axis_size,) + counts.shape)
        return _batched(x, src_off, counts, out_len), True

    return f


def concat_varlen(
    x: jax.Array, src_off: jax.Array, counts: jax.Array, out_len: int
) -> jax.Array:
    """Concatenate NW variable-length segments of x (NW, W) int32 into one
    (out_len,) array (zeros beyond the total). vmap-compatible (batch axes
    collapse into the kernel grid)."""
    return _concat_fn(out_len)(x, src_off, counts)
