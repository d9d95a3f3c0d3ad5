"""One-pass per-row dynamic roll as a Pallas TPU kernel.

The pipeline composes variable-length sections by rolling fixed-capacity
buffers to traced offsets (ops/bitpack.py `dynroll`/`place`/`shift_words`).
The portable implementation decomposes a roll into log2(W) conditional static
rolls — in the real compress graph XLA assigns these intermediates sublane-
major layouts and breaks the fusion, costing ~0.2 ms per LEVEL at (64, 128K)
on v5e (measured via tools/line_profile.py: 27.9 ms of a 73 ms encode stage).
This kernel does the whole roll in ONE pass with `tpu.dynamic_rotate`
(~0.03 ms at the same shape): a flat roll by s over a (Q, 128) vector tile is
a lane rotate by s % 128 plus two sublane rotates (s // 128 and one extra for
the lanes that wrapped).

`tpu.dynamic_rotate` is 32-bit only, so uint8 rows ride as u32 words: a byte
roll by s = word roll by s // 4, then each word borrows 32 - 8*(s % 4) bits
from its predecessor (little-endian), mirroring how the reference's bitstream
writer splits bit offsets into word index + intra-word shift (reference
src/gpu_bitstream.cuh:14-50).

`roll_rows` carries a custom_vmap rule that collapses any number of batch
axes into the row grid, so `bitpack.dynroll` can route to it from inside
vmapped per-block code without materializing gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
U32 = jnp.uint32

# Minimum last-axis width (elements) for the Pallas path; below this the log
# dynroll is cheap and per-call overhead dominates.
MIN_WIDTH_32 = 2048
MIN_WIDTH_8 = 8192


def _flat_roll(x: jax.Array, s: jax.Array) -> jax.Array:
    """Right-roll the flattened (Q, L) tile by s elements (row-major order)."""
    Q, L = x.shape
    s_l = s % L
    s_q = s // L
    a = pltpu.roll(x, s_l, 1)
    b = pltpu.roll(a, s_q, 0)
    c = pltpu.roll(a, s_q + 1, 0)
    lane = jax.lax.broadcasted_iota(I32, (Q, L), 1)
    return jnp.where(lane < s_l, c, b)


def _kern32(s_ref, x_ref, o_ref):
    r = pl.program_id(0)
    o_ref[0] = _flat_roll(x_ref[0], s_ref[r])


def _kern8(s_ref, w_ref, o_ref):
    """Byte roll over a u32-word view: word roll + sub-word bit borrow."""
    r = pl.program_id(0)
    s = s_ref[r]
    a = _flat_roll(w_ref[0], s // 4)
    am = _flat_roll(a, 1)  # previous word of each position
    sh = (8 * (s % 4)).astype(U32)
    merged = (a << sh) | (am >> (U32(32) - sh))
    o_ref[0] = jnp.where(sh == 0, a, merged)


def _pallas_roll_2d(x: jax.Array, s: jax.Array, interpret: bool) -> jax.Array:
    """x: (R, W) int32/uint32 (W % 128 == 0) or uint8 (W % 512 == 0)."""
    R, W = x.shape
    if x.dtype == jnp.uint8:
        w = jax.lax.bitcast_convert_type(x.reshape(R, W // 4, 4), U32)
        kern, width, back = _kern8, W // 4, True
    else:
        w, kern, width, back = x, _kern32, W, False
    Q = width // 128
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, Q, 128), w.dtype),
        grid=(R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Q, 128), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q, 128), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(s.astype(I32), w.reshape(R, Q, 128))
    out = out.reshape(R, width)
    if back:
        out = jax.lax.bitcast_convert_type(out, jnp.uint8).reshape(R, W)
    return out


@functools.partial(jax.custom_batching.custom_vmap)
def roll_rows(x: jax.Array, s: jax.Array) -> jax.Array:
    """Right-roll each row of x (R, W) by s[r] (mod W). One device pass."""
    return _pallas_roll_2d(x, s % x.shape[-1], interpret=_use_interpret())


@roll_rows.def_vmap
def _roll_rows_vmap(axis_size, in_batched, x, s):
    xb, sb = in_batched
    if not xb:
        x = jnp.broadcast_to(x, (axis_size,) + x.shape)
    if not sb:
        s = jnp.broadcast_to(s, (axis_size,) + s.shape)
    B, R, W = x.shape
    out = roll_rows(x.reshape(B * R, W), s.reshape(B * R))
    return out.reshape(B, R, W), True


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _eligible(x: jax.Array) -> bool:
    # The sublane rotate needs Q = words/128 divisible by 8 (Mosaic rejects
    # unaligned sublane shapes): 1024 words for 32-bit rows, 4096 bytes for u8.
    w = x.shape[-1]
    if x.dtype in (jnp.int32, jnp.uint32):
        return w % 1024 == 0 and w >= MIN_WIDTH_32
    if x.dtype == jnp.uint8:
        return w % 4096 == 0 and w >= MIN_WIDTH_8
    return False


def roll_last_maybe(x: jax.Array, shift: jax.Array) -> jax.Array | None:
    """Pallas one-pass roll of x (..., W) by `shift` when profitable, else None.

    shift: scalar or broadcastable to x.shape[:-1] (+ optional trailing 1).
    On CPU the kernel runs through the Pallas interpreter, which is slower
    than the log path — callers get the portable path off-TPU.
    """
    if jax.default_backend() != "tpu" or not _eligible(x):
        return None
    W = x.shape[-1]
    rows = x.shape[:-1]
    shift = jnp.asarray(shift, I32)
    if shift.ndim and shift.shape[-1] == 1 and shift.ndim == x.ndim:
        shift = shift[..., 0]
    try:
        shift = jnp.broadcast_to(shift, rows)
    except ValueError:
        return None
    if x.ndim == 1:
        return roll_rows(x[None], shift[None])[0]
    R = 1
    for d in rows:
        R *= d
    return roll_rows(x.reshape(R, W), shift.reshape(R)).reshape(x.shape)
