"""Lane-parallel Pallas decode kernels vs the XLA reference decoders.

Runs in interpret mode on the CPU backend: builds real accel frames through
the format layer, stages them with the same prepare helpers the TPU path
uses, and checks bit-identity against the host format decoder.
"""

from __future__ import annotations

import numpy as np
import pytest

import tpu_zstd.ops.pallas_decode as PD
from tpu_zstd.api import decompress as D
from tpu_zstd.format.frame import parse_frame_header
from tpu_zstd.format.accel import parse_accel_tail


def _mixed_data(n: int, seed: int = 7) -> bytes:
    rng = np.random.default_rng(seed)
    words = [b"the quick brown fox ", b"jumps over ", b"lazy dogs and cats ",
             b"0123456789abcdef", b"zstd zstd zstd "]
    parts = []
    total = 0
    while total < n:
        w = words[int(rng.integers(len(words)))]
        parts.append(w)
        total += len(w)
    blob = b"".join(parts)[:n]
    return blob


def _compress_accel(data: bytes):
    """Compress one block via the TPU pipeline (CPU backend) with accel."""
    from dataclasses import replace

    from tpu_zstd.api.config import CompressionConfig
    from tpu_zstd.api.manager import compress_items_tpu

    cfg = replace(CompressionConfig.from_level(3), decode_accel=True)
    return compress_items_tpu([data], cfg)[0]


@pytest.mark.timeout(600)
def test_huffman_lanes_interpret():
    import jax

    data = _mixed_data(40000)
    frame = _compress_accel(data)
    meta, frame_end = parse_accel_tail(frame)
    if meta is None or meta.lit_stride <= 0:
        pytest.skip("no accel literal metadata emitted by host compressor")
    hdr = parse_frame_header(frame)
    pos = hdr.header_size
    bh = int.from_bytes(frame[pos : pos + 3], "little")
    btype = (bh >> 1) & 3
    if btype != 2:
        pytest.skip("block not compressed")
    body = frame[pos + 3 : pos + 3 + (bh >> 3)]
    parsed = D._parse_litdev(body)
    if parsed is None:
        pytest.skip("literals not 4-stream compressed")
    litdev, consumed, regen = parsed
    if litdev[4] > 8:
        pytest.skip("table_log > 8 (host encoder)")
    CL = meta.lit_stride
    lck = meta.blocks[0][4]
    seg = (regen + 3) // 4
    ncl_pad = max(32, -(-(-(-seg // CL)) // 32) * 32)
    slices, bits0, nsym, tl, banks, wmax, R = PD.build_litlane_inputs(
        [litdev], [lck], ncl_pad, CL
    )
    Rpad = -(-R // 1024) * 1024
    if Rpad > R:
        ext = (Rpad - R) // 128
        slices = np.concatenate([slices, np.zeros((wmax, ext, 128), np.int32)], 1)
        z = np.zeros((ext, 128), np.int32)
        bits0, nsym, tl = (np.concatenate([a, z]) for a in (bits0, nsym, tl))
        banks = np.concatenate([banks, np.zeros((ext, 2, 128), np.int32)])
    import jax.numpy as jnp

    syms = PD.decode_huffman_lanes(
        jnp.asarray(slices), jnp.asarray(bits0), jnp.asarray(nsym),
        jnp.asarray(tl), jnp.asarray(banks), CL, wmax, True,
    )
    syms = np.asarray(jax.device_get(syms))[:R].reshape(4, ncl_pad * CL)
    # Reference: host literal decode.
    from tpu_zstd.format.frame import decode_literals_section

    lits = decode_literals_section(body, None).data
    segs = [lits[i * seg : (i + 1) * seg] for i in range(3)] + [lits[3 * seg :]]
    for s in range(4):
        got = syms[s, : len(segs[s])].tobytes()
        assert got == segs[s], f"stream {s} mismatch"


@pytest.mark.timeout(600)
def test_sequences_lanes_interpret():
    import jax
    import jax.numpy as jnp

    data = _mixed_data(50000, seed=3)
    frame = _compress_accel(data)
    meta, _ = parse_accel_tail(frame)
    if meta is None or meta.stride <= 0 or not meta.blocks:
        pytest.skip("no accel metadata")
    C = meta.stride
    hdr = parse_frame_header(frame)
    pos = hdr.header_size
    bh = int.from_bytes(frame[pos : pos + 3], "little")
    if (bh >> 1) & 3 != 2:
        pytest.skip("block not compressed")
    body = frame[pos + 3 : pos + 3 + (bh >> 3)]
    plan, _, _ = D._parse_block_plan(body, None, None)
    if plan.nbseq == 0:
        pytest.skip("no sequences")
    rec = meta.blocks[0]
    nc_pad = max(128, -(-(-(-plan.nbseq // C)) // 128) * 128)
    blk = {
        "stream": plan.stream, "tbits": plan.total_bits, "nseq": plan.nbseq,
        "tables": plan.tables, "ckb": rec[1], "cks": rec[2], "ckr": rec[3],
    }
    sl, b0, s0, r0, nloc, nupd, banks, wmax, R = PD.build_seqlane_inputs(
        [blk], nc_pad, C
    )
    Rpad = -(-R // 1024) * 1024
    if Rpad > R:
        ext = (Rpad - R) // 128
        sl = np.concatenate([sl, np.zeros((wmax, ext, 128), np.int32)], 1)
        z = np.zeros((ext, 128), np.int32)
        b0, s0, nloc, nupd = (np.concatenate([a, z]) for a in (b0, s0, nloc, nupd))
        r0 = np.concatenate([r0, np.ones((3, ext, 128), np.int32)], 1)
        banks = np.concatenate([banks, np.zeros((ext, 12, 128), np.int32)])
    llb, mlb = PD._value_banks()
    ll, ml, off = PD.decode_sequences_lanes(
        jnp.asarray(sl), jnp.asarray(b0), jnp.asarray(s0), jnp.asarray(r0),
        jnp.asarray(nloc), jnp.asarray(nupd), jnp.asarray(banks),
        jnp.asarray(llb), jnp.asarray(mlb), C, wmax, True,
    )
    ll, ml, off = (np.asarray(jax.device_get(a))[:R].reshape(-1) for a in (ll, ml, off))
    # Reference: host sequence decode with resolved offsets.
    from tpu_zstd.constants import REPCODE_INIT
    from tpu_zstd.format.sequences import decode_sequences_section, resolve_offset

    rest = body[D.decode_literals_section(body, None).consumed :]
    seqs, _, _ = decode_sequences_section(rest, None)
    rep = list(REPCODE_INIT)
    ns = plan.nbseq
    for k in range(ns):
        o, rep = resolve_offset(int(seqs.off_bases[k]), int(seqs.lit_lengths[k]), rep)
        assert ll[k] == seqs.lit_lengths[k], f"ll[{k}]"
        assert ml[k] == seqs.match_lengths[k], f"ml[{k}]"
        assert off[k] == o, f"off[{k}]: {off[k]} != {o}"
