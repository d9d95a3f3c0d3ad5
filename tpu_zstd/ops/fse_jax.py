"""TPU-parallel FSE (tANS) sequence-section encoder (RFC 8878 §3.1.1.3.2).

The ANS state chain is inherently sequential: state_{t} = T[sym_t, state_{t-1}].
The reference breaks it with a sequential per-chunk state pre-pass on the GPU
(reference src/cuda_zstd_fse_chunk_kernel.cuh:22-70, and the interleaved
single-thread encoder at src/cuda_zstd_fse_encoding_kernel.cu:33). The
TPU-native formulation used here exploits the tiny state space of the
predefined tables (table_log <= 6, i.e. <= 64 states):

  Phase A (parallel over chunks): evolve ALL `table_size` possible entry
          states through each chunk's symbols simultaneously — this computes
          every chunk's composed transition function as a (chunks, states)
          matrix in `chunk_len` vectorized steps.
  Phase B (tiny sequential scan): thread the single real entry state through
          the per-chunk composed functions (`num_chunks` scalar gathers).
  Phase C (parallel over chunks): re-walk each chunk from its now-known entry
          state to record the per-step pre-transition states.

Bit emission is then fully parallel: per-sequence bit counts -> prefix sum ->
scatter deposit (ops/bitpack.py). Everything is jittable with static shapes
and vmaps over blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    LL_BITS,
    LL_CODE_TABLE,
    LL_DEFAULT_LOG,
    LL_DEFAULT_NORM,
    LL_DELTA_CODE,
    ML_BITS,
    ML_CODE_TABLE,
    ML_DEFAULT_LOG,
    ML_DEFAULT_NORM,
    ML_DELTA_CODE,
    OF_DEFAULT_LOG,
    OF_DEFAULT_NORM,
)
from ..format.fse import build_ctable

I32 = jnp.int32
U32 = jnp.uint32

CHUNK = 128  # sequences per chunk in the state pre-pass


# --- Encode tables (numpy precompute; tiny, built once at import) -------------------


class EncTables:
    """Dense (symbol, state) -> (next_state, nb_bits) transition tables."""

    def __init__(self, norm: np.ndarray, table_log: int):
        ct = build_ctable(norm, table_log)
        ts = 1 << table_log
        nsym = len(norm)
        u = np.arange(ts, dtype=np.int64)
        value = ts + u  # zstd state "value" range [ts, 2*ts)
        dnb = ct.delta_nb_bits.astype(np.int64)
        dfs = ct.delta_find_state.astype(np.int64)
        nb = (value[None, :] + dnb[:, None]) >> 16  # (nsym, ts)
        idx = (value[None, :] >> nb) + dfs[:, None]
        nxt = ct.state_table.astype(np.int64)[idx] - ts
        # Init state per symbol (FSE_initCState2 semantics).
        nb0 = (dnb + (1 << 15)) >> 16
        v0 = (nb0 << 16) - dnb
        init = ct.state_table.astype(np.int64)[(v0 >> nb0) + dfs] - ts

        self.table_log = table_log
        self.table_size = ts
        self.num_symbols = nsym
        # Stored as NUMPY so the module never pins device buffers at import;
        # jnp.asarray at use-sites (inside traces) inlines them as literals.
        self.next_flat = nxt.reshape(-1).astype(np.int32)  # [sym*ts + state]
        self.nb_flat = nb.reshape(-1).astype(np.int32)
        self.init_state = init.astype(np.int32)


# Built eagerly at import (NOT lazily: constructing jnp constants inside a jit
# trace and caching them would leak tracers across traces).
_PREDEF_ENC = (
    EncTables(LL_DEFAULT_NORM, LL_DEFAULT_LOG),
    EncTables(OF_DEFAULT_NORM, OF_DEFAULT_LOG),
    EncTables(ML_DEFAULT_NORM, ML_DEFAULT_LOG),
)


def predefined_enc_tables() -> tuple[EncTables, EncTables, EncTables]:
    """(LL, OF, ML) encode tables for the RFC 8878 predefined distributions."""
    return _PREDEF_ENC


# --- Code mapping (value -> code), jnp versions of constants.ll_code etc. -----------


def highbit32_jnp(v: jax.Array) -> jax.Array:
    """floor(log2(v)) for v >= 1, elementwise (int32 in/out)."""
    v = v.astype(U32)
    out = jnp.zeros(v.shape, dtype=I32)
    for shift in (16, 8, 4, 2, 1):
        m = v >= (U32(1) << U32(shift))
        out = out + jnp.where(m, shift, 0)
        v = jnp.where(m, v >> U32(shift), v)
    return out


_LL_CODE_J = LL_CODE_TABLE.astype(np.int32)
_ML_CODE_J = ML_CODE_TABLE.astype(np.int32)
_LL_BITS_J = LL_BITS.astype(np.int32)
_ML_BITS_J = ML_BITS.astype(np.int32)


def ll_code_jnp(ll: jax.Array) -> jax.Array:
    small = ll < 64
    tab = jnp.asarray(_LL_CODE_J)
    return jnp.where(
        small, tab[jnp.minimum(ll, 63)], LL_DELTA_CODE + highbit32_jnp(jnp.maximum(ll, 1))
    )


def ml_code_jnp(ml: jax.Array) -> jax.Array:
    base = ml - 3
    small = base < 128
    tab = jnp.asarray(_ML_CODE_J)
    return jnp.where(
        small, tab[jnp.minimum(base, 127)], ML_DELTA_CODE + highbit32_jnp(jnp.maximum(base, 1))
    )


def of_code_jnp(ob: jax.Array) -> jax.Array:
    return highbit32_jnp(jnp.maximum(ob, 1))


# --- State chains -------------------------------------------------------------------


def _state_chain(tables: EncTables, rsym: jax.Array, nseq: jax.Array, max_seqs: int):
    """States of one FSE stream processed in encoder order.

    rsym[t] = symbol of sequence (nseq-1-t)  (t=0 is the init symbol).
    Transitions consume rsym[t] for t in [1, nseq).

    Returns (pre_states[max_seqs], final_state):
      pre_states[t] = state BEFORE consuming rsym[t]   (valid for 1 <= t < nseq)
      final_state   = state after the last transition (flushed to the stream).
    """
    ts = tables.table_size
    nc = max_seqs // CHUNK
    t_next = jnp.asarray(tables.next_flat)

    init = jnp.asarray(tables.init_state)[rsym[0]]
    # Step s consumes rsym[s+1]; lay steps out as (chunks, CHUNK).
    st_sym = jnp.roll(rsym, -1).reshape(nc, CHUNK)
    t_idx = jnp.arange(max_seqs, dtype=I32).reshape(nc, CHUNK)
    st_valid = (t_idx + 1) < nseq

    # Phase A: per-chunk composed transition over all `ts` entry states.
    def stepA(states, inp):
        sym, valid = inp  # (nc,), (nc,)
        nxt = t_next[sym[:, None] * ts + states]
        return jnp.where(valid[:, None], nxt, states), None

    all_states0 = jnp.broadcast_to(jnp.arange(ts, dtype=I32)[None, :], (nc, ts))
    chunk_fn, _ = jax.lax.scan(stepA, all_states0, (st_sym.T, st_valid.T))

    # Phase B: thread the real entry state through chunk functions.
    def stepB(state, fn_row):
        return fn_row[state], state  # carry out pre-chunk entry state

    final_state, entries = jax.lax.scan(stepB, init, chunk_fn)

    # Phase C: re-walk each chunk, recording pre-transition states.
    def stepC(states, inp):
        sym, valid = inp
        nxt = t_next[sym * ts + states]
        return jnp.where(valid, nxt, states), states

    _, pre_seq = jax.lax.scan(stepC, entries, (st_sym.T, st_valid.T))
    # pre_seq is (CHUNK, nc): pre_seq[i, c] = state before step s = c*CHUNK + i,
    # i.e. before consuming rsym[s+1]. Re-index to pre_states[t] for t = s+1.
    pre_by_step = pre_seq.T.reshape(-1)  # [s] -> state before consuming rsym[s+1]
    pre_states = jnp.roll(pre_by_step, 1)  # [t] -> state before consuming rsym[t]
    return pre_states, final_state


# --- Sequence section encode ---------------------------------------------------------


def encode_sequences_predefined(
    ll: jax.Array,
    ml: jax.Array,
    ob: jax.Array,
    nseq: jax.Array,
    max_seqs: int,
    out_bytes_cap: int,
) -> tuple[jax.Array, jax.Array]:
    """Encode one block's sequences with the predefined FSE tables (mode 0).

    ll/ml/ob: (max_seqs,) int32 (entries >= nseq are ignored)
    Returns (section_bytes[out_bytes_cap] uint8, section_len int32).
    Emission order mirrors format/sequences.py:encode_sequences_bitstream
    (validated against stock libzstd).
    """
    tl, to, tm = predefined_enc_tables()
    ms = max_seqs
    ll = ll.astype(I32)
    ml = ml.astype(I32)
    ob = ob.astype(I32)

    llc = ll_code_jnp(ll)
    mlc = ml_code_jnp(ml)
    ofc = of_code_jnp(ob)
    llb = jnp.asarray(_LL_BITS_J)[llc]
    mlb = jnp.asarray(_ML_BITS_J)[mlc]
    ofb = ofc

    # Reversed (encoder-order) symbol streams: rsym[t] = code[nseq-1-t].
    t_ar = jnp.arange(ms, dtype=I32)
    k_of_t = jnp.clip(nseq - 1 - t_ar, 0, ms - 1)
    r_llc = llc[k_of_t]
    r_mlc = mlc[k_of_t]
    r_ofc = ofc[k_of_t]

    pre_ll, fin_ll = _state_chain(tl, r_llc, nseq, ms)
    pre_of, fin_of = _state_chain(to, r_ofc, nseq, ms)
    pre_ml, fin_ml = _state_chain(tm, r_mlc, nseq, ms)

    # Per-step state bit counts/values (valid for 1 <= t < nseq).
    def state_bits(tables: EncTables, pre, rsym):
        nb = jnp.asarray(tables.nb_flat)[rsym * tables.table_size + pre]
        val = tables.table_size + pre  # zstd emits the raw state value
        return nb, val

    nb_ll, v_ll = state_bits(tl, pre_ll, r_llc)
    nb_of, v_of = state_bits(to, pre_of, r_ofc)
    nb_ml, v_ml = state_bits(tm, pre_ml, r_mlc)

    is_step = (t_ar >= 1) & (t_ar < nseq)
    is_seq = t_ar < nseq

    # Emission layout per t: [OF state, ML state, LL state, LL extra, ML extra, OF extra]
    lens = jnp.stack(
        [
            jnp.where(is_step, nb_of, 0),
            jnp.where(is_step, nb_ml, 0),
            jnp.where(is_step, nb_ll, 0),
            jnp.where(is_seq, llb[k_of_t], 0),
            jnp.where(is_seq, mlb[k_of_t], 0),
            jnp.where(is_seq, ofb[k_of_t], 0),
        ],
        axis=1,
    ).reshape(-1)
    vals = jnp.stack(
        [v_of, v_ml, v_ll, ll[k_of_t], ml[k_of_t] - 3, ob[k_of_t]],
        axis=1,
    ).reshape(-1)

    # Tail: flush ML, OF, LL states (table_log bits each; value = state index),
    # then the sentinel 1-bit.
    has = (nseq > 0).astype(I32)
    tail_lens = jnp.stack(
        [has * tm.table_log, has * to.table_log, has * tl.table_log, has]
    )
    tail_vals = jnp.stack([fin_ml, fin_of, fin_ll, jnp.ones((), I32)])

    all_lens = jnp.concatenate([lens, tail_lens])
    all_vals = jnp.concatenate([vals, tail_vals]).astype(U32)

    num_words = out_bytes_cap // 4
    from .bitpack import deposit_bits

    words, total_bits = deposit_bits(all_vals, all_lens, num_words)
    stream_bytes = (total_bits + 7) >> 3

    # Section header: nbSeq varint + mode byte (predefined = 0x00).
    b0 = jnp.where(
        nseq < 128,
        nseq,
        jnp.where(nseq < 0x7F00, (nseq >> 8) + 0x80, 255),
    )
    b1 = jnp.where(nseq < 0x7F00, nseq & 0xFF, (nseq - 0x7F00) & 0xFF)
    b2 = ((nseq - 0x7F00) >> 8) & 0xFF
    hdr_len = jnp.where(nseq < 128, 1, jnp.where(nseq < 0x7F00, 2, 3)) + has  # + mode byte
    # hdr bytes array (4 slots; mode byte position depends on varint width)
    hdr = jnp.zeros(4, dtype=I32)
    hdr = hdr.at[0].set(b0)
    hdr = hdr.at[1].set(jnp.where(nseq < 128, 0, b1))
    hdr = hdr.at[2].set(jnp.where(nseq < 0x7F00, 0, b2))
    # mode byte (0) is already 0 at hdr[hdr_len-1]; nseq==0 -> single 0x00 byte.

    j = jnp.arange(out_bytes_cap, dtype=I32)
    sj = j - hdr_len
    stream_byte = (
        words[jnp.clip(sj >> 2, 0, num_words - 1)] >> (U32(8) * (sj & 3).astype(U32))
    ) & U32(0xFF)
    out = jnp.where(j < hdr_len, hdr[jnp.clip(j, 0, 3)], stream_byte.astype(I32))
    section_len = hdr_len + has * stream_bytes
    return out.astype(jnp.uint8), section_len
