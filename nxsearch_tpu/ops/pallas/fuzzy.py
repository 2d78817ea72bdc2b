"""Pallas kernel: bit-parallel Myers edit distance, term-per-lane.

The jnp implementation (ops/levenshtein.py) materializes a [T, 32]
Peq matrix in HBM and scans it; this kernel keeps everything on-chip:
the vocabulary is laid out position-major ([32, T], one term per VPU
lane), each grid step streams one [32, BLK] tile into VMEM, and the 32
Myers steps run as fused u32 lane ops with the Peq row computed in
registers -- zero extra HBM traffic beyond reading the vocabulary
once.

Layout notes:
- vocab tile [32, BLK] uint8: position-major so step j reads one
  contiguous [BLK] row; 32 sublanes exactly matches the int8 tile.
- DP state (PV, MV, score) are [BLK] vectors carried through a
  fori_loop -- one term's whole DP column lives in one lane's u32.

The kernel is numerically identical to ops/levenshtein.myers_distances
(property-tested); `distances()` picks the kernel on TPU and interpret
mode elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Terms per vocabulary tile.  Bigger tiles amortize the per-grid-step
# scalar prologue (hardware sweep, 1M vocab, M=64: blk 1024 93 ms,
# 4096 76 ms, 8192 76 ms per chunk); clamped to the padded vocab size
# for small dictionaries.
BLOCK_TERMS = 8192
QUERY_WIDTH = 32


def _myers_kernel(q_ref, qlen_ref, vocab_ref, vlen_ref, out_ref):
    """One vocabulary tile: distances for BLK terms.

    q_ref:    SMEM int32[1, 32]  query bytes (zero-padded)
    qlen_ref: SMEM int32[1, 1]
    vocab_ref: VMEM uint8[32, BLK]  position-major term bytes
    vlen_ref: VMEM int32[1, BLK]
    out_ref:  VMEM int32[1, BLK]
    """
    out_ref[0, :] = _myers_tile(q_ref, qlen_ref, 0, vocab_ref, vlen_ref)


def _myers_kernel_batch(q_ref, qlen_ref, vocab_ref, vlen_ref, out_ref):
    """Batched grid (tile, query): q_ref/qlen_ref hold ALL M queries
    (SMEM int32[M, 32] / int32[M, 1], full-array blocks -- Mosaic's
    block-divisibility rule forbids (1, 32) row blocks of an [M, 32]
    array); the row is selected by the inner grid index.  out_ref is
    the full [M, BLK] column block, revisited across the inner query
    axis (its index map ignores the query index, so Mosaic keeps it
    resident and flushes once per tile); each iteration stores its
    own row -- a (1, BLK) output block would violate the 8-row
    block-divisibility rule on the [M, T_pad] output."""
    row = pl.program_id(1)
    score = _myers_tile(q_ref, qlen_ref, row, vocab_ref, vlen_ref)
    out_ref[pl.ds(row, 1), :] = score[None, :]


def _myers_tile(q_ref, qlen_ref, row, vocab_ref, vlen_ref):
    blk = vocab_ref.shape[1]
    m = qlen_ref[row, 0]
    mu = m.astype(jnp.uint32)
    full = jnp.uint32(0xFFFFFFFF)
    mask_m = jax.lax.select(
        m >= 32, full,
        (jnp.uint32(1) << jnp.minimum(mu, jnp.uint32(31))) - jnp.uint32(1))
    high_bit = jnp.uint32(1) << jnp.minimum(mu - jnp.uint32(1),
                                            jnp.uint32(31))

    vlen = vlen_ref[0, :]
    # Longest term in this tile: every loop below is bounded by the
    # REAL lengths instead of the 32-byte layout width.  Typical
    # vocabularies average 6-9 bytes, so length-bounding is worth
    # ~4-5x on both phases (measured 13 -> ~X QPS on the 1M-vocab
    # fuzzy tier; the old full-width kernel spent ~75 us per
    # (tile, query) grid step almost entirely on padding work).
    vmax = jnp.max(vlen)
    pv0 = jnp.full((blk,), mask_m, jnp.uint32)
    mv0 = jnp.zeros((blk,), jnp.uint32)
    score0 = jnp.full((blk,), m, jnp.int32)

    # Peq: bit i of peq_all[j, t] is set where q[i] == term t's byte
    # j.  The query loop is STATICALLY unrolled (a dynamic fori_loop
    # here costs ~100 cycles of scalar loop overhead per iteration --
    # it dominated the kernel at ~75 us per (tile, query) grid step)
    # and branch-gated per 8-byte chunk on the query's real length
    # (typical query tokens are 5-10 bytes; the tail 24 compares are
    # dead work).  Exactness of both cuts: extra matches against
    # zero-padded q bytes can only set peq bits i >= qlen, and bit
    # i >= qlen of xh/ph never reaches the score (inc/dec read bit
    # qlen-1; carries in the xh add propagate upward only) or the
    # state (masked to mask_m) -- so bits >= qlen may be anything,
    # including the zeros the skipped chunks leave.  Term rows build
    # in 8-sublane groups, each group skipped outright when every
    # term in the tile ends before it.
    def _build_group(g0):
        chars = vocab_ref[g0: g0 + 8, :].astype(jnp.int32)
        zeros8 = jnp.zeros((8, blk), jnp.uint32)

        def _byte_chunk(i0):
            part = zeros8
            for i in range(i0, i0 + 8):
                hit = chars == q_ref[row, i]
                part = part | (hit.astype(jnp.uint32) << jnp.uint32(i))
            return part

        acc = _byte_chunk(0)  # qlen >= 1 always
        for i0 in range(8, QUERY_WIDTH, 8):
            acc = acc | lax.cond(i0 < m,
                                 functools.partial(_byte_chunk, i0),
                                 lambda: zeros8)
        return acc

    zeros_g = jnp.zeros((8, blk), jnp.uint32)
    peq_all = jnp.concatenate(
        [lax.cond(vmax > g * 8,
                  functools.partial(_build_group, g * 8),
                  lambda: zeros_g)
         for g in range(QUERY_WIDTH // 8)], axis=0)

    # The Myers steps unroll over term positions: row reads with
    # *static* indexes keep Mosaic's sublane alignment checks happy
    # (a fori_loop induction variable cannot be proven aligned).
    # Steps past the tile's longest term are exact no-ops for every
    # lane (active = j < vlen is false everywhere), so each step is
    # branch-gated on the scalar bound.
    def _step(state, *, j, peq):
        pv, mv, score = state
        xv = peq | mv
        xh = (((peq & pv) + pv) ^ pv) | peq
        ph = mv | ~(xh | pv)
        mh = pv & xh

        inc = ((ph & high_bit) != 0).astype(jnp.int32)
        dec = ((mh & high_bit) != 0).astype(jnp.int32)
        active = j < vlen
        score = score + jnp.where(active, inc - dec, 0)

        ph = (ph << 1) | jnp.uint32(1)
        mh = mh << 1
        new_pv = (mh | ~(xv | ph)) & mask_m
        new_mv = (ph & xv) & mask_m
        return (jnp.where(active, new_pv, pv),
                jnp.where(active, new_mv, mv), score)

    state = (pv0, mv0, score0)
    for j in range(QUERY_WIDTH):
        state = lax.cond(j < vmax,
                         functools.partial(_step, j=j, peq=peq_all[j, :]),
                         lambda s: s, state)
    return state[2]


def _myers_rev_kernel_batch(q_ref, qlen_ref, vocab_ref, vlen_ref,
                            out_ref, table_ref):
    """Transposed Myers: pattern = TERM (per lane), text = QUERY.

    Edit distance is symmetric, so swapping the roles is exact -- and
    it moves the O(pattern x alphabet) Peq preprocessing from
    per-(tile, query) to per-tile: ``table_ref`` (VMEM scratch
    u32[256, BLK]) holds, for every byte value c, the bitmask over
    term positions j where term[j] == c.  It is built ONCE per
    vocabulary tile (inner grid axis = queries revisits the tile; the
    scratch persists across grid steps) and each query's DP step i
    just reads row q[i] -- the per-query work drops from the full
    Peq build (~8 x 8 gated [8, BLK] compares) to qlen row reads plus
    qlen Myers steps of [BLK] u32 lane ops.

    Per-lane state: PV/MV masked to the term's own length n
    (mask = (1 << n) - 1), score starts at n, and the score
    increment reads the per-lane high bit 1 << (n - 1).  Steps run
    over query positions i < qlen (scalar-gated static unroll).
    Numerically identical to _myers_kernel_batch (property-tested).
    """
    row = pl.program_id(1)
    blk = vocab_ref.shape[1]

    @pl.when(row == 0)
    def _build_table():
        vmax = jnp.max(vlen_ref[0, :])
        cvals = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)
        table = jnp.zeros((256, blk), jnp.uint32)
        # Unrolled over term positions, branch-gated per 8-byte chunk
        # on the tile's longest term (typical vocab terms are 6-9
        # bytes, so 3 of 4 chunks are dead work).
        def _chunk(tbl, *, g0):
            chars = vocab_ref[g0: g0 + 8, :].astype(jnp.int32)
            for j in range(8):
                hit = cvals == chars[j][None, :]        # [256, blk]
                tbl = tbl | (hit.astype(jnp.uint32)
                             << jnp.uint32(g0 + j))
            return tbl

        table = _chunk(table, g0=0)   # vmax >= 1 always (live tiles)
        for g0 in range(8, QUERY_WIDTH, 8):
            table = lax.cond(g0 < vmax,
                             functools.partial(_chunk, g0=g0),
                             lambda t: t, table)
        table_ref[:, :] = table

    vlen = vlen_ref[0, :]
    n_u = vlen.astype(jnp.uint32)
    full = jnp.uint32(0xFFFFFFFF)
    mask_n = jnp.where(
        vlen >= 32, full,
        (jnp.uint32(1) << jnp.minimum(n_u, jnp.uint32(31)))
        - jnp.uint32(1))
    high_bit = jnp.uint32(1) << jnp.minimum(
        n_u - jnp.uint32(1), jnp.uint32(31))

    m = qlen_ref[row, 0]
    pv0 = mask_n
    mv0 = jnp.zeros((blk,), jnp.uint32)
    score0 = vlen

    def _step(state, *, i):
        pv, mv, score = state
        # Dynamic single-row read of the char table by the query byte.
        eq = table_ref[pl.ds(q_ref[row, i], 1), :][0]
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | ~(xh | pv)
        mh = pv & xh
        inc = ((ph & high_bit) != 0).astype(jnp.int32)
        dec = ((mh & high_bit) != 0).astype(jnp.int32)
        score = score + inc - dec
        ph = (ph << 1) | jnp.uint32(1)
        mh = mh << 1
        pv = (mh | ~(xv | ph)) & mask_n
        mv = (ph & xv) & mask_n
        return (pv, mv, score)

    state = (pv0, mv0, score0)
    for i in range(QUERY_WIDTH):
        state = lax.cond(i < m,
                         functools.partial(_step, i=i),
                         lambda s: s, state)
    out_ref[pl.ds(row, 1), :] = state[2][None, :]


# Terms per tile for the transposed kernel: the 256-row char table is
# the VMEM budget driver (256 x BLK x 4 B = 4 MB at 4096).
BLOCK_TERMS_REV = 4096


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def myers_rev_distances_pallas_batch(
    vocab_t: jax.Array,    # uint8[32, T_pad] position-major
    vocab_len: jax.Array,  # int32[1, T_pad]
    q_bytes: jax.Array,    # int32[M, 32]
    q_len: jax.Array,      # int32[M, 1]
    *,
    interpret: bool = False,
    block: int | None = None,
):
    """int32[M, T_pad]: transposed-Myers batch distances (exact twin
    of myers_distances_pallas_batch; see _myers_rev_kernel_batch)."""
    m_q = q_bytes.shape[0]
    t_pad = vocab_t.shape[1]
    blk = min(block or BLOCK_TERMS_REV, t_pad)
    assert t_pad % blk == 0, \
        f"vocab pad {t_pad} not divisible by block {blk}"
    grid = (t_pad // blk, m_q)
    return pl.pallas_call(
        _myers_rev_kernel_batch,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_q, QUERY_WIDTH), lambda i, m: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m_q, 1), lambda i, m: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((QUERY_WIDTH, blk), lambda i, m: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i, m: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_q, blk), lambda i, m: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_q, t_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((256, blk), jnp.uint32)],
        interpret=interpret,
    )(q_bytes, q_len, vocab_t, vocab_len)


@functools.partial(jax.jit, static_argnames=("interpret",))
def myers_distances_pallas(
    vocab_t: jax.Array,    # uint8[32, T_pad] position-major, T_pad % BLK == 0
    vocab_len: jax.Array,  # int32[1, T_pad]
    q_bytes: jax.Array,    # int32[1, 32]
    q_len: jax.Array,      # int32[1, 1]
    *,
    interpret: bool = False,
):
    """int32[1, T_pad] exact Levenshtein distances."""
    t_pad = vocab_t.shape[1]
    blk = min(BLOCK_TERMS, t_pad)
    assert t_pad % blk == 0, \
        f"vocab pad {t_pad} not divisible by block {blk}"
    grid = (t_pad // blk,)
    return pl.pallas_call(
        _myers_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, QUERY_WIDTH), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((QUERY_WIDTH, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, t_pad), jnp.int32),
        interpret=interpret,
    )(q_bytes, q_len, vocab_t, vocab_len)


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def myers_distances_pallas_batch(
    vocab_t: jax.Array,    # uint8[32, T_pad] position-major
    vocab_len: jax.Array,  # int32[1, T_pad]
    q_bytes: jax.Array,    # int32[M, 32]
    q_len: jax.Array,      # int32[M, 1]
    *,
    interpret: bool = False,
    block: int | None = None,
):
    """int32[M, T_pad]: distances of M queries to every vocab term.

    Same kernel body as the single-query call; the grid's inner axis
    iterates queries with the vocab tile's index map held constant, so
    Pallas keeps the [32, BLK] tile resident in VMEM across all M
    queries -- the vocabulary is read from HBM once per *batch*, not
    once per query.  The jnp batch path (ops/levenshtein.
    fuzzy_best_batch) materializes a [M, T, 32] u32 Peq matrix in HBM
    (1 GB at M=8, T=1M), capping its chunk size at 8; this kernel's
    state is [BLK] vectors, so M=64 chunks are free.
    """
    m_q = q_bytes.shape[0]
    t_pad = vocab_t.shape[1]
    blk = min(block or BLOCK_TERMS, t_pad)
    assert t_pad % blk == 0, \
        f"vocab pad {t_pad} not divisible by block {blk}"
    grid = (t_pad // blk, m_q)
    return pl.pallas_call(
        _myers_kernel_batch,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_q, QUERY_WIDTH), lambda i, m: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m_q, 1), lambda i, m: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((QUERY_WIDTH, blk), lambda i, m: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i, m: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_q, blk), lambda i, m: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_q, t_pad), jnp.int32),
        interpret=interpret,
    )(q_bytes, q_len, vocab_t, vocab_len)
