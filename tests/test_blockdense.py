"""Blockdense (Pallas) executor parity with the XLA executors.

The block-accumulation kernel is the accelerator exact path; on CPU it
runs in interpret mode here and must match the candidate executor
bit-for-bit on matched docs (1e-5) across random CSR snapshots,
boolean programs, alive bitmaps, and both ranking algorithms.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from nxsearch_tpu.ops.boolean import (EMPTY_LEAF_BIT, OP_AND, OP_ANDNOT,
                                      OP_OR, OP_PUSH)
from nxsearch_tpu.ops.executor import (device_search,
                                       device_search_blockdense)


# Real kernels on accelerators, interpret mode on CPU: the on-TPU test
# lane (tools/tpu_tests.sh) re-runs these against actual Mosaic
# lowering and hardware numerics (denormal flushes etc.).
import jax as _jax

INTERPRET = _jax.devices()[0].platform == "cpu"


def make_index(rng, n_slots=2048, n_terms=6):
    lens = [rng.randint(0, 900) for _ in range(n_terms)]
    pos = 0
    starts = []
    p_pad = 8192
    ps = np.zeros(p_pad, np.int32)
    pf = np.zeros(p_pad, np.float32)
    for L in lens:
        starts.append(pos)
        sl = np.sort(np.random.default_rng(rng.randint(0, 1 << 30))
                     .choice(n_slots, size=L, replace=False))
        ps[pos: pos + L] = sl
        pf[pos: pos + L] = np.log(
            np.random.default_rng(rng.randint(0, 1 << 30))
            .integers(1, 6, L) + 1.0)
        pos += L
    dlen = np.random.default_rng(7).integers(5, 60, n_slots) \
        .astype(np.float32)
    alive = np.ones(n_slots, bool)
    alive[rng.randint(0, n_slots - 1)] = False
    amask = np.packbits(alive, bitorder="little").view(np.uint32)
    q_pad = 8
    qs = np.zeros(q_pad, np.int32)
    ql = np.zeros(q_pad, np.int32)
    qi = np.zeros(q_pad, np.float32)
    qs[:n_terms] = starts
    ql[:n_terms] = lens
    qi[:n_terms] = [0.3 + 0.2 * i for i in range(n_terms)]
    return (jnp.asarray(ps), jnp.asarray(pf), jnp.asarray(dlen),
            jnp.asarray(amask), jnp.asarray(qs), jnp.asarray(ql),
            jnp.asarray(qi))


PROGRAMS = [
    (False, [(OP_PUSH, 0)]),                          # dummy (pure OR)
    (True, [(OP_PUSH, 0), (OP_PUSH, 1), (OP_AND, 0)]),
    (True, [(OP_PUSH, 0), (OP_PUSH, 1), (OP_ANDNOT, 0)]),
    (True, [(OP_PUSH, 0), (OP_PUSH, 2), (OP_OR, 0),
            (OP_PUSH, 1), (OP_AND, 0)]),
    (True, [(OP_PUSH, 0), (OP_PUSH, EMPTY_LEAF_BIT), (OP_ANDNOT, 0)]),
]


@pytest.mark.parametrize("algo", [0, 1])
@pytest.mark.parametrize("prog_i", range(len(PROGRAMS)))
def test_blockdense_matches_candidate(algo, prog_i):
    rng = random.Random(41 + prog_i)
    ps, pf, dlen, amask, qs, ql, qi = make_index(rng)
    use_mask, prog = PROGRAMS[prog_i]
    ops = np.zeros(16, np.int32)
    args = np.zeros(16, np.int32)
    for j, (o, a) in enumerate(prog):
        ops[j], args[j] = o, a
    adl = jnp.float32(30.0)

    ref_scores, ref_slots = device_search(
        ps, pf, dlen, amask, qs, ql, qi, adl,
        jnp.asarray(ops), jnp.asarray(args),
        budget=8192, k=64, algo=algo, use_mask=use_mask, depth=4)
    got_scores, got_slots = device_search_blockdense(
        ps, pf, dlen, amask, qs, ql, qi, adl,
        jnp.asarray(ops), jnp.asarray(args),
        k=64, algo=algo, n_slots=2048, use_mask=use_mask, depth=4,
        interpret=INTERPRET)

    ref = {int(s): float(v) for v, s in
           zip(np.asarray(ref_scores), np.asarray(ref_slots)) if v > 0}
    got = {int(s): float(v) for v, s in
           zip(np.asarray(got_scores), np.asarray(got_slots)) if v > 0}
    # Same matched docs in the top-64 and same scores.
    common = set(ref) & set(got)
    assert len(common) >= min(len(ref), len(got)) - 2  # tie-edge docs
    for slot in common:
        assert got[slot] == pytest.approx(ref[slot], abs=1e-5), slot


def test_blockdense_wide_query_groups():
    """>8 terms run the kernel per 8-term group; sums must match."""
    rng = random.Random(5)
    ps, pf, dlen, amask, qs8, ql8, qi8 = make_index(rng, n_terms=6)
    # Build a 16-wide query: the same 6 terms + 10 empty rows.
    qs = np.zeros(16, np.int32)
    ql = np.zeros(16, np.int32)
    qi = np.zeros(16, np.float32)
    qs[:8] = np.asarray(qs8)
    ql[:8] = np.asarray(ql8)
    qi[:8] = np.asarray(qi8)
    ops = np.zeros(16, np.int32)
    args = np.zeros(16, np.int32)
    adl = jnp.float32(30.0)
    ref_scores, ref_slots = device_search(
        ps, pf, dlen, amask, jnp.asarray(qs8), jnp.asarray(ql8),
        jnp.asarray(qi8), adl, jnp.asarray(ops), jnp.asarray(args),
        budget=8192, k=32, algo=0, use_mask=False, depth=4)
    got_scores, got_slots = device_search_blockdense(
        ps, pf, dlen, amask, jnp.asarray(qs), jnp.asarray(ql),
        jnp.asarray(qi), adl, jnp.asarray(ops), jnp.asarray(args),
        k=32, algo=0, n_slots=2048, use_mask=False, depth=4,
        interpret=INTERPRET)
    ref = {int(s): float(v) for v, s in
           zip(np.asarray(ref_scores), np.asarray(ref_slots)) if v > 0}
    got = {int(s): float(v) for v, s in
           zip(np.asarray(got_scores), np.asarray(got_slots)) if v > 0}
    for slot in set(ref) & set(got):
        assert got[slot] == pytest.approx(ref[slot], abs=1e-5)


@pytest.mark.parametrize("algo", [0, 1])
@pytest.mark.parametrize("use_mask", [False, True])
def test_dense_rows_match_kernel(algo, use_mask):
    """Heavy terms scored via precomputed dense ltf rows must produce
    exactly the kernel's scores (same values, same formula)."""
    rng = random.Random(99)
    ps, pf, dlen, amask, qs, ql, qi = make_index(rng, n_terms=4)
    n_slots = 2048
    # Build dense rows for terms 0 and 2 from the same CSR data.
    rows = np.zeros((2, n_slots), np.float32)
    for h, t in enumerate((0, 2)):
        lo, ln = int(np.asarray(qs)[t]), int(np.asarray(ql)[t])
        rows[h, np.asarray(ps)[lo: lo + ln]] = np.asarray(pf)[lo: lo + ln]
    d_qpos = np.array([0, 2, -1, -1], np.int32)
    d_row = np.array([0, 1, -1, -1], np.int32)
    ops = np.zeros(16, np.int32)
    args = np.zeros(16, np.int32)
    if use_mask:
        from nxsearch_tpu.ops.boolean import OP_AND, OP_PUSH
        for j, (o, a) in enumerate([(OP_PUSH, 0), (OP_PUSH, 1),
                                    (OP_AND, 0)]):
            ops[j], args[j] = o, a
    adl = jnp.float32(30.0)

    ref_s, ref_sl = device_search_blockdense(
        ps, pf, dlen, amask, qs, ql, qi, adl,
        jnp.asarray(ops), jnp.asarray(args),
        k=64, algo=algo, n_slots=n_slots, use_mask=use_mask, depth=4,
        interpret=INTERPRET)
    got_s, got_sl = device_search_blockdense(
        ps, pf, dlen, amask, qs, ql, qi, adl,
        jnp.asarray(ops), jnp.asarray(args),
        jnp.asarray(rows), jnp.asarray(d_qpos), jnp.asarray(d_row),
        k=64, algo=algo, n_slots=n_slots, use_mask=use_mask, depth=4,
        interpret=INTERPRET, use_rows=True)
    ref = {int(s): float(v) for v, s in
           zip(np.asarray(ref_s), np.asarray(ref_sl)) if v > 0}
    got = {int(s): float(v) for v, s in
           zip(np.asarray(got_s), np.asarray(got_sl)) if v > 0}
    common = set(ref) & set(got)
    assert len(common) >= min(len(ref), len(got)) - 2
    for slot in common:
        assert got[slot] == pytest.approx(ref[slot], abs=1e-5), slot


def test_cached_bounds_matches_ranges():
    """The per-term bounds-cache path must equal the in-jit binary
    search path, including dense-handled terms collapsing to the zero
    row."""
    import jax

    from nxsearch_tpu.ops.executor import (
        device_search_blockdense_cached, unpack_blockdense)
    from nxsearch_tpu.ops.pallas.segsum import csr_block_bounds

    rng = random.Random(7)
    ps, pf, dlen, amask, qs, ql, qi = make_index(rng, n_terms=4)
    n_slots, n_blocks = 2048, 2
    ops = np.zeros(16, np.int32)
    args = np.zeros(16, np.int32)
    adl = jnp.float32(30.0)

    ref_s, ref_sl = device_search_blockdense(
        ps, pf, dlen, amask, qs, ql, qi, adl,
        jnp.asarray(ops), jnp.asarray(args),
        k=64, algo=0, n_slots=n_slots, use_mask=False, depth=4,
        interpret=INTERPRET)

    # Build a little bounds cache: row 0 zero, rows 1..4 per term.
    cache = np.zeros((8, n_blocks + 1), np.int32)
    rows = np.asarray(csr_block_bounds(ps, qs[:4], ql[:4],
                                       n_blocks=n_blocks))
    cache[1:5] = rows
    q_crow = np.array([1, 2, 3, 4, 0, 0, 0, 0], np.int32)
    d_qpos = np.full(4, -1, np.int32)
    d_row = np.full(4, -1, np.int32)
    packed = device_search_blockdense_cached(
        ps, pf, dlen, amask, jnp.asarray(cache),
        jnp.asarray(q_crow[None]), qi[None], adl,
        jnp.asarray(ops[None]), jnp.asarray(args[None]),
        jnp.zeros((1, n_slots), jnp.float32),
        jnp.asarray(d_qpos[None]), jnp.asarray(d_row[None]),
        k=64, algo=0, n_slots=n_slots, use_mask=False, depth=4,
        interpret=INTERPRET)
    got_s, got_sl = unpack_blockdense(packed)
    ref = {int(s): float(v) for v, s in
           zip(np.asarray(ref_s), np.asarray(ref_sl)) if v > 0}
    got = {int(s): float(v) for v, s in
           zip(got_s[0], got_sl[0]) if v > 0}
    assert got == pytest.approx(ref, abs=1e-6)


def test_bounds_crows_cache():
    """DeviceIndex bounds cache: hits, misses, zero-row for delta
    terms, invalidation on rebuild."""
    import tempfile

    from nxsearch_tpu.index.device import DeviceIndex
    from nxsearch_tpu.index.hostindex import HostIndex
    from nxsearch_tpu.text.tokenizer import TOKENSET_STAGE, TokenSet

    def add(host, doc_id, words):
        ts = TokenSet()
        for wd in words:
            ts.add(wd)
        ts.resolve(host.term_lookup, TOKENSET_STAGE)
        host.terms_add(ts)
        host.dtmap_add(doc_id, ts)

    with tempfile.TemporaryDirectory() as d:
        host = HostIndex(d)
        add(host, 1, ["aa", "bb", "cc"])
        add(host, 2, ["aa", "dd"])
        dev = DeviceIndex(host)
        dev.refresh()
        t_aa = host.term_lookup("aa")
        t_bb = host.term_lookup("bb")
        m1 = dev.bounds_crows([t_aa, t_bb, t_aa])
        assert m1[t_aa] != 0 and m1[t_bb] != 0
        assert m1[t_aa] != m1[t_bb]
        m2 = dev.bounds_crows([t_aa])
        assert m2[t_aa] == m1[t_aa]  # cache hit, same row
        # Delta-born term: no base postings -> zero row.
        add(host, 3, ["zz"])
        t_zz = host.term_lookup("zz")
        assert dev.bounds_crows([t_zz])[t_zz] == 0
        # Rebuild invalidates.
        dev._full_rebuild()
        assert dev._bounds_map is None
        m3 = dev.bounds_crows([t_zz])
        assert m3[t_zz] != 0  # now has base postings
        host.close()
