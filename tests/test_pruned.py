"""Block-max pruned executor: exactness and parity with the full sweep.

The pruned path scores only the top-n_sel slot blocks by score bound
and flags whether the result is provably exact.  Invariants tested
here (interpret-mode Pallas on CPU):

- Whenever the exactness flag is set, the positive results equal the
  full blockdense sweep's bit-for-bit (same slots, same scores).
- When every occupied block is selected, the flag is always set.
- The flag correctly refuses to certify when strong candidates remain
  outside the selected blocks (fallback trigger).
- Boolean programs and alive bitmaps behave identically to the full
  sweep.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nxsearch_tpu.index.device import block_bounds_metadata
from nxsearch_tpu.ops.boolean import OP_AND, OP_ANDNOT, OP_PUSH
from nxsearch_tpu.ops.executor import (device_search_blockdense,
                                       device_search_pruned_batch,
                                       unpack_pruned)
from nxsearch_tpu.ops.pallas.segsum import BLOCK_SLOTS

# Real kernels on accelerators, interpret mode on CPU: the on-TPU test
# lane (tools/tpu_tests.sh) re-runs these against actual Mosaic
# lowering and hardware numerics (denormal flushes etc.).
import jax as _jax

INTERPRET = _jax.devices()[0].platform == "cpu"


ADL = 30.0
ADL_CAP = ADL * 1.25


def make_index(seed, n_slots=16 * BLOCK_SLOTS, n_terms=4,
               df=2000, hot_block=None, n_dead=3, occupy_blocks=None):
    """Random CSR over n_slots.  With hot_block set, that block gets
    125 short documents containing ALL query terms at high tf -- the
    kind of multi-term co-occurrence block-max bounds can isolate
    (BM25's tf saturation makes single-term tf spikes undiscriminating
    at block granularity)."""
    rng = np.random.default_rng(seed)
    p_pad = 1 << 17
    ps = np.zeros(p_pad, np.int32)
    tf = np.zeros(p_pad, np.float64)
    dlen = rng.integers(20, 60, n_slots).astype(np.float32)
    hot_slots = None
    if hot_block is not None:
        hot_slots = hot_block * BLOCK_SLOTS + np.sort(
            rng.choice(BLOCK_SLOTS, size=125, replace=False))
        dlen[hot_slots] = 6.0
    starts = [0]
    pos = 0
    draw_slots = n_slots if occupy_blocks is None \
        else occupy_blocks * BLOCK_SLOTS
    for t in range(n_terms):
        sl = np.sort(rng.choice(draw_slots, size=df, replace=False))
        tfs = rng.integers(1, 4, df).astype(np.float64)
        if hot_slots is not None:
            sl = np.unique(np.concatenate([sl, hot_slots]))
            tfs = rng.integers(1, 4, len(sl)).astype(np.float64)
            tfs[np.isin(sl, hot_slots)] = 30
        ps[pos: pos + len(sl)] = sl
        tf[pos: pos + len(sl)] = tfs
        pos += len(sl)
        starts.append(pos)
    ltf = np.zeros(p_pad, np.float32)
    ltf[:pos] = np.log(tf[:pos] + 1.0)
    alive = np.ones(n_slots, bool)
    if n_dead:
        alive[rng.choice(n_slots, size=n_dead, replace=False)] = False
    amask = np.packbits(alive, bitorder="little").view(np.uint32)
    bmax_ltf, bmax_bm25 = block_bounds_metadata(
        np.asarray(starts, np.int64), ps[:pos], ltf, dlen,
        n_slots, p_pad, ADL_CAP)
    q_pad = 8
    qs = np.zeros(q_pad, np.int32)
    ql = np.zeros(q_pad, np.int32)
    qi = np.zeros(q_pad, np.float32)
    qs[:n_terms] = starts[:-1]
    ql[:n_terms] = np.diff(starts)
    qi[:n_terms] = 0.4 + 0.2 * np.arange(n_terms)
    return dict(ps=jnp.asarray(ps), ltf=jnp.asarray(ltf),
                dlen=jnp.asarray(dlen), amask=jnp.asarray(amask),
                bmax_ltf=jnp.asarray(bmax_ltf),
                bmax_bm25=jnp.asarray(bmax_bm25),
                qs=qs, ql=ql, qi=qi, n_slots=n_slots)


def run_both(ix, *, n_sel, k=32, algo=0, use_mask=False, prog=None):
    ops = np.zeros(16, np.int32)
    args = np.zeros(16, np.int32)
    if prog:
        for j, (o, a) in enumerate(prog):
            ops[j], args[j] = o, a
    adl = jnp.float32(ADL)
    bound = ix["bmax_bm25"] if algo == 0 else ix["bmax_ltf"]
    packed = device_search_pruned_batch(
        ix["ps"], ix["ltf"], ix["dlen"], ix["amask"], bound,
        jnp.asarray(ix["qs"][None]), jnp.asarray(ix["ql"][None]),
        jnp.asarray(ix["qi"][None]), adl,
        jnp.asarray(ops[None]), jnp.asarray(args[None]),
        k=k, algo=algo, n_slots=ix["n_slots"], n_sel=n_sel,
        use_mask=use_mask, depth=4, interpret=INTERPRET)
    p_scores, p_slots, exact = unpack_pruned(packed)
    f_scores, f_slots = device_search_blockdense(
        ix["ps"], ix["ltf"], ix["dlen"], ix["amask"],
        jnp.asarray(ix["qs"]), jnp.asarray(ix["ql"]),
        jnp.asarray(ix["qi"]), adl,
        jnp.asarray(ops), jnp.asarray(args),
        k=k, algo=algo, n_slots=ix["n_slots"], use_mask=use_mask,
        depth=4, interpret=INTERPRET)
    return ((p_scores[0], p_slots[0], bool(exact[0])),
            (np.asarray(f_scores), np.asarray(f_slots)))


def as_map(scores, slots):
    return {int(s): float(v) for v, s in zip(scores, slots) if v > 0}


def assert_topk_equal(got: dict, ref: dict, k: int):
    """Same positive results modulo tie order at the k-th score (both
    lax.top_k and the reference's capped min-heap break score ties by
    traversal order)."""
    gs = sorted(got.values(), reverse=True)
    rs = sorted(ref.values(), reverse=True)
    np.testing.assert_allclose(gs, rs, atol=1e-6)
    kth = rs[-1] if len(rs) == k else 0.0
    for slot, v in ref.items():
        if v > kth + 1e-6:
            assert slot in got, (slot, v)
            assert got[slot] == pytest.approx(v, abs=1e-6)


@pytest.mark.parametrize("algo", [0, 1])
def test_pruned_certified_matches_full(algo):
    """Co-occurring hot block -> pruning certifies at n_sel=4; results
    must equal the full sweep exactly."""
    ix = make_index(11, hot_block=5)
    (ps, psl, exact), (fs, fsl) = run_both(ix, n_sel=4, k=16, algo=algo)
    assert exact, "co-occurrence-skewed index must certify at n_sel=4"
    got, ref = as_map(ps, psl), as_map(fs, fsl)
    # Same top-k membership above the k-th full score (tie edge aside)
    kth = sorted(ref.values())[0] if len(ref) == 16 else 0.0
    for slot, v in ref.items():
        if v > kth:
            assert slot in got, (slot, v)
            assert got[slot] == pytest.approx(v, abs=1e-6)


def test_pruned_all_blocks_selected_always_exact():
    """n_sel >= occupied blocks: flag must be set and results equal."""
    ix = make_index(12, n_slots=16 * BLOCK_SLOTS, occupy_blocks=12)
    (ps, psl, exact), (fs, fsl) = run_both(ix, n_sel=15, k=32)
    assert exact
    assert_topk_equal(as_map(ps, psl), as_map(fs, fsl), 32)


def test_pruned_refuses_uniform_scores():
    """Uniform tf/dl + deep k: bounds cannot separate blocks, so the
    executor must NOT claim exactness (the router then falls back)."""
    n_slots = 32 * BLOCK_SLOTS
    ix = make_index(13, n_slots=n_slots, df=8000, n_dead=0)
    # Force uniformity: constant tf and dl everywhere.
    ps = np.asarray(ix["ps"])
    ltf = np.where(np.asarray(ix["ltf"]) > 0, np.float32(np.log(2.0)),
                   np.float32(0))
    dlen = np.full(n_slots, 30.0, np.float32)
    starts = np.asarray([0, 8000, 16000, 24000, 32000], np.int64)
    bmax_ltf, bmax_bm25 = block_bounds_metadata(
        starts, ps[:32000], ltf, dlen, n_slots, len(ps), ADL_CAP)
    ix.update(ltf=jnp.asarray(ltf), dlen=jnp.asarray(dlen),
              bmax_ltf=jnp.asarray(bmax_ltf),
              bmax_bm25=jnp.asarray(bmax_bm25))
    (s, sl, exact), _ = run_both(ix, n_sel=4, k=128)
    assert not exact


@pytest.mark.parametrize("prog,use_mask", [
    ([(OP_PUSH, 0), (OP_PUSH, 1), (OP_AND, 0)], True),
    ([(OP_PUSH, 0), (OP_PUSH, 1), (OP_ANDNOT, 0)], True),
])
def test_pruned_boolean_programs(prog, use_mask):
    ix = make_index(14, hot_block=2, occupy_blocks=12)
    (ps, psl, exact), (fs, fsl) = run_both(
        ix, n_sel=15, k=32, use_mask=use_mask, prog=prog)
    assert exact  # every occupied block selected
    assert_topk_equal(as_map(ps, psl), as_map(fs, fsl), 32)


def test_pruned_respects_alive_mask():
    """Dead docs never appear, and bounds (computed pre-removal)
    remain safe: flag only certifies true results."""
    ix = make_index(15, hot_block=7, n_dead=0, occupy_blocks=12)
    # Kill the entire hot block after metadata was built.
    alive = np.ones(ix["n_slots"], bool)
    alive[7 * BLOCK_SLOTS: 8 * BLOCK_SLOTS] = False
    ix["amask"] = jnp.asarray(
        np.packbits(alive, bitorder="little").view(np.uint32))
    (ps, psl, exact), (fs, fsl) = run_both(ix, n_sel=15, k=16)
    assert exact
    for slot in as_map(ps, psl):
        assert not (7 * BLOCK_SLOTS <= slot < 8 * BLOCK_SLOTS)
    got, ref = as_map(ps, psl), as_map(fs, fsl)
    kth = min(ref.values()) if len(ref) == 16 else 0.0
    for slot, v in ref.items():
        if v > kth:
            assert got[slot] == pytest.approx(v, abs=1e-6)
