"""Search orchestration: parse -> prepare -> device execute -> response.

The host-side half of nxs_index_search (src/query/search.c:285-342):
parameter handling (limit default 1000, algo override, fuzzymatch
default on, search.c:78-112), journal sync before the query
(search.c:309-310), query construction, and response assembly.  The
doc×term scoring loop itself runs on device (ops/executor.py).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .errors import ErrorCode, NxsError
from .index.device import DeviceIndex
from .ops.boolean import (EMPTY_LEAF_BIT, QUERY_NESTING_LIMIT,
                          check_nesting, compile_program)
from .ops.executor import (device_search, device_search_blockdense,
                           device_search_dense)
from .ops.scoring import ALGO_BM25, ALGO_TFIDF, host_idf
from .params import DEFAULT_RESULTS_LIMIT, Params

# Beyond 32 unique query terms the presence-bits boolean evaluation
# does not fit a uint32; such queries use the dense packed-bitmap path.
MAX_BITS_TERMS = 32
from .query.ast import EXPR_OP_OR, EXPR_VAL_TOKEN, Expr
from .query.parser import parse_query
from .query.prepare import Query, prepare
from .resp import Response
from .text.tokenizer import Token

# Shared AST stand-in for batched fast-path queries (pure implicit-OR
# term lists resolve without an Expr tree; a lone leaf is trivially
# pure-OR for any walker that does look).
_PURE_OR_ROOT = Expr.leaf("<batched-pure-or>")

_ALGO_BY_NAME = {"BM25": ALGO_BM25, "TF-IDF": ALGO_TFIDF}

# Executor-path counters (observability; reset freely).  Keys:
# prefix / prefix_exact / prefix_fallback / sliced / full / dense /
# candidate count QUERIES routed through each path.
EXEC_STATS: dict[str, int] = {}


def _count(key: str, n: int = 1) -> None:
    EXEC_STATS[key] = EXEC_STATS.get(key, 0) + n


_MAX_DENSE_PER_QUERY = 4

# Static bucket floors; shapes are rounded up to powers of two so XLA
# executables are shared across queries of similar size.
_MIN_BUDGET = 1024
_MIN_TERMS = 8
_MIN_K = 16
_MIN_PROG = 16
_MIN_DEPTH = 4
# Head-term extraction thresholds (sliced path): a CSR term with df at
# or above this leaves the sort plane for the searchsorted/top_k merge.
# DISABLED by default after hardware profiling (r3): the merge's
# batched binary search -- every sort-plane lane searched into the
# head slice, log2(T_head) dependent gathers each -- measured
# ~33 ms/query at T_head = 2**20 on v5e, 93% of the whole batch's
# device time, where simply sorting the same postings in the windowed
# plane costs ~2 ms/query worst-case.  The thresholds remain
# monkeypatchable (tests) and env-tunable for non-tunneled setups.
_HEAD_MIN_DF = int(os.environ.get("NXS_HEAD_MIN_DF", str(1 << 30)))
# Two-term queries: extracting the bigger term as the head leaves ONE
# logical term in the plane, which skips the sort entirely (sliced_topk
# n_logical == 1).  Same measured verdict: off by default.
_HEAD_MIN_DF_PAIR = int(os.environ.get("NXS_HEAD_MIN_DF_PAIR",
                                       str(1 << 30)))


@dataclass
class SearchParams:
    """Resolved per-query parameters (search_params_t, search.c:71-76)."""
    limit: int
    algo: int
    fuzzymatch: bool


def get_search_params(default_algo: int, params: Params | None) -> SearchParams:
    sp = SearchParams(limit=DEFAULT_RESULTS_LIMIT, algo=default_algo,
                      fuzzymatch=True)
    if params is None:
        return sp
    # A wrong-typed limit is ignored, matching nxs_params_get_uint's
    # failure being ignored (search.c:96); an explicit 0 or oversized
    # value is an error (search.c:96-101).
    limit = params.get_uint("limit")
    if limit is not None:
        if limit == 0 or limit > 0xFFFFFFFF:
            raise NxsError(ErrorCode.INVALID, "invalid limit")
        sp.limit = limit
    algo_name = params.get_str("algo")
    if algo_name is not None:
        if algo_name not in _ALGO_BY_NAME:
            raise NxsError(ErrorCode.INVALID, "invalid algorithm")
        sp.algo = _ALGO_BY_NAME[algo_name]
    fl = params.get_bool("fuzzymatch")
    if fl is not None:
        sp.fuzzymatch = fl
    return sp


def _bucket(n: int, minimum: int, shift: int = 1) -> int:
    """Round up to the bucket grid: minimum * (2**shift)**i.

    Coarse grids (shift > 1) trade some wasted device work for far
    fewer distinct executable signatures -- which matters both for
    compile count and for batched execution, where every distinct
    signature is a separate device dispatch.
    """
    size = minimum
    while size < n:
        size <<= shift
    return size


def _slice_tier(n: int, cap: int) -> int:
    """Sort-plane slice tier: coarse 512 * 8**i grid with the
    SLICE_MAX_T cap tier folded in.  Every dispatched group costs a
    host round trip (plan uploads + launch), so tier count directly
    multiplies per-batch dispatch overhead; the chip-side overfetch of
    a <=8x-too-wide plane is cheaper than one extra round trip per
    batch (measured ~12 ms/group through the tunnel, r2).

    ``cap`` is the index's slice_t_cap: the widest window its pack
    guard rows allow.  cap >= every sliceable df, so the clamp never
    shrinks a tier below the plane's widest term."""
    t = 512
    while t < n:
        t <<= 3
    if n <= DeviceIndex.SLICE_MAX_T:
        return min(t, DeviceIndex.SLICE_MAX_T, cap)
    return t    # over the cap: the router rejects the sliced path


def _head_tier(n: int, cap: int) -> int:
    """Head-slice tier: two tiers only.  The head plane skips the sort
    (top_k + searchsorted merge), so padding is ~0.1 ns/lane -- coarse
    tiers are nearly free and keep the signature space tiny."""
    return min(65536 if n <= 65536 else DeviceIndex.SLICE_MAX_T, cap)


# Windowed sliced plans: fixed sort-plane window width.  A term wider
# than this splits into ceil(df/T0) columns, so the sort plane holds
# ~df lanes instead of a power-of-8 tier pad (up to ~8x fewer lanes at
# ~3.6 ns/lane), while ONE width covers every df -- fewer executable
# signatures than the tier grid it replaces.
_WINDOW_T = int(os.environ.get("NXS_WINDOW_T", "1024"))
# Column cap: wider queries (> _WINDOW_MAX_COLS * T0 sliced postings)
# keep the legacy tiered plane / other executors.  32768 * T0=1024
# covers FOUR ~4.2M-df monster terms in one query (any realistic
# query of the 8.8M-doc tier, and then some), so wide-term rows stay
# on the sliced path: the alternative (blockdense) derives the
# 3.9 GB legacy slot/ltf columns on first use, which measured as THE
# trigger of RESOURCE_EXHAUSTED wedges next to the 6.3 GB pack (r4).
# A full-width row is ~33M sort-plane lanes (~130 ms) -- rare, row-
# padded from 1, and cheap against a 4 GB allocation spike.
_WINDOW_MAX_COLS = int(os.environ.get("NXS_WINDOW_MAX_COLS", "32768"))


def _window_t0(cap: int) -> int:
    """Window width, shrunk to what the pack's guard rows can absorb
    (window starts sit inside the real postings, so a read never
    extends more than T0 past n_postings)."""
    t = _WINDOW_T
    while t > cap and t > 1:
        t >>= 1
    return t


# Variable-width windows: per-ROW window width chosen from this rung
# ladder (clipped to the guard cap).  The plane cost of a dispatched
# row is (column tier) x (window width) lanes -- independent of how
# much of it is real postings -- and with a fixed T0 = 1024 the
# damped-Zipf mix pays mostly padding: a 3-term query whose terms
# window once each pads to the 8-column tier = 8192 sorted lanes for
# ~300 real postings.  Choosing the rung that minimizes the padded
# plane (a small-df row drops to 8 x 128 = 1024 lanes; a mid-df row
# to 64 x 256; wide rows keep T0) cuts the measured sort-plane budget
# severalfold while every window still covers its postings in full --
# exactness is untouched.  A smaller FIXED T0 was measured dead
# (r4 A/B: T0=512 shifted rows into wider column tiers); the per-row
# choice is what makes the diet pay.  Smaller widths are always safe
# against the pack guard (reads extend at most T <= T0 past a start
# inside the postings).
_T_LADDER_CFG = tuple(sorted(
    int(x) for x in os.environ.get("NXS_T_LADDER",
                                   "128,256,512,1024").split(",") if x))


def _t_ladder(T0: int) -> tuple:
    """Window-width rungs available under the guard cap T0 (ascending,
    always ending at T0 itself)."""
    return tuple(t for t in _T_LADDER_CFG if t < T0) + (T0,)


def _tier_cols(nw: np.ndarray) -> np.ndarray:
    """Column count a row with ``nw`` windows pads to after group
    coalescing: the _PF_TIERS tier grid for narrow planes, pow2
    beyond (wide fine groups)."""
    cost = _pow2ceil(np.maximum(nw, 1))
    for bound in reversed(_PF_TIERS):
        cost = np.where(nw <= bound, bound, cost)
    return np.where(nw == 0, 0, cost)


def _choose_T(ln_eff: np.ndarray, T0: int) -> np.ndarray:
    """Per-row window width: the ladder rung minimizing the padded
    plane lane count (tier columns x width).  Ties prefer the widest
    rung -- fewer columns, fewer signatures.  ``ln_eff`` is the
    [rows, terms] effective-length matrix (zeros for dead cells)."""
    ladder = _t_ladder(T0)
    ns = ln_eff.shape[0]
    big = np.int64(np.iinfo(np.int64).max)
    best_T = np.full(ns, ladder[-1], np.int64)
    best_cost = np.full(ns, big, np.int64)
    nw0 = None
    for T in ladder:                    # ascending: ties -> larger T
        nw = (-(-ln_eff // T)).sum(axis=1)
        cost = _tier_cols(nw) * T
        if T != ladder[-1]:
            # Sub-T0 rungs are only legal while the row stays within
            # the coalesce tiers: beyond 64 columns a row becomes a
            # WIDE-plane fine group whose (qs, T) signature tracks
            # content -- a narrow rung there minted fresh multi-second
            # executables mid-serving (measured: fuzzy batches with
            # 12-37 s dispatch stalls on ('pf', 256, 128) shapes).
            # The wide prewarm covers T0 shapes only.
            cost = np.where(nw <= _COALESCE_MAX_COLS, cost, big)
        better = cost <= best_cost
        best_T = np.where(better, T, best_T)
        best_cost = np.where(better, cost, best_cost)
        nw0 = nw                        # last iteration: nw at T0
    # Wide planes (beyond the last coalesce tier at T0) pin to T0:
    # their plane is ~df lanes at every rung (the tie rule resolves
    # there anyway), and the wide-signature AOT prewarm covers T0
    # shapes only.
    return np.where(nw0 > _COALESCE_MAX_COLS, ladder[-1], best_T)


# Column-pad floor: the plan-stats model shows sorted lanes at the
# 8.8M mix are dominated by padding (a 2-window query pads to 4
# columns = 16k lanes).  A floor of 2 halves those lanes at the cost
# of one extra signature group; tune on hardware via NXS_QS_MIN.
_QS_MIN = int(os.environ.get("NXS_QS_MIN", "2"))

# Impact-prefix pruned path (ops/executor.prefix_topk): rescored
# candidate count for R > 0 plans (the exactness certificate covers
# the top-k only when k <= M) and the per-query cap on wide terms
# (each costs a binary-search rescore pass; queries with more fall
# back to the classic plan).  _PREFIX_M is the floor rung; R > 0
# dispatches ladder M up to the requested limit (reference default
# limit is 1000, nxs_impl.h:39, so a stock caller must still route
# the fast path), and R = 0 plans are exact at ANY depth by
# construction -- their plane is complete -- so only the ladder top
# bounds them.
_PREFIX_M = 32
_PREFIX_M_RUNGS = (32, 128, 1024)
_PREFIX_LIMIT_MAX = _PREFIX_M_RUNGS[-1]


def _prefix_m(sp: "SearchParams", r: int) -> int:
    """Rescore depth for one prefix dispatch: R = 0 groups pass the
    floor (the complete-plane branch never reads M, and a varying
    static value would mint spurious executables); R > 0 groups take
    the ladder rung covering the requested limit, so the certificate
    covers every returned row."""
    if r == 0:
        return _PREFIX_M
    return _ladder(min(sp.limit, _PREFIX_LIMIT_MAX), _PREFIX_M_RUNGS)
# Wide terms in a prefix plan default OFF (r4 measurement: R > 0
# certification fires for 0-3% of rows at any rescore depth M --
# every near-tied plane doc is granted the whole missing tail, so
# the certificate structurally tracks kth + tail -- which made every
# wide-term row a pf dispatch + guaranteed serialized classic
# re-run).  Wide rows now plan classically up front and ride the
# MAIN launch wave; the R > 0 executor stays available for
# workloads where tails are small (NXS_PREFIX_MAX_WIDE=4).
_PREFIX_MAX_WIDE = int(os.environ.get("NXS_PREFIX_MAX_WIDE", "0"))


def _prefix_mode(dev, sp, sharded: bool) -> bool:
    """Scalar gate for impact-prefix plans: single chip, BM25 (the
    impacts are BM25 tf-parts), live adl equal to the adl the impacts
    were ordered under, and a limit the M-rescore ladder covers
    (R = 0 plans -- the default serving shape -- are exact at any
    depth; see _prefix_m)."""
    return (not sharded
            and getattr(dev, "prefix_ready", False)
            and sp.algo == ALGO_BM25
            and sp.limit <= _PREFIX_LIMIT_MAX
            and dev.adl == dev.adl_built
            and getattr(dev, "postings_pack", None) is not None
            and dev.n_slots < (1 << 24))


def _prefix_mode_sharded(dev, sp) -> bool:
    """Mesh twin of _prefix_mode.  Doc sharding needs no impact
    regions or adl pinning: each shard windows its own rows of every
    term IN FULL, so every sharded prefix plan is R = 0 (complete
    plane, exact by construction) -- the only gates are the scoring
    algo, the rescoreable limit, and f32 slot exactness per shard."""
    return (sp.algo == ALGO_BM25
            and sp.limit <= _PREFIX_LIMIT_MAX
            and getattr(dev, "postings_pack", None) is not None
            and dev.slots_per_shard < (1 << 24))
# Masked dense-row hybrid: route masked (AND/NOT) queries with
# dense-handled terms through the sliced hybrid instead of the
# blockdense kernel.  Exact either way (tests force both); ON by
# default since r4 -- not for speed but for memory: the blockdense
# route derives the 3.9 GB legacy slot/ltf columns and allocates
# O(rows x n_slots) dense workspace, which on the 8.8M-doc tier
# spikes past the free HBM beside the 6.3 GB pack (measured
# RESOURCE_EXHAUSTED; an exhaustion wedges the session).  The hybrid
# stays on the pack-only sliced plane.
_MASKED_HYBRID = os.environ.get("NXS_MASKED_HYBRID", "1") == "1"
# Cap on the summed plane-lane estimate of concurrently in-flight
# dispatch groups (each holds sort/plane workspace in HBM until it
# completes; the persistent snapshot already claims most of HBM on
# big corpora).  2**27 weighted lanes ~ 2-3 GB with sort copies --
# fits the v5e headroom beside the 8.8M-doc snapshot + dense rows
# (~6.7 GB).  The r4 cap of 2**26 equalled ONE wide group's weighted
# estimate, so admits serialized the whole submit phase behind device
# completion round trips (measured: dispatch ~340 ms/batch at ~16
# groups, each wait ~1 tunnel RTT).
_OUTSTANDING_ELEMS_CAP = int(
    os.environ.get("NXS_OUTSTANDING_ELEMS", str(1 << 28)))


class _InflightEntry:
    """One dispatched device group awaiting completion."""
    __slots__ = ("est", "arrays", "done")

    def __init__(self, est: int):
        self.est = est
        self.arrays = None     # set right after the async dispatch
        self.done = False


# Process-global in-flight dispatch registry.  Pipelined serving keeps
# several submits' device groups alive at once (batch i, its fallback
# sub-batch, batch i+1); bounding HBM pressure therefore needs ONE
# ledger across submits, not one per call (a per-submit ledger let an
# 8-batch pipelined run OOM the 8.8M-doc snapshot's leftover HBM, and
# a RESOURCE_EXHAUSTED on this backend permanently wedges the device
# -- prevention is the only recovery).  All state transitions happen
# under _INFLIGHT_LOCK: the REST service runs searches from multiple
# threads, and block_until_ready releases the GIL, so an unlocked
# check-then-act on ``done`` double-decrements the total (silently
# disabling the cap this ledger exists to enforce).
import threading as _threading

_INFLIGHT: list = []
_INFLIGHT_TOTAL = [0]
_INFLIGHT_LOCK = _threading.Lock()


def _entry_finish(ent: _InflightEntry) -> None:
    """Atomically retire one entry: idempotent done-transition that
    returns its reservation exactly once."""
    with _INFLIGHT_LOCK:
        if ent.done:
            return
        ent.done = True
        _INFLIGHT_TOTAL[0] -= ent.est
        try:
            _INFLIGHT.remove(ent)
        except ValueError:
            pass


def _entry_ready(ent: _InflightEntry) -> bool:
    """Non-blocking completion check for one in-flight entry."""
    if ent.arrays is None:
        return False
    try:
        return all(x.is_ready() for x in ent.arrays
                   if hasattr(x, "is_ready"))
    except Exception:
        return True          # deleted/poisoned: nothing left to hold


def _inflight_admit(est: int) -> _InflightEntry:
    """Reserve HBM headroom for one group dispatch.

    Under cap pressure, first retires every in-flight entry whose
    result is ALREADY computed (non-blocking is_ready sweep): with the
    submit-before-collect pipeline, the previous batch's groups are
    usually long done but still hold their reservation until collect
    runs -- blocking on them cost ~1 tunnel RTT each (~25 ms, measured
    240-380 ms/batch of admit stalls).  Only if the sweep frees
    nothing does this block on the OLDEST dispatch (launch order ==
    device execution order)."""
    import jax as _jax

    while True:
        with _INFLIGHT_LOCK:
            if _INFLIGHT_TOTAL[0] + est <= _OUTSTANDING_ELEMS_CAP \
                    or not _INFLIGHT:
                ent = _InflightEntry(est)
                _INFLIGHT.append(ent)
                _INFLIGHT_TOTAL[0] += est
                return ent
            candidates = list(_INFLIGHT)
        ready = [e for e in candidates if _entry_ready(e)]
        if ready:
            for e in ready:
                _entry_finish(e)
            continue
        with _INFLIGHT_LOCK:
            if not _INFLIGHT:
                continue
            oldest = _INFLIGHT[0]
        # Block outside the lock (waiting on an entry another thread
        # already finished is harmless -- the arrays are just ready);
        # the finally guarantees the reservation returns even when the
        # wait raises (a leaked est would tighten the cap forever).
        try:
            if oldest.arrays is not None:
                _jax.block_until_ready(
                    [x for x in oldest.arrays if hasattr(x, "device")])
        finally:
            _entry_finish(oldest)


def _inflight_release(entries) -> None:
    """Mark collected groups complete and return their reservation."""
    for ent in entries:
        _entry_finish(ent)


def _inflight_drain() -> None:
    """Block on every in-flight dispatch and return all reservations
    (the OOM-recovery path: free the chip before retrying)."""
    import jax as _jax

    while True:
        with _INFLIGHT_LOCK:
            if not _INFLIGHT:
                return
            ent = _INFLIGHT[0]
        if ent.arrays is not None:
            try:
                _jax.block_until_ready(
                    [x for x in ent.arrays if hasattr(x, "device")])
            except Exception:
                pass     # a poisoned result still frees on GC
        _entry_finish(ent)


def _dispatch_oom_retry(fn):
    """Run one group dispatch; on RESOURCE_EXHAUSTED drain the global
    in-flight ledger, collect garbage and retry with backoff.

    The tunneled backend's free HBM varies outside this process's
    control (pool staging / co-tenancy), and an unhandled exhaustion
    wedges the session permanently -- a drained retry is the only
    graceful degradation available."""
    import gc
    import time as _t

    attempts = 7
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e) \
                    or attempt == attempts - 1:
                raise
            _trace_logger().warning(
                "dispatch RESOURCE_EXHAUSTED; draining in-flight work "
                "and retrying (attempt %d)", attempt + 1)
            _inflight_drain()
            gc.collect()
            # Exhaustion on this backend is usually external (pool
            # co-tenancy) and clears on its own timescale: back off up
            # to ~30 s so a transient squeeze does not kill serving.
            _t.sleep(min(2.0 ** attempt, 30.0))


def _row_pad(n: int, qs: int = 0, T: int = 0, pf: bool = False) -> int:
    """Group row count -> padded row count on the configured grid.

    Wide-plane groups (qs > 64: the monster-term rows) pad on the
    {1, 8, 64} ladder, clamped so one dispatch stays under ~16M
    plane lanes: the row-8 floor multiplied a 1-row 0.1-8M-lane
    group's device work 8x, a full pow2 grid mints an executable per
    (plane, row-count) batch-mix (multi-second compiles
    mid-serving), and an unclamped ladder rung re-inflated chunked
    monster groups right past the chunk cap (2 rows re-padded to 8 =
    a ~5 GB dispatch; the r4 prewarm OOM).  Narrow prefix groups
    (``pf``) ladder onto {8, 64, 512, 2048}: variable-width windows
    split a batch over ~7 (tier, T) cells whose member counts track
    the query mix, so a pow2 grid would mint executables per batch --
    the laddered over-pad costs at most 8x of a CHEAP narrow plane.
    Other narrow groups keep the pow2 floor-8 grid.  ``T`` is the
    group's actual window width (the chunking cap's T can shrink
    below _WINDOW_T on small guard caps, so the lane clamp must use
    the same T as the chunker or a chunk can hold more members than
    the clamped pad)."""
    if qs > 64:
        # {1,2,4,8,64}: monster planes are the most expensive lanes
        # in the batch, and padding rows sort REAL lanes -- the r4
        # {1,8,64} ladder made a 1-row 2M-lane group sort 16M lanes
        # (8x pad), which dominated both the device time and the
        # in-flight HBM estimate (admit blocking ~220 ms/batch).  The
        # extra rungs cost a few more prewarmed executables.
        p = _ladder(n, (1, 2, 4, 8, 64))
        if p > 64:
            p = _bucket(n, 64)
        lane_cap = max(1, (1 << 24) // (qs * (T or _WINDOW_T)))
        # pad >= n always: the chunker is the source of truth for
        # group size; a pad below it would overflow the fill loops.
        return max(min(p, lane_cap), n)
    if pf:
        # 2x steps from 64 up: the pf cells carry hundreds of rows of
        # the batch's most-traveled planes, so a 4x rung step re-paid
        # a third of the lane diet in row padding (75 rows -> 512-row
        # pad on a 16k-lane/row cell, measured); below 64 rows the
        # cells are cheap and a single rung keeps signatures scarce.
        return _ladder(_bucket(n, 8),
                       (8, 64, 128, 256, 512, 1024, 2048))
    return _bucket(n, 8)


def _qs_pad(n: int) -> int:
    """Sliced-plane term-count pad: 1 keeps the sort-free single-term
    plane; everything else rounds to >= _QS_MIN (hardware A/B r2:
    floor 2 + window 1024 measured +21% batched QPS over floor 4 +
    window 4096 at the 1M tier -- padding lanes dominated the sort)."""
    if n <= 1:
        return 1
    p = _QS_MIN
    while p < n:
        p <<= 1
    return p


def _is_pure_or(expr: Expr) -> bool:
    """True if every operator in the tree is OR: the final bitmap is
    the plain union of the leaves, so no mask evaluation is needed."""
    stack = [expr]
    while stack:
        e = stack.pop()
        if e.type == EXPR_VAL_TOKEN:
            continue
        if e.type != EXPR_OP_OR:
            return False
        stack.extend(e.elements)
    return True


@dataclass
class _Plan:
    """Host-resolved device inputs for one query."""
    q_start: np.ndarray    # [Q] or [n_dev, Q] when sharded
    q_len: np.ndarray
    q_idf: np.ndarray      # [Q]
    term_ids: np.ndarray   # int64[n_tok]: resolved term IDs (row order)
    prog_ops: np.ndarray   # [L] NOP-padded
    prog_args: np.ndarray
    use_mask: bool
    use_dense: bool
    budget: int
    depth: int
    # Dense-row tier entries (blockdense/sliced-hybrid): query row +
    # device row of up to _MAX_DENSE_PER_QUERY heavy terms; -1 padded.
    d_qpos: np.ndarray = None  # int32[_MAX_DENSE_PER_QUERY]
    d_row: np.ndarray = None
    d_idf: np.ndarray = None   # float32[_MAX_DENSE_PER_QUERY]
    # Sliced-executor inputs: the non-dense (CSR) terms' ranges,
    # compacted and padded to a power-of-two width, plus the per-term
    # slice length bucket (>= the widest CSR term's df).
    sl_start: np.ndarray = None  # int32[Qs_pad]
    sl_len: np.ndarray = None
    sl_idf: np.ndarray = None
    sl_T: int = 0
    # Windowed plans (single-chip): token row per column and the
    # logical CSR term count (bounds aggregation run lengths).  n_run
    # stays 0 on legacy tiered plans (sharded / over-wide fallback).
    sl_rows: np.ndarray = None   # int32[Qs_pad]
    n_run: int = 0
    single: bool = False        # exactly one term, pure-OR
    # Head-term hybrid (sliced path): the heaviest CSR term, kept out
    # of the sort plane (ops/executor.py sliced_topk T_head).
    h_start: int = 0
    h_len: int = 0
    h_idf: float = 0.0
    h_row: int = -1             # token row (presence-bit position)
    h_T: int = 0                # pow2 slice tier; 0 = no head
    h_pass: bool = True         # program({head}) for head-only docs
    # Masked dense-row hybrid: program verdict for every dense-only
    # presence pattern (bool[2**_MAX_DENSE_PER_QUERY]).
    d_pass: np.ndarray = None
    # Impact-prefix plan (pure-OR BM25; ops/executor.prefix_topk):
    # per-column wide-term bit, and per wide term the tail bound
    # (idf * excluded-impact max) plus its FULL CSR range and idf for
    # the exact rescore.  R-padded; pf_len 0 on padding rows.
    pf: bool = False
    pf_bits: np.ndarray = None   # int32[Qs_pad]
    pf_tail: np.ndarray = None   # float32[R]
    pf_start: np.ndarray = None  # int32[R]
    pf_len: np.ndarray = None    # int32[R]
    pf_idf: np.ndarray = None    # float32[R]

    @property
    def use_rows(self) -> bool:
        return self.d_qpos is not None and bool((self.d_qpos >= 0).any())

    @property
    def batch_key(self):
        """Static-signature key: plans with equal keys share a compiled
        batched executable."""
        return (self.q_start.shape[-1], len(self.prog_ops), self.use_mask,
                self.use_dense, self.budget, self.depth)


def _build_plan_prefix(dev, tokens, q_start, q_len, q_idf,
                       term_ids) -> Optional[_Plan]:
    """Impact-prefix plan: wide terms window over their top-CAP impact
    region with a tail bound; complete terms window over their full
    CSR range.  None when the query exceeds the wide-term or column
    caps (the caller falls through to the classic plan)."""
    T0 = _window_t0(dev.slice_t_cap)
    lookup = dev.prefix_start_lookup
    tails = dev.prefix_tail
    plens = dev.prefix_len
    entries: list[tuple[int, int, float, int]] = []   # (s, eln, idf, bit)
    w_tail: list[float] = []
    w_start: list[int] = []
    w_len: list[int] = []
    w_idf: list[float] = []
    n_live = 0
    for i in range(len(tokens)):
        ln = int(q_len[i])
        if ln <= 0:
            continue
        n_live += 1
        tid = int(term_ids[i])
        pstart = int(lookup[tid]) if tid <= dev.base_nterms else -1
        if pstart >= 0:
            j = len(w_tail)
            if j >= _PREFIX_MAX_WIDE:
                return None
            w_tail.append(float(tails[tid]) * float(q_idf[i]))
            w_start.append(int(q_start[i]))
            w_len.append(ln)
            w_idf.append(float(q_idf[i]))
            # Windows cover the tie-free cut, not the full cap (ranks
            # past the cut are boundary ties the build excluded).
            s, eln, bit = pstart, int(plens[tid]), 1 << j
        else:
            s, eln, bit = int(q_start[i]), ln, 0
        entries.append((s, eln, float(q_idf[i]), bit))
    T0 = int(_choose_T(np.asarray(
        [[e[1] for e in entries]], dtype=np.int64), T0)[0]) \
        if entries else T0
    starts: list[int] = []
    lens: list[int] = []
    idfs: list[float] = []
    bits: list[int] = []
    for s, eln, idf, bit in entries:
        for off in range(0, eln, T0):
            starts.append(s + off)
            lens.append(min(T0, eln - off))
            idfs.append(idf)
            bits.append(bit)
    if len(starts) > _WINDOW_MAX_COLS:
        return None

    qs_pad = _qs_pad(len(starts))
    sl_start = np.zeros(qs_pad, dtype=np.int32)
    sl_len = np.zeros(qs_pad, dtype=np.int32)
    sl_idf = np.zeros(qs_pad, dtype=np.float32)
    pf_bits = np.zeros(qs_pad, dtype=np.int32)
    sl_start[: len(starts)] = starts
    sl_len[: len(starts)] = lens
    sl_idf[: len(starts)] = idfs
    pf_bits[: len(starts)] = bits
    # No wide terms: R = 0 routes the complete-plane fast path in
    # prefix_topk (2-operand sort, no rescore epilogue, always exact).
    r_pad = _bucket(len(w_tail), 1) if w_tail else 0
    pf_tail = np.zeros(r_pad, dtype=np.float32)
    pf_start = np.zeros(r_pad, dtype=np.int32)
    pf_len = np.zeros(r_pad, dtype=np.int32)
    pf_idf = np.zeros(r_pad, dtype=np.float32)
    pf_tail[: len(w_tail)] = w_tail
    pf_start[: len(w_tail)] = w_start
    pf_len[: len(w_tail)] = w_len
    pf_idf[: len(w_tail)] = w_idf
    return _Plan(q_start=q_start, q_len=q_len, q_idf=q_idf,
                 term_ids=np.asarray(term_ids, dtype=np.int64),
                 prog_ops=_PROG_DUMMY, prog_args=_PROG_DUMMY,
                 use_mask=False, use_dense=False,
                 budget=_MIN_BUDGET, depth=_MIN_DEPTH,
                 sl_start=sl_start, sl_len=sl_len, sl_idf=sl_idf,
                 sl_T=T0, n_run=_bucket(n_live, 1) if n_live else 1,
                 pf=True, pf_bits=pf_bits, pf_tail=pf_tail,
                 pf_start=pf_start, pf_len=pf_len, pf_idf=pf_idf)


def _build_plan(dev, query: Query, sp: SearchParams,
                no_prefix: bool = False) -> Optional[_Plan]:
    """Resolve a prepared query to padded device inputs, or None when
    the query produces a trivially empty result."""
    tokens = query.tokens.tokens
    if query.root is None or not tokens:
        # No meaningful tokens: empty result, not an error
        # (search.c:219-226).
        return None

    # BM25 skips every score when adl < 1 (ranking.c:161-163), and
    # both algorithms bail with empty results when doc_count == 0.
    if dev.doc_count == 0 or (sp.algo == ALGO_BM25 and dev.adl < 1.0):
        return None

    sharded = hasattr(dev, "mesh")

    # Per-query-term CSR metadata (host side; the term dictionary and
    # starts live on the host, the postings live on device).  IDF is
    # computed here in f64, matching the C double-precision arithmetic
    # (ranking.c:91,171).
    n_tok = len(tokens)
    q_pad = _bucket(n_tok, _MIN_TERMS)
    lead = (dev.n_dev,) if sharded else ()
    q_start = np.zeros(lead + (q_pad,), dtype=np.int32)
    q_len = np.zeros(lead + (q_pad,), dtype=np.int32)
    q_idf = np.zeros(q_pad, dtype=np.float32)
    row_of_token = {}
    for i, token in enumerate(tokens):
        if sharded:
            start, length = dev.term_ranges(token.term_id)
            q_start[:, i] = start
            q_len[:, i] = length
        else:
            q_start[i], q_len[i] = dev.term_range(token.term_id)
        df = dev.term_live_df(token.term_id)
        if df > 0:
            q_idf[i] = host_idf(sp.algo, dev.doc_count, df)
        row_of_token[id(token)] = i
    # Budget covers the largest per-device flat postings stream.
    total = int(q_len.sum(axis=-1).max())

    use_mask = not _is_pure_or(query.root)

    if (not no_prefix and not use_mask
            and _prefix_mode(dev, sp, sharded)):
        plan = _build_plan_prefix(
            dev, tokens, q_start, q_len, q_idf,
            [t.term_id for t in tokens])
        if plan is not None:
            return plan

    budget = _bucket(max(total, 1), _MIN_BUDGET, shift=2)
    # Dense execution (packed bitmaps + per-slot score scatter) is
    # O(B + S) with no sort; candidate scoring is O(B log B).  Dense
    # wins for >32-term queries (presence bits overflow u32) and for
    # high-df queries whose postings stream rivals the corpus size.
    # Sharded indexes use the per-shard slot count (the dense core
    # runs inside the shard_map body over shard-local slots).
    local_slots = dev.slots_per_shard if sharded else dev.n_slots
    use_dense = n_tok > MAX_BITS_TERMS or budget >= max(local_slots, 1)
    empty_leaf = q_pad if use_dense else EMPTY_LEAF_BIT
    depth = _MIN_DEPTH
    # Dummy one-op program when maskless: keeps the argument pytree
    # shape stable for shard_map specs; DCE'd when unused.
    prog_ops = np.zeros(1, dtype=np.int32)
    prog_args = np.zeros(1, dtype=np.int32)
    if use_mask:
        ops, args, max_depth = compile_program(
            query.root,
            lambda tok: row_of_token.get(id(tok), empty_leaf)
            if tok is not None else empty_leaf)
        prog_len = _bucket(len(ops), _MIN_PROG)
        prog_ops = np.zeros(prog_len, dtype=np.int32)
        prog_ops[: len(ops)] = ops
        prog_args = np.zeros(prog_len, dtype=np.int32)
        prog_args[: len(args)] = args
        depth = _bucket(max_depth, _MIN_DEPTH)

    # Heavy terms with a dense device row (blockdense path only;
    # overflow beyond _MAX_DENSE_PER_QUERY stays in the kernel --
    # exact either way).
    d_qpos = np.full(_MAX_DENSE_PER_QUERY, -1, dtype=np.int32)
    d_row = np.full(_MAX_DENSE_PER_QUERY, -1, dtype=np.int32)
    row_of = getattr(dev, "dense_row_of", None)
    if row_of:
        j = 0
        for i, token in enumerate(tokens):
            if j >= _MAX_DENSE_PER_QUERY:
                break
            h = row_of.get(token.term_id)
            if h is not None:
                d_qpos[j] = i
                d_row[j] = h
                j += 1

    # Sliced-executor inputs: non-dense terms compacted in token order
    # (for masked queries no term is dense-handled on the sliced path,
    # so column index == token row == presence-bit index).
    d_idf = np.zeros(_MAX_DENSE_PER_QUERY, dtype=np.float32)
    for j in range(_MAX_DENSE_PER_QUERY):
        if d_qpos[j] >= 0:
            d_idf[j] = q_idf[d_qpos[j]]
    dense_set = {int(x) for x in d_qpos if x >= 0}
    csr_cols = [i for i in range(n_tok) if i not in dense_set]

    # Masked hybrid verdict table: the program evaluated on every
    # dense-only presence pattern (documents matched by no CSR term
    # are gated by this on the dense-sweep side).
    d_pass_v = None
    if use_mask and _MASKED_HYBRID and dense_set:
        nd = _MAX_DENSE_PER_QUERY
        pats = np.zeros((EMPTY_LEAF_BIT + 1, 1 << nd), np.bool_)
        for m in range(1 << nd):
            for j in range(nd):
                if d_qpos[j] >= 0 and (m >> j) & 1:
                    pats[min(int(d_qpos[j]), EMPTY_LEAF_BIT - 1), m] = \
                        True
        d_pass_v = _eval_program_np(pats, prog_ops, prog_args)

    # Head-term extraction (sliced path): the heaviest CSR term leaves
    # the sort plane for the searchsorted + top_k merge when its df
    # clears the tier threshold -- sort costs ~36x more per lane than
    # top_k on v5e, and high-df terms dominate the sort.  Sharded
    # plans carry per-shard head ranges (the merge is shard-local);
    # eligibility and the tier use the max per-shard length.
    h_start_v = h_len_v = 0
    h_idf_v = 0.0
    h_row_v = -1
    h_T = 0
    h_pass_v = True
    if not dense_set and len(csr_cols) >= 2:
        lens = [int(q_len[..., c].max()) for c in csr_cols]
        hmax = max(lens)
        min_df = _HEAD_MIN_DF_PAIR if len(csr_cols) == 2 else _HEAD_MIN_DF
        if hmax >= min_df and hmax <= DeviceIndex.SLICE_MAX_T:
            hcol = csr_cols[lens.index(hmax)]
            if sharded:
                h_start_v = q_start[:, hcol].copy()
                h_len_v = q_len[:, hcol].copy()
            else:
                h_start_v = int(q_start[hcol])
                h_len_v = hmax
            h_idf_v = float(q_idf[hcol])
            h_row_v = hcol
            h_T = _head_tier(hmax, dev.slice_t_cap)
            csr_cols = [c for c in csr_cols if c != hcol]
            if use_mask:
                present = np.zeros((EMPTY_LEAF_BIT + 1, 1), np.bool_)
                present[min(h_row_v, EMPTY_LEAF_BIT - 1)] = True
                h_pass_v = bool(_eval_program_np(
                    present, prog_ops, prog_args)[0])

    # Windowed plane: split each CSR term into ceil(df/T0) fixed-width
    # windows so the sort plane holds ~df lanes.  Sharded plans window
    # on the max per-shard length, so the column -> token-row map and
    # the column count stay replicated across devices (shards with
    # fewer windows carry zero-length columns, whose lanes are all
    # invalid).  Queries whose windows overflow the column cap keep
    # the legacy tiered plane.
    T0 = _window_t0(dev.slice_t_cap)
    live_cols = [i for i in csr_cols if int(q_len[..., i].max()) > 0]
    if live_cols:
        # Per-row variable window width (same chooser as the batch
        # planner; sharded rows size windows on the max per-shard
        # length so the column layout stays replicated).
        T0 = int(_choose_T(np.asarray(
            [[int(q_len[..., i].max()) for i in live_cols]],
            dtype=np.int64), T0)[0])
    n_w = sum(-(-int(q_len[..., i].max()) // T0) for i in live_cols)
    if not sharded and n_w <= _WINDOW_MAX_COLS:
        # Vectorized ragged window expansion: a monster term yields
        # thousands of windows, and the python per-window loop cost
        # ~1 ms per wide row (~40 ms/batch of fallback planning).
        cl = np.asarray([int(q_len[i]) for i in live_cols],
                        dtype=np.int64)
        cs = np.asarray([int(q_start[i]) for i in live_cols],
                        dtype=np.int64)
        ci = np.asarray(live_cols, dtype=np.int64)
        wcnt = -(-cl // T0) if len(cl) else cl
        cell_of = np.repeat(np.arange(len(ci)), wcnt)
        wi = (np.arange(cell_of.size, dtype=np.int64)
              - np.repeat(np.cumsum(wcnt) - wcnt, wcnt))
        n_wins = cell_of.size
        qs_pad = _qs_pad(n_wins)
        sl_start = np.zeros(qs_pad, dtype=np.int32)
        sl_len = np.zeros(qs_pad, dtype=np.int32)
        sl_idf = np.zeros(qs_pad, dtype=np.float32)
        sl_rows = np.zeros(qs_pad, dtype=np.int32)
        sl_start[:n_wins] = cs[cell_of] + wi * T0
        sl_len[:n_wins] = np.minimum(cl[cell_of] - wi * T0, T0)
        sl_idf[:n_wins] = q_idf[ci[cell_of]]
        sl_rows[:n_wins] = ci[cell_of]
        sl_T = T0
        n_run = _bucket(len(live_cols), 1) if live_cols else 1
        single_v = n_tok == 1 and not use_mask and n_wins <= 1
    elif sharded and n_w <= _WINDOW_MAX_COLS:
        cols = [(i, j)
                for i in live_cols
                for j in range(-(-int(q_len[..., i].max()) // T0))]
        qs_pad = _qs_pad(len(cols))
        sl_start = np.zeros(lead + (qs_pad,), dtype=np.int32)
        sl_len = np.zeros(lead + (qs_pad,), dtype=np.int32)
        sl_idf = np.zeros(qs_pad, dtype=np.float32)
        sl_rows = np.zeros(qs_pad, dtype=np.int32)
        for c, (i, j) in enumerate(cols):
            # Clamp a zero-length column's start into the shard's own
            # range so the window read never leaves the pack (its
            # lanes are all invalid either way).
            off = np.minimum(j * T0, np.maximum(q_len[:, i] - 1, 0))
            sl_start[:, c] = q_start[:, i] + off
            sl_len[:, c] = np.clip(q_len[:, i] - j * T0, 0, T0)
            sl_idf[c] = q_idf[i]
            sl_rows[c] = i
        sl_T = T0
        n_run = _bucket(len(live_cols), 1) if live_cols else 1
        single_v = n_tok == 1 and not use_mask and len(cols) <= 1
    else:
        qs_pad = _qs_pad(len(csr_cols))
        sl_start = np.zeros(lead + (qs_pad,), dtype=np.int32)
        sl_len = np.zeros(lead + (qs_pad,), dtype=np.int32)
        sl_idf = np.zeros(qs_pad, dtype=np.float32)
        for col, i in enumerate(csr_cols):
            sl_start[..., col] = q_start[..., i]
            sl_len[..., col] = q_len[..., i]
            sl_idf[col] = q_idf[i]
        sl_T = _slice_tier(int(sl_len.max()) if sl_len.size else 0,
                           dev.slice_t_cap)
        sl_rows = None
        n_run = 0
        single_v = n_tok == 1 and not use_mask

    # Sharded prefix plans: a pure-OR windowed plan on the mesh IS an
    # R = 0 prefix plan (per-shard windows cover each shard's postings
    # in full), so the flagship executor serves multi-chip too.
    pf_v = False
    pf_bits_v = pf_tail_v = pf_start_v = pf_len_v = pf_idf_v = None
    if (sharded and not no_prefix and not use_mask and n_run > 0
            and h_T == 0 and not bool((d_qpos >= 0).any())
            and _prefix_mode_sharded(dev, sp)):
        pf_v = True
        pf_bits_v = np.zeros(sl_start.shape[-1], dtype=np.int32)
        pf_tail_v = np.zeros(0, dtype=np.float32)
        pf_start_v = np.zeros(0, dtype=np.int32)
        pf_len_v = np.zeros(0, dtype=np.int32)
        pf_idf_v = np.zeros(0, dtype=np.float32)

    return _Plan(q_start=q_start, q_len=q_len, q_idf=q_idf,
                 term_ids=np.asarray([t.term_id for t in tokens],
                                     dtype=np.int64),
                 prog_ops=prog_ops, prog_args=prog_args,
                 use_mask=use_mask, use_dense=use_dense,
                 budget=budget, depth=depth,
                 d_qpos=d_qpos, d_row=d_row, d_idf=d_idf,
                 sl_start=sl_start, sl_len=sl_len, sl_idf=sl_idf,
                 sl_T=sl_T, sl_rows=sl_rows, n_run=n_run,
                 single=single_v,
                 h_start=h_start_v, h_len=h_len_v, h_idf=h_idf_v,
                 h_row=h_row_v, h_T=h_T, h_pass=h_pass_v,
                 d_pass=d_pass_v,
                 pf=pf_v, pf_bits=pf_bits_v, pf_tail=pf_tail_v,
                 pf_start=pf_start_v, pf_len=pf_len_v,
                 pf_idf=pf_idf_v)


# Shared read-only dummy program for unmasked plans (kept 1-op so the
# argument pytree shape is stable; DCE'd when unused).
_PROG_DUMMY = np.zeros(1, dtype=np.int32)
_PROG_DUMMY.setflags(write=False)


def _pow2ceil(x: np.ndarray) -> np.ndarray:
    """Elementwise next power of two (>= 1) for small positive ints."""
    x = np.maximum(x, 1)
    return (1 << np.ceil(np.log2(x)).astype(np.int64)).astype(np.int64)


def _build_plans(dev, queries: list[Query], sp: SearchParams,
                 no_prefix: bool = False) -> list[Optional[_Plan]]:
    """Batch twin of _build_plan: one vectorized numpy pass plans every
    simple (pure-OR, non-sharded) query; the rest fall back to the
    per-query path.  Field-for-field identical plans -- the per-query
    planner spends ~95 us/query in small-array Python, which at a
    2048-query batch is a third of the whole wall time."""
    n_q = len(queries)
    plans: list[Optional[_Plan]] = [None] * n_q
    if dev.doc_count == 0 or (sp.algo == ALGO_BM25 and dev.adl < 1.0):
        return plans

    sharded = hasattr(dev, "mesh")
    lookup = getattr(dev, "dense_row_lookup", None)
    simple: list[int] = []
    for i, q in enumerate(queries):
        tokens = q.tokens.tokens
        if q.root is None or not tokens:
            continue
        if (sharded or lookup is None or len(tokens) > MAX_BITS_TERMS
                or not _is_pure_or(q.root)):
            plans[i] = _build_plan(dev, q, sp, no_prefix=no_prefix)
            continue
        simple.append(i)
    if not simple:
        return plans

    ns = len(simple)
    counts = np.fromiter((len(queries[i].tokens.tokens) for i in simple),
                         np.int64, ns)
    total_tok = int(counts.sum())
    flat_tid = np.fromiter(
        (t.term_id for i in simple for t in queries[i].tokens.tokens),
        np.int64, total_tok)
    offs = np.zeros(ns + 1, np.int64)
    np.cumsum(counts, out=offs[1:])

    base_n = dev.base_nterms
    ts = dev.term_starts
    tid_c = np.minimum(flat_tid, base_n)
    in_base = flat_tid <= base_n
    st_f = np.where(in_base, ts[tid_c - 1], 0).astype(np.int32)
    ln_f = np.where(in_base, ts[tid_c] - ts[tid_c - 1], 0).astype(np.int32)
    df_f = np.asarray(dev.host.term_df.a[flat_tid - 1], dtype=np.int64)
    # IDF in f64, same arithmetic as host_idf (ranking.c:91,171).
    with np.errstate(divide="ignore", invalid="ignore"):
        if sp.algo == ALGO_TFIDF:
            ratio = (np.float32(dev.doc_count)
                     / df_f.astype(np.float32)).astype(np.float64)
            idf64 = np.log(ratio) + 1.0
        else:
            idf64 = np.log((dev.doc_count - df_f + 0.5)
                           / (df_f + 0.5) + 1.0)
    idf_f = np.where(df_f > 0, idf64, 0.0).astype(np.float32)
    drow_f = np.where(in_base, lookup[tid_c], -1).astype(np.int32)

    # [ns, mp] matrices, token row-major scatter.
    mp = int(_bucket(int(counts.max()), _MIN_TERMS))
    row_f = np.repeat(np.arange(ns, dtype=np.int64), counts)
    col_f = np.arange(total_tok, dtype=np.int64) - offs[:-1][row_f]
    st_m = np.zeros((ns, mp), np.int32)
    ln_m = np.zeros((ns, mp), np.int32)
    idf_m = np.zeros((ns, mp), np.float32)
    st_m[row_f, col_f] = st_f
    ln_m[row_f, col_f] = ln_f
    idf_m[row_f, col_f] = idf_f

    if not no_prefix and _prefix_mode(dev, sp, sharded):
        return _plans_prefix(
            dev, sp, queries, plans, simple, counts, offs, flat_tid,
            tid_c, in_base, row_f, col_f, st_m, ln_m, idf_m)

    # Dense-row split: first _MAX_DENSE_PER_QUERY dense-capable tokens
    # take a dense row; overflow stays in the CSR columns.
    isdense_m = np.zeros((ns, mp), bool)
    isdense_m[row_f, col_f] = drow_f >= 0
    dord = np.cumsum(isdense_m, axis=1) - 1
    take = isdense_m & (dord < _MAX_DENSE_PER_QUERY)
    any_dense = bool(take.any())
    d_qpos_m = np.full((ns, _MAX_DENSE_PER_QUERY), -1, np.int32)
    d_row_m = np.full((ns, _MAX_DENSE_PER_QUERY), -1, np.int32)
    d_idf_m = np.zeros((ns, _MAX_DENSE_PER_QUERY), np.float32)
    valid_m = np.zeros((ns, mp), bool)
    valid_m[row_f, col_f] = True
    if any_dense:
        drow_m = np.full((ns, mp), -1, np.int32)
        drow_m[row_f, col_f] = drow_f
        tr, tc = np.nonzero(take)
        d_qpos_m[tr, dord[tr, tc]] = tc.astype(np.int32)
        d_row_m[tr, dord[tr, tc]] = drow_m[tr, tc]
        d_idf_m[tr, dord[tr, tc]] = idf_m[tr, tc]
        iscsr = valid_m & ~take
    else:
        iscsr = valid_m

    # Head-term extraction (matches _build_plan): rows without dense
    # terms whose heaviest CSR term clears the tier threshold move it
    # out of the sort plane (pure-OR here, so h_pass is always True).
    ln_csr = np.where(iscsr, ln_m, 0)
    row_max = ln_csr.max(axis=1)
    n_csr0 = iscsr.sum(axis=1)
    min_df_row = np.where(n_csr0 == 2, _HEAD_MIN_DF_PAIR, _HEAD_MIN_DF)
    elig = ((~take.any(axis=1)) & (n_csr0 >= 2)
            & (row_max >= min_df_row)
            & (row_max <= DeviceIndex.SLICE_MAX_T))
    any_head = bool(elig.any())
    h_col = np.argmax(ln_csr, axis=1)
    if any_head:
        ishead = np.zeros((ns, mp), bool)
        er = np.nonzero(elig)[0]
        ishead[er, h_col[er]] = True
        iscsr = iscsr & ~ishead

    # Windowed plane construction: each CSR cell of length ln becomes
    # ceil(ln/T) fixed-width window columns (vectorized ragged
    # expansion), so the sort plane holds ~postings lanes instead of a
    # power-of-8 tier pad per term.  T is chosen PER ROW from the rung
    # ladder (variable-width windows; see _choose_T).
    T0 = _window_t0(dev.slice_t_cap)
    ln_csr = np.where(iscsr, ln_m, 0)
    T_row = _choose_T(ln_csr, T0)
    w_m = -(-ln_csr // T_row[:, None])   # windows per (row, cell)
    n_w = w_m.sum(axis=1)                # windows per query
    n_csr = (w_m > 0).sum(axis=1)        # logical CSR terms (df > 0)

    # Queries whose windows overflow the column cap keep the
    # per-query planner's legacy tiered plane.  no_prefix must thread
    # through: a certification-fallback batch re-entering the prefix
    # planner here would recurse forever (observed on the 8.8M tier,
    # whose mix has over-wide rows).
    over = n_w > _WINDOW_MAX_COLS
    if bool(over.any()):
        for j in np.nonzero(over)[0]:
            i = simple[j]
            plans[i] = _build_plan(dev, queries[i], sp,
                                   no_prefix=no_prefix)
        w_m[over] = 0
        n_w[over] = 0

    rr, cc = np.nonzero(w_m > 0)         # cells, row-major order
    wcnt = w_m[rr, cc]
    cell_of = np.repeat(np.arange(len(rr), dtype=np.int64), wcnt)
    wi = (np.arange(cell_of.size, dtype=np.int64)
          - np.repeat(np.cumsum(wcnt) - wcnt, wcnt))
    wr = rr[cell_of]                     # query row per window
    t_w = T_row[wr]                      # window width per lane
    w_start = (st_m[rr, cc][cell_of] + wi * t_w).astype(np.int32)
    w_len = np.minimum(ln_csr[rr, cc][cell_of] - wi * t_w, t_w
                       ).astype(np.int32)
    w_idf = idf_m[rr, cc][cell_of]
    w_row = cc[cell_of].astype(np.int32)  # token row (presence bit)
    # Column index within each query row (windows are row-major).
    row_first = np.zeros(ns + 1, np.int64)
    np.cumsum(n_w, out=row_first[1:])
    wcol = np.arange(wr.size, dtype=np.int64) - row_first[:-1][wr]

    qs_pad = np.where(n_w <= 1, 1, np.maximum(_QS_MIN, _pow2ceil(n_w)))
    qs_max = int(qs_pad.max()) if len(qs_pad) else 1
    sl_start_m = np.zeros((ns, qs_max), np.int32)
    sl_len_m = np.zeros((ns, qs_max), np.int32)
    sl_idf_m = np.zeros((ns, qs_max), np.float32)
    sl_rows_m = np.zeros((ns, qs_max), np.int32)
    sl_start_m[wr, wcol] = w_start
    sl_len_m[wr, wcol] = w_len
    sl_idf_m[wr, wcol] = w_idf
    sl_rows_m[wr, wcol] = w_row
    n_run = np.where(n_csr <= 1, 1, _pow2ceil(n_csr))

    t_cap = min(DeviceIndex.SLICE_MAX_T, dev.slice_t_cap)
    h_t = np.where(elig,
                   np.minimum(np.where(row_max <= 65536, 65536,
                                       DeviceIndex.SLICE_MAX_T), t_cap),
                   0)

    # Per-query scalars.
    totals = ln_m.sum(axis=1, dtype=np.int64)
    x = np.maximum(totals, 1)
    exp = np.maximum(np.ceil((np.log2(x) - np.log2(_MIN_BUDGET)) / 2.0),
                     0).astype(np.int64)
    budget = (_MIN_BUDGET << (2 * exp)).astype(np.int64)
    q_pad = _pow2ceil(np.maximum(counts, _MIN_TERMS))
    use_dense = budget >= max(dev.n_slots, 1)

    for j, i in enumerate(simple):
        if plans[i] is not None:         # over-wide fallback above
            continue
        qp = int(q_pad[j])
        head = bool(elig[j])
        hc = int(h_col[j])
        plans[i] = _Plan(
            q_start=st_m[j, :qp], q_len=ln_m[j, :qp],
            q_idf=idf_m[j, :qp],
            term_ids=flat_tid[offs[j]: offs[j + 1]],
            prog_ops=_PROG_DUMMY, prog_args=_PROG_DUMMY,
            use_mask=False, use_dense=bool(use_dense[j]),
            budget=int(budget[j]), depth=_MIN_DEPTH,
            d_qpos=d_qpos_m[j], d_row=d_row_m[j], d_idf=d_idf_m[j],
            sl_start=sl_start_m[j, : qs_pad[j]],
            sl_len=sl_len_m[j, : qs_pad[j]],
            sl_idf=sl_idf_m[j, : qs_pad[j]],
            sl_T=int(T_row[j]),
            sl_rows=sl_rows_m[j, : qs_pad[j]],
            n_run=int(n_run[j]),
            single=bool(counts[j] == 1 and n_w[j] <= 1),
            h_start=int(st_m[j, hc]) if head else 0,
            h_len=int(row_max[j]) if head else 0,
            h_idf=float(idf_m[j, hc]) if head else 0.0,
            h_row=hc if head else -1,
            h_T=int(h_t[j]))
    return plans


def _plans_prefix(dev, sp, queries, plans, simple, counts, offs,
                  flat_tid, tid_c, in_base, row_f, col_f,
                  st_m, ln_m, idf_m) -> list[Optional[_Plan]]:
    """Vectorized impact-prefix twin of _plans' classic tail: every
    simple row becomes a prefix plan (wide terms window over their
    top-CAP impact region, complete terms over their full range); rows
    exceeding the wide-term or column caps fall back to the per-query
    planner.  Field-for-field identical to _build_plan_prefix."""
    ns = len(simple)
    mp = st_m.shape[1]
    T0 = _window_t0(dev.slice_t_cap)
    pfx_f = np.where(in_base, dev.prefix_start_lookup[tid_c],
                     np.int32(-1))
    tail_f = np.where(in_base, dev.prefix_tail[tid_c],
                      np.float32(0.0)).astype(np.float32)
    plen_f = np.where(in_base, dev.prefix_len[tid_c], np.int32(0))
    wide_f = pfx_f >= 0

    valid_m = np.zeros((ns, mp), bool)
    valid_m[row_f, col_f] = True
    wide_m = np.zeros((ns, mp), bool)
    wide_m[row_f, col_f] = wide_f
    pfx_m = np.zeros((ns, mp), np.int32)
    pfx_m[row_f, col_f] = pfx_f
    tail_m = np.zeros((ns, mp), np.float32)
    tail_m[row_f, col_f] = tail_f
    plen_m = np.zeros((ns, mp), np.int32)
    plen_m[row_f, col_f] = plen_f

    # Wide terms window over their tie-free cut (<= cap; ranks past
    # it are boundary ties the build excluded -- see _prefix_build_dev).
    ln_eff = np.where(valid_m, np.where(wide_m, plen_m, ln_m), 0)
    st_eff = np.where(wide_m, pfx_m, st_m)
    word = np.cumsum(wide_m, axis=1) - 1      # wide index j per cell
    n_wide = wide_m.sum(axis=1)

    T_row = _choose_T(ln_eff, T0)        # variable-width windows
    w_m = -(-ln_eff // T_row[:, None])
    n_w = w_m.sum(axis=1)
    n_live = (ln_eff > 0).sum(axis=1)

    over = (n_w > _WINDOW_MAX_COLS) | (n_wide > _PREFIX_MAX_WIDE)
    if bool(over.any()):
        for j in np.nonzero(over)[0]:
            i = simple[j]
            plans[i] = _build_plan(dev, queries[i], sp)
        w_m[over] = 0
        n_w[over] = 0

    rr, cc = np.nonzero(w_m > 0)
    wcnt = w_m[rr, cc]
    cell_of = np.repeat(np.arange(len(rr), dtype=np.int64), wcnt)
    wi = (np.arange(cell_of.size, dtype=np.int64)
          - np.repeat(np.cumsum(wcnt) - wcnt, wcnt))
    wr = rr[cell_of]
    t_w = T_row[wr]
    w_start = (st_eff[rr, cc][cell_of] + wi * t_w).astype(np.int32)
    w_len = np.minimum(ln_eff[rr, cc][cell_of] - wi * t_w, t_w
                       ).astype(np.int32)
    w_idf = idf_m[rr, cc][cell_of]
    bit_cell = np.where(wide_m[rr, cc],
                        1 << np.minimum(word[rr, cc], 31), 0)
    w_bit = bit_cell[cell_of].astype(np.int32)
    row_first = np.zeros(ns + 1, np.int64)
    np.cumsum(n_w, out=row_first[1:])
    wcol = np.arange(wr.size, dtype=np.int64) - row_first[:-1][wr]

    qs_pad = np.where(n_w <= 1, 1, np.maximum(_QS_MIN, _pow2ceil(n_w)))
    qs_max = int(qs_pad.max()) if len(qs_pad) else 1
    sl_start_m = np.zeros((ns, qs_max), np.int32)
    sl_len_m = np.zeros((ns, qs_max), np.int32)
    sl_idf_m = np.zeros((ns, qs_max), np.float32)
    pf_bits_m = np.zeros((ns, qs_max), np.int32)
    sl_start_m[wr, wcol] = w_start
    sl_len_m[wr, wcol] = w_len
    sl_idf_m[wr, wcol] = w_idf
    pf_bits_m[wr, wcol] = w_bit

    wr2, wc2 = np.nonzero(wide_m)
    j2 = word[wr2, wc2]
    pf_tail_m = np.zeros((ns, _PREFIX_MAX_WIDE), np.float32)
    pf_start_m = np.zeros((ns, _PREFIX_MAX_WIDE), np.int32)
    pf_len_m = np.zeros((ns, _PREFIX_MAX_WIDE), np.int32)
    pf_idf_m = np.zeros((ns, _PREFIX_MAX_WIDE), np.float32)
    keep2 = j2 < _PREFIX_MAX_WIDE      # over rows were zeroed above
    wr2, wc2, j2 = wr2[keep2], wc2[keep2], j2[keep2]
    pf_tail_m[wr2, j2] = tail_m[wr2, wc2] * idf_m[wr2, wc2]
    pf_start_m[wr2, j2] = st_m[wr2, wc2]
    pf_len_m[wr2, j2] = ln_m[wr2, wc2]
    pf_idf_m[wr2, j2] = idf_m[wr2, wc2]
    # Fallback rows must not carry wide entries (their plan comes from
    # the per-query planner; these arrays are unused there).
    if bool(over.any()):
        pf_tail_m[over] = 0.0
        pf_len_m[over] = 0

    n_run = np.where(n_live <= 1, 1, _pow2ceil(n_live))
    # n_wide == 0 -> R = 0: the complete-plane fast path (2-operand
    # sort, no bound/rescore epilogue, exact by construction).
    r_pad = np.where(n_wide == 0, 0,
                     np.where(n_wide <= 1, 1, _pow2ceil(np.minimum(
                         n_wide, _PREFIX_MAX_WIDE))))
    q_pad = _pow2ceil(np.maximum(counts, _MIN_TERMS))
    for j, i in enumerate(simple):
        if plans[i] is not None:
            continue
        qp = int(q_pad[j])
        rp = int(r_pad[j])
        plans[i] = _Plan(
            q_start=st_m[j, :qp], q_len=ln_m[j, :qp],
            q_idf=idf_m[j, :qp],
            term_ids=flat_tid[offs[j]: offs[j + 1]],
            prog_ops=_PROG_DUMMY, prog_args=_PROG_DUMMY,
            use_mask=False, use_dense=False,
            budget=_MIN_BUDGET, depth=_MIN_DEPTH,
            sl_start=sl_start_m[j, : qs_pad[j]],
            sl_len=sl_len_m[j, : qs_pad[j]],
            sl_idf=sl_idf_m[j, : qs_pad[j]],
            sl_T=int(T_row[j]), n_run=int(n_run[j]),
            pf=True, pf_bits=pf_bits_m[j, : qs_pad[j]],
            pf_tail=pf_tail_m[j, :rp], pf_start=pf_start_m[j, :rp],
            pf_len=pf_len_m[j, :rp], pf_idf=pf_idf_m[j, :rp])
    return plans


def _eval_program_np(present: np.ndarray, prog_ops: np.ndarray,
                     prog_args: np.ndarray) -> np.ndarray:
    """Host postfix-program evaluation over a presence matrix
    (bool[R, n]); the numpy twin of ops/boolean eval for delta docs."""
    from .ops.boolean import OP_AND, OP_ANDNOT, OP_NOP, OP_OR, OP_PUSH

    n = present.shape[1]
    stack: list[np.ndarray] = []
    for op, arg in zip(prog_ops, prog_args):
        if op == OP_NOP:
            continue
        if op == OP_PUSH:
            row = present[arg] if arg < present.shape[0] \
                else np.zeros(n, dtype=np.bool_)
            stack.append(row)
        else:
            b = stack.pop()
            a = stack.pop()
            if op == OP_AND:
                stack.append(a & b)
            elif op == OP_OR:
                stack.append(a | b)
            elif op == OP_ANDNOT:
                stack.append(a & ~b)
    return stack[0] if stack else np.zeros(n, dtype=np.bool_)


def _delta_results(dev, plan: _Plan, sp: SearchParams):
    """Score the post-snapshot delta on the host (same formulas as the
    device executors, f32 arithmetic).  Returns (slots, scores) of
    live matching delta documents, or None when there is no delta."""
    if not getattr(dev, "has_delta", False):
        return None
    from .ops.scoring import BM25_B, BM25_K1

    host = dev.host
    slot0 = dev.delta_slot0
    n_new = host.doc_ids.n - slot0
    if n_new <= 0:
        return None

    n_tok = len(plan.term_ids)
    acc = np.zeros(n_new, dtype=np.float32)
    present = np.zeros((n_tok, n_new), dtype=np.bool_) if plan.use_mask \
        else None
    adl = np.float32(dev.adl)
    for i, term_id in enumerate(plan.term_ids):
        # Term-sorted delta index: O(log delta + matches) per term
        # instead of a full boolean scan of the delta per (query, term).
        t_count, t_slot = dev.delta_lookup(int(term_id))
        if not len(t_count):
            continue
        rows = t_slot.astype(np.int64) - slot0
        ltf = np.log(t_count.astype(np.float64) + 1.0).astype(np.float32)
        idf = np.float32(plan.q_idf[i])
        if sp.algo == ALGO_BM25:
            dl = host.doc_len.a[t_slot].astype(np.float32)
            denom = ltf + np.float32(BM25_K1) * (
                np.float32(1.0 - BM25_B) + np.float32(BM25_B) * dl / adl)
            contrib = ltf / denom * idf
        else:
            contrib = ltf * idf
        np.add.at(acc, rows, contrib)
        if present is not None:
            present[i, rows] = True

    if present is not None:
        keep = _eval_program_np(present, plan.prog_ops, plan.prog_args)
        acc = np.where(keep, acc, np.float32(0.0))
    alive = host.doc_alive.a[slot0: slot0 + n_new]
    acc = np.where(alive, acc, np.float32(0.0))
    nz = np.nonzero(acc > 0.0)[0]
    if not len(nz):
        return None
    return nz + slot0, acc[nz]


def _on_accelerator() -> bool:
    import jax
    return jax.devices()[0].platform != "cpu"


def _use_sliced(plan: _Plan, sharded: bool, dev) -> bool:
    """The sliced executor is the exact fast path for selective
    queries: contiguous per-term postings windows (no random gathers),
    one variadic sort, segmented-scan aggregation (ops/executor.py
    sliced_topk).  With dense-row terms it becomes the pure-OR hybrid
    (candidate plane scatter-max-merged into the dense-row sweep).

    Exclusions: sharded indexes (those route to the shard_map twin),
    slot counts that overflow exact f32 packing, terms wider than the
    slice guard, masked queries with dense-handled terms (unless the
    masked hybrid is enabled: candidate lanes gather dense presence
    bits and dense-only documents are gated by a host-evaluated
    verdict table), and very wide queries.
    """
    if sharded or getattr(dev, "postings_pack", None) is None:
        return False
    from .index.device import DeviceIndex
    cols_cap = _WINDOW_MAX_COLS if plan.n_run else 64
    # The masked hybrid needs the explicit column -> token-row map of
    # windowed plans (dense terms leave gaps in the column order, so
    # column index != token row on the tiered fallback).
    masked_rows_ok = (_MASKED_HYBRID and plan.d_pass is not None
                      and plan.n_run > 0)
    return (dev.n_slots < (1 << 24)
            and plan.sl_T <= DeviceIndex.SLICE_MAX_T
            and len(plan.sl_start) <= cols_cap
            and not (plan.use_mask and plan.use_rows
                     and not masked_rows_ok)
            and (not plan.use_mask or plan.q_start.shape[-1] <= 32))


def _use_blockdense(plan: _Plan, sharded: bool, n_slots: int) -> bool:
    # The Pallas block-accumulation executor is the exact path on
    # accelerators (sort/scatter-free); boolean queries need
    # presence bits to fit u32.  CPU runs keep the XLA executors
    # (interpret-mode Pallas is for tests only).  Its packed result
    # carries slot indexes in f32, exact only below 2**24 slots --
    # larger indexes take the candidate/dense executors.
    return (not sharded and _on_accelerator()
            and n_slots < (1 << 24)
            and (not plan.use_mask or plan.q_start.shape[-1] <= 32))


# Block-max pruning at 1024-slot granularity was implemented in r2
# and REMOVED in r3: its certification never fired on realistic
# tf/arrival distributions (measured 100% fallback), so it only
# added overhead.  The skip-work answer to the reference's
# matching-docs-only scoring loop (src/query/search.c:236-271) is
# the impact-prefix pruned path (ops/executor.prefix_topk), which
# IS on by default (_prefix_mode above).


def _kernel_crows(dev, plan: _Plan,
                  crow_map: Optional[dict] = None) -> np.ndarray:
    """Bounds-cache rows for the plan's kernel terms (dense-handled
    and delta-born terms map to the zero row)."""
    dense_pos = {int(x) for x in plan.d_qpos if x >= 0} \
        if plan.d_qpos is not None else set()
    if crow_map is None:
        tids = [int(t) for i, t in enumerate(plan.term_ids)
                if i not in dense_pos]
        crow_map = dev.bounds_crows(tids)
    q_crow = np.zeros(plan.q_start.shape[-1], dtype=np.int32)
    for i, t in enumerate(plan.term_ids):
        if i not in dense_pos:
            q_crow[i] = crow_map.get(int(t), 0)
    return q_crow


def _sharded_sliced(plan: _Plan, dev) -> bool:
    """Run the sliced executor inside the shard_map body (the fast
    path per shard; same exclusions as _use_sliced, per-shard slot
    counts, no dense rows on the sharded index)."""
    from .index.device import DeviceIndex
    cols_cap = _WINDOW_MAX_COLS if plan.n_run else 64
    return (getattr(dev, "postings_pack", None) is not None
            and dev.slots_per_shard < (1 << 24)
            and plan.sl_T <= DeviceIndex.SLICE_MAX_T
            and plan.sl_start.shape[-1] <= cols_cap
            and (not plan.use_mask or plan.q_start.shape[-1] <= 32)
            # Dense-handled terms: the hybrid is pure-OR only (masked
            # queries cannot evaluate NOT/AND on partial presence
            # bits) -- same rule as _use_sliced.
            and not (plan.use_mask and plan.use_rows))


def _sharded_kernel(plan: _Plan, dev) -> bool:
    """Run the blockdense kernel inside the shard_map body: the fast
    path per shard on accelerators (same gating as _use_blockdense,
    with per-shard slot counts)."""
    return (_on_accelerator()
            and dev.slots_per_shard < (1 << 24)
            and (not plan.use_mask or plan.q_start.shape[-1] <= 32))


def _to_response(dev, scores, slots, limit: int, delta=None) -> Response:
    scores = np.asarray(scores)
    slots = np.asarray(slots)
    matched = scores > 0.0
    scores = scores[matched]
    slots = slots[matched]
    perm = getattr(dev, "slot_perm", None)
    if perm is not None:
        # Device slots are dl-ordered; translate back to host slots
        # before doc-id lookup and delta merging (delta slots are
        # host-ordered).
        slots = perm[slots.astype(np.int64)]
    if delta is not None:
        d_slots, d_scores = delta
        slots = np.concatenate([slots.astype(np.int64), d_slots])
        scores = np.concatenate([scores, d_scores])
        order = np.argsort(-scores, kind="stable")
        slots = slots[order]
        scores = scores[order]
    doc_ids = dev.doc_ids
    results = [
        (int(doc_ids[slot]), float(score))
        for score, slot in zip(scores[:limit], slots[:limit])
    ]
    return Response(results)


def _dispatch_sliced_single(dev, plan: _Plan, sp: SearchParams, k: int):
    """Asynchronously dispatch ONE query's sliced-executor call;
    returns the packed device array (unpack with unpack_sliced)."""
    from .ops.executor import (device_search_sliced_packed,
                               pack_sliced_group)
    use_mask = plan.use_mask
    t_head = plan.h_T
    with_rows = bool(use_mask and plan.n_run)
    buf = pack_sliced_group(
        plan.sl_start[None], plan.sl_len[None], plan.sl_idf[None],
        plan.prog_ops[None] if use_mask else None,
        plan.prog_args[None] if use_mask else None,
        plan.d_row[None] if plan.use_rows else None,
        plan.d_idf[None] if plan.use_rows else None,
        np.asarray([plan.h_start], np.int32) if t_head else None,
        np.asarray([plan.h_len], np.int32) if t_head else None,
        np.asarray([plan.h_idf], np.float32) if t_head else None,
        np.asarray([plan.h_row], np.int32) if t_head else None,
        np.asarray([plan.h_pass], np.bool_) if t_head else None,
        plan.sl_rows[None] if with_rows else None,
        plan.d_qpos[None] if (use_mask and plan.use_rows) else None,
        plan.d_pass[None] if (use_mask and plan.use_rows) else None)
    return device_search_sliced_packed(
        dev.postings_pack, dev.alive_mask, dev.doc_len,
        jnp.asarray(buf), dev.adl_dev,
        dev.dense_rows if plan.use_rows else None,
        qs=len(plan.sl_start), L=len(plan.prog_ops),
        D=_MAX_DENSE_PER_QUERY,
        T=plan.sl_T, k=k, algo=sp.algo, n_slots=dev.n_slots,
        use_mask=use_mask, single=plan.single,
        alive_all=dev.alive_all, use_rows=plan.use_rows,
        depth=plan.depth, T_head=t_head, n_run=plan.n_run,
    )


def execute_query(dev, query: Query, sp: SearchParams,
                  no_prefix: bool = False) -> Response:
    """Run the prepared query against the device snapshot.

    ``dev`` is a DeviceIndex (single chip) or a
    parallel.ShardedDeviceIndex (doc-sharded over a mesh).
    """
    plan = _build_plan(dev, query, sp, no_prefix=no_prefix)
    if plan is None:
        return Response()
    sharded = hasattr(dev, "mesh")

    if plan.pf and sharded:
        from .parallel.sharded import sharded_search_prefix_batch
        k = _bucket(min(sp.limit, dev.n_slots), _MIN_K)
        scores, slots = sharded_search_prefix_batch(
            dev.postings_pack, dev.alive_mask,
            jnp.asarray(plan.sl_start[:, None, :]),
            jnp.asarray(plan.sl_len[:, None, :]),
            jnp.asarray(plan.sl_idf[None]), jnp.float32(dev.adl),
            mesh=dev.mesh, T=plan.sl_T, k=k, algo=sp.algo,
            alive_all=dev.alive_all, n_run=plan.n_run,
            k_ret=min(sp.limit, k))
        _count("prefix")
        _count("prefix_exact")
        _count("sharded_prefix")
        return _to_response(dev, np.asarray(scores)[0],
                            np.asarray(slots)[0], sp.limit,
                            delta=_delta_results(dev, plan, sp))

    if plan.pf:
        from .ops.executor import (device_search_prefix_packed,
                                   pack_prefix_group, unpack_prefix,
                                   unpack_sliced)
        k = _bucket(min(sp.limit, dev.n_slots), _MIN_K)
        buf = pack_prefix_group(
            plan.sl_start[None], plan.sl_len[None], plan.sl_idf[None],
            plan.pf_bits[None], plan.pf_tail[None],
            plan.pf_start[None], plan.pf_len[None], plan.pf_idf[None])
        packed = device_search_prefix_packed(
            dev.postings_pack, dev.alive_mask, jnp.asarray(buf),
            dev.adl_dev, qs=len(plan.sl_start),
            R=len(plan.pf_tail), T=plan.sl_T, k=k,
            M=_prefix_m(sp, len(plan.pf_tail)),
            algo=sp.algo, n_slots=dev.n_slots,
            alive_all=dev.alive_all, n_run=plan.n_run,
            k_ret=min(sp.limit, k))
        _count("prefix")
        cplan = cpacked = None
        if len(plan.pf_tail):
            # Wide terms present: the certificate can fail.  Dispatch
            # the classic twin SPECULATIVELY in the same launch wave
            # and fetch both results in one consolidated transfer, so
            # an uncertified query costs zero extra round trips
            # (one-call search parity: src/query/search.c:285; the
            # sequential p50 regression diagnosed in r3 was this
            # fallback's re-plan + second round trip).
            cplan = _build_plan(dev, query, sp, no_prefix=True)
            if cplan is not None and _use_sliced(cplan, sharded, dev):
                cpacked = _dispatch_sliced_single(dev, cplan, sp, k)
        if cpacked is not None:
            both = np.asarray(jnp.concatenate(
                [packed.reshape(-1), cpacked.reshape(-1)]))
            pf_arr = both[: packed.size].reshape(packed.shape)
            scores, slots, exact = unpack_prefix(pf_arr)
            if exact[0]:
                _count("prefix_exact")
                return _to_response(dev, scores[0], slots[0], sp.limit,
                                    delta=_delta_results(dev, plan, sp))
            _count("prefix_fallback")
            _count("prefix_spec_used")
            cl = both[packed.size:].reshape(cpacked.shape)
            s2, l2 = unpack_sliced(cl)
            _count("sliced")
            return _to_response(dev, s2[0], l2[0], sp.limit,
                                delta=_delta_results(dev, cplan, sp))
        scores, slots, exact = unpack_prefix(packed)
        if exact[0]:
            _count("prefix_exact")
            return _to_response(dev, scores[0], slots[0], sp.limit,
                                delta=_delta_results(dev, plan, sp))
        # Certification failed and no speculative twin was eligible:
        # the classic plan is exact.
        _count("prefix_fallback")
        return execute_query(dev, query, sp, no_prefix=True)
    q_start, q_len, q_idf = plan.q_start, plan.q_len, plan.q_idf
    prog_ops, prog_args = plan.prog_ops, plan.prog_args
    use_mask, use_dense = plan.use_mask, plan.use_dense
    budget, depth = plan.budget, plan.depth
    k = _bucket(min(sp.limit, dev.n_slots), _MIN_K)

    if _use_sliced(plan, sharded, dev):
        from .ops.executor import unpack_sliced
        packed = _dispatch_sliced_single(dev, plan, sp, k)
        scores, slots = unpack_sliced(packed)
        _count("sliced")
        if plan.h_T:
            _count("sliced_head")
        return _to_response(dev, scores[0], slots[0], sp.limit,
                            delta=_delta_results(dev, plan, sp))

    if _use_blockdense(plan, sharded, dev.n_slots):
        from .ops.executor import (device_search_blockdense_cached,
                                   unpack_blockdense)
        q_crow = _kernel_crows(dev, plan)
        packed = device_search_blockdense_cached(
            dev.postings_slot, dev.postings_ltf, dev.doc_len,
            dev.alive_mask, dev._bounds_cache,
            jnp.asarray(q_crow[None]), jnp.asarray(q_idf[None]),
            dev.adl_dev,
            jnp.asarray(prog_ops[None]), jnp.asarray(prog_args[None]),
            dev.dense_rows, jnp.asarray(plan.d_qpos[None]),
            jnp.asarray(plan.d_row[None]),
            k=k, algo=sp.algo, n_slots=dev.n_slots,
            use_mask=use_mask, depth=depth, use_rows=plan.use_rows,
        )
        scores, slots = unpack_blockdense(packed)
        return _to_response(dev, scores[0], slots[0], sp.limit,
                            delta=_delta_results(dev, plan, sp))

    if sharded and _sharded_sliced(plan, dev):
        from .parallel.sharded import sharded_search_sliced_batch
        h_kw = {}
        if plan.h_T:
            h_kw = dict(
                h_start=jnp.asarray(
                    np.asarray(plan.h_start, np.int32)[:, None]),
                h_len=jnp.asarray(
                    np.asarray(plan.h_len, np.int32)[:, None]),
                h_idf=jnp.asarray(
                    np.asarray([plan.h_idf], np.float32)),
                h_row=jnp.asarray(np.asarray([plan.h_row], np.int32)),
                h_pass=jnp.asarray(np.asarray([plan.h_pass], np.bool_)))
        if plan.use_rows:
            h_kw.update(
                dense_rows=dev.dense_rows,
                d_row=jnp.asarray(plan.d_row[None]),
                d_idf=jnp.asarray(plan.d_idf[None]))
        scores, slots = sharded_search_sliced_batch(
            dev.postings_pack, dev.alive_mask, dev.doc_len,
            jnp.asarray(plan.sl_start[:, None, :]),
            jnp.asarray(plan.sl_len[:, None, :]),
            jnp.asarray(plan.sl_idf[None]), jnp.float32(dev.adl),
            jnp.asarray(prog_ops[None]), jnp.asarray(prog_args[None]),
            jnp.asarray(plan.sl_rows[None])
            if plan.sl_rows is not None else None,
            mesh=dev.mesh, T=plan.sl_T, k=k, algo=sp.algo,
            use_mask=use_mask, single=plan.single,
            alive_all=dev.alive_all, depth=depth, n_run=plan.n_run,
            T_head=plan.h_T, use_rows=plan.use_rows, **h_kw,
        )
        _count("sharded_sliced")
        return _to_response(dev, np.asarray(scores)[0],
                            np.asarray(slots)[0], sp.limit,
                            delta=_delta_results(dev, plan, sp))

    if sharded:
        from .parallel.sharded import sharded_search  # local: lazy import
        scores, slots = sharded_search(
            dev.postings_slot, dev.postings_ltf, dev.doc_len,
            dev.alive_mask,
            jnp.asarray(q_start), jnp.asarray(q_len), jnp.asarray(q_idf),
            jnp.float32(dev.adl),
            jnp.asarray(prog_ops), jnp.asarray(prog_args),
            mesh=dev.mesh, budget=budget, k=k, algo=sp.algo,
            use_mask=use_mask, depth=depth,
            use_kernel=_sharded_kernel(plan, dev), use_dense=use_dense,
        )
    elif use_dense:
        scores, slots = device_search_dense(
            dev.postings_slot, dev.postings_ltf, dev.doc_len,
            dev.alive_mask,
            jnp.asarray(q_start), jnp.asarray(q_len), jnp.asarray(q_idf),
            dev.adl_dev,
            jnp.asarray(prog_ops) if use_mask else None,
            jnp.asarray(prog_args) if use_mask else None,
            budget=budget, k=k, algo=sp.algo, n_slots=dev.n_slots,
            use_mask=use_mask, depth=depth,
        )
    else:
        scores, slots = device_search(
            dev.postings_slot, dev.postings_ltf, dev.doc_len,
            dev.alive_mask,
            jnp.asarray(q_start), jnp.asarray(q_len), jnp.asarray(q_idf),
            dev.adl_dev,
            jnp.asarray(prog_ops), jnp.asarray(prog_args),
            budget=budget, k=k, algo=sp.algo,
            use_mask=use_mask, depth=depth,
        )
    return _to_response(dev, scores, slots, sp.limit,
                        delta=_delta_results(dev, plan, sp))


@dataclass
class _PendingBatch:
    """In-flight batch state between submit and collect: every device
    call has been dispatched (async) but no result fetched."""
    plans: list
    responses: list
    chunked: list
    pending: list
    k: int
    t_dispatch: float
    t_submitted: float
    # Prepared queries, kept for the impact-prefix certification
    # fallback (uncertified rows re-plan classically at collect time).
    queries: list = None
    # Global in-flight ledger entries, released when collected.
    inflight: list = None
    # Consolidated-fetch plan: (device concat array, per-group dims,
    # pending indexes).  The concat is ENQUEUED AT SUBMIT TIME so it
    # executes inside this batch's own device wave -- enqueueing it at
    # collect time put it BEHIND the next pipelined batch's groups on
    # the stream, serializing the pipeline (measured r5: the
    # submit-before-collect reorder bought nothing until this moved).
    fetch_concat: tuple = None


def execute_query_batch(dev, queries: list[Query],
                        sp: SearchParams) -> list[Response]:
    """Execute many prepared queries with batched device dispatches.

    Queries are planned host-side, grouped by static signature, and
    each group runs as ONE vmapped device call over the shared
    snapshot -- amortizing dispatch and filling the chip.  Results are
    identical to per-query execution.
    """
    return collect_query_batch(dev, submit_query_batch(dev, queries, sp),
                               sp)


# Group coalescing: a 2048-query mixed batch shatters into ~19 fine
# signature groups (measured, 8.8M-doc tier), most holding < 64 rows
# but each costing a dispatch + upload round trip (~7-12 ms through a
# tunneled device -- more than the whole sort work of the batch).
# Small sliced groups that differ only in the cheap static dimensions
# (head tier, run count, single flag, column pad) merge into one
# widened group: rows re-pad to the group maxima, which is exact --
# zero-length window columns score nothing, n_run beyond a row's run
# length adds no-op aggregation passes, and a 1M-wide head plane is
# ~0.1 ns/lane top_k work.  Headless rows joining a head group carry
# h_len = 0 (their head plane is all-invalid).  Groups at or above
# the row threshold keep their fine signature: wasted lanes scale
# with row count, dispatch overhead does not.
_COALESCE_MIN_ROWS = 64
_COALESCE_MAX_COLS = 64
# Prefix groups coalesce unconditionally: hardware A/B (r3, 8.8M tier)
# measured one merged 2048-row dispatch at 319 ms vs six fine groups
# at 382 ms plus five spare dispatch round trips -- padded window
# columns are cheap (zero-length windows score nothing) while each
# extra dispatch costs ~50 ms fixed through a tunneled device.
# 2417 -> 2618 QPS (tools/tpu_sweep.py 'pfco').
_COALESCE_MIN_ROWS_PF = 1 << 30
# Column tiers for the merge: "8" buckets small pf groups into a
# narrow (qs <= 8) and a wide dispatch instead of padding every row to
# the batch-max window count (most damped-Zipf rows have 2-4 windows;
# one 16-wide row would force every lane to 16).  Lanes scale with the
# tier width, so the split cuts the merged plane roughly in half for
# one extra dispatch round trip.  Hardware A/B at the 8.8M tier
# (tools/tpu_sweep.py): single merged group 2694 QPS, tiers=(4,) 2668,
# tiers=(8,) 2847 -- the qs<=8 tier captures ~98% of rows at half the
# pad width.  Empty NXS_PF_TIERS = single merged group.
_PF_TIERS = tuple(sorted(
    int(x) for x in os.environ.get("NXS_PF_TIERS", "8,64").split(",")
    if x))


def _ladder(v: int, rungs: tuple) -> int:
    """Smallest rung >= v (v itself beyond the top rung): quantizes
    merged-group dimensions onto a fixed ladder so coalesced dispatch
    signatures do not vary with batch composition."""
    for r in rungs:
        if v <= r:
            return r
    return v


def _coalesce_sliced_groups(groups: dict, plans: list) -> dict:
    small = [key for key, members in groups.items()
             if key[0] == "sl" and len(members) < _COALESCE_MIN_ROWS
             and key[9] > 0              # windowed plans only
             and key[1] <= _COALESCE_MAX_COLS]
    if len(small) < 2:
        return groups
    # Bucket by the dimensions that genuinely split executables:
    # (plane width class is folded; mask/use_rows/head-presence kept
    # -- merging headless rows into a head group would hand EVERY row
    # a T_head plane fetch).
    buckets: dict[tuple, list[tuple]] = {}
    for key in small:
        ck = (key[2], key[4], key[7], key[8] > 0)   # T, mask, rows, head
        buckets.setdefault(ck, []).append(key)
    for ck, keys in buckets.items():
        if len(keys) < 2:
            continue
        T, use_mask, use_rows, _ = ck
        members: list[int] = []
        for key in keys:
            members.extend(groups.pop(key))
        # Quantize the merged shape onto a coarse ladder instead of
        # the member maxima: maxima differ run to run (the certified
        # fallback mix varies with query content), so max-shaped
        # merges mint fresh executable signatures mid-serving -- each
        # a 1-2 s persistent-cache load stalling the whole batch
        # (measured: ~11 s submit phases on the fuzzy tier, r4).  A
        # {8, 64, 512}-rung ladder pins the signature while padded
        # lanes stay cheap (zero-length window columns score nothing).
        qs_g = max(len(plans[i].sl_start) for i in members)
        qs_g = _ladder(_qs_pad(qs_g), (8, 64, 512))
        L_g = max(len(plans[i].prog_ops) for i in members) \
            if use_mask else 0
        depth_g = max(plans[i].depth for i in members)
        h_g = max(plans[i].h_T for i in members)
        n_run_g = _ladder(
            max(plans[i].n_run for i in members), (1, 4, 16))
        merged = ("sl", qs_g, T, L_g, use_mask, depth_g, False,
                  use_rows, h_g, n_run_g)
        groups.setdefault(merged, []).extend(members)
        _count("coalesced", len(members))
    return groups


def _coalesce_prefix_groups(groups: dict, plans: list) -> dict:
    """Merge small impact-prefix groups (same T by construction) into
    one widened group: rows re-pad to the group maxima, which is exact
    -- zero-length window columns score nothing, padding wide-term
    rows carry zero tails and empty rescore ranges, and extra n_run
    passes are no-ops.  Same dispatch-overhead argument as
    _coalesce_sliced_groups."""
    small = [key for key, members in groups.items()
             if key[0] in ("pf", "spf")
             and len(members) < _COALESCE_MIN_ROWS_PF
             and key[1] <= _COALESCE_MAX_COLS]
    if not small:
        return groups
    # Tier by (qs bound, has-wide, window width): merging an R = 0
    # group into an R > 0 one would hand the complete-plane rows the
    # full 3-operand sort + rescore epilogue back, and merging across
    # window widths would re-pad narrow rows to a wide plane (undoing
    # the variable-width diet).  Singleton cells still re-key onto the
    # tier bound so dispatch signatures never track the batch's exact
    # column counts.
    tiers: dict[tuple, list[tuple]] = {}
    for key in small:
        for bound in _PF_TIERS:
            if key[1] <= bound:
                break
        else:
            bound = 1 << 30
        tiers.setdefault((key[0], bound, key[3] > 0, key[2]),
                         []).append(key)
    for (kind, _bound, _wide, T), keys in tiers.items():
        members: list[int] = []
        qs_g = run_g = 1
        r_g = 0                # stays 0 for an all-R=0 tier
        for key in keys:
            members.extend(groups.pop(key))
            qs_g = max(qs_g, key[1])
            r_g = max(r_g, key[3])
            run_g = max(run_g, key[4])
        # Ladder-quantize the merged dims (same signature-stability
        # argument as _coalesce_sliced_groups): the wide tier always
        # dispatches at R=4 / the tier's qs bound, the R=0 tier at its
        # qs bound, so every batch reuses the same few executables.
        if r_g:
            r_g = _PREFIX_MAX_WIDE
        qs_g = _ladder(qs_g, _PF_TIERS)
        run_g = _ladder(run_g, (4, 8))
        merged = (kind, qs_g, T, r_g, run_g)
        groups.setdefault(merged, []).extend(members)
        _count("coalesced_pf", len(members))
    return groups


def submit_query_batch(dev, queries: list[Query],
                       sp: SearchParams,
                       no_prefix: bool = False) -> _PendingBatch:
    """Plan, group and asynchronously dispatch every device call for a
    query batch; pair with collect_query_batch.  Between the two calls
    the chip crunches this batch while the host is free to prepare and
    submit the next one (the pipelined serving path)."""
    from .utils.trace import phase

    with phase("batch.plan"):
        plans: list[Optional[_Plan]] = _build_plans(
            dev, queries, sp, no_prefix=no_prefix)
    return _submit_plans(dev, plans, queries, sp)


def _submit_plans(dev, plans: list, queries: list[Query],
                  sp: SearchParams) -> _PendingBatch:
    """Group and asynchronously dispatch already-built plans."""
    from .ops.executor import device_search_batch

    responses: list[Optional[Response]] = [
        Response() if p is None else None for p in plans]

    k = _bucket(min(sp.limit, dev.n_slots), _MIN_K)
    sharded_flag = hasattr(dev, "mesh")
    groups: dict[tuple, list[int]] = {}
    for i, plan in enumerate(plans):
        if plan is None:
            continue
        if plan.pf and sharded_flag:
            key = ("spf", plan.sl_start.shape[-1], plan.sl_T,
                   0, plan.n_run)
        elif plan.pf:
            key = ("pf", len(plan.sl_start), plan.sl_T,
                   len(plan.pf_tail), plan.n_run)
        elif _use_sliced(plan, sharded_flag, dev):
            # Wide planes (qs > 64: monster-term rows) quantize n_run
            # up onto a ladder: extra aggregation passes are no-op
            # shifted adds, while a content-dependent n_run mints a
            # fresh multi-second executable compile per batch mix
            # (measured 20-90 s stalls on the fuzzy tier, whose
            # typo-resolved monster rows vary every batch).
            n_run_k = plan.n_run
            if len(plan.sl_start) > 64 and n_run_k > 0:
                n_run_k = _ladder(n_run_k, (4, 16, 128))
            key = ("sl", len(plan.sl_start), plan.sl_T,
                   len(plan.prog_ops) if plan.use_mask else 0,
                   plan.use_mask, plan.depth, plan.single, plan.use_rows,
                   plan.h_T, n_run_k)
        elif sharded_flag and _sharded_sliced(plan, dev):
            key = ("ssl", plan.sl_start.shape[-1], plan.sl_T,
                   len(plan.prog_ops) if plan.use_mask else 0,
                   plan.use_mask, plan.depth, plan.single, plan.n_run,
                   plan.h_T, plan.use_rows)
        elif _use_blockdense(plan, sharded_flag, dev.n_slots):
            # The block kernel's signature has no postings budget:
            # every budget tier shares one executable per shape.
            key = ("bd", plan.q_start.shape[-1], len(plan.prog_ops),
                   plan.use_mask, plan.depth, plan.use_rows)
        else:
            key = plan.batch_key
        groups.setdefault(key, []).append(i)

    groups = _coalesce_sliced_groups(groups, plans)
    groups = _coalesce_prefix_groups(groups, plans)

    # Cap per-dispatch working-set: the batched executors materialize
    # O(N * budget) temporaries (or N * n_slots dense arrays for the
    # block kernel), so groups are chunked to bound device memory.
    _ELEMS_CAP = 1 << 26
    _BD_ELEMS_CAP = 1 << 26   # dense f32+u32 workspace ~0.5 GB
    chunked: list[tuple[tuple, list[int]]] = []
    for key, members in groups.items():
        if key[0] == "ssl":
            p = plans[members[0]]
            elems = max(p.sl_start.shape[-1] * p.sl_T + p.h_T, 1)
            max_n = max(1, _ELEMS_CAP // elems)
            if key[9]:                   # use_rows: [N, Ss] dense plane
                max_n = min(max_n, max(
                    1, _BD_ELEMS_CAP // max(dev.slots_per_shard, 1)))
        elif key[0] == "spf":
            elems = max(key[1] * key[2], 1)
            cap_l = (1 << 24) if key[1] > 64 else _ELEMS_CAP
            max_n = max(1, cap_l // elems)
        elif key[0] == "pf":
            elems = max(key[1] * key[2], 1)
            # Wide prefix planes (qs > 64) carry the same 3-column
            # fetch + sort copies as wide sliced planes: same ~16M
            # lane bound per dispatch so one group cannot spike HBM.
            cap_l = (1 << 24) if key[1] > 64 else _ELEMS_CAP
            max_n = max(1, cap_l // elems)
        elif key[0] == "sl":
            elems = max(key[1] * key[2] + key[8], 1)
            # Wide planes carry 3 fetched columns + sort copies
            # (~24 B/lane at peak): bound a monster group's single
            # dispatch at ~16M lanes (~0.5 GB planes) so one
            # pathological multi-monster batch cannot spike HBM.
            cap_l = (1 << 24) if key[1] > 64 else _ELEMS_CAP
            max_n = max(1, cap_l // elems)
            if key[7]:                   # use_rows
                max_n = min(max_n,
                            max(1, _BD_ELEMS_CAP // max(dev.n_slots, 1)))
        elif key[0] == "bd":
            max_n = max(1, _BD_ELEMS_CAP // max(dev.n_slots, 1))
        else:
            max_n = max(1, _ELEMS_CAP // max(plans[members[0]].budget, 1))
        for at in range(0, len(members), max_n):
            chunked.append((key, members[at: at + max_n]))

    # Launch every group's device call first (dispatch is async), then
    # collect -- device work and transfers for all groups overlap.
    # Overlap is bounded: every in-flight dispatch holds its sort /
    # plane workspace in HBM simultaneously, and on big corpora the
    # persistent snapshot already claims most of the device memory
    # (observed: RESOURCE_EXHAUSTED on the 8.8M-doc mixed trace).
    # The outstanding-lane accounting is GLOBAL (_inflight_admit):
    # pipelined serving keeps batch i's groups + its fallback sub-batch
    # + batch i+1's groups in flight simultaneously, so a per-submit
    # cap underestimates pressure by ~3x (observed: an 8-batch
    # pipelined run OOMing where single batches fit, r4).  When the
    # estimate exceeds the cap, the oldest in-flight dispatch
    # anywhere is awaited first -- serialization only under pressure.
    from .ops.executor import device_search_dense_batch
    import time as _time
    _t_dispatch = _time.perf_counter()
    sharded = sharded_flag
    pending = []
    inflight: list = []

    def _attach_last():
        # Bind the previous iteration's dispatched result arrays to its
        # in-flight entry (each loop branch appends exactly one pending
        # tuple), so later admits can block on it under HBM pressure.
        if pending and inflight and inflight[-1].arrays is None:
            inflight[-1].arrays = tuple(
                x for x in pending[-1][1:3] if hasattr(x, "device"))

    for key, members in chunked:
        _attach_last()
        sample = plans[members[0]]
        est = _row_pad(len(members),
                       key[1] if key[0] in ("sl", "pf", "spf") else 0,
                       key[2] if key[0] in ("sl", "pf", "spf") else 0,
                       pf=key[0] in ("pf", "spf")) * (
            max(key[1] * key[2] + key[8], 1) if key[0] == "sl"
            else max(key[1] * key[2], 1) if key[0] in ("pf", "ssl",
                                                       "spf")
            else max(dev.n_slots, 1) if key[0] == "bd"
            else max(getattr(sample, "budget", 0) or 0, 1 << 12))
        if key[0] in ("sl", "pf", "spf") and key[1] > 64:
            # Wide planes carry 3 fetched f32 columns plus sort
            # copies: weight their lane estimate so the global cap
            # admits at most ~one monster dispatch at a time.
            est *= 4
        inflight.append(_inflight_admit(est))
        if key[0] == "ssl":
            from .parallel.sharded import sharded_search_sliced_batch
            n = len(members)
            n_pad = _row_pad(n)
            qs_pad = sample.sl_start.shape[-1]
            prog_len = len(sample.prog_ops)
            n_dev = dev.n_dev
            t_head = sample.h_T
            sl_start = np.zeros((n_dev, n_pad, qs_pad), dtype=np.int32)
            sl_len = np.zeros((n_dev, n_pad, qs_pad), dtype=np.int32)
            sl_idf = np.zeros((n_pad, qs_pad), dtype=np.float32)
            sl_rows_b = np.zeros((n_pad, qs_pad), dtype=np.int32)
            prog_ops = np.zeros((n_pad, prog_len), dtype=np.int32)
            prog_args = np.zeros((n_pad, prog_len), dtype=np.int32)
            if t_head:
                h_start = np.zeros((n_dev, n_pad), dtype=np.int32)
                h_len = np.zeros((n_dev, n_pad), dtype=np.int32)
                h_idf = np.zeros(n_pad, dtype=np.float32)
                h_row = np.zeros(n_pad, dtype=np.int32)
                h_pass = np.zeros(n_pad, dtype=np.bool_)
            for row, i in enumerate(members):
                p = plans[i]
                sl_start[:, row] = p.sl_start
                sl_len[:, row] = p.sl_len
                sl_idf[row] = p.sl_idf
                if p.sl_rows is not None:
                    sl_rows_b[row] = p.sl_rows
                if p.use_mask:
                    prog_ops[row] = p.prog_ops
                    prog_args[row] = p.prog_args
                if t_head and p.h_T:
                    h_start[:, row] = p.h_start
                    h_len[:, row] = p.h_len
                    h_idf[row] = p.h_idf
                    h_row[row] = p.h_row
                    h_pass[row] = p.h_pass
            h_kw = dict(
                h_start=jnp.asarray(h_start), h_len=jnp.asarray(h_len),
                h_idf=jnp.asarray(h_idf), h_row=jnp.asarray(h_row),
                h_pass=jnp.asarray(h_pass)) if t_head else {}
            use_rows_g = bool(key[9])
            if use_rows_g:
                d_row_b = np.full((n_pad, _MAX_DENSE_PER_QUERY), -1,
                                  dtype=np.int32)
                d_idf_b = np.zeros((n_pad, _MAX_DENSE_PER_QUERY),
                                   dtype=np.float32)
                for row, i in enumerate(members):
                    if plans[i].d_row is not None:
                        d_row_b[row] = plans[i].d_row
                        d_idf_b[row] = plans[i].d_idf
                h_kw.update(dense_rows=dev.dense_rows,
                            d_row=jnp.asarray(d_row_b),
                            d_idf=jnp.asarray(d_idf_b))
            scores, slots = sharded_search_sliced_batch(
                dev.postings_pack, dev.alive_mask, dev.doc_len,
                jnp.asarray(sl_start), jnp.asarray(sl_len),
                jnp.asarray(sl_idf), jnp.float32(dev.adl),
                jnp.asarray(prog_ops), jnp.asarray(prog_args),
                jnp.asarray(sl_rows_b),
                mesh=dev.mesh, T=sample.sl_T, k=k, algo=sp.algo,
                use_mask=sample.use_mask, single=sample.single,
                alive_all=dev.alive_all, depth=sample.depth,
                n_run=sample.n_run, T_head=t_head, use_rows=use_rows_g,
                **h_kw,
            )
            _count("sharded_sliced", n)
            pending.append((members, scores, slots, None))
            continue
        if key[0] == "spf":
            from .parallel.sharded import sharded_search_prefix_batch
            _, qs_pad, T_g, _r, n_run_g = key
            n = len(members)
            n_pad = _row_pad(n, qs_pad, T_g, pf=True)
            n_dev = dev.n_dev
            sl_start = np.zeros((n_dev, n_pad, qs_pad), dtype=np.int32)
            sl_len = np.zeros((n_dev, n_pad, qs_pad), dtype=np.int32)
            sl_idf = np.zeros((n_pad, qs_pad), dtype=np.float32)
            for row, i in enumerate(members):
                p = plans[i]
                w = p.sl_start.shape[-1]    # coalesced rows re-pad
                sl_start[:, row, :w] = p.sl_start
                sl_len[:, row, :w] = p.sl_len
                sl_idf[row, :w] = p.sl_idf
            scores, slots = sharded_search_prefix_batch(
                dev.postings_pack, dev.alive_mask,
                jnp.asarray(sl_start), jnp.asarray(sl_len),
                jnp.asarray(sl_idf), jnp.float32(dev.adl),
                mesh=dev.mesh, T=T_g, k=k, algo=sp.algo,
                alive_all=dev.alive_all, n_run=n_run_g,
                k_ret=min(sp.limit, k))
            _count("prefix", n)
            _count("prefix_exact", n)
            _count("sharded_prefix", n)
            pending.append((members, scores, slots, None))
            continue
        if key[0] == "pf":
            from .ops.executor import (device_search_prefix_packed,
                                       pack_prefix_group)
            _, qs_pad, T_g, r_pad, n_run_g = key
            n = len(members)
            n_pad = _row_pad(n, qs_pad, T_g, pf=True)
            sl_start = np.zeros((n_pad, qs_pad), dtype=np.int32)
            sl_len = np.zeros((n_pad, qs_pad), dtype=np.int32)
            sl_idf = np.zeros((n_pad, qs_pad), dtype=np.float32)
            pf_bits = np.zeros((n_pad, qs_pad), dtype=np.int32)
            pf_tail = np.zeros((n_pad, r_pad), dtype=np.float32)
            pf_start = np.zeros((n_pad, r_pad), dtype=np.int32)
            pf_len = np.zeros((n_pad, r_pad), dtype=np.int32)
            pf_idf = np.zeros((n_pad, r_pad), dtype=np.float32)
            for row, i in enumerate(members):
                p = plans[i]
                w = len(p.sl_start)       # coalesced rows re-pad
                r = len(p.pf_tail)
                sl_start[row, :w] = p.sl_start
                sl_len[row, :w] = p.sl_len
                sl_idf[row, :w] = p.sl_idf
                pf_bits[row, :w] = p.pf_bits
                pf_tail[row, :r] = p.pf_tail
                pf_start[row, :r] = p.pf_start
                pf_len[row, :r] = p.pf_len
                pf_idf[row, :r] = p.pf_idf
            buf = pack_prefix_group(sl_start, sl_len, sl_idf, pf_bits,
                                    pf_tail, pf_start, pf_len, pf_idf)
            packed = _dispatch_oom_retry(lambda: (
                device_search_prefix_packed(
                    dev.postings_pack, dev.alive_mask, jnp.asarray(buf),
                    dev.adl_dev, qs=qs_pad, R=r_pad, T=T_g, k=k,
                    M=_prefix_m(sp, r_pad), algo=sp.algo,
                    n_slots=dev.n_slots,
                    alive_all=dev.alive_all, n_run=n_run_g,
                    k_ret=min(sp.limit, k))))
            _count("prefix", n)
            pending.append((members, packed, None, "prefix"))
            continue
        if key[0] == "sl":
            from .ops.executor import (device_search_sliced_packed,
                                       pack_sliced_group)
            # Group params come from the KEY: coalesced groups carry
            # widened maxima there, and member rows re-pad below.
            (_, qs_pad, T_g, L_key, use_mask_g, depth_g, single_g,
             use_rows_g, t_head, n_run_g) = key
            prog_len = L_key or 1
            n = len(members)
            n_pad = _row_pad(n, qs_pad, T_g)
            sl_start = np.zeros((n_pad, qs_pad), dtype=np.int32)
            sl_len = np.zeros((n_pad, qs_pad), dtype=np.int32)
            sl_idf = np.zeros((n_pad, qs_pad), dtype=np.float32)
            sl_rows = np.zeros((n_pad, qs_pad), dtype=np.int32) \
                if (n_run_g and use_mask_g) else None
            if use_mask_g:
                prog_ops = np.zeros((n_pad, prog_len), dtype=np.int32)
                prog_args = np.zeros((n_pad, prog_len), dtype=np.int32)
            if use_rows_g:
                d_row = np.full((n_pad, _MAX_DENSE_PER_QUERY), -1,
                                dtype=np.int32)
                d_idf = np.zeros((n_pad, _MAX_DENSE_PER_QUERY),
                                 dtype=np.float32)
            masked_rows = bool(use_mask_g and use_rows_g)
            if masked_rows:
                d_bit = np.full((n_pad, _MAX_DENSE_PER_QUERY), -1,
                                dtype=np.int32)
                d_pass = np.zeros(
                    (n_pad, 1 << _MAX_DENSE_PER_QUERY), dtype=np.bool_)
            if t_head:
                h_start = np.zeros(n_pad, dtype=np.int32)
                h_len = np.zeros(n_pad, dtype=np.int32)
                h_idf = np.zeros(n_pad, dtype=np.float32)
                h_row = np.zeros(n_pad, dtype=np.int32)
                h_pass = np.zeros(n_pad, dtype=np.bool_)
            for row, i in enumerate(members):
                p = plans[i]
                w = len(p.sl_start)
                sl_start[row, :w] = p.sl_start
                sl_len[row, :w] = p.sl_len
                sl_idf[row, :w] = p.sl_idf
                if sl_rows is not None:
                    sl_rows[row, :w] = p.sl_rows
                if use_mask_g:
                    lp = len(p.prog_ops)
                    prog_ops[row, :lp] = p.prog_ops
                    prog_args[row, :lp] = p.prog_args
                if use_rows_g and p.d_row is not None:
                    d_row[row] = p.d_row
                    d_idf[row] = p.d_idf
                if masked_rows:
                    d_bit[row] = p.d_qpos
                    if p.d_pass is not None:
                        d_pass[row] = p.d_pass
                if t_head and p.h_T:
                    h_start[row] = p.h_start
                    h_len[row] = p.h_len
                    h_idf[row] = p.h_idf
                    h_row[row] = p.h_row
                    h_pass[row] = p.h_pass
            buf = pack_sliced_group(
                sl_start, sl_len, sl_idf,
                prog_ops if use_mask_g else None,
                prog_args if use_mask_g else None,
                d_row if use_rows_g else None,
                d_idf if use_rows_g else None,
                h_start if t_head else None,
                h_len if t_head else None,
                h_idf if t_head else None,
                h_row if t_head else None,
                h_pass if t_head else None,
                sl_rows,
                d_bit if masked_rows else None,
                d_pass if masked_rows else None)
            packed = _dispatch_oom_retry(lambda: (
                device_search_sliced_packed(
                    dev.postings_pack, dev.alive_mask, dev.doc_len,
                    jnp.asarray(buf), dev.adl_dev,
                    dev.dense_rows if use_rows_g else None,
                    qs=qs_pad, L=prog_len, D=_MAX_DENSE_PER_QUERY,
                    T=T_g, k=k, algo=sp.algo, n_slots=dev.n_slots,
                    use_mask=use_mask_g, single=single_g,
                    alive_all=dev.alive_all, use_rows=use_rows_g,
                    depth=depth_g, T_head=t_head, n_run=n_run_g,
                )))
            _count("sliced", n)
            if t_head:
                _count("sliced_head", n)
            pending.append((members, packed, None, "sliced"))
            continue
        if _use_blockdense(sample, sharded, dev.n_slots):
            from .ops.executor import device_search_blockdense_batch
            n = len(members)
            n_pad = _row_pad(n)
            q_pad = sample.q_start.shape[-1]
            prog_len = len(sample.prog_ops)
            q_start = np.zeros((n_pad, q_pad), dtype=np.int32)
            q_len = np.zeros((n_pad, q_pad), dtype=np.int32)
            q_idf = np.zeros((n_pad, q_pad), dtype=np.float32)
            prog_ops = np.zeros((n_pad, prog_len), dtype=np.int32)
            prog_args = np.zeros((n_pad, prog_len), dtype=np.int32)
            d_qpos = np.full((n_pad, _MAX_DENSE_PER_QUERY), -1,
                             dtype=np.int32)
            d_row = np.full((n_pad, _MAX_DENSE_PER_QUERY), -1,
                            dtype=np.int32)
            for row, i in enumerate(members):
                p = plans[i]
                q_start[row] = p.q_start
                q_len[row] = p.q_len
                q_idf[row] = p.q_idf
                prog_ops[row] = p.prog_ops
                prog_args[row] = p.prog_args
                if p.d_qpos is not None:
                    d_qpos[row] = p.d_qpos
                    d_row[row] = p.d_row
            from .ops.executor import device_search_blockdense_cached
            # The legacy-column derivation below transiently allocates
            # ~2x 2 GB beside the pack: drain queued work first so the
            # spike has the whole free-HBM headroom.
            _inflight_drain()
            all_tids = []
            for i in members:
                p = plans[i]
                dense_pos = {int(x) for x in p.d_qpos if x >= 0} \
                    if p.d_qpos is not None else set()
                all_tids.extend(int(t) for j, t in enumerate(p.term_ids)
                                if j not in dense_pos)
            crow_map = dev.bounds_crows(all_tids)
            q_crow = np.zeros((n_pad, q_pad), dtype=np.int32)
            for row, i in enumerate(members):
                q_crow[row] = _kernel_crows(dev, plans[i], crow_map)
            packed = _dispatch_oom_retry(lambda: (
                device_search_blockdense_cached(
                    dev.postings_slot, dev.postings_ltf, dev.doc_len,
                    dev.alive_mask, dev._bounds_cache,
                    jnp.asarray(q_crow),
                    jnp.asarray(q_idf), dev.adl_dev,
                    jnp.asarray(prog_ops), jnp.asarray(prog_args),
                    dev.dense_rows, jnp.asarray(d_qpos),
                    jnp.asarray(d_row),
                    k=k, algo=sp.algo, n_slots=dev.n_slots,
                    use_mask=sample.use_mask, depth=sample.depth,
                    use_rows=sample.use_rows,
                )))
            _count("blockdense", n)
            pending.append((members, packed, None, "packed"))
            continue
        _inflight_drain()      # candidate/dense: same column spike
        n = len(members)
        n_pad = _row_pad(n)
        q_pad = sample.q_start.shape[-1]
        prog_len = len(sample.prog_ops)
        lead = (dev.n_dev,) if sharded else ()
        # Query axis placement: [n_dev, N, Q] sharded, [N, Q] otherwise.
        q_start = np.zeros(lead + (n_pad, q_pad), dtype=np.int32)
        q_len = np.zeros(lead + (n_pad, q_pad), dtype=np.int32)
        q_idf = np.zeros((n_pad, q_pad), dtype=np.float32)
        prog_ops = np.zeros((n_pad, prog_len), dtype=np.int32)
        prog_args = np.zeros((n_pad, prog_len), dtype=np.int32)
        for row, i in enumerate(members):
            p = plans[i]
            if sharded:
                q_start[:, row] = p.q_start
                q_len[:, row] = p.q_len
            else:
                q_start[row] = p.q_start
                q_len[row] = p.q_len
            q_idf[row] = p.q_idf
            prog_ops[row] = p.prog_ops
            prog_args[row] = p.prog_args
        if sharded:
            from .parallel.sharded import sharded_search_batch
            scores, slots = sharded_search_batch(
                dev.postings_slot, dev.postings_ltf, dev.doc_len,
                dev.alive_mask,
                jnp.asarray(q_start), jnp.asarray(q_len),
                jnp.asarray(q_idf), jnp.float32(dev.adl),
                jnp.asarray(prog_ops), jnp.asarray(prog_args),
                mesh=dev.mesh, budget=sample.budget, k=k, algo=sp.algo,
                use_mask=sample.use_mask, depth=sample.depth,
                use_kernel=_sharded_kernel(sample, dev),
                use_dense=sample.use_dense,
            )
            _count("sharded_fallback", n)
        elif sample.use_dense:
            scores, slots = _dispatch_oom_retry(lambda: (
                device_search_dense_batch(
                    dev.postings_slot, dev.postings_ltf, dev.doc_len,
                    dev.alive_mask,
                    jnp.asarray(q_start), jnp.asarray(q_len),
                    jnp.asarray(q_idf), dev.adl_dev,
                    jnp.asarray(prog_ops), jnp.asarray(prog_args),
                    budget=sample.budget, k=k, algo=sp.algo,
                    n_slots=dev.n_slots,
                    use_mask=sample.use_mask, depth=sample.depth,
                )))
            _count("dense", n)
        else:
            _count("candidate", n)
            scores, slots = _dispatch_oom_retry(lambda: (
                device_search_batch(
                    dev.postings_slot, dev.postings_ltf, dev.doc_len,
                    dev.alive_mask,
                    jnp.asarray(q_start), jnp.asarray(q_len),
                    jnp.asarray(q_idf), dev.adl_dev,
                    jnp.asarray(prog_ops), jnp.asarray(prog_args),
                    budget=sample.budget, k=k, algo=sp.algo,
                    use_mask=sample.use_mask, depth=sample.depth,
                )))
        pending.append((members, scores, slots, None))

    _attach_last()
    if any(key[0] not in ("pf", "sl", "ssl", "spf")
           for key, _m in chunked) \
            and hasattr(dev, "drop_legacy_cols"):
        # A blockdense/candidate/dense group consumed the derived
        # legacy columns: release the cache so the 3.9 GB frees as
        # soon as the queued work completes.
        dev.drop_legacy_cols()

    # Enqueue the consolidated-fetch concat NOW, inside this batch's
    # device wave (see _PendingBatch.fetch_concat): packed groups
    # flatten to [N, d], pad d to the batch max, and one concat makes
    # the whole batch ONE device->host transfer at collect time.
    fetch_concat = None
    packed_ix = [i for i, p in enumerate(pending)
                 if p[3] in ("packed", "sliced", "prefix")]
    if len(packed_ix) >= 2:
        try:
            flats = []
            dims = []
            for i in packed_ix:
                a = pending[i][1]
                d = int(np.prod(a.shape[1:]))
                flats.append(a.reshape(a.shape[0], d))
                dims.append(d)
            d_max = max(dims)
            flats = [jnp.pad(f, ((0, 0), (0, d_max - f.shape[1])))
                     if f.shape[1] < d_max else f for f in flats]
            fetch_concat = (jnp.concatenate(flats, axis=0), dims,
                            packed_ix)
        except Exception as e:
            # A transient backend RESOURCE_EXHAUSTED on the enqueue:
            # collect falls back to per-group fetches (extra RTTs,
            # exact results) instead of failing the batch.
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            _trace_logger().warning(
                "fetch-concat enqueue RESOURCE_EXHAUSTED; collect "
                "will fetch per group")
    return _PendingBatch(plans=plans, responses=responses,
                         chunked=chunked, pending=pending, k=k,
                         t_dispatch=_t_dispatch,
                         t_submitted=_time.perf_counter(),
                         queries=queries, inflight=inflight,
                         fetch_concat=fetch_concat)


def collect_query_batch(dev, st: _PendingBatch, sp: SearchParams,
                        defer_fallback: bool = False):
    """Fetch a submitted batch's device results and build responses.

    With ``defer_fallback=True`` the uncertified prefix rows are NOT
    re-run here; the call returns ``(responses, fallback_ix)`` and the
    caller must pass them through ``_submit_fallback`` /
    ``_finish_fallback``.  The pipelined serving loop uses this to
    enqueue the re-run sub-batch BEFORE the next batch's device groups
    (a fallback submitted after them would wait behind a whole batch
    of device work, serializing the pipeline -- measured as collect
    phases of ~500 ms/batch, half the batch budget, in r3 profiling).
    """
    import os as _os
    import time as _time

    plans, responses = st.plans, st.responses
    chunked, pending, k = st.chunked, st.pending, st.k

    # NXS_PROFILE_GROUPS=1: block on each group's result in dispatch
    # order and log (key, n, ms) -- the chip executes dispatches in
    # launch order, so the deltas attribute device time per signature
    # group (the dispatch above was still fully async).
    if _os.environ.get("NXS_PROFILE_GROUPS"):
        import jax as _jax
        _plog = _trace_logger()
        _pt = _time.perf_counter()
        for (_key, _members), _p in zip(chunked, pending):
            _jax.block_until_ready(
                [x for x in (_p[1], _p[2]) if hasattr(x, "device")])
            _now = _time.perf_counter()
            _plog.info("group %s n=%d device %.2f ms (%.0f us/q)",
                       _key, len(_members), (_now - _pt) * 1e3,
                       (_now - _pt) * 1e6 / max(len(_members), 1))
            _pt = _now

    from .ops.executor import unpack_blockdense

    _t_fetch = _time.perf_counter()
    # Consume the consolidated fetch enqueued AT SUBMIT TIME (one
    # device->host transfer for every packed group; each separate
    # fetch is a full round trip, ~27 ms measured).  The concat array
    # computed inside this batch's own device wave, so this np.asarray
    # is a transfer of ready data -- it does not queue behind the next
    # pipelined batch's groups.
    if st.fetch_concat is not None:
        try:
            concat_dev, dims, packed_ix = st.fetch_concat
            arr = np.asarray(concat_dev)
            at = 0
            for i, d in zip(packed_ix, dims):
                members_i, packed_i, extra_i, tag_i = pending[i]
                n_i = packed_i.shape[0]
                sl = arr[at: at + n_i, :d].reshape(
                    (n_i,) + tuple(packed_i.shape[1:]))
                pending[i] = (members_i, sl, extra_i, tag_i)
                at += n_i
        except Exception as e:
            # A poisoned concat (transient backend exhaustion): the
            # group results themselves are usually healthy, so fall
            # back to per-group fetches (extra RTTs, exact results).
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            _trace_logger().warning(
                "consolidated fetch RESOURCE_EXHAUSTED; falling back "
                "to per-group fetches")

    _t_resp = _time.perf_counter()
    fallback_ix: list[int] = []
    for members, scores, slots, tag in pending:
        if tag == "packed":
            scores, slots = unpack_blockdense(scores)
        elif tag == "sliced":
            from .ops.executor import unpack_sliced
            scores, slots = unpack_sliced(scores)
        elif tag == "prefix":
            from .ops.executor import unpack_prefix
            scores, slots, exact = unpack_prefix(scores)
            n_m = len(members)
            ok = exact[:n_m]
            _count("prefix_exact", int(ok.sum()))
            if not ok.all():
                # Certification failed for these rows: queue them for
                # the classic re-run below (exact for every shape).
                fallback_ix.extend(
                    members[r] for r in np.nonzero(~ok)[0])
            members = [i for r, i in enumerate(members) if ok[r]]
            scores = scores[:n_m][ok]
            slots = slots[:n_m][ok]
        else:
            scores = np.asarray(scores)
            slots = np.asarray(slots)
        _to_responses_group(dev, members, scores, slots, plans, sp,
                            responses)

    # Every group's results are on host: return the HBM reservation
    # before any fallback sub-batch dispatches.
    _inflight_release(st.inflight or ())

    if fallback_ix and not defer_fallback:
        _finish_fallback(dev, _submit_fallback(dev, st, fallback_ix, sp),
                         fallback_ix, sp, responses)
        fallback_ix = []

    _trace_log = _trace_logger()
    if _trace_log.isEnabledFor(10):      # logging.DEBUG
        _t_end = _time.perf_counter()
        _trace_log.debug(
            "batch.exec: %d groups, dispatch %.1f ms, fetch %.1f ms, "
            "respond %.1f ms",
            len(chunked), (st.t_submitted - st.t_dispatch) * 1e3,
            (_t_resp - _t_fetch) * 1e3, (_t_end - _t_resp) * 1e3)
    if defer_fallback:
        return responses, fallback_ix
    return responses  # type: ignore[return-value]


def _submit_fallback(dev, st: _PendingBatch, fallback_ix: list[int],
                     sp: SearchParams) -> _PendingBatch:
    """Dispatch one classic sub-batch covering every uncertified
    prefix row (async; pair with _finish_fallback)."""
    _count("prefix_fallback", len(fallback_ix))
    fb_queries = [st.queries[i] for i in fallback_ix]
    fb_st = submit_query_batch(dev, fb_queries, sp, no_prefix=True)
    # A no-prefix batch must never contain prefix groups -- a leak
    # here would recurse unboundedly.
    assert not any(p[3] == "prefix" for p in fb_st.pending), \
        "no_prefix planning leaked a prefix plan"
    return fb_st


def _finish_fallback(dev, fb_st: _PendingBatch, fallback_ix: list[int],
                     sp: SearchParams, responses: list) -> None:
    """Collect a fallback sub-batch into the main responses."""
    fb_responses = collect_query_batch(dev, fb_st, sp)
    for i, resp in zip(fallback_ix, fb_responses):
        responses[i] = resp


@functools.lru_cache(maxsize=1)
def _trace_logger():
    from .utils.log import get_logger
    return get_logger("trace")


def _to_responses_group(dev, members, scores, slots, plans, sp,
                        responses) -> None:
    """Vectorized _to_response over one result group: one perm/doc-id
    gather for the whole [N, k] block instead of N small-array passes
    (~60 us/query of host time at batch scale).  Falls back to the
    per-row path when a delta must be merged (rare in serving: only
    between a mutation and the next refresh).

    A RESOURCE_EXHAUSTED surfacing at these fetches means the already-
    dispatched computation itself failed -- the result is poisoned and
    a retry cannot recover it, so only dispatch-time exhaustion is
    retried (_dispatch_oom_retry); fetch-time exhaustion propagates."""
    scores = np.asarray(scores)
    slots = np.asarray(slots)
    if getattr(dev, "has_delta", False):
        for row, i in enumerate(members):
            responses[i] = _to_response(
                dev, scores[row], slots[row], sp.limit,
                delta=_delta_results(dev, plans[i], sp))
        return
    n, k = scores.shape
    matched = scores > 0.0
    # Unmatched rows may carry padding slot indexes past the host slot
    # count; clamp them to 0 before the gathers (they are dropped).
    safe = np.where(matched, slots, 0).astype(np.int64)
    perm = getattr(dev, "slot_perm", None)
    if perm is not None:
        safe = perm[safe]
    ids = np.asarray(dev.doc_ids)[safe]
    # top_k scores are descending, so the matched mask is a prefix:
    # each row's results are a SLICE, and Response keeps the numpy
    # rows, materializing (doc_id, score) tuples only on demand.
    counts = np.minimum(matched.sum(axis=1), sp.limit).tolist()
    for row, i in enumerate(members):
        c = counts[row]
        responses[i] = Response.from_arrays(ids[row, :c], scores[row, :c])


def search(dev: DeviceIndex, pipeline, query_str: str,
           sp: SearchParams, fuzzy_lookup=None) -> Response:
    """Full search path against an up-to-date device snapshot."""
    root = parse_query(query_str)
    check_nesting(root)
    query = prepare(root, pipeline, dev.host.term_lookup,
                    fuzzy_lookup=fuzzy_lookup, fuzzymatch=sp.fuzzymatch)
    return execute_query(dev, query, sp)


# Fast-path term-count bound: a left-folded OR chain of N leaves puts
# its deepest leaf at recursion depth N-1, so the reference's nesting
# limit of 100 (search.c:66-75) first fires at 102 terms; the value
# list is only taken below that (check_nesting on the built chain
# raises for parity otherwise).
_FAST_MAX_TERMS = QUERY_NESTING_LIMIT + 1


def _prepare_many(dev, pipeline, query_strs: list[str],
                  sp: SearchParams, fuzzy_lookup=None,
                  fuzzy_prefetch=None) -> list[Query]:
    """Host query prep for a batch.

    Work is deduplicated across the *batch*, not per query: each
    unique raw value is filtered once (one native call primes the
    memo), each unique filtered token is resolved against the term
    dictionary once, and all fuzzy misses resolve in one batched
    dispatch.  Plain term queries (the overwhelming serving majority)
    skip AST construction entirely -- their Query carries the resolved
    token list and a ``pure_or`` flag.  Only chains of the pure
    builtin filters take the batched path: plugin filters may be
    stateful, so they keep the reference's per-leaf run order.
    """
    from .query.parser import parse_fast_values
    from .utils.trace import phase

    if getattr(pipeline, "_memo", None) is None:
        # Non-memoizable (stateful plugin) chain: per-query reference
        # flow, one pipeline run per leaf occurrence.
        out = []
        for query_str in query_strs:
            root = parse_query(query_str)
            check_nesting(root)
            out.append(prepare(root, pipeline, dev.host.term_lookup,
                               fuzzy_lookup=(fuzzy_lookup
                                             if sp.fuzzymatch else None),
                               fuzzymatch=sp.fuzzymatch))
        return out

    with phase("prep.parse"):
        fast_vals: list[Optional[list[str]]] = []
        roots: list[Optional[Expr]] = []
        slow_ix: list[int] = []
        for i, query_str in enumerate(query_strs):
            vals = parse_fast_values(query_str)
            if vals is not None and len(vals) <= _FAST_MAX_TERMS:
                fast_vals.append(vals)
                roots.append(None)
            else:
                root = parse_query(query_str)
                check_nesting(root)
                fast_vals.append(None)
                roots.append(root)
                slow_ix.append(i)

    # Unique raw values across the whole batch (insertion-ordered).
    uniq: dict[str, None] = {}
    for vals in fast_vals:
        if vals:
            for v in vals:
                uniq[v] = None
    for i in slow_ix:
        for leaf in roots[i].walk_leaves():
            uniq[leaf.value] = None

    prime = getattr(pipeline, "prime", None)
    if prime is not None:
        # One native call filters the batch's unique values into the
        # pipeline memo; run() below is then a small-dict hit.
        with phase("prep.prime"):
            prime(list(uniq))

    with phase("prep.resolve"):
        run = pipeline.run
        fmap = {v: run(v) for v in uniq}         # raw -> filtered|None
        lookup = dev.host.term_lookup
        tid_map: dict[str, Optional[int]] = {}   # filtered -> term id
        missing: list[str] = []
        for f in fmap.values():
            if f is None or f in tid_map:
                continue
            t = lookup(f)
            tid_map[f] = t
            if t is None:
                missing.append(f)

    if missing and sp.fuzzymatch and fuzzy_lookup is not None:
        # One batched fuzzy dispatch for every miss, then per-value
        # cache hits.
        with phase("prep.fuzzy"):
            if fuzzy_prefetch is not None:
                fuzzy_prefetch(sorted(missing))
            for f in missing:
                tid_map[f] = fuzzy_lookup(f)

    with phase("prep.prepare"):
        out = []
        tid_get = tid_map.get
        for i, query_str in enumerate(query_strs):
            vals = fast_vals[i]
            if vals is None:
                # Boolean/quoted query: reference prepare() over the
                # AST; term resolution (incl. fuzzy) comes from the
                # batch maps, so no big-dict or device work remains.
                out.append(prepare(roots[i], pipeline, tid_get,
                                   fuzzy_lookup=None,
                                   fuzzymatch=sp.fuzzymatch))
                continue
            q = Query(root=_PURE_OR_ROOT, pure_or=True)
            tset = q.tokens
            tmap = tset._map
            tlist = tset.tokens
            for v in vals:
                f = fmap[v]
                if f is None:
                    continue            # filter discarded (stopword)
                tok = tmap.get(f)
                if tok is not None:
                    tok.count += 1
                    tset.seen += 1
                    continue
                tid = tid_get(f)
                if tid is None:
                    continue            # TRIM: no matching term
                tok = Token(value=f, count=1, term_id=tid)
                tmap[f] = tok
                tlist.append(tok)
                tset.seen += 1
                tset.data_len += len(f.encode("utf-8"))
            out.append(q)
        return out


def search_many(dev, pipeline, query_strs: list[str],
                sp: SearchParams, fuzzy_lookup=None,
                fuzzy_prefetch=None) -> list[Response]:
    """Batched search path: one device dispatch per signature group."""
    prepared = _prepare_many(dev, pipeline, query_strs, sp,
                             fuzzy_lookup, fuzzy_prefetch)
    return execute_query_batch(dev, prepared, sp)


def search_many_pipelined(dev, pipeline, batches: list[list[str]],
                          sp: SearchParams, fuzzy_lookup=None,
                          fuzzy_prefetch=None) -> list[list[Response]]:
    """Streaming serving path: overlap host work with device work.

    Batch i+1 is prepared, planned and dispatched while the chip is
    still crunching batch i (dispatch is async; only the result fetch
    blocks), so steady-state throughput approaches
    max(host time, device time) per batch instead of their sum.
    Results are identical to per-batch search_many.
    """
    from .utils.trace import phase

    out: list[Optional[list[Response]]] = [None] * len(batches)
    prev_st = None
    prev_i = -1
    for i, query_strs in enumerate(batches):
        with phase("pipeline.prepare"):
            prepared = _prepare_many(dev, pipeline, query_strs, sp,
                                     fuzzy_lookup, fuzzy_prefetch)
        # Submit batch i BEFORE collecting batch i-1: planning,
        # packing and the upload/dispatch sync all happen while the
        # chip still crunches i-1 (collect-first left the device idle
        # through the whole ~200 ms submit window every cycle --
        # measured r5, the steady-state batch wall was prepare +
        # collect + submit SERIAL).  The price is that an uncertified
        # prefix row's re-run now queues behind batch i's device work
        # -- acceptable since certification restructuring made
        # fallbacks empty on the serving mix (prefix == prefix_exact);
        # when one does fire it costs one extra batch of latency, not
        # correctness.
        with phase("pipeline.submit"):
            st = submit_query_batch(dev, prepared, sp)
        if prev_st is not None:
            with phase("pipeline.collect"):
                resp_prev, fb_ix = collect_query_batch(
                    dev, prev_st, sp, defer_fallback=True)
                fb_st = _submit_fallback(dev, prev_st, fb_ix, sp) \
                    if fb_ix else None
            with phase("pipeline.fallback"):
                if fb_st is not None:
                    _finish_fallback(dev, fb_st, fb_ix, sp, resp_prev)
                out[prev_i] = resp_prev
        prev_st, prev_i = st, i
    if prev_st is not None:
        with phase("pipeline.collect"):
            out[prev_i] = collect_query_batch(dev, prev_st, sp)
    return out  # type: ignore[return-value]
