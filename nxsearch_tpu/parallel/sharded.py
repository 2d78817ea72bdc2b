"""Doc-sharded search over a JAX device mesh.

The reference's only parallelism is multi-process index sharing on one
node via mmap + flock (SURVEY §2.8).  The TPU-native scale-out story is
*document sharding*: the doc-slot space is partitioned contiguously
across the mesh's ``docs`` axis, each chip holds its shard of the
postings (its rows of every term's posting list) and its shard of the
document table, and a query executes as:

    shard-local gather -> score -> boolean mask -> dense scatter
    -> shard-local top-k                      (pure local compute)
    -> all_gather of the per-shard top-k      (one small ICI collective)
    -> global top-k merge                     (replicated)

The only cross-chip traffic is ``n_dev * k`` candidate (score, slot)
pairs -- the collective rides ICI, never the postings.  This mirrors
the classic distributed-search scatter/gather but expressed as a
single SPMD program under ``shard_map``.

Scoring/mask math is identical to the single-chip executor
(ops/executor.py); correctness of the merge follows from every global
top-k document being in its own shard's local top-k.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.hostindex import HostIndex
from ..ops.executor import candidate_topk


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis: str = "docs") -> Mesh:
    """A 1-D mesh over the available devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _bucket(n: int, minimum: int) -> int:
    size = minimum
    while size < n:
        size <<= 1
    return size


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "budget", "k", "algo", "use_mask", "depth"),
)
def sharded_search(
    postings_slot: jax.Array,   # int32[n_dev, Ps_pad] shard-local slots
    postings_ltf: jax.Array,    # float32[n_dev, Ps_pad]
    doc_len: jax.Array,         # float32[n_dev, Ss]
    alive_mask: jax.Array,      # uint32[n_dev, Ss/32]
    q_start: jax.Array,         # int32[n_dev, Q] per-shard CSR starts
    q_len: jax.Array,           # int32[n_dev, Q]
    q_idf: jax.Array,           # float32[Q] (replicated)
    adl: jax.Array,             # float32 scalar (replicated)
    prog_ops: jax.Array,
    prog_args: jax.Array,
    *,
    mesh: Mesh,
    budget: int,                # per-shard postings budget
    k: int,
    algo: int,
    use_mask: bool,
    depth: int = 8,
):
    """Returns replicated (scores f32[k'], global slots i32[k'])."""
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    slots_per_shard = doc_len.shape[1]
    k_local = min(k, budget)
    k_final = min(k, n_dev * k_local)

    def shard_body(pslot, pltf, dlen, am, qs, qlen, qidf, adl_s,
                   pops, pargs):
        local_scores, local_slots = candidate_topk(
            pslot[0], pltf[0], dlen[0], am[0], qs[0], qlen[0],
            qidf, adl_s, pops, pargs,
            budget=budget, k=k_local, algo=algo,
            use_mask=use_mask, depth=depth)
        global_slots = (local_slots
                        + lax.axis_index(axis) * slots_per_shard)

        # Merge candidates across the mesh: n_dev * k_local pairs over
        # ICI, then an identical top-k on every chip (replicated out).
        all_scores = lax.all_gather(local_scores, axis).reshape(-1)
        all_slots = lax.all_gather(global_slots, axis).reshape(-1)
        m_scores, m_idx = lax.top_k(all_scores, k_final)
        return m_scores, all_slots[m_idx]

    sharded = P(mesh.axis_names[0], None)
    repl = P()
    return jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded, sharded, sharded,
                  repl, repl, repl, repl),
        out_specs=(repl, repl),
        check_vma=False,
    )(postings_slot, postings_ltf, doc_len, alive_mask, q_start, q_len,
      q_idf, adl, prog_ops, prog_args)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "budget", "k", "algo", "use_mask", "depth"),
)
def sharded_search_batch(
    postings_slot: jax.Array,   # int32[n_dev, Ps_pad]
    postings_ltf: jax.Array,    # float32[n_dev, Ps_pad]
    doc_len: jax.Array,         # float32[n_dev, Ss]
    alive_mask: jax.Array,      # uint32[n_dev, Ss/32]
    q_start: jax.Array,         # int32[n_dev, N, Q] per-shard, per-query
    q_len: jax.Array,           # int32[n_dev, N, Q]
    q_idf: jax.Array,           # float32[N, Q] (replicated)
    adl: jax.Array,             # float32 scalar (replicated)
    prog_ops: jax.Array,        # int32[N, L] (replicated)
    prog_args: jax.Array,
    *,
    mesh: Mesh,
    budget: int,
    k: int,
    algo: int,
    use_mask: bool,
    depth: int = 8,
):
    """Batched doc-sharded search: vmap of the candidate core inside
    the shard_map body, one ICI all_gather for the whole batch.
    Returns replicated (scores f32[N, k'], global slots i32[N, k'])."""
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    slots_per_shard = doc_len.shape[1]
    k_local = min(k, budget)
    k_final = min(k, n_dev * k_local)

    def shard_body(pslot, pltf, dlen, am, qs, qlen, qidf, adl_s,
                   pops, pargs):
        def one(q_s, q_l, q_i, p_o, p_a):
            return candidate_topk(
                pslot[0], pltf[0], dlen[0], am[0], q_s, q_l, q_i, adl_s,
                p_o, p_a, budget=budget, k=k_local, algo=algo,
                use_mask=use_mask, depth=depth)

        local_scores, local_slots = jax.vmap(one)(
            qs[0], qlen[0], qidf, pops, pargs)     # [N, k_local]
        global_slots = (local_slots
                        + lax.axis_index(axis) * slots_per_shard)
        all_scores = lax.all_gather(local_scores, axis, axis=1)
        all_slots = lax.all_gather(global_slots, axis, axis=1)
        n = all_scores.shape[0]
        all_scores = all_scores.reshape(n, -1)
        all_slots = all_slots.reshape(n, -1)
        m_scores, m_idx = lax.top_k(all_scores, k_final)
        return m_scores, jnp.take_along_axis(all_slots, m_idx, axis=1)

    sharded = P(mesh.axis_names[0], None)
    sharded3 = P(mesh.axis_names[0], None, None)
    repl = P()
    return jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded, sharded3, sharded3,
                  repl, repl, repl, repl),
        out_specs=(repl, repl),
        check_vma=False,
    )(postings_slot, postings_ltf, doc_len, alive_mask, q_start, q_len,
      q_idf, adl, prog_ops, prog_args)


class ShardedDeviceIndex:
    """Doc-sharded device mirror of one HostIndex generation.

    Same refresh contract as index.device.DeviceIndex, but arrays have
    a leading ``n_dev`` axis laid out with NamedSharding over the mesh,
    and every shard carries its own CSR row pointers (a term's posting
    list is split by the doc-slot partition).
    """

    _MIN_SLOTS = 1024       # per shard; keeps mask words VPU-aligned
    _MIN_POSTINGS = 4096    # per shard

    def __init__(self, host: HostIndex, mesh: Mesh):
        self.host = host
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n_dev = mesh.shape[self.axis]
        self.generation = -1
        self.doc_ids = np.zeros(0, dtype=np.int64)
        self.doc_count = 0
        self.token_count = 0
        self.n_slots = 0            # global padded slot count
        self.slots_per_shard = 0
        self.postings_slot = None   # [n_dev, Ps_pad] device
        self.postings_ltf = None
        self.doc_len = None         # [n_dev, Ss] device
        self.alive_mask = None      # [n_dev, Ss/32] device
        self.shard_starts = None    # host int64[n_dev, T+1]
        self.term_df = np.zeros(0, dtype=np.int64)

    def refresh(self) -> bool:
        if self.generation == self.host.generation:
            return False
        snap = self.host.build_csr()
        self.term_df = snap["term_df"]
        self.doc_ids = snap["doc_ids"]
        self.doc_count = snap["doc_count"]
        self.token_count = snap["token_count"]

        nterms = len(snap["term_starts"]) - 1
        n_live = len(snap["doc_ids"])
        ss = _bucket(-(-max(n_live, 1) // self.n_dev), self._MIN_SLOTS)
        self.slots_per_shard = ss
        self.n_slots = ss * self.n_dev

        slots = snap["postings_slot"].astype(np.int64)
        counts = np.diff(snap["term_starts"])
        term_of = np.repeat(np.arange(nterms, dtype=np.int64), counts)
        shard_of = slots // ss

        # Per-(shard, term) histogram -> per-shard CSR row pointers.
        per = np.zeros((self.n_dev, nterms), dtype=np.int64)
        np.add.at(per, (shard_of, term_of), 1)
        starts = np.zeros((self.n_dev, nterms + 1), dtype=np.int64)
        np.cumsum(per, axis=1, out=starts[:, 1:])
        self.shard_starts = starts

        ps_pad = _bucket(int(starts[:, -1].max()) if self.n_dev else 0,
                         self._MIN_POSTINGS)
        pslot = np.zeros((self.n_dev, ps_pad), dtype=np.int32)
        pltf = np.zeros((self.n_dev, ps_pad), dtype=np.float32)
        ltf_all = np.log(snap["postings_tf"].astype(np.float64) + 1.0)
        # Stable partition by shard preserves the term grouping inside
        # each shard, so per-shard CSR pointers index it directly.
        order = np.argsort(shard_of, kind="stable")
        sizes = starts[:, -1]
        offs = np.concatenate([[0], np.cumsum(sizes)])
        for d in range(self.n_dev):
            sel = order[offs[d]: offs[d + 1]]
            pslot[d, : sizes[d]] = (slots[sel] - d * ss).astype(np.int32)
            pltf[d, : sizes[d]] = ltf_all[sel]

        dlen = np.ones((self.n_dev, ss), dtype=np.float32)
        flat = dlen.reshape(-1)
        flat[:n_live] = snap["doc_len"]  # slots are contiguous per shard

        shard_spec = NamedSharding(self.mesh, P(self.axis, None))
        self.postings_slot = jax.device_put(pslot, shard_spec)
        self.postings_ltf = jax.device_put(pltf, shard_spec)
        self.doc_len = jax.device_put(dlen, shard_spec)
        # Full rebuilds only contain live postings; the alive bitmap
        # exists for executor-signature parity with the single-chip
        # incremental path.
        self.alive_mask = jax.device_put(
            np.full((self.n_dev, ss // 32), 0xFFFFFFFF, dtype=np.uint32),
            shard_spec)
        self.generation = snap["generation"]
        return True

    # -- query-side metadata (per-shard ranges) ---------------------------

    def term_ranges(self, term_id: int) -> tuple[np.ndarray, np.ndarray]:
        """Per-shard (start, length) of a 1-based term's postings."""
        start = self.shard_starts[:, term_id - 1]
        end = self.shard_starts[:, term_id]
        return start, end - start

    def term_live_df(self, term_id: int) -> int:
        return int(self.term_df[term_id - 1])

    @property
    def adl(self) -> float:
        if self.doc_count == 0:
            return 0.0
        return float(self.token_count // self.doc_count)
