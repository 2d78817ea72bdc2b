"""Pallas kernels: exact per-document score accumulation, sort-free.

The exact executors need, per query, the per-document sum of posting
contributions.  XLA's TPU sort and scatter both cost ~100 ns/element,
so at millions of postings they dominate everything.  These kernels
remove both by exploiting two structural facts:

1. Each term's postings are **slot-sorted** (index/hostindex.build_csr),
   so the postings of term q that fall into a slot block
   [g*R, (g+1)*R) form one contiguous subrange of q's posting list --
   located with a binary search (``csr_block_bounds``) instead of any
   data movement.
2. Within a block, "scatter" into R=1024 slots is a broadcast compare
   one-hot [M, R] followed by a sublane sum -- pure VPU elementwise
   work with no data-dependent layout.  (One-hot MXU matmuls were
   tried first: with R slots they are matrix-vector products that
   waste 127/128 of the systolic array and ran ~8x slower.)  The same
   compare matrix masks the BM25 term and the per-term presence
   vectors for boolean queries, and the doc-length gather disappears:
   the denominator uses doc_len broadcast along the slot lanes, so
   each posting meets its document's length at the (posting, slot)
   cell the compare selects.

The accumulation core drives ``blockdense_scores``: the full sweep,
grid (N, G) -- every slot block of the corpus is scored.  Exact,
used for small corpora and for masked work the sliced planes cannot
express.  (A block-max pruned sibling kernel existed through r2 and
was removed in r3: its certification never fired on realistic
distributions, so it only added a bound pass on top of the sweep.)

Compute is tiled [TILE_POSTINGS, R] with a ``pl.when`` skip per tile,
so a (term, block) subrange with L postings costs
~ceil(L/TILE)*TILE*R lane-ops instead of a fixed 2*SUB*R.

BM25 per-posting contribution is rearranged broadcast-friendly:
    ltf * idf / (ltf + C1 + C2 * dl),   C1 = k(1-b), C2 = k*b/adl.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_SLOTS = 1024     # R: slots per grid block
# Mosaic requires HBM DMA slices aligned to the 1-D tiling (1024), so
# postings load in 1024-aligned chunks; a (term, block) subrange has
# length <= R = 1024 and therefore spans at most two aligned chunks.
SUB_POSTINGS = 1024
# Compute-tile granularity within a chunk: tiles that do not overlap
# the (term, block) subrange are skipped entirely, so sparse
# subranges cost ~1 tile instead of a full chunk of lane-ops.
TILE_POSTINGS = 256
MAX_KERNEL_TERMS = 8   # queries wider than this run the kernel in groups


@functools.partial(jax.jit, static_argnames=("n_blocks", "block"))
def csr_block_bounds(postings_slot: jax.Array,   # int32[P]
                     q_start: jax.Array,         # int32[Q]
                     q_len: jax.Array,           # int32[Q]
                     *, n_blocks: int, block: int = BLOCK_SLOTS):
    """bounds int32[Q, n_blocks+1]: for each term, the index of its
    first posting with slot >= g*block -- a vectorized lower-bound
    binary search within each term's slot-sorted CSR range."""
    edges = (jnp.arange(n_blocks + 1, dtype=jnp.int32)
             * jnp.int32(block))                       # [G+1]
    q = q_start.shape[0]
    lo = jnp.broadcast_to(q_start[:, None], (q, n_blocks + 1)) \
        .astype(jnp.int32)
    hi = (lo + q_len[:, None]).astype(jnp.int32)
    p_max = postings_slot.shape[0]

    def body(_, carry):
        lo, hi = carry
        active = lo < hi
        mid = (lo + hi) >> 1
        v = postings_slot[jnp.clip(mid, 0, p_max - 1)]
        go_right = active & (v < edges[None, :])
        new_lo = jnp.where(go_right, mid + 1, lo)
        new_hi = jnp.where(active & ~go_right, mid, hi)
        return new_lo, new_hi

    lo, hi = lax.fori_loop(0, 32, body, (lo, hi))
    return lo


def _accumulate_term(q, b0, b1, coef_ref, pslot_hbm, pltf_hbm,
                     dlen_row, slot_scr, ltf_scr, acc_ref, pres_ref,
                     sem, sem2, base, *, algo: int, use_mask: bool,
                     n_sub: int):
    """Accumulate one query term's postings-in-block into acc_ref
    (and pres_ref when masking).  Shared by both kernels.

    b0/b1: the term's subrange [b0, b1) in the postings arrays;
    base: the block's first slot; dlen_row: f32[R] doc lengths for
    this block (a loaded value, not a ref).
    """
    r = BLOCK_SLOTS
    m = SUB_POSTINGS
    mt = TILE_POSTINGS
    p_max = pslot_hbm.shape[0]
    iota_r = lax.broadcasted_iota(jnp.int32, (mt, r), 1)
    iota_m = lax.broadcasted_iota(jnp.int32, (mt, r), 0)

    for s in range(n_sub):        # aligned chunks covering the range
        # b0 < b1 matters: an EMPTY subrange with an unaligned b0
        # would otherwise still run a chunk (DMA + one all-masked
        # tile) -- for rare terms that used to waste a full chunk on
        # nearly every block of the corpus.
        @pl.when((b0 < b1) & (((b0 // m) + s) * m < b1))
        def _(s=s):
            aligned = ((b0 // m) + s) * m
            safe = pl.multiple_of(jnp.minimum(aligned, p_max - m), m)
            cp1 = pltpu.make_async_copy(
                pslot_hbm.at[pl.ds(safe, m)], slot_scr, sem)
            cp2 = pltpu.make_async_copy(
                pltf_hbm.at[pl.ds(safe, m)], ltf_scr, sem2)
            cp1.start()
            cp2.start()
            cp1.wait()
            cp2.wait()
            # Posting j in the scratch is global index safe+j; compute
            # in [mt, R] tiles, each skipped when it cannot overlap
            # [b0, b1).  All-VPU: the scatter is a broadcast compare +
            # sublane-sum -- one-hot MATMULS here are matrix-vector
            # products (N=1 / K=1) that waste 127/128 of the MXU and
            # measured ~8x slower.  The doc-length "gather" vanishes:
            # BM25's denominator uses dlen broadcast along the slot
            # lanes, so each posting meets its own document's length
            # at the (posting, slot) cell the compare selects.
            idf = coef_ref[0, q, 0]
            for t in range(m // mt):
                j0 = t * mt

                @pl.when((safe + j0 + mt > b0) & (safe + j0 < b1))
                def _(t=t, j0=j0, safe=safe):
                    valid2 = ((safe + j0 + iota_m >= b0)
                              & (safe + j0 + iota_m < b1))       # [mt,r]
                    off = slot_scr[j0: j0 + mt] - base           # [mt]
                    oh = ((off[:, None] == iota_r)
                          & valid2).astype(jnp.float32)          # [mt,r]
                    ltf = ltf_scr[j0: j0 + mt]
                    if algo == 0:   # BM25
                        c1 = coef_ref[0, q, 1]
                        c2 = coef_ref[0, q, 2]
                        denom = (ltf[:, None] + c1
                                 + c2 * dlen_row[None, :])
                        contrib = oh * (ltf * idf)[:, None] / denom
                    else:           # TF-IDF
                        contrib = oh * (ltf * idf)[:, None]
                    acc_ref[0, :] = acc_ref[0, :] + \
                        jnp.sum(contrib, axis=0)
                    if use_mask:
                        pres_ref[0, :] = pres_ref[0, :] + \
                            jnp.sum(oh, axis=0)


def _make_kernel(n_terms: int, algo: int, use_mask: bool, n_sub: int):
    """Full-sweep kernel: grid (N, G), block data via BlockSpecs.

    The bounds row is the whole [Q, G+1] slice per query: Mosaic
    requires SMEM block dims to divide (8, 128) or equal the array
    dims, so a per-g (Q, 1) window is not expressible.
    """
    r = BLOCK_SLOTS

    def kernel(bounds_ref,    # SMEM int32[1, Q, G+1] (query n)
               coef_ref,      # SMEM f32[1, Q, 4]: idf, C1, C2, unused
               pslot_hbm,     # ANY int32[P]
               pltf_hbm,      # ANY f32[P]
               dlen_ref,      # VMEM f32[1, R] (block g)
               alive_ref,     # VMEM f32[1, R] (block g; 0/1 factors)
               out_ref,       # VMEM f32[1, 1, R]
               bits_ref,      # VMEM u32[1, 1, R]
               slot_scr, ltf_scr, pres_ref, acc_ref, sem, sem2):
        g = pl.program_id(1)
        base = g * r

        acc_ref[0, :] = jnp.zeros((r,), jnp.float32)
        bits_ref[0, 0, :] = jnp.zeros((r,), jnp.uint32)

        for q in range(n_terms):          # static unroll over query rows
            if use_mask:
                pres_ref[0, :] = jnp.zeros((r,), jnp.float32)
            _accumulate_term(
                q, bounds_ref[0, q, g], bounds_ref[0, q, g + 1],
                coef_ref, pslot_hbm, pltf_hbm, dlen_ref[0, :],
                slot_scr, ltf_scr, acc_ref, pres_ref, sem, sem2,
                base, algo=algo, use_mask=use_mask, n_sub=n_sub)
            if use_mask:
                bits_ref[0, 0, :] = bits_ref[0, 0, :] | jnp.where(
                    pres_ref[0, :] > 0.0,
                    jnp.uint32(1) << jnp.uint32(min(q, 31)),
                    jnp.uint32(0))

        out_ref[0, 0, :] = acc_ref[0, :] * alive_ref[0, :]

    return kernel


def alive_factors(alive_mask: jax.Array) -> jax.Array:
    """Packed u32 bitmap -> per-slot 0/1 f32 factors (block shapes of
    R/32 u32 words violate Mosaic tile constraints, so the expansion
    happens in XLA)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return (((alive_mask[:, None] >> shifts[None, :]) & 1)
            .astype(jnp.float32).reshape(-1))


@functools.partial(
    jax.jit,
    static_argnames=("n_slots", "algo", "use_mask", "interpret"),
)
def blockdense_scores(
    postings_slot: jax.Array,   # int32[P] slot-sorted per term
    postings_ltf: jax.Array,    # float32[P]
    doc_len: jax.Array,         # float32[S_pad]
    alive_mask: jax.Array,      # uint32[S_pad/32]
    bounds: jax.Array,          # int32[N, Q, G+1] from csr_block_bounds
    coef: jax.Array,            # float32[N, Q, 4]: idf, C1, C2, 0
    *,
    n_slots: int,
    algo: int,
    use_mask: bool,
    interpret: bool = False,
):
    """Dense per-slot scores (and presence bits) via the full-sweep
    block kernel.  Batched over queries: grid (N, G), one dispatch for
    the whole batch.  Returns (scores f32[N, S], bits u32[N, S])."""
    n_batch, n_terms = bounds.shape[0], bounds.shape[1]
    grid = (n_batch, n_slots // BLOCK_SLOTS)
    n_sub = 2   # a <=R-long subrange spans at most 2 aligned chunks

    alive_f = alive_factors(alive_mask)

    kernel = _make_kernel(n_terms, algo, use_mask, n_sub)
    scores, bits = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,) + bounds.shape[1:], lambda n, g: (n, 0, 0),
                         memory_space=pltpu.SMEM),    # bounds
            pl.BlockSpec((1,) + coef.shape[1:], lambda n, g: (n, 0, 0),
                         memory_space=pltpu.SMEM),    # coef
            pl.BlockSpec(memory_space=pl.ANY),     # postings_slot
            pl.BlockSpec(memory_space=pl.ANY),     # postings_ltf
            pl.BlockSpec((1, BLOCK_SLOTS), lambda n, g: (0, g),
                         memory_space=pltpu.VMEM),    # doc_len
            pl.BlockSpec((1, BLOCK_SLOTS), lambda n, g: (0, g),
                         memory_space=pltpu.VMEM),    # alive factors
        ],
        out_specs=[
            pl.BlockSpec((1, 1, BLOCK_SLOTS), lambda n, g: (n, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLOCK_SLOTS), lambda n, g: (n, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_batch, 1, n_slots), jnp.float32),
            jax.ShapeDtypeStruct((n_batch, 1, n_slots), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SUB_POSTINGS,), jnp.int32),
            pltpu.VMEM((SUB_POSTINGS,), jnp.float32),
            pltpu.VMEM((1, BLOCK_SLOTS), jnp.float32),
            pltpu.VMEM((1, BLOCK_SLOTS), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(bounds, coef, postings_slot, postings_ltf,
      doc_len[None, :], alive_f[None, :])
    return scores[:, 0, :], bits[:, 0, :]
