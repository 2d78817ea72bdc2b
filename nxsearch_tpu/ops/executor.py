"""Fused device search executable: gather -> mask -> score -> top-k.

One jitted function covers the whole device side of a query
(src/query/search.c:210-283 equivalent).  Static bucket parameters
(postings budget, query width, k, mask program length/depth) define the
executable signature; query data (CSR ranges, df, the boolean program)
are runtime inputs, so every query in the same buckets reuses one
compiled kernel.

Two modes:
- ``use_mask=False``: pure-OR queries (the common case -- adjacency is
  implicit OR).  The final bitmap is the union of the query terms'
  bitmaps, which is exactly the set of gathered postings, so no mask is
  materialized at all.
- ``use_mask=True``: general AND/OR/AND-NOT trees.  Packed per-term
  bitmaps are built from the same gathered postings and the postfix
  program is interpreted over them (ops/boolean.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .boolean import build_term_masks, eval_program
from .scoring import ALGO_BM25, bm25, flatten_ranges, tf_idf


@functools.partial(
    jax.jit,
    static_argnames=("budget", "k", "algo", "n_slots", "use_mask", "depth"),
)
def device_search(
    postings_slot: jax.Array,    # int32[P_pad]
    postings_ltf: jax.Array,     # float32[P_pad]: log(tf+1), host f64
    doc_len: jax.Array,          # float32[S_pad]
    q_start: jax.Array,          # int32[Q]
    q_len: jax.Array,            # int32[Q]
    q_idf: jax.Array,            # float32[Q]: per-term IDF, host f64
    adl: jax.Array,              # float32 scalar
    prog_ops: jax.Array | None,  # int32[L] or None when not use_mask
    prog_args: jax.Array | None,
    *,
    budget: int,
    k: int,
    algo: int,
    n_slots: int,
    use_mask: bool,
    depth: int = 8,
):
    """Returns (scores f32[k], slots i32[k]) sorted descending; entries
    with score <= 0.0 are non-matches to be dropped by the caller."""
    n_terms = q_start.shape[0]
    src, qid, valid = flatten_ranges(q_start, q_len, budget)
    slot = postings_slot[src]
    ltf = postings_ltf[src]
    idf = q_idf[qid]

    if algo == ALGO_BM25:
        score = bm25(ltf, doc_len[slot], idf, adl)
    else:
        score = tf_idf(ltf, idf)
    contrib = jnp.where(valid, score, 0.0)

    if use_mask:
        n_words = n_slots // 32
        masks = build_term_masks(slot, qid, valid,
                                 n_terms=n_terms, n_words=n_words)
        final = eval_program(masks, prog_ops, prog_args, depth=depth)
        bit = (final[slot >> 5] >> (slot & 31).astype(jnp.uint32)) & 1
        contrib = jnp.where(bit.astype(bool), contrib, 0.0)

    dense = jnp.zeros((n_slots,), jnp.float32).at[slot].add(
        contrib, mode="drop")
    k_eff = min(k, n_slots)
    top_scores, top_slots = lax.top_k(dense, k_eff)
    return top_scores, top_slots.astype(jnp.int32)
