"""Fuzzy matching: Myers bit-parallel DP parity + selection behavior.

The device path must compute exact Levenshtein distances (property-
tested against the single-row Wagner-Fischer reference implementation,
levdist.c semantics) and the lookup must select the most-popular term
within tolerance 2, host and device paths agreeing.
"""

import random
import string

import jax.numpy as jnp
import numpy as np
import pytest

import nxsearch_tpu.fuzzy as fuzzy_mod
from nxsearch_tpu import Nxs
from nxsearch_tpu.fuzzy import FuzzyMatcher, levdist
from nxsearch_tpu.ops.levenshtein import (MAX_TERM_BYTES, fuzzy_best,
                                          myers_distances)


# Real kernels on accelerators, interpret mode on CPU: the on-TPU test
# lane (tools/tpu_tests.sh) re-runs these against actual Mosaic
# lowering and hardware numerics (denormal flushes etc.).
import jax as _jax

INTERPRET = _jax.devices()[0].platform == "cpu"


def pack_vocab(words):
    vb = np.zeros((len(words), MAX_TERM_BYTES), dtype=np.uint8)
    vl = np.zeros(len(words), dtype=np.int32)
    for i, w in enumerate(words):
        enc = w.encode()
        vb[i, : len(enc)] = np.frombuffer(enc, dtype=np.uint8)
        vl[i] = len(enc)
    return jnp.asarray(vb), jnp.asarray(vl)


def pack_query(q):
    enc = q.encode()
    qb = np.zeros(MAX_TERM_BYTES, dtype=np.uint8)
    qb[: len(enc)] = np.frombuffer(enc, dtype=np.uint8)
    return jnp.asarray(qb), jnp.int32(len(enc))


def test_myers_exact_small_cases():
    vocab = ["kitten", "sitting", "dog", "dogs", "doggy", "cat", "",
             "a", "ab", "abcdefghijklmnopqrstuvwxyz012345"]
    vocab = [v for v in vocab if v]
    vb, vl = pack_vocab(vocab)
    for q in ("kitten", "dog", "smitten", "x", "abcdefghijklmnop"):
        qb, ql = pack_query(q)
        dists = np.asarray(myers_distances(vb, vl, qb, ql))
        for i, w in enumerate(vocab):
            assert dists[i] == levdist(q.encode(), w.encode()), (q, w)


def test_myers_property_fuzz():
    rng = random.Random(13)
    alphabet = string.ascii_lowercase[:6]
    vocab = ["".join(rng.choice(alphabet)
                     for _ in range(rng.randint(1, MAX_TERM_BYTES)))
             for _ in range(200)]
    vb, vl = pack_vocab(vocab)
    for _ in range(30):
        q = "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(1, MAX_TERM_BYTES)))
        qb, ql = pack_query(q)
        dists = np.asarray(myers_distances(vb, vl, qb, ql))
        for i, w in enumerate(vocab):
            want = levdist(q.encode(), w.encode())
            assert dists[i] == want, (q, w, dists[i], want)


def test_fuzzy_best_selection():
    vocab = ["dog", "dig", "dug", "cat"]
    vb, vl = pack_vocab(vocab)
    totals = jnp.asarray(np.array([5, 50, 5, 100], dtype=np.uint32))
    qb, ql = pack_query("dag")
    idx, dist = fuzzy_best(vb, vl, totals, qb, ql, jnp.int32(2))
    # dig (50) beats dog/dug (5); cat is within distance 2? c-a-t vs
    # d-a-g = 2 substitutions => eligible with total 100 -> wins.
    assert int(idx) == 3
    # Zero-total terms are never selected.
    totals = jnp.asarray(np.array([5, 50, 5, 0], dtype=np.uint32))
    idx, _ = fuzzy_best(vb, vl, totals, qb, ql, jnp.int32(2))
    assert int(idx) == 1
    # Nothing within tolerance.
    qb, ql = pack_query("zzzzzzzz")
    idx, _ = fuzzy_best(vb, vl, totals, qb, ql, jnp.int32(2))
    assert int(idx) == -1


def test_fuzzy_end_to_end(tmp_path):
    nxs = Nxs(str(tmp_path))
    try:
        idx = nxs.index_create("fz")
        idx.add(1, "dog dog dog popular")
        idx.add(2, "dig rare")
        # "dag" is distance 1 from both dog and dig; dog is more popular.
        r = idx.search("dag")
        assert {d for d, _ in r} == {1}
        # fuzzymatch off: no results.
        from nxsearch_tpu import Params
        r = idx.search("dag", Params().set_bool("fuzzymatch", False))
        assert r.count == 0
        # Removing the popular doc flips the winner.
        idx.remove(1)
        r = idx.search("dag")
        assert {d for d, _ in r} == {2}
    finally:
        nxs.close()


def test_pallas_kernel_matches_jnp():
    """The term-per-lane Pallas kernel (interpret mode on CPU) must be
    bit-identical to the jnp Myers implementation."""
    from nxsearch_tpu.ops.pallas.fuzzy import (BLOCK_TERMS,
                                               myers_distances_pallas)
    rng = random.Random(5)
    n = BLOCK_TERMS * 2
    words = ["".join(rng.choice(string.ascii_lowercase[:5])
                     for _ in range(rng.randint(1, MAX_TERM_BYTES)))
             for _ in range(n)]
    vb = np.zeros((n, MAX_TERM_BYTES), np.uint8)
    vl = np.zeros(n, np.int32)
    for i, w in enumerate(words):
        e = w.encode()
        vb[i, : len(e)] = np.frombuffer(e, np.uint8)
        vl[i] = len(e)
    for q in ("abc", "abcde" * 6, "z", "aaaaa"):
        e = q.encode()
        qb = np.zeros(MAX_TERM_BYTES, np.uint8)
        qb[: len(e)] = np.frombuffer(e, np.uint8)
        ref = np.asarray(myers_distances(
            jnp.asarray(vb), jnp.asarray(vl), jnp.asarray(qb),
            jnp.int32(len(e))))
        out = np.asarray(myers_distances_pallas(
            jnp.asarray(np.ascontiguousarray(vb.T)),
            jnp.asarray(vl[None, :]),
            jnp.asarray(qb.astype(np.int32)[None, :]),
            jnp.asarray([[len(e)]], np.int32),
            interpret=INTERPRET))[0]
        assert np.array_equal(ref, out), q


def test_pallas_batch_kernel_matches_jnp():
    """The batched grid (queries on the inner axis, vocab tile held
    in VMEM) must match the jnp Myers sweep row-for-row, including
    zero-length padded query rows not poisoning real rows."""
    from nxsearch_tpu.ops.pallas.fuzzy import (BLOCK_TERMS,
                                               myers_distances_pallas_batch)
    rng = random.Random(7)
    n = BLOCK_TERMS * 2
    words = ["".join(rng.choice(string.ascii_lowercase[:5])
                     for _ in range(rng.randint(1, MAX_TERM_BYTES)))
             for _ in range(n)]
    vb = np.zeros((n, MAX_TERM_BYTES), np.uint8)
    vl = np.zeros(n, np.int32)
    for i, w in enumerate(words):
        e = w.encode()
        vb[i, : len(e)] = np.frombuffer(e, np.uint8)
        vl[i] = len(e)
    queries = ["abc", "abcde" * 6, "z", "aaaaa", "bcd", ""]  # "" = pad row
    m = len(queries)
    qb = np.zeros((m, MAX_TERM_BYTES), np.uint8)
    ql = np.zeros(m, np.int32)
    for i, q in enumerate(queries):
        e = q.encode()
        qb[i, : len(e)] = np.frombuffer(e, np.uint8)
        ql[i] = len(e)
    out = np.asarray(myers_distances_pallas_batch(
        jnp.asarray(np.ascontiguousarray(vb.T)),
        jnp.asarray(vl[None, :]),
        jnp.asarray(qb.astype(np.int32)),
        jnp.asarray(ql[:, None]),
        interpret=INTERPRET))
    for i, q in enumerate(queries):
        if not q:
            continue
        ref = np.asarray(myers_distances(
            jnp.asarray(vb), jnp.asarray(vl), jnp.asarray(qb[i]),
            jnp.int32(ql[i])))
        assert np.array_equal(ref, out[i]), q


def test_pallas_rev_batch_kernel_matches_jnp():
    """The transposed-Myers batch kernel (pattern = term per lane,
    per-tile char table shared across the query chunk) must match the
    jnp Myers sweep row-for-row, including zero-length padded query
    rows and full-width 32-byte terms (per-lane mask/high-bit)."""
    from nxsearch_tpu.ops.pallas.fuzzy import \
        myers_rev_distances_pallas_batch
    rng = random.Random(11)
    n = 512
    words = ["".join(rng.choice(string.ascii_lowercase[:5])
                     for _ in range(rng.randint(1, MAX_TERM_BYTES)))
             for _ in range(n - 4)]
    vb = np.zeros((n, MAX_TERM_BYTES), np.uint8)   # 4 pad lanes
    vl = np.zeros(n, np.int32)
    for i, w in enumerate(words):
        e = w.encode()
        vb[i, : len(e)] = np.frombuffer(e, np.uint8)
        vl[i] = len(e)
    queries = ["abc", "abcde" * 6, "z", "aaaaa", "bcd", "",  # "" = pad
               "a" * 32]
    m = len(queries)
    qb = np.zeros((m, MAX_TERM_BYTES), np.uint8)
    ql = np.zeros(m, np.int32)
    for i, q in enumerate(queries):
        e = q.encode()
        qb[i, : len(e)] = np.frombuffer(e, np.uint8)
        ql[i] = len(e)
    out = np.asarray(myers_rev_distances_pallas_batch(
        jnp.asarray(np.ascontiguousarray(vb.T)),
        jnp.asarray(vl[None, :]),
        jnp.asarray(qb.astype(np.int32)),
        jnp.asarray(ql[:, None]),
        interpret=INTERPRET, block=256))
    live = vl > 0
    for i, q in enumerate(queries):
        if not q:
            continue
        ref = np.asarray(myers_distances(
            jnp.asarray(vb), jnp.asarray(vl), jnp.asarray(qb[i]),
            jnp.int32(ql[i])))
        assert np.array_equal(ref[live], out[i][live]), q


def test_device_and_host_paths_agree(tmp_path, monkeypatch):
    rng = random.Random(99)
    words = list({
        "".join(rng.choice(string.ascii_lowercase[:8])
                for _ in range(rng.randint(3, 9)))
        for _ in range(600)})
    nxs = Nxs(str(tmp_path))
    try:
        idx = nxs.index_create("agree")
        for i in range(0, len(words), 50):
            idx.add_many([(i + j + 1, " ".join(words[i + j: i + j + 1] * 2))
                          for j in range(min(50, len(words) - i))])
        matcher_host = FuzzyMatcher(idx.host)
        monkeypatch.setattr(fuzzy_mod, "_DEVICE_THRESHOLD", 1)
        matcher_dev = FuzzyMatcher(idx.host)
        probes = ["".join(rng.choice(string.ascii_lowercase[:8])
                          for _ in range(rng.randint(3, 9)))
                  for _ in range(60)]
        for probe in probes:
            assert matcher_host.lookup(probe) == matcher_dev.lookup(probe), \
                probe
        # Batched prefetch (length-region grouped dispatches) must
        # agree with per-probe lookup.
        matcher_batch = FuzzyMatcher(idx.host)
        matcher_batch.prefetch(probes)
        for probe in probes:
            assert matcher_batch.lookup(probe) == \
                matcher_host.lookup(probe), probe
    finally:
        nxs.close()
