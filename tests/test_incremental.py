"""Incremental device refresh: delta adds + alive-bitmap removals.

Interleaves mutations and searches on one handle (forcing the delta
path: the device base snapshot is built at the first search, later
adds stay host-side, removals only flip bitmap bits) and checks every
search against a fresh handle whose snapshot is fully rebuilt.
"""

import random

import numpy as np
import pytest

from nxsearch_tpu import Nxs, Params


def fresh_results(tmp_path, name, query, algo):
    """Ground truth: a brand-new engine instance (full rebuild)."""
    nxs = Nxs(str(tmp_path))
    try:
        idx = nxs.index_open(name)
        return dict(idx.search(query, Params().set_str("algo", algo)))
    finally:
        nxs.close()


def test_delta_adds_visible_without_rebuild(tmp_path):
    nxs = Nxs(str(tmp_path))
    try:
        idx = nxs.index_create("inc")
        idx.add(1, "the quick brown fox")
        idx.search("fox")                      # builds the base snapshot
        base_gen = idx.dev.generation
        mark = idx.dev._arrival_mark

        idx.add(2, "another fox appears")      # delta add
        r = idx.search("fox")
        assert {d for d, _ in r} == {1, 2}
        # The base snapshot was NOT rebuilt: watermark unchanged.
        assert idx.dev._arrival_mark == mark
        assert idx.dev.has_delta
        for doc_id, score in fresh_results(tmp_path, "inc", "fox",
                                           "BM25").items():
            assert dict(r)[doc_id] == pytest.approx(score, abs=1e-4)
    finally:
        nxs.close()


def test_removal_via_bitmap_without_rebuild(tmp_path):
    nxs = Nxs(str(tmp_path))
    try:
        idx = nxs.index_create("rmv")
        idx.add(1, "shared dog words")
        idx.add(2, "other dog words")
        idx.search("dog")
        mark = idx.dev._arrival_mark
        idx.remove(1)
        r = idx.search("dog")
        assert {d for d, _ in r} == {2}
        assert idx.dev._arrival_mark == mark   # no rebuild
        # IDF reflects the removal (df/doc_count are host-live).
        want = fresh_results(tmp_path, "rmv", "dog", "BM25")
        assert dict(r)[2] == pytest.approx(want[2], abs=1e-4)
    finally:
        nxs.close()


def test_delta_overflow_triggers_rebuild(tmp_path, monkeypatch):
    nxs = Nxs(str(tmp_path))
    try:
        idx = nxs.index_create("ovf")
        idx.add(1, "first doc here")
        idx.search("doc")
        monkeypatch.setattr(type(idx.dev), "DELTA_MAX_POSTINGS", 8)
        idx.add_many([(i, f"doc number {i} extra words galore")
                      for i in range(2, 12)])
        r = idx.search("doc")
        assert len(r) == 11
        assert not idx.dev.has_delta           # rebuild consumed it
    finally:
        nxs.close()


@pytest.mark.parametrize("algo", ["BM25", "TF-IDF"])
def test_random_interleaving_matches_full_rebuild(tmp_path, algo):
    rng = random.Random(17)
    words = [f"term{i}" for i in range(30)]
    nxs = Nxs(str(tmp_path))
    try:
        idx = nxs.index_create("mix")
        live = set()
        next_id = 1
        queries = [
            "term1 term2 term3",
            "term1 AND term2",
            "term4 AND NOT term5",
            "(term1 OR term6) AND term2",
            "term9",
        ]
        for step in range(60):
            op = rng.random()
            if op < 0.55 or not live:
                text = " ".join(rng.choices(words, k=rng.randint(3, 12)))
                idx.add(next_id, text)
                live.add(next_id)
                next_id += 1
            elif op < 0.75:
                victim = rng.choice(sorted(live))
                idx.remove(victim)
                live.discard(victim)
            else:
                query = rng.choice(queries)
                got = dict(idx.search(query,
                                      Params().set_str("algo", algo)))
                want = fresh_results(tmp_path, "mix", query, algo)
                assert set(got) == set(want), (step, query)
                for doc_id, score in want.items():
                    assert got[doc_id] == pytest.approx(score, abs=1e-4), \
                        (step, query, doc_id)
        # Final consistency check.
        got = dict(idx.search("term1 term2 term3"))
        want = fresh_results(tmp_path, "mix", "term1 term2 term3", "BM25")
        assert set(got) == set(want)
    finally:
        nxs.close()


def test_batch_with_delta(tmp_path):
    nxs = Nxs(str(tmp_path))
    try:
        idx = nxs.index_create("bd")
        idx.add(1, "alpha beta gamma")
        idx.search("alpha")
        idx.add(2, "alpha delta")
        idx.remove(1)
        rs = idx.search_many(["alpha", "beta", "alpha AND delta"])
        assert {d for d, _ in rs[0]} == {2}
        assert rs[1].count == 0
        assert {d for d, _ in rs[2]} == {2}
    finally:
        nxs.close()
