"""Index.prewarm: serving-signature compile warmer.

The product half of the r2 latency finding (a first-of-its-shape
query paid a 15 s XLA compile inside a measured percentile): prewarm
synthesizes a df-stratified query mix from the index's own terms and
drives the sequential + batched search paths once, so every plan
signature compiles at load time instead of on a production query.
"""

import pytest

from nxsearch_tpu import Nxs, Params


@pytest.fixture()
def idx(tmp_path):
    nxs = Nxs(str(tmp_path))
    idx = nxs.index_create("warm")
    # Spread document frequencies across several log2 tiers.
    docs = []
    did = 1
    for rank, word in enumerate(
            ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]):
        for _ in range(1 << rank):
            docs.append((did, f"{word} filler{did % 7} common"))
            did += 1
    idx.add_many(docs)
    yield idx
    nxs.close()


def test_prewarm_runs_and_serves(idx):
    n = idx.prewarm(rows=(1, 8))
    assert n > 0
    # The warmed index serves normally afterwards.
    r = idx.search("alpha OR common")
    assert r.count > 0


def test_prewarm_covers_boolean_and_fuzzy(idx):
    # fuzzymatch defaults on: the typo terms exercise the Levenshtein
    # sweep signatures; boolean forms exercise the masked plans.
    # rows=(8,) runs one 8-row batched pass plus the 8-row no-prefix
    # (classic fallback ladder) pass.
    n = idx.prewarm(rows=(8,))
    assert n == 16


def test_prewarm_empty_index(tmp_path):
    nxs = Nxs(str(tmp_path))
    idx = nxs.index_create("empty")
    assert idx.prewarm() == 0
    nxs.close()
