"""Pruned (max-score) executor: exactness vs the full executors.

Small-k searches route through pruned_topk; its certificate must make
results identical to the exact paths (which large-limit queries still
use), across random corpora, boolean queries, fuzzy-free mutation.
"""

import random

import pytest

from nxsearch_tpu import Nxs, Params

WORDS = [f"w{i}" for i in range(60)]


@pytest.fixture(scope="module")
def index(tmp_path_factory):
    rng = random.Random(23)
    nxs = Nxs(str(tmp_path_factory.mktemp("pruned")))
    idx = nxs.index_create("p")
    docs = []
    for i in range(1, 401):
        # Zipf-flavored: low ids more common.
        words = [WORDS[min(int(rng.expovariate(0.12)), 59)]
                 for _ in range(rng.randint(4, 20))]
        docs.append((i, " ".join(words)))
    idx.add_many(docs)
    yield idx
    nxs.close()


QUERIES = [
    "w0",
    "w0 w1 w2",
    "w5 AND w3",
    "w0 AND NOT w1",
    "(w2 OR w7) AND w0",
    "w40 w50 w59",
    "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9",
]


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("algo", ["BM25", "TF-IDF"])
def test_pruned_matches_exact(index, query, algo):
    # limit 10 -> pruned path; limit 100000 -> exact path.
    pruned = index.search(
        query, Params().set_str("algo", algo).set_uint("limit", 10))
    exact = index.search(
        query, Params().set_str("algo", algo).set_uint("limit", 100000))
    exact_top = exact.results[:10]
    # Scores at each rank must agree (doc order may differ on ties).
    for (d1, s1), (d2, s2) in zip(pruned.results, exact_top):
        assert s1 == pytest.approx(s2, abs=1e-5), (query, d1, d2)
    assert {d for d, _ in pruned.results} == \
        {d for d, s in exact_top
         if not any(abs(s - s2) < 1e-9 and d2 not in
                    {x for x, _ in exact_top}
                    for d2, s2 in exact.results[10:])} or \
        len(pruned.results) == len(exact_top)


def test_pruned_batch_matches_single(index):
    p = Params().set_uint("limit", 10)
    batched = index.search_many(QUERIES, p)
    for query, resp in zip(QUERIES, batched):
        single = index.search(query, p)
        assert [s for _, s in resp] == pytest.approx(
            [s for _, s in single], abs=1e-6), query


def test_pruned_with_mutation(index):
    p = Params().set_uint("limit", 5)
    before = index.search("zebra w1", p)
    assert 9001 not in {d for d, _ in before}
    index.add(9001, "zebra zebra zebra")   # delta add, rare term
    after = index.search("zebra w1", p)
    assert 9001 in {d for d, _ in after}
    index.remove(9001)                     # alive-bitmap removal
    again = index.search("zebra w1", p)
    assert [d for d, _ in again] == [d for d, _ in before]
