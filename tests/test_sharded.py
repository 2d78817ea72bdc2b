"""Doc-sharded search over a virtual 8-device mesh.

Verifies that the shard_map execution path (per-shard CSR gather +
local top-k + ICI merge) produces results identical to the single-chip
executor, including exact scores and boolean mask semantics.
"""

import jax
import pytest

from nxsearch_tpu import Nxs, Params
from nxsearch_tpu.parallel import make_mesh

DOCS = [
    (1, "The quick brown fox jumped over the lazy dog"),
    (2, "Once upon a time there were three little foxes"),
    (3, "Dogs and cats living together in harmony"),
    (4, "A dog chasing a cat chasing a mouse"),
    (5, "Textbook about Erlang in Linux environment"),
    (6, "Unix Shell scripting textbook"),
    (7, "Erlang and Python examples"),
    (8, "Textbook about Python using Linux and Windows"),
    (9, "All but NOT: Textbook Erlang Python Shell Linux Unix Java"),
    (10, "All keywords: Textbook Erlang Python Shell Linux Unix"),
]

QUERIES = [
    "dog",
    "fox dog cat",
    "dog AND cat",
    "dog AND NOT cat",
    "textbook AND (Erlang OR Python OR Shell) AND "
    "(Linux OR Unix) AND NOT (Windows OR Java)",
    "nonexistentterm",
]


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    single = Nxs(str(tmp_path_factory.mktemp("single")))
    sharded = Nxs(str(tmp_path_factory.mktemp("sharded")),
                  mesh=make_mesh(jax.devices()))
    for nxs in (single, sharded):
        idx = nxs.index_create("c")
        for doc_id, text in DOCS:
            idx.add(doc_id, text)
    yield single.index_get("c"), sharded.index_get("c")
    single.close()
    sharded.close()


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("algo", ["BM25", "TF-IDF"])
def test_sharded_matches_single_chip(corpora, query, algo):
    single, sharded = corpora
    p = Params().set_str("algo", algo)
    res_single = dict(single.search(query, p))
    res_sharded = dict(sharded.search(query, p))
    assert set(res_single) == set(res_sharded)
    for doc_id, score in res_single.items():
        assert res_sharded[doc_id] == pytest.approx(score, abs=1e-6)


def test_sharded_mutation_and_limit(corpora):
    _, sharded = corpora
    resp = sharded.search("dog", Params().set_uint("limit", 1))
    assert resp.count == 1
    # Mutations refresh the sharded snapshot too.
    sharded.add(100, "another dog appears")
    assert 100 in dict(sharded.search("dog"))
    sharded.remove(100)
    assert 100 not in dict(sharded.search("dog"))
