"""End-to-end search parity tests.

Ports the reference's declarative search fixtures: exact-score cases
from src/tests/t_scoring.c (executable specs of the TF-IDF and BM25
formulas, tolerance 1e-4 per helpers.c:215) and the boolean-logic
cases from src/tests/t_querylogic.c.  Each case builds a real index in
a tmpdir and runs the query under both ranking algorithms, exercising
the full host-tokenize -> journal -> device-snapshot -> device-scoring
path.
"""

import pytest

from nxsearch_tpu import Nxs, Params
from nxsearch_tpu.errors import ErrorCode, NxsError

# (docs, query, {doc_id: (tfidf, bm25)}) -- scores None = presence only.
DOCS_1 = [
    (1, "The quick brown fox jumped over the lazy dog"),
    (2, "Once upon a time there were three little foxes"),
]
DOG_TFIDF, DOG_BM25 = 1.1736, 0.253785
FOX_TFIDF, FOX_BM25 = 0.693147, 0.066754

DOCS_2 = [(1, "cat dog rat"), (2, "cat cat dog")]
DOCS_3 = [
    (1, "cat cat dog dog"),
    (2, "dog dog cat cat"),
    (3, "cat dog rat cow"),
    (4, "cat dog rat bat"),
]
DOCS_4 = [
    (1, "aa " * 19 + "aa"),
    (2, "aa " * 9 + "aa " + "bb " * 9 + "bb"),
    (3, "aa " + "bb " * 18 + "bb"),
]
DOCS_5 = [
    (1, "This is a very long document about the cats "
        "All kind of cats including the tabby and other cats"),
    (2, "cats cats cats"),
    (3, "cats cats dogs"),
]

QUERYLOGIC_DOCS = [
    (1, "Textbook about Erlang in Linux environment"),
    (2, "Unix Shell scripting textbook"),
    (3, "Erlang and Python examples"),
    (4, "Textbook about Python using Linux and Windows"),
    (5, "All but NOT: Textbook Erlang Python Shell Linux Unix Java"),
    (6, "All keywords: Textbook Erlang Python Shell Linux Unix"),
]

SEARCH_CASES = [
    # t_scoring.c test_case_1/2/3: IDF + equal scores + score summing.
    (DOCS_1, "dog", {1: (DOG_TFIDF, DOG_BM25)}),
    (DOCS_1, "fox", {1: (FOX_TFIDF, FOX_BM25), 2: (FOX_TFIDF, FOX_BM25)}),
    (DOCS_1, "fox dog", {
        1: (DOG_TFIDF + FOX_TFIDF, DOG_BM25 + FOX_BM25),
        2: (FOX_TFIDF, FOX_BM25),
    }),
    # test_case_4: TF.
    (DOCS_2, "cat", {1: (0.693147, 0.066754), 2: (1.098612, 0.087140)}),
    # test_case_5: variety of terms.
    (DOCS_3, "cat dog rat cow", {
        1: (2.197225, 0.100713),
        2: (2.197225, 0.100713),
        3: (4.213948, 0.771754),
        4: (2.559895, 0.330938),
    }),
    # test_case_6: BM25 term saturation.
    (DOCS_4, "aa", {
        1: (3.044523, 0.095780),
        2: (2.397895, 0.088995),
        3: (0.693147, 0.048890),
    }),
    # test_case_7: document length normalization.
    (DOCS_5, "cats", {
        1: (1.386294, 0.048411),
        2: (1.386294, 0.091469),
        3: (1.098612, 0.084499),
    }),
    # t_querylogic.c cases (presence only).
    (QUERYLOGIC_DOCS, "non-existant-term", {}),
    (QUERYLOGIC_DOCS, "unix", {2: None, 5: None, 6: None}),
    (QUERYLOGIC_DOCS,
     "textbook AND (Erlang OR Python OR Shell) AND "
     "(Linux OR Unix) AND NOT (Windows OR Java)",
     {1: None, 2: None, 6: None}),
]


def run_search_case(tmp_path, docs, query, expected):
    nxs = Nxs(str(tmp_path))
    try:
        idx = nxs.index_create("__test-idx-1")
        for doc_id, text in docs:
            idx.add(doc_id, text)
        for algo_idx, algo in enumerate(("TF-IDF", "BM25")):
            resp = idx.search(query, Params().set_str("algo", algo))
            got = {doc_id: score for doc_id, score in resp}
            assert set(got) == set(expected), (
                f"[{algo}] {query!r}: docs {sorted(got)} != "
                f"{sorted(expected)}")
            assert resp.count == len(expected)
            for doc_id, scores in expected.items():
                if scores is None:
                    continue
                assert got[doc_id] == pytest.approx(
                    scores[algo_idx], abs=1e-4), (
                    f"[{algo}] {query!r} doc {doc_id}")
    finally:
        nxs.close()


@pytest.mark.parametrize("docs,query,expected", SEARCH_CASES,
                         ids=[c[1] for c in SEARCH_CASES])
def test_search_case(tmp_path, docs, query, expected):
    run_search_case(tmp_path, docs, query, expected)


# ---------------------------------------------------------------------------
# Behavior beyond the declarative fixtures.
# ---------------------------------------------------------------------------

@pytest.fixture()
def nxs(tmp_path):
    inst = Nxs(str(tmp_path))
    yield inst
    inst.close()


def test_results_sorted_descending_and_limited(nxs):
    idx = nxs.index_create("lim")
    for doc_id, text in DOCS_3:
        idx.add(doc_id, text)
    resp = idx.search("cat dog rat cow")
    scores = [s for _, s in resp]
    assert scores == sorted(scores, reverse=True)
    # limit caps both results and count (results.c:196-218).
    resp = idx.search("cat dog rat cow", Params().set_uint("limit", 2))
    assert resp.count == 2
    assert [s for _, s in resp] == scores[:2]


def test_invalid_limit_rejected(nxs):
    idx = nxs.index_create("liminv")
    idx.add(1, "some text here")
    with pytest.raises(NxsError) as ei:
        idx.search("text", Params().set_uint("limit", 0))
    assert ei.value.code == ErrorCode.INVALID


def test_invalid_algo_rejected(nxs):
    idx = nxs.index_create("algoinv")
    idx.add(1, "some text here")
    with pytest.raises(NxsError) as ei:
        idx.search("text", Params().set_str("algo", "pagerank"))
    assert ei.value.code == ErrorCode.INVALID


def test_add_remove_search(nxs):
    idx = nxs.index_create("rm")
    idx.add(1, "the quick brown fox")
    idx.add(2, "the lazy dog naps")
    assert {d for d, _ in idx.search("fox dog")} == {1, 2}
    idx.remove(1)
    assert {d for d, _ in idx.search("fox dog")} == {2}
    with pytest.raises(NxsError) as ei:
        idx.remove(1)
    assert ei.value.code == ErrorCode.MISSING


def test_add_errors(nxs):
    idx = nxs.index_create("adderr")
    with pytest.raises(NxsError) as ei:
        idx.add(0, "zero id")
    assert ei.value.code == ErrorCode.INVALID
    idx.add(7, "some words")
    with pytest.raises(NxsError) as ei:
        idx.add(7, "duplicate")
    assert ei.value.code == ErrorCode.EXISTS
    # No meaningful tokens (nxs.c:521-525); punctuation-only text
    # yields no words from the UAX#29 segmenter.
    with pytest.raises(NxsError) as ei:
        idx.add(8, " ... , ; ")
    assert ei.value.code == ErrorCode.MISSING


def test_response_json_shape(nxs):
    idx = nxs.index_create("json")
    idx.add(1, "hello world")
    resp = idx.search("hello")
    obj = resp.tojson_obj()
    assert set(obj) == {"results", "count"}
    assert obj["count"] == 1
    assert set(obj["results"][0]) == {"doc_id", "score"}
    assert obj["results"][0]["doc_id"] == 1


def test_index_lifecycle_errors(nxs):
    with pytest.raises(NxsError) as ei:
        nxs.index_create("bad name!")
    assert ei.value.code == ErrorCode.INVALID
    nxs.index_create("twice")
    with pytest.raises(NxsError) as ei:
        nxs.index_create("twice")
    assert ei.value.code == ErrorCode.EXISTS
    with pytest.raises(NxsError) as ei:
        nxs.index_open("nonesuch")
    assert ei.value.code == ErrorCode.MISSING
    nxs.index_destroy("twice")
    with pytest.raises(NxsError) as ei:
        nxs.index_destroy("twice")
    assert ei.value.code == ErrorCode.MISSING


def test_index_reopen_persists(tmp_path):
    nxs = Nxs(str(tmp_path))
    idx = nxs.index_create("persist")
    idx.add(1, "the quick brown fox")
    idx.add(2, "lazy dogs sleeping")
    nxs.close()

    nxs = Nxs(str(tmp_path))
    try:
        idx = nxs.index_open("persist")
        assert {d for d, _ in idx.search("fox dog")} == {1, 2}
    finally:
        nxs.close()


def test_wide_query_dense_path(nxs):
    """>32 unique terms routes to the dense packed-bitmap executor;
    results must match semantics (presence bits cannot hold 40 terms)."""
    idx = nxs.index_create("wide")
    idx.add(1, " ".join(f"word{i}" for i in range(40)))
    idx.add(2, "word0 word1 unrelated")
    idx.add(3, "nothing in common")
    wide_or = " ".join(f"word{i}" for i in range(40))
    r = idx.search(wide_or)
    assert {d for d, _ in r} == {1, 2}
    # Wide boolean: all 40 terms AND-ed only matches doc 1.
    wide_and = " AND ".join(f"word{i}" for i in range(40))
    r = idx.search(wide_and)
    assert {d for d, _ in r} == {1}
    # Wide AND NOT.
    r = idx.search(f"({wide_or}) AND NOT unrelated")
    assert {d for d, _ in r} == {1}


def test_multi_writer_visibility(tmp_path):
    """Two engine instances over the same basedir (the reference's
    multi-process sharing) see each other's writes via the journal
    commit-pointer sync protocol (terms.c:184-198, dtmap.c:18-26)."""
    nxs_a = Nxs(str(tmp_path))
    nxs_b = Nxs(str(tmp_path))
    try:
        a = nxs_a.index_create("shared")
        b = nxs_b.index_open("shared")
        a.add(1, "written by the first handle")
        b.add(2, "written by the second handle")
        # Search syncs the tails first (search.c:309-310).
        assert {d for d, _ in a.search("written")} == {1, 2}
        assert {d for d, _ in b.search("written")} == {1, 2}
        a.remove(2)
        assert {d for d, _ in b.search("written")} == {1}
    finally:
        nxs_a.close()
        nxs_b.close()
