"""Batched search: results must be identical to per-query search."""

import json

import pytest

from nxsearch_tpu import Nxs, Params

DOCS = [
    (1, "The quick brown fox jumped over the lazy dog"),
    (2, "Once upon a time there were three little foxes"),
    (3, "Dogs and cats living together in harmony"),
    (4, "A dog chasing a cat chasing a mouse"),
    (5, "Textbook about Erlang in Linux environment"),
    (6, "Unix Shell scripting textbook"),
]

QUERIES = [
    "dog",
    "fox dog cat",
    "dog AND cat",
    "dog AND NOT cat",
    "textbook AND (erlang OR shell)",
    "nonexistentterm",
    "fox",
]


@pytest.fixture(scope="module")
def index(tmp_path_factory):
    nxs = Nxs(str(tmp_path_factory.mktemp("batch")))
    idx = nxs.index_create("b")
    for doc_id, text in DOCS:
        idx.add(doc_id, text)
    yield idx
    nxs.close()


@pytest.mark.parametrize("algo", ["BM25", "TF-IDF"])
def test_batch_matches_sequential(index, algo):
    p = Params().set_str("algo", algo)
    batched = index.search_many(QUERIES, p)
    assert len(batched) == len(QUERIES)
    for query, resp in zip(QUERIES, batched):
        single = index.search(query, p)
        assert dict(resp) == pytest.approx(dict(single), abs=1e-6), query
        assert resp.count == single.count


def test_sharded_batch_matches_sequential(tmp_path):
    import jax

    from nxsearch_tpu.parallel import make_mesh
    nxs = Nxs(str(tmp_path), mesh=make_mesh(jax.devices()))
    try:
        idx = nxs.index_create("sb")
        for doc_id, text in DOCS:
            idx.add(doc_id, text)
        batched = idx.search_many(QUERIES)
        for query, resp in zip(QUERIES, batched):
            single = idx.search(query)
            assert dict(resp) == pytest.approx(dict(single), abs=1e-6), query
    finally:
        nxs.close()


def test_pipelined_matches_batched(index):
    p = Params().set_str("algo", "BM25")
    batches = [QUERIES, QUERIES[:3], QUERIES[3:]]
    piped = index.search_pipelined(batches, p)
    assert [len(b) for b in piped] == [len(b) for b in batches]
    for qbatch, rbatch in zip(batches, piped):
        expect = index.search_many(qbatch, p)
        for query, resp, ref in zip(qbatch, rbatch, expect):
            assert dict(resp) == pytest.approx(dict(ref), abs=1e-6), query


def test_pipelined_empty(index):
    assert index.search_pipelined([]) == []
    assert index.search_pipelined([[]]) == [[]]


def test_batch_respects_limit(index):
    responses = index.search_many(["dog fox cat"],
                                  Params().set_uint("limit", 2))
    assert responses[0].count == 2


def test_batch_empty_list(index):
    assert index.search_many([]) == []


def test_service_search_batch(tmp_path):
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from nxsearch_tpu.service.app import SearchService, make_handler

    svc = SearchService(str(tmp_path))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        def post(url, data):
            req = urllib.request.Request(url, data=data, method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, r.read()

        post(f"{base}/bt", b"")
        post(f"{base}/bt/add/1", b"cat dog cow")
        post(f"{base}/bt/add/2", b"dog cow")
        body = json.dumps({"queries": ["cat", "cow", "zebra"]}).encode()
        status, raw = post(f"{base}/bt/search_batch", body)
        assert status == 200
        out = json.loads(raw)
        assert len(out["responses"]) == 3
        assert out["responses"][0]["results"][0]["doc_id"] == 1
        assert out["responses"][2]["count"] == 0
    finally:
        httpd.shutdown()
        httpd.server_close()
        svc.close()
