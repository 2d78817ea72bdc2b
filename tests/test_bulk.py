"""Bulk ingest (add_many / HostIndex.add_bulk) semantics."""

import pytest

from nxsearch_tpu import Nxs
from nxsearch_tpu.errors import ErrorCode, NxsError


@pytest.fixture()
def nxs(tmp_path):
    inst = Nxs(str(tmp_path))
    yield inst
    inst.close()


def test_bulk_matches_sequential(nxs, tmp_path):
    docs = [
        (1, "The quick brown fox jumped over the lazy dog"),
        (2, "Once upon a time there were three little foxes"),
        (3, "Dogs and cats living together"),
        (4, "cat cat dog"),
    ]
    a = nxs.index_create("seq")
    for doc_id, text in docs:
        a.add(doc_id, text)
    b = nxs.index_create("bulk")
    b.add_many(docs)

    for query in ("dog", "fox dog", "cat AND dog"):
        ra = dict(a.search(query))
        rb = dict(b.search(query))
        assert ra == pytest.approx(rb), query
    # Same term dictionary (IDs assigned in the same order).
    assert a.host.term_values == b.host.term_values


def test_bulk_duplicate_aborts_batch(nxs):
    idx = nxs.index_create("dup")
    idx.add(5, "existing document text")
    with pytest.raises(NxsError) as ei:
        idx.add_many([(6, "new one"), (5, "duplicate"), (7, "another")])
    assert ei.value.code == ErrorCode.EXISTS
    # Nothing from the batch was committed.
    assert idx.search("new").count == 0
    assert idx.search("another").count == 0
    # Duplicate within the batch itself.
    with pytest.raises(NxsError):
        idx.add_many([(8, "aa bb"), (8, "cc dd")])
    assert idx.search("aa").count == 0


def test_bulk_visible_to_other_handles(nxs, tmp_path):
    idx = nxs.index_create("vis")
    idx.add_many([(1, "shared dog"), (2, "shared cat")])
    other = Nxs(str(tmp_path))
    try:
        o = other.index_open("vis")
        assert {d for d, _ in o.search("shared")} == {1, 2}
    finally:
        other.close()


def test_bulk_validation(nxs):
    idx = nxs.index_create("val")
    with pytest.raises(NxsError) as ei:
        idx.add_many([(0, "zero id")])
    assert ei.value.code == ErrorCode.INVALID
    with pytest.raises(NxsError) as ei:
        idx.add_many([(1, "...")])
    assert ei.value.code == ErrorCode.MISSING
    idx.add_many([])  # no-op
