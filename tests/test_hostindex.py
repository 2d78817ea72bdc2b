"""Host index engine tests.

Ports the *semantics* of the reference's index-layer tests
(t_index_terms.c, t_index_dtmap.c, t_index_remove.c, t_index_limits.c)
-- not the byte layout, which is deliberately different.  Includes the
multi-writer stress tests (t_stress_terms.c, t_stress_dtmap.c): several
workers, each with its *own* HostIndex over the same journal files,
exercising the flock + publish/sync protocol.
"""

import threading

import pytest

from nxsearch_tpu.errors import ErrorCode, NxsError
from nxsearch_tpu.index.hostindex import HostIndex
from nxsearch_tpu.text.tokenizer import TokenSet, TOKENSET_STAGE


def make_tokens(values, index=None, flags=TOKENSET_STAGE):
    tset = TokenSet()
    for v in values:
        tset.add(v)
    if index is not None:
        tset.resolve(index.term_lookup, flags)
    else:
        tset.staging = list(tset.tokens)
        tset.tokens = []
    return tset


def rot_string(i: int) -> str:
    # Mirrors tests/helpers.c get_rot_string: 8-char base-26 string.
    out = []
    for pos in range(7, -1, -1):
        out.append(chr(ord("a") + (i // (26 ** pos)) % 26))
    return "".join(out)


def add_doc(idx: HostIndex, doc_id: int, values):
    tokens = make_tokens(values)
    tokens.resolve(idx.term_lookup, TOKENSET_STAGE)
    idx.terms_add(tokens)
    assert not tokens.staging
    idx.dtmap_add(doc_id, tokens)


def test_terms_add_and_ids(tmp_path):
    idx = HostIndex(str(tmp_path / "idx"))
    tokens = make_tokens(["foo", "bar", "foo"])
    tokens.resolve(idx.term_lookup, TOKENSET_STAGE)
    assert tokens.staged == 2
    idx.terms_add(tokens)
    # Sequential 1-based IDs in append order (terms.c:275).
    assert idx.term_lookup("foo") == 1
    assert idx.term_lookup("bar") == 2
    assert tokens.tokens[0].term_id in (1, 2)
    idx.close()


def test_terms_visible_to_second_descriptor(tmp_path):
    path = str(tmp_path / "idx")
    a = HostIndex(path)
    add_doc(a, 1, ["cat", "dog", "cat"])
    b = HostIndex(path)  # fresh open: full scan
    assert b.term_lookup("cat") == a.term_lookup("cat")
    assert b.doc_lookup(1) is not None
    assert b.get_doc_termcount(1, b.term_lookup("cat")) == 2
    assert b.get_doc_len(1) == 3
    assert b.doc_count == 1
    assert b.token_count == 3
    a.close()
    b.close()


def test_incremental_sync(tmp_path):
    path = str(tmp_path / "idx")
    a = HostIndex(path)
    b = HostIndex(path)
    add_doc(a, 1, ["alpha", "beta"])
    assert b.doc_lookup(1) is None    # not yet synced
    b.sync()
    assert b.doc_lookup(1) is not None
    assert b.term_lookup("alpha") == 1
    a.close()
    b.close()


def test_duplicate_doc(tmp_path):
    idx = HostIndex(str(tmp_path / "idx"))
    add_doc(idx, 7, ["x"])
    with pytest.raises(NxsError) as ei:
        add_doc(idx, 7, ["y"])
    assert ei.value.code == ErrorCode.EXISTS
    assert ei.value.msg == "document 7 is already indexed"
    idx.close()


def test_remove_semantics(tmp_path):
    path = str(tmp_path / "idx")
    a = HostIndex(path)
    add_doc(a, 1, ["cat", "dog"])
    add_doc(a, 2, ["cat"])
    live = HostIndex(path)  # live reader, already synced both docs
    assert live.doc_count == 2

    a.dtmap_remove(1)
    assert a.doc_count == 1
    assert a.token_count == 1
    assert a.doc_lookup(1) is None
    cat = a.term_lookup("cat")
    dog = a.term_lookup("dog")
    assert int(a.term_df.view()[cat - 1]) == 1
    assert int(a.term_df.view()[dog - 1]) == 0
    assert int(a.term_total.view()[cat - 1]) == 1

    # Live reader consumes the tombstone marker.
    live.sync()
    assert live.doc_count == 1
    assert live.doc_lookup(1) is None

    # Fresh reader skips the zeroed block.
    fresh = HostIndex(path)
    assert fresh.doc_count == 1
    assert fresh.doc_lookup(1) is None
    assert fresh.doc_lookup(2) is not None

    # Remove of a missing document.
    with pytest.raises(NxsError) as ei:
        a.dtmap_remove(1)
    assert ei.value.code == ErrorCode.MISSING

    # Re-adding the removed doc id is allowed.
    add_doc(a, 1, ["bird"])
    assert a.doc_count == 2
    a.close()
    live.close()
    fresh.close()


def test_term_too_long(tmp_path):
    idx = HostIndex(str(tmp_path / "idx"))
    with pytest.raises(NxsError) as ei:
        add_doc(idx, 1, ["x" * 65536])
    assert ei.value.code == ErrorCode.LIMIT
    idx.close()


def test_many_terms(tmp_path):
    # t_index_limits.c run_many_terms_test, scaled down for speed:
    # N unique terms in one doc, verified through a fresh descriptor.
    n = 5000
    path = str(tmp_path / "idx")
    idx = HostIndex(path)
    values = [rot_string(i) for i in range(n)]
    add_doc(idx, 1001, values)
    idx.close()

    fresh = HostIndex(path)
    assert fresh.term_count == n
    for i in (0, 1, 42, n - 1):
        term_id = fresh.term_lookup(rot_string(i))
        assert term_id == i + 1
        assert fresh.get_doc_termcount(1001, term_id) == 1
    assert fresh.get_doc_len(1001) == n
    assert fresh.token_count == n
    fresh.close()


def test_csr_snapshot(tmp_path):
    idx = HostIndex(str(tmp_path / "idx"))
    add_doc(idx, 1, ["cat", "dog", "cat"])
    add_doc(idx, 2, ["dog", "cow"])
    idx.dtmap_remove(2)
    csr = idx.build_csr()
    cat, dog, cow = (idx.term_lookup(v) for v in ("cat", "dog", "cow"))
    # Postings of removed docs are filtered out of the snapshot.
    s, e = csr["term_starts"][dog - 1], csr["term_starts"][dog]
    assert e - s == 1
    s, e = csr["term_starts"][cow - 1], csr["term_starts"][cow]
    assert e - s == 0
    s, e = csr["term_starts"][cat - 1], csr["term_starts"][cat]
    assert list(csr["postings_tf"][s:e]) == [2.0]
    assert csr["doc_count"] == 1
    assert csr["token_count"] == 3
    idx.close()


@pytest.mark.parametrize("nworkers,nterms", [(4, 2000)])
def test_stress_terms(tmp_path, nworkers, nterms):
    # t_stress_terms.c: N workers adding overlapping unique terms via
    # their own descriptors; a fresh open sees every term exactly once
    # with consistent IDs.
    path = str(tmp_path / "idx")
    HostIndex(path).close()  # create files
    errors = []

    def worker(wid: int):
        try:
            idx = HostIndex(path)
            for i in range(wid, nterms, 2):  # overlapping ranges
                tokens = make_tokens([rot_string(i)])
                tokens.resolve(idx.term_lookup, TOKENSET_STAGE)
                idx.terms_add(tokens)
            idx.close()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(w % 2,))
               for w in range(nworkers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors

    fresh = HostIndex(path)
    assert fresh.term_count == nterms
    seen_ids = set()
    for i in range(nterms):
        tid = fresh.term_lookup(rot_string(i))
        assert tid is not None
        seen_ids.add(tid)
    assert seen_ids == set(range(1, nterms + 1))
    fresh.close()


@pytest.mark.parametrize("nworkers,ndocs", [(4, 500)])
def test_stress_dtmap(tmp_path, nworkers, ndocs):
    # t_stress_dtmap.c: N workers adding disjoint documents concurrently.
    path = str(tmp_path / "idx")
    HostIndex(path).close()
    errors = []

    def worker(wid: int):
        try:
            idx = HostIndex(path)
            for i in range(ndocs):
                doc_id = wid * ndocs + i + 1
                add_doc(idx, doc_id, [rot_string(i), rot_string(i + 1),
                                      rot_string(i)])
            idx.close()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(w,))
               for w in range(nworkers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors

    fresh = HostIndex(path)
    assert fresh.doc_count == nworkers * ndocs
    assert fresh.token_count == nworkers * ndocs * 3
    for wid in range(nworkers):
        for i in (0, ndocs - 1):
            doc_id = wid * ndocs + i + 1
            assert fresh.get_doc_len(doc_id) == 3
            tid = fresh.term_lookup(rot_string(i))
            assert fresh.get_doc_termcount(doc_id, tid) == 2
    fresh.close()


def test_crash_safety_torn_append(tmp_path):
    # Data appended but commit pointer not published => invisible.
    path = str(tmp_path / "idx")
    idx = HostIndex(path)
    add_doc(idx, 1, ["safe"])
    # Simulate a torn write past the committed length.
    import os
    with open(os.path.join(path, "dtmap.db"), "r+b") as f:
        f.seek(0, 2)
        f.write(b"\xde\xad\xbe\xef" * 8)
    idx.close()
    fresh = HostIndex(path)
    assert fresh.doc_count == 1
    assert fresh.doc_lookup(1) is not None
    fresh.close()
