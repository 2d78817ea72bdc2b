"""Shared-handle concurrency: the service's threading model.

The reference gives every nginx worker a process-private handle; our
service shares one Index per name across request threads, so the
handle itself must serialize journal-tail consumption (without the
per-Index lock, two concurrent sync()s double-apply the same tail).
"""

import threading

from nxsearch_tpu import Nxs


def test_shared_handle_search_during_ingest(tmp_path):
    nxs = Nxs(str(tmp_path))
    writer_nxs = Nxs(str(tmp_path))
    try:
        idx = nxs.index_create("shared")
        idx.add(1, "seed document about dogs")
        writer = writer_nxs.index_open("shared")

        errors = []
        stop = threading.Event()

        def search_loop():
            try:
                while not stop.is_set():
                    idx.search("dogs document")
            except Exception as e:  # pragma: no cover
                errors.append(e)

        def write_loop(base):
            try:
                for i in range(50):
                    writer.add(base + i, f"document {base + i} with dogs")
            except Exception as e:  # pragma: no cover
                errors.append(e)

        searchers = [threading.Thread(target=search_loop)
                     for _ in range(3)]
        for t in searchers:
            t.start()
        writers = [threading.Thread(target=write_loop, args=(1000 * k,))
                   for k in range(1, 4)]
        for t in writers:
            t.start()
        for t in writers:
            t.join()
        stop.set()
        for t in searchers:
            t.join()

        assert not errors, errors
        # Every write applied exactly once.
        resp = idx.search("dogs", None)
        assert resp.count == 151
        assert idx.host.doc_count == 151
        # And the other handle agrees.
        assert writer.search("dogs").count == 151
    finally:
        nxs.close()
        writer_nxs.close()


def test_concurrent_readers_with_writer(tmp_path):
    """Shared-lock readers run while a writer interleaves mutations:
    every search must observe a consistent index (no torn state, no
    double-applied journal tails) through the RW fast path + upgrade."""
    import threading

    from nxsearch_tpu import Nxs, Params

    nxs = Nxs(str(tmp_path))
    idx = nxs.index_create("rw")
    idx.add_many([(i + 1, f"alpha beta w{i % 11}") for i in range(100)])
    idx.search("alpha")  # build the base snapshot

    errors = []
    stop = threading.Event()

    def reader():
        sp = Params().set_uint("limit", 200)
        try:
            while not stop.is_set():
                r = dict(idx.search("alpha", sp))
                if not r:
                    errors.append("empty result")
                r2 = dict(idx.search("alpha AND NOT beta", sp))
                if r2:
                    errors.append(f"NOT violated: {sorted(r2)[:3]}")
        except Exception as e:  # pragma: no cover
            errors.append(repr(e))

    def writer():
        try:
            for i in range(30):
                idx.add(1000 + i, f"alpha beta gamma w{i % 5}")
                if i % 3 == 0:
                    idx.remove(1 + (i % 50))
        except Exception as e:  # pragma: no cover
            errors.append(repr(e))

    readers = [threading.Thread(target=reader) for _ in range(4)]
    w = threading.Thread(target=writer)
    for t in readers:
        t.start()
    w.start()
    w.join()
    stop.set()
    for t in readers:
        t.join()
    assert not errors, errors[:5]
    # Final state: all writer docs visible, removed docs absent.
    final = dict(idx.search("gamma", Params().set_uint("limit", 200)))
    assert all(1000 + i in final for i in range(30))
    nxs.close()
