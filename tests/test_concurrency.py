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
