"""Multi-process journal stress (reference: t_stress_terms.c:23-80,
t_stress_dtmap.c:22-128).

The reference's stress tests simulate N independent engines sharing
one index's files, exercising the flock + publish/sync protocol: each
worker opens its OWN handle over the same basedir, hammers unique
terms / documents, and a fresh open afterwards must see every write
exactly once with consistent IDs and counts.  The reference uses
pthreads with per-thread handles; here each worker is a real separate
PROCESS, so the cross-process flock path (storage.py LogFile) is what
actually serializes appends and re-syncs.

Scaled to CI budget by default; NXS_STRESS_SCALE=1 runs the
reference-sized load (4 x 10k terms, 4 x 12.5k docs).
"""

import multiprocessing as mp
import os

import pytest

from nxsearch_tpu import Nxs, Params

N_WORKERS = 4
SCALE = float(os.environ.get("NXS_STRESS_SCALE", "0.1"))
TERMS_PER_WORKER = max(200, int(10_000 * SCALE))
DOCS_PER_WORKER = max(150, int(12_500 * SCALE))


def _terms_worker(basedir: str, worker: int, n_terms: int) -> None:
    # Fresh process-private handle over the shared files
    # (t_stress_terms.c gives each thread its own nxs_index_t).
    nxs = Nxs(basedir)
    idx = nxs.index_open("stress")
    doc_base = 1_000_000 * (worker + 1)
    chunk = 100
    for at in range(0, n_terms, chunk):
        words = " ".join(f"w{worker}x{j}" for j in range(at, min(
            at + chunk, n_terms)))
        idx.add(doc_base + at, words)
    nxs.close()


def _dtmap_worker(basedir: str, worker: int, n_docs: int) -> None:
    nxs = Nxs(basedir)
    idx = nxs.index_open("stress")
    doc_base = 1_000_000 * (worker + 1)
    for j in range(n_docs):
        idx.add(doc_base + j, f"alpha beta w{worker} doc{j % 97} "
                              f"gamma{(worker * 31 + j) % 53}")
    nxs.close()


def _mixed_worker(basedir: str, worker: int, _n: int) -> None:
    nxs = Nxs(basedir)
    h = nxs.index_open("stress")
    for j in range(50):
        h.add(10_000 * (worker + 1) + j,
              f"new doc {j} from worker {worker}")
    for i in range(worker * 20 + 1, worker * 20 + 11):
        h.remove(i)  # disjoint tombstone ranges
    nxs.close()


def _spawn(target, args_list):
    ctx = mp.get_context("spawn")
    procs = [ctx.Process(target=target, args=args) for args in args_list]
    for p in procs:
        p.start()
    for p in procs:
        p.join(600)
        assert p.exitcode == 0, f"worker failed: {p.exitcode}"


@pytest.mark.slow
def test_stress_terms_multiprocess(tmp_path):
    """N processes x unique terms; a FRESH open must resolve every
    term with a stable unique sequential ID (t_stress_terms.c)."""
    basedir = str(tmp_path)
    boot = Nxs(basedir)
    boot.index_create("stress")
    boot.close()

    _spawn(_terms_worker,
           [(basedir, w, TERMS_PER_WORKER) for w in range(N_WORKERS)])

    fresh = Nxs(basedir)
    idx = fresh.index_open("stress")
    seen_ids = set()
    for w in range(N_WORKERS):
        for j in range(TERMS_PER_WORKER):
            tid = idx.host.term_lookup(f"w{w}x{j}")
            assert tid is not None, (w, j)
            seen_ids.add(tid)
    n_terms = N_WORKERS * TERMS_PER_WORKER
    assert len(seen_ids) == n_terms
    # Sequential 1-based IDs with no holes (terms.c:275 semantics).
    assert idx.host.term_count == n_terms
    assert min(seen_ids) == 1 and max(seen_ids) == n_terms
    fresh.close()


@pytest.mark.slow
def test_stress_dtmap_multiprocess(tmp_path):
    """N processes x docs; a fresh open must see every document with
    correct lengths and term counts (t_stress_dtmap.c)."""
    basedir = str(tmp_path)
    boot = Nxs(basedir)
    boot.index_create("stress")
    boot.close()

    _spawn(_dtmap_worker,
           [(basedir, w, DOCS_PER_WORKER) for w in range(N_WORKERS)])

    fresh = Nxs(basedir)
    idx = fresh.index_open("stress")
    n_docs = N_WORKERS * DOCS_PER_WORKER
    assert idx.host.doc_count == n_docs
    # Every doc is 5 tokens long (doc_len counts duplicates).
    assert idx.host.token_count == 5 * n_docs
    for w in range(N_WORKERS):
        doc_base = 1_000_000 * (w + 1)
        for j in (0, DOCS_PER_WORKER // 2, DOCS_PER_WORKER - 1):
            slot = idx.host.doc_lookup(doc_base + j)
            assert slot is not None, (w, j)
            assert idx.host.doc_len.a[slot] == 5
    # Cross-process content is searchable with exact counts.
    assert idx.search("alpha").count == min(n_docs, 1000)
    fresh.close()


def test_stress_mixed_remove_multiprocess(tmp_path):
    """Concurrent writers + removers across processes: tombstones and
    re-syncs must converge to the same counts on a fresh open."""
    basedir = str(tmp_path)
    boot = Nxs(basedir)
    idx = boot.index_create("stress")
    for i in range(1, 101):
        idx.add(i, f"seed doc {i} with shared words")
    boot.close()

    _spawn(_mixed_worker, [(basedir, w, 0) for w in range(4)])

    fresh = Nxs(basedir)
    idx = fresh.index_open("stress")
    # 100 seed + 200 new - 40 removed
    assert idx.host.doc_count == 260
    assert idx.search("seed").count == 60
    assert idx.search("worker").count == 200
    fresh.close()


def _sigkill_victim(basedir):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from nxsearch_tpu import Nxs
    nxs = Nxs(basedir)
    idx = nxs.index_open("kill")
    i = 1000
    while True:  # killed from outside mid-append
        idx.add_many([(i + j, f"alpha bravo w{i + j} charlie")
                      for j in range(50)])
        i += 50


def test_sigkill_mid_ingest_recovers(tmp_path):
    """SIGKILL a writer process mid-ingest, then reopen: the journal
    commit-pointer discipline (append data, then release-store
    data_len -- storage.py, matching terms.c:303-305/dtmap.c:331-337)
    must leave every committed document fully intact and searchable,
    with internally consistent counters; uncommitted tails are
    invisible.  A second writer must be able to continue appending."""
    import signal
    import time

    basedir = str(tmp_path)
    nxs = Nxs(basedir)
    idx = nxs.index_create("kill")
    idx.add(1, "alpha seed document")
    nxs.close()

    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_sigkill_victim, args=(basedir,), daemon=True)
    p.start()
    time.sleep(2.5)  # let it commit a few batches
    os.kill(p.pid, signal.SIGKILL)
    p.join(10)

    # Fresh open replays only the committed prefix.
    nxs2 = Nxs(basedir)
    idx2 = nxs2.index_open("kill")
    st = idx2.stats()
    n_docs = st["docs"] if isinstance(st, dict) and "docs" in st else None
    res = dict(idx2.search("alpha", Params().set_uint("limit", 100000)))
    assert 1 in res
    if n_docs is not None:
        assert len(res) == n_docs
    # Every committed doc is complete: its unique term matches too.
    if len(res) > 1:
        some = sorted(d for d in res if d != 1)[-1]
        assert some in dict(idx2.search(f"w{some}"))
    # The index remains writable after the crash.
    idx2.add(2, "post crash write alpha")
    assert 2 in dict(idx2.search("alpha", Params().set_uint("limit", 100000)))
    nxs2.close()
