"""Parallel multi-process ingest (nxsearch_tpu/ingest.py).

Builds the same corpus serially and with striped parallel workers and
requires identical search behavior -- term IDs may differ between the
two builds (assignment order is interleaving-dependent), but document
sets, counts, and scores must match exactly.
"""

import numpy as np
import pytest

from nxsearch_tpu import Nxs
from nxsearch_tpu.ingest import parallel_ingest

N_DOCS = 600


def _doc_text(i: int) -> str:
    rng = np.random.default_rng(i)
    vocab = [f"w{j:03d}" for j in range(250)]
    words = [vocab[int(k)] for k in rng.integers(0, 250, 12)]
    return " ".join(words)


def corpus_source(lo: int, hi: int):
    return [(i + 1, _doc_text(i)) for i in range(lo, hi)]


def test_parallel_ingest_matches_serial(tmp_path):
    serial_dir, par_dir = str(tmp_path / "s"), str(tmp_path / "p")

    boot = Nxs(serial_dir)
    boot.index_create("c")
    boot.close()
    parallel_ingest(serial_dir, "c", corpus_source, N_DOCS, workers=1)

    boot = Nxs(par_dir)
    boot.index_create("c")
    boot.close()
    parallel_ingest(par_dir, "c", corpus_source, N_DOCS, workers=3,
                    chunk=64, stripe=100)

    ns, np_ = Nxs(serial_dir), Nxs(par_dir)
    a, b = ns.index_open("c"), np_.index_open("c")
    assert a.stats()["doc_count"] == N_DOCS
    assert b.stats()["doc_count"] == N_DOCS
    assert a.stats()["term_count"] == b.stats()["term_count"]
    for q in ["w001", "w001 w017", "w003 AND w004", "w005 AND NOT w006"]:
        ra = sorted((d, round(s, 6)) for d, s in a.search(q).repr_dict().items())
        rb = sorted((d, round(s, 6)) for d, s in b.search(q).repr_dict().items())
        assert ra == rb, q
    ns.close()
    np_.close()


def test_parallel_ingest_worker_failure(tmp_path):
    basedir = str(tmp_path)
    boot = Nxs(basedir)
    boot.index_create("c")
    boot.close()

    with pytest.raises(RuntimeError, match="parallel ingest failed"):
        # doc_id 0 is invalid -> one worker raises NxsError(INVALID).
        parallel_ingest(basedir, "c", _bad_source, 300, workers=2,
                        chunk=50, stripe=100)


def _bad_source(lo: int, hi: int):
    return [(i, f"some words {i}") for i in range(lo, hi)]  # id 0 invalid
