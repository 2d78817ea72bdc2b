"""The vectorized batch planner must produce field-for-field the same
plans as the per-query planner (search._build_plan), including
dense-row splits, budgets, and slice shapes."""

import numpy as np
import pytest

from nxsearch_tpu import Nxs
from nxsearch_tpu.query.parser import parse_query
from nxsearch_tpu.query.prepare import prepare
from nxsearch_tpu.search import (SearchParams, _build_plan, _build_plans,
                                 ALGO_BM25, ALGO_TFIDF)


@pytest.fixture(scope="module")
def index(tmp_path_factory):
    nxs = Nxs(str(tmp_path_factory.mktemp("planb")))
    idx = nxs.index_create("p")
    rng = np.random.default_rng(7)
    # Zipf-ish corpus: a few very heavy terms (dense rows), a long
    # tail, and some docs sharing terms.
    vocab = [f"t{i:03d}" for i in range(120)]
    probs = 1.0 / (np.arange(120) + 2.0)
    probs /= probs.sum()
    docs = []
    for doc_id in range(1, 401):
        n = int(rng.integers(3, 12))
        words = rng.choice(vocab, size=n, p=probs)
        docs.append((doc_id, " ".join(words)))
    idx.add_many(docs)
    idx.search("t000")   # materialize the device snapshot (dense rows)
    yield idx
    nxs.close()


def _queries(index):
    rng = np.random.default_rng(13)
    qs = []
    for _ in range(60):
        n = int(rng.integers(1, 6))
        toks = rng.choice([f"t{i:03d}" for i in range(130)], size=n,
                          replace=False)
        qs.append(" ".join(str(t) for t in toks))
    qs += ["t000", "t000 t001 t002 t003",          # heavy (dense) terms
           "t000 AND t001", "t005 AND NOT t000",   # masked fallback
           "zzz missing", "t001 t999"]
    prepared = []
    for q in qs:
        root = parse_query(q)
        prepared.append(prepare(root, index.pipeline,
                                index.dev.host.term_lookup,
                                fuzzymatch=False))
    return prepared


@pytest.mark.parametrize("algo", [ALGO_BM25, ALGO_TFIDF])
def test_batch_planner_matches_per_query(index, algo):
    dev = index.dev
    sp = SearchParams(limit=10, algo=algo, fuzzymatch=False)
    prepared = _queries(index)
    batch = _build_plans(dev, prepared, sp, no_prefix=True)
    for q, got in zip(prepared, batch):
        want = _build_plan(dev, q, sp, no_prefix=True)
        if want is None:
            assert got is None
            continue
        assert got is not None
        assert not got.pf
        for field in ("q_start", "q_len", "term_ids", "d_qpos", "d_row",
                      "sl_start", "sl_len"):
            np.testing.assert_array_equal(
                getattr(got, field), getattr(want, field), err_msg=field)
        for field in ("q_idf", "d_idf", "sl_idf"):
            np.testing.assert_allclose(
                getattr(got, field), getattr(want, field), rtol=0,
                atol=0, err_msg=field)
        assert got.use_mask == want.use_mask
        assert got.use_dense == want.use_dense
        assert got.budget == want.budget
        assert got.depth == want.depth
        assert got.sl_T == want.sl_T
        assert got.single == want.single
        assert len(got.prog_ops) == len(want.prog_ops)
        assert got.batch_key == want.batch_key


def test_batch_planner_matches_per_query_prefix(index, monkeypatch):
    """Prefix-plan parity: the vectorized prefix planner must equal the
    per-query prefix planner field-for-field (wide terms forced via a
    tiny CAP)."""
    from nxsearch_tpu.index.device import DeviceIndex

    monkeypatch.setattr(DeviceIndex, "PREFIX_CAP", 8)
    monkeypatch.setattr(DeviceIndex, "WIDE_MIN_DF", 8)
    import nxsearch_tpu.search as _S
    monkeypatch.setattr(_S, "_PREFIX_MAX_WIDE", 4)
    dev = index.dev
    dev._full_rebuild()          # rebuild with the small cap
    try:
        assert dev.prefix_ready and (dev.prefix_start_lookup >= 0).any()
        sp = SearchParams(limit=10, algo=ALGO_BM25, fuzzymatch=False)
        prepared = _queries(index)
        batch = _build_plans(dev, prepared, sp)
        n_pf = 0
        for q, got in zip(prepared, batch):
            want = _build_plan(dev, q, sp)
            if want is None:
                assert got is None
                continue
            assert got.pf == want.pf
            if not want.pf:
                continue
            n_pf += 1
            for field in ("q_start", "q_len", "term_ids", "sl_start",
                          "sl_len", "pf_bits", "pf_start", "pf_len"):
                np.testing.assert_array_equal(
                    getattr(got, field), getattr(want, field),
                    err_msg=field)
            for field in ("q_idf", "sl_idf", "pf_tail", "pf_idf"):
                np.testing.assert_allclose(
                    getattr(got, field), getattr(want, field), rtol=0,
                    atol=0, err_msg=field)
            assert got.sl_T == want.sl_T
            assert got.n_run == want.n_run
        assert n_pf > 0
    finally:
        # Rebuild with the restored default cap for later tests.
        monkeypatch.undo()
        dev._full_rebuild()


def test_batch_planner_dense_rows_present(index):
    # The fixture's head terms must actually exercise the dense-row
    # split, or the parity above proves nothing about it.
    assert index.dev.dense_row_of, "corpus produced no dense rows"
    dev = index.dev
    sp = SearchParams(limit=10, algo=ALGO_BM25, fuzzymatch=False)
    root = parse_query("t000 t050 t001")
    q = prepare(root, index.pipeline, dev.host.term_lookup,
                fuzzymatch=False)
    plan = _build_plans(dev, [q], sp, no_prefix=True)[0]
    assert plan.use_rows
