"""Fast-open snapshot cache: correctness + tail replay + corruption."""

from nxsearch_tpu import Nxs
from nxsearch_tpu.index.hostindex import HostIndex


def _state(h: HostIndex):
    """Live-semantics view: slot numbering may legitimately differ
    between a snapshot-restored process and a fresh journal replay
    (fresh readers skip zeroed removed-doc blocks entirely, like the
    reference), so compare per-document content, not raw slots."""
    docs = {}
    for doc_id, slot in h.doc_map.items():
        start = int(h.doc_start.a[slot])
        n = int(h.doc_n.a[slot])
        pairs = sorted(zip(h.p_term.a[start: start + n].tolist(),
                           h.p_count.a[start: start + n].tolist()))
        docs[doc_id] = (int(h.doc_len.a[slot]), pairs)
    return {
        "terms": list(h.term_values),
        "docs": docs,
        "doc_count": h.doc_count,
        "token_count": h.token_count,
        "totals": h.term_total.view().tolist(),
        "df": h.term_df.view().tolist(),
    }


def test_snapshot_roundtrip_equals_replay(tmp_path):
    nxs = Nxs(str(tmp_path))
    idx = nxs.index_create("snap")
    idx.add_many([(i, f"document number {i} about topic{i % 7}")
                  for i in range(1, 201)])
    idx.remove(5)
    idx.remove(77)
    nxs.close()  # writes the snapshot

    fast = HostIndex(str(tmp_path / "data" / "snap"))
    slow = HostIndex(str(tmp_path / "data" / "snap"), use_snapshot=False)
    try:
        assert fast._snapshot_gen >= 0   # snapshot actually loaded
        assert _state(fast) == _state(slow)
    finally:
        fast.close()
        slow.close()


def test_snapshot_plus_tail_replay(tmp_path):
    nxs = Nxs(str(tmp_path))
    idx = nxs.index_create("tail")
    idx.add(1, "first document here")
    idx.checkpoint()
    # Post-snapshot writes land in the journal tail only.
    idx.add(2, "second document arrives later")
    idx.remove(1)
    nxs.close_no_snapshot = True  # (attribute unused; explicit intent)
    idx.host.close()              # close WITHOUT saving a new snapshot
    nxs._indexes.clear()

    h = HostIndex(str(tmp_path / "data" / "tail"))
    ref = HostIndex(str(tmp_path / "data" / "tail"), use_snapshot=False)
    try:
        assert _state(h) == _state(ref)
        assert 2 in h.doc_map and 1 not in h.doc_map
    finally:
        h.close()
        ref.close()


def test_corrupt_snapshot_falls_back(tmp_path):
    nxs = Nxs(str(tmp_path))
    idx = nxs.index_create("corrupt")
    idx.add(1, "some proper words")
    nxs.close()
    (tmp_path / "data" / "corrupt" / "snapshot.npz").write_bytes(
        b"not an npz at all")
    h = HostIndex(str(tmp_path / "data" / "corrupt"))
    try:
        assert h.doc_count == 1
        assert h.term_lookup("word") is not None
    finally:
        h.close()


def test_search_after_snapshot_open(tmp_path):
    nxs = Nxs(str(tmp_path))
    idx = nxs.index_create("srch")
    idx.add(1, "the quick brown fox")
    idx.add(2, "lazy dogs sleeping")
    nxs.close()

    nxs = Nxs(str(tmp_path))
    try:
        idx = nxs.index_open("srch")
        assert {d for d, _ in idx.search("fox dog")} == {1, 2}
    finally:
        nxs.close()


def test_csr_cache_roundtrip(tmp_path, monkeypatch):
    """The persisted CSR layout must reproduce the exact device
    snapshot on reopen (generation-checked; stale caches ignored)."""
    from nxsearch_tpu import Nxs, Params
    from nxsearch_tpu.index.device import DeviceIndex

    monkeypatch.setattr(DeviceIndex, "CSR_CACHE_MIN_POSTINGS", 0)
    import numpy as np
    rng = np.random.default_rng(3)
    docs = [(i + 1, " ".join(f"t{rng.integers(0, 40)}" for _ in range(12)))
            for i in range(120)]
    nxs = Nxs(str(tmp_path))
    idx = nxs.index_create("c")
    idx.add_many(docs)
    sp = Params().set_uint("limit", 50)
    want = dict(idx.search("t3 t7", sp))   # builds + saves the cache
    import os
    assert os.path.exists(idx.dev._csr_cache_path)
    idx.checkpoint()
    nxs.close()

    nxs2 = Nxs(str(tmp_path))
    idx2 = nxs2.index_open("c")
    got = dict(idx2.search("t3 t7", sp))   # loads the cache
    assert got == want
    # Mutations bump the generation: the stale cache must be ignored
    # and a later rebuild must still be correct.
    idx2.remove(5)
    got2 = dict(idx2.search("t3 t7", sp))
    assert 5 not in got2
    nxs2.close()


def test_csr_cache_v1_compat_and_upgrade(tmp_path, monkeypatch):
    """A v1 layout cache (f32 ltf) must load, produce identical
    results, and upgrade itself to the compact v2 (u16 tf) format."""
    import os

    import numpy as np

    from nxsearch_tpu import Nxs, Params
    from nxsearch_tpu.index.device import DeviceIndex

    monkeypatch.setattr(DeviceIndex, "CSR_CACHE_MIN_POSTINGS", 0)
    rng = np.random.default_rng(9)
    docs = [(i + 1, " ".join(f"t{rng.integers(0, 30)}" for _ in range(10)))
            for i in range(90)]
    nxs = Nxs(str(tmp_path))
    idx = nxs.index_create("v")
    idx.add_many(docs)
    sp = Params().set_uint("limit", 50)
    want = dict(idx.search("t3 t7 t11", sp))
    path = idx.dev._csr_cache_path
    with np.load(path, allow_pickle=False) as zf:
        assert int(zf["version"]) == 2 and "tf16" in zf
        z = {k: np.asarray(zf[k]) for k in zf.files}
    # Rewrite the cache in the v1 layout.
    ltf = np.log(z["tf16"].astype(np.float64) + 1.0).astype(np.float32)
    with open(path, "wb") as f:
        np.savez(f, version=np.int64(1), generation=z["generation"],
                 term_starts=z["term_starts"], slot=z["slot"],
                 ltf=ltf, perm=z["perm"])
    idx.checkpoint()
    nxs.close()

    nxs2 = Nxs(str(tmp_path))
    idx2 = nxs2.index_open("v")
    got = dict(idx2.search("t3 t7 t11", sp))
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-4
    with np.load(path, allow_pickle=False) as z2:
        assert int(z2["version"]) == 2 and "tf16" in z2   # upgraded
        np.testing.assert_array_equal(z2["slot"], z["slot"])
    nxs2.close()


def test_v2_missing_sidecar_falls_back(tmp_path):
    """v2 meta with a deleted sidecar must fall back to journal replay."""
    import os
    nxs = Nxs(str(tmp_path))
    idx = nxs.index_create("side")
    idx.add_many([(i, f"alpha beta gamma{i % 5}") for i in range(1, 51)])
    nxs.close()
    os.remove(tmp_path / "data" / "side" / "snapshot_p_term.npy")
    h = HostIndex(str(tmp_path / "data" / "side"))
    ref = HostIndex(str(tmp_path / "data" / "side"), use_snapshot=False)
    try:
        assert _state(h) == _state(ref)
    finally:
        h.close()
        ref.close()


def test_v2_truncated_sidecar_falls_back(tmp_path):
    """A torn sidecar write (wrong length) must be rejected by the
    length check and fall back to replay."""
    import numpy as np
    nxs = Nxs(str(tmp_path))
    idx = nxs.index_create("torn")
    idx.add_many([(i, f"delta epsilon zeta{i % 3}") for i in range(1, 41)])
    nxs.close()
    side = tmp_path / "data" / "torn" / "snapshot_doc_len.npy"
    arr = np.load(side)
    np.save(side, arr[: len(arr) // 2])
    h = HostIndex(str(tmp_path / "data" / "torn"))
    ref = HostIndex(str(tmp_path / "data" / "torn"), use_snapshot=False)
    try:
        assert _state(h) == _state(ref)
    finally:
        h.close()
        ref.close()


def test_v1_inline_snapshot_still_loads(tmp_path):
    """Legacy v1 snapshots (arrays inline in the npz) must keep
    loading after the v2 format change."""
    import numpy as np
    nxs = Nxs(str(tmp_path))
    idx = nxs.index_create("leg")
    idx.add_many([(i, f"eta theta iota{i % 4}") for i in range(1, 31)])
    nxs.close()
    idxdir = tmp_path / "data" / "leg"
    ref = HostIndex(str(idxdir), use_snapshot=False)
    # Rewrite the snapshot in the v1 inline layout from replayed state.
    blob = "\x00".join(ref.term_values).encode("utf-8")
    with open(idxdir / "snapshot.npz", "wb") as f:
        np.savez(
            f, version=np.int64(1),
            terms_consumed=np.int64(ref._terms_consumed),
            dt_consumed=np.int64(ref._dt_consumed),
            doc_count=np.int64(ref.doc_count),
            token_count=np.int64(ref.token_count),
            values_blob=np.frombuffer(blob, dtype=np.uint8),
            n_terms=np.int64(len(ref.term_values)),
            **{name: getattr(ref, name).view()
               for name, _d, _g in HostIndex._SIDECARS})
    for name, _d, _g in HostIndex._SIDECARS:
        (idxdir / f"snapshot_{name}.npy").unlink(missing_ok=True)
    h = HostIndex(str(idxdir))
    try:
        assert h._snapshot_gen == h.generation   # snapshot path taken
        assert _state(h) == _state(ref)
    finally:
        h.close()
        ref.close()


def test_v2_resave_while_mapped(tmp_path):
    """os.replace of sidecars must not disturb a live reader whose
    arrays are memory-mapped from the old inodes."""
    nxs = Nxs(str(tmp_path))
    idx = nxs.index_create("live")
    idx.add_many([(i, f"kappa lambda mu{i % 6}") for i in range(1, 61)])
    idx.checkpoint()
    nxs.close()

    reader = HostIndex(str(tmp_path / "data" / "live"))
    before = _state(reader)
    # A second writer appends and re-saves the snapshot (new sidecars
    # replace the files the reader has mapped).
    nxs2 = Nxs(str(tmp_path))
    nxs2.index_open("live").add(1000, "nu kappa")
    nxs2.close()   # re-saves the snapshot over the mapped files
    # The reader's mapped view is unchanged until it syncs...
    assert _state(reader) == before
    # ...and a sync brings in the tail correctly.
    reader.sync()
    assert 1000 in reader.doc_map
    reader.close()
