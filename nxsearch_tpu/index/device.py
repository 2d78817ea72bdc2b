"""Device snapshot of the host index: padded CSR arrays in HBM.

The reference's in-memory search state (per-term roaring bitmaps +
mmap-backed counts, src/index/idxterm.c, idxdoc.c) is derived state
rebuilt from the journals.  The TPU analogue is a *snapshot*: the
host-authoritative :class:`HostIndex` is transposed to term-grouped CSR
(HostIndex.build_csr) and uploaded as immutable device arrays.  Shapes
are padded to power-of-two buckets so XLA executables are reused as the
index grows; a refresh only happens when the host generation changed
(the functional analogue of idx_*_sync consuming the journal tail --
search syncs before every query, search.c:309-310).

Device arrays (everything the scoring kernel needs; strings and the
term dictionary never leave the host):

    postings_slot int32[P_pad]   doc slots grouped by term
    postings_ltf  float32[P_pad] log(tf + 1) per (term, doc) -- the
                                 logs are taken on the host in f64
                                 because score parity is 1e-4 and
                                 XLA's fast f32 log is not that exact
    doc_len       float32[S_pad] per-slot token counts

Host-side metadata kept with the snapshot (term_starts, term_df,
doc_ids, scalars) resolves query terms to CSR ranges and maps result
slots back to external document IDs.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .hostindex import HostIndex


def _bucket(n: int, minimum: int) -> int:
    """Smallest power-of-two >= max(n, minimum)."""
    size = minimum
    while size < n:
        size <<= 1
    return size


class DeviceIndex:
    """Padded device mirror of one HostIndex generation."""

    def __init__(self, host: HostIndex, device: Optional[jax.Device] = None):
        self.host = host
        self.device = device
        self.generation = -1
        # Host-side metadata of the current snapshot.
        self.term_starts = np.zeros(1, dtype=np.int64)
        self.term_df = np.zeros(0, dtype=np.int64)
        self.doc_ids = np.zeros(0, dtype=np.int64)
        self.doc_count = 0
        self.token_count = 0
        self.n_slots = 0        # padded slot count (S_pad)
        self.n_postings = 0     # padded postings count (P_pad)
        # Device arrays.
        self.postings_slot = None
        self.postings_ltf = None
        self.doc_len = None

    # S_pad is a multiple of 1024 so the packed bitmap width (S_pad/32)
    # is a multiple of 32 words -- friendly to VPU lanes.
    _MIN_SLOTS = 1024
    _MIN_POSTINGS = 4096

    def refresh(self) -> bool:
        """Re-snapshot if the host index changed.  Returns True if so."""
        if self.generation == self.host.generation:
            return False
        snap = self.host.build_csr()
        self.term_starts = snap["term_starts"]
        self.term_df = snap["term_df"]
        self.doc_ids = snap["doc_ids"]
        self.doc_count = snap["doc_count"]
        self.token_count = snap["token_count"]

        n_live_slots = len(snap["doc_ids"])
        n_post = len(snap["postings_slot"])
        s_pad = _bucket(n_live_slots, self._MIN_SLOTS)
        p_pad = _bucket(n_post, self._MIN_POSTINGS)

        slot = np.zeros(p_pad, dtype=np.int32)
        slot[:n_post] = snap["postings_slot"]
        ltf = np.zeros(p_pad, dtype=np.float32)
        ltf[:n_post] = np.log(snap["postings_tf"].astype(np.float64) + 1.0)
        # Padding doc_len with 1.0 keeps dl/adl finite for padded slots
        # (their contributions are masked out regardless).
        dlen = np.ones(s_pad, dtype=np.float32)
        dlen[:n_live_slots] = snap["doc_len"]

        put = (lambda a: jax.device_put(a, self.device)) if self.device \
            else jax.device_put
        self.postings_slot = put(slot)
        self.postings_ltf = put(ltf)
        self.doc_len = put(dlen)
        self.n_slots = s_pad
        self.n_postings = p_pad
        self.generation = snap["generation"]
        return True

    # -- query-side metadata ----------------------------------------------

    def term_range(self, term_id: int) -> tuple[int, int]:
        """CSR (start, length) of a 1-based term's postings."""
        start = int(self.term_starts[term_id - 1])
        end = int(self.term_starts[term_id])
        return start, end - start

    def term_live_df(self, term_id: int) -> int:
        return int(self.term_df[term_id - 1])

    @property
    def adl(self) -> float:
        """Average document length with the reference's integer
        division (ranking.c:160: unsigned long / unsigned long)."""
        if self.doc_count == 0:
            return 0.0
        return float(self.token_count // self.doc_count)
