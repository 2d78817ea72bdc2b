"""Fuzzy term matching: Levenshtein tolerance 2 + popularity pick.

The reference resolves unmatched query tokens via a BK-tree over all
terms searched within Levenshtein tolerance 2 (src/index/idxterm.c:210-
249, src/algo/bktree.c:219, LEVDIST_TOLERANCE src/index/index.h:26) and
selects "the most popular term" among candidates by total occurrence
count (idxterm.c:236-242; only terms with a non-zero live total are
eligible).  Distances are measured over UTF-8 *bytes*, matching
src/algo/levdist.c operating on char.

The TPU-native design replaces metric-tree pointer chasing with data
parallelism: candidates are pruned by length (|len(t)-len(q)| <= 2 is
a Levenshtein lower bound) and then checked with a banded
Wagner-Fischer DP.  Ties on the total count pick the lowest (oldest)
term ID; the reference's pick among equals is a BK-tree traversal
artifact (idxterm.c:238 never updates its running max, so the
traversal's first candidate wins) that is not meaningful to reproduce.

``levdist`` mirrors src/algo/levdist.c:67 (single-row DP, O(min(n,m))
memory) with an added band cutoff for the tolerance-2 use case.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .index.hostindex import HostIndex

TOLERANCE = 2


def levdist(a: bytes, b: bytes, cutoff: Optional[int] = None) -> int:
    """Levenshtein distance over bytes (levdist.c semantics).

    With ``cutoff``, returns cutoff+1 early once the distance provably
    exceeds it (band minimum test).
    """
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    if cutoff is not None and abs(n - m) > cutoff:
        return cutoff + 1
    # Single-row DP (Wagner-Fischer), row indexed by b.
    row = list(range(m + 1))
    for i in range(1, n + 1):
        prev_diag = row[0]
        row[0] = i
        best = row[0]
        ai = a[i - 1]
        for j in range(1, m + 1):
            cost = 0 if ai == b[j - 1] else 1
            cur = min(row[j] + 1,          # deletion
                      row[j - 1] + 1,      # insertion
                      prev_diag + cost)    # substitution
            prev_diag = row[j]
            row[j] = cur
            if cur < best:
                best = cur
        if cutoff is not None and best > cutoff:
            return cutoff + 1
    return row[m]


class FuzzyMatcher:
    """Per-index fuzzy resolver over the term dictionary."""

    def __init__(self, host: HostIndex, tolerance: int = TOLERANCE):
        self.host = host
        self.tolerance = tolerance
        self._gen = -1
        self._encoded: list[bytes] = []
        self._lengths = np.zeros(0, dtype=np.int32)

    def _refresh(self) -> None:
        if self._gen == self.host.generation:
            return
        values = self.host.term_values
        start = len(self._encoded)
        if start > len(values):  # pragma: no cover - dictionary never shrinks
            start, self._encoded = 0, []
        self._encoded.extend(v.encode("utf-8") for v in values[start:])
        self._lengths = np.fromiter(
            (len(e) for e in self._encoded), dtype=np.int32,
            count=len(self._encoded))
        self._gen = self.host.generation

    def lookup(self, value: str) -> Optional[int]:
        """Best term within tolerance, or None (idxterm_fuzzysearch)."""
        self._refresh()
        if not self._encoded:
            return None
        q = value.encode("utf-8")
        tol = self.tolerance
        near = np.nonzero(np.abs(self._lengths - len(q)) <= tol)[0]

        best_id = None
        best_total = 0
        totals = self.host.term_total.view()
        for idx in near:
            total = int(totals[idx])
            if total <= 0:
                continue  # no live occurrences: never selected
            if best_id is not None and (
                    total < best_total or
                    (total == best_total and idx + 1 > best_id)):
                continue  # cannot beat the current pick; skip the DP
            if levdist(q, self._encoded[idx], cutoff=tol) <= tol:
                best_id = int(idx) + 1
                best_total = total
        return best_id
