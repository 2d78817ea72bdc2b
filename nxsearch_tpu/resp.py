"""Search response object (reference: src/core/results.c nxs_resp_t).

Holds the ranked ``(doc_id, score)`` results, already capped at the
query limit and sorted descending by score; ``count`` is the number of
returned entries (the reference caps count at the heap limit,
results.c:196-199).  JSON shape matches results.c:155-159,218:
``{"results": [{"doc_id": ..., "score": ...}, ...], "count": N}``.
"""

from __future__ import annotations

import json
from typing import Iterator


class Response:
    """Ranked search results (nxs_resp_t equivalent)."""

    def __init__(self, results: list[tuple[int, float]] | None = None):
        self.results: list[tuple[int, float]] = results or []

    @property
    def count(self) -> int:
        return len(self.results)

    def __iter__(self) -> Iterator[tuple[int, float]]:
        """Iterate (doc_id, score), nxs_resp_iter_result equivalent."""
        return iter(self.results)

    def __len__(self) -> int:
        return len(self.results)

    def tojson_obj(self) -> dict:
        return {
            "results": [
                {"doc_id": doc_id, "score": score}
                for doc_id, score in self.results
            ],
            "count": self.count,
        }

    def tojson(self) -> str:
        return json.dumps(self.tojson_obj())

    def repr_dict(self) -> dict[int, float]:
        """doc_id -> score map (the Lua binding's resp:repr() table)."""
        return {doc_id: score for doc_id, score in self.results}

    def __repr__(self) -> str:  # pragma: no cover
        return f"Response(count={self.count}, results={self.results!r})"
