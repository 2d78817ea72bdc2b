"""Port of the reference's Lua end-to-end test (src/tests/test.lua).

The reference runs this with the NLTK stopword list deployed by
tools/fetch_ext_data.sh (the Docker image fetches it before running
tests) -- its 4-decimal BM25 anchors (doc 1: 0.0610, doc 2: 0.0668,
test.lua:34-35) only reproduce with stopwords active, which pins
document lengths to 6 and 5 tokens and adl to 5.  We install the
vendored list and assert the identical scores, ordering, duplicate
error, and JSON/table representations.
"""

import json

import pytest

from nxsearch_tpu import Nxs
from nxsearch_tpu.errors import ErrorCode, NxsError
from nxsearch_tpu.text.stopwords_data import install_default_stopwords

SCORE_DOC_1 = "0.0610"
SCORE_DOC_2 = "0.0668"


def test_lua_e2e(tmp_path):
    install_default_stopwords(str(tmp_path))
    nxs = Nxs(str(tmp_path))
    try:
        index = nxs.index_create("__test-index-lua-1")
        index.add(1, "The quick brown fox jumped over the lazy dog")
        index.add(2, "Once upon a time there were three little foxes")
        index.add(3, "Test")

        with pytest.raises(NxsError) as ei:
            index.add(3, "Test")
        assert ei.value.code == ErrorCode.EXISTS
        assert ei.value.msg == "document 3 is already indexed"

        index.remove(3)

        resp = index.search("fox")
        results_json = json.loads(resp.tojson())
        assert results_json["count"] == 2

        doc = results_json["results"][0]
        assert doc["doc_id"] == 2
        assert f"{doc['score']:.4f}" == SCORE_DOC_2

        doc = results_json["results"][1]
        assert doc["doc_id"] == 1
        assert f"{doc['score']:.4f}" == SCORE_DOC_1

        table = resp.repr_dict()
        assert len(table) == 2
        assert f"{table[1]:.4f}" == SCORE_DOC_1
        assert f"{table[2]:.4f}" == SCORE_DOC_2

        nxs.index_destroy("__test-index-lua-1")
    finally:
        nxs.close()
