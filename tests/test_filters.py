"""Filter framework tests (ports src/tests/t_filters.c)."""

import pytest

from nxsearch_tpu.errors import ErrorCode, NxsError
from nxsearch_tpu.params import Params
from nxsearch_tpu.text.filters import (FilterOps, FilterPipeline,
                                       FilterRegistry)
from nxsearch_tpu.text.plugins import load_filter
from nxsearch_tpu.text.stopwords_data import install_default_stopwords
from nxsearch_tpu.text.tokenizer import tokenize


def _test_filter(_ctx, value):
    # The token value decides the action (t_filters.c:39-52).
    if value == "M":
        return value
    if value == "D":
        return None
    raise NxsError(ErrorCode.FATAL, "filter error")


def make_registry(tmp_path) -> FilterRegistry:
    return FilterRegistry(str(tmp_path))


def test_filter_actions(tmp_path):
    registry = make_registry(tmp_path)
    registry.register("test-filter", FilterOps(filter=_test_filter))

    # Duplicate registration => EXISTS (t_filters.c:77-79).
    with pytest.raises(NxsError) as ei:
        registry.register("test-filter", FilterOps(filter=_test_filter))
    assert ei.value.code == ErrorCode.EXISTS

    params = Params().set_strlist("filters", ["test-filter"])
    pipeline = FilterPipeline(registry, params)
    assert pipeline.run("M") == "M"       # MUTATION
    assert pipeline.run("D") is None      # DISCARD
    with pytest.raises(NxsError):
        pipeline.run("E")                 # ERROR


def test_empty_result_discards(tmp_path):
    registry = make_registry(tmp_path)
    registry.register("empty", FilterOps(filter=lambda ctx, v: ""))
    pipeline = FilterPipeline(registry, Params().set_strlist(
        "filters", ["empty"]))
    assert pipeline.run("anything") is None  # filters.c:208


def test_plugin_filter(tmp_path):
    # Python plugin equivalent of the inline Lua filter test
    # (t_filters.c:141-146): lowercases the token.
    registry = make_registry(tmp_path)
    load_filter(registry, "py-test-filter",
                "def filter(ctx, value):\n    return value.lower()\n")
    pipeline = FilterPipeline(registry, Params()
                              .set_str("lang", "en")
                              .set_strlist("filters", ["py-test-filter"]))
    assert pipeline.run("TEST-STRING") == "test-string"


def test_plugin_filter_with_context(tmp_path):
    # The create() handler receives the params as a JSON string and its
    # return value is threaded to filter()/destroy() -- mirrors the Lua
    # example in docs/lua-filters-api.md.
    registry = make_registry(tmp_path)
    load_filter(registry, "ctx-filter", """
import json
destroyed = []

def create(json_params):
    params = json.loads(json_params)
    return {"lang": params["lang"]}

def filter(ctx, value):
    assert ctx["lang"] == "en"
    return value.lower()

def destroy(ctx):
    destroyed.append(ctx)
""")
    pipeline = FilterPipeline(registry, Params()
                              .set_str("lang", "en")
                              .set_strlist("filters", ["ctx-filter"]))
    assert pipeline.run("ABC") == "abc"
    pipeline.close()


def test_plugin_requires_filter(tmp_path):
    registry = make_registry(tmp_path)
    with pytest.raises(NxsError) as ei:
        load_filter(registry, "bad", "x = 1\n")
    assert ei.value.code == ErrorCode.INVALID


def test_stopwords(tmp_path):
    install_default_stopwords(str(tmp_path))
    registry = make_registry(tmp_path)
    params = (Params().set_str("lang", "en")
              .set_strlist("filters", ["normalizer", "stopwords", "stemmer"]))
    pipeline = FilterPipeline(registry, params)
    tset = tokenize(pipeline, "The quick brown fox jumped over the lazy dog")
    assert [t.value for t in tset.tokens] == [
        "quick", "brown", "fox", "jump", "lazi", "dog"]
    assert tset.seen == 6

    tset = tokenize(pipeline, "Once upon a time there were three little foxes")
    assert [t.value for t in tset.tokens] == [
        "upon", "time", "three", "littl", "fox"]
    assert tset.seen == 5


def test_stopwords_absent_is_passthrough(tmp_path):
    # No stopwords file in the basedir => filter is a no-op
    # (filters_builtin.c:104-109,178-180).
    registry = make_registry(tmp_path)
    params = (Params().set_str("lang", "en")
              .set_strlist("filters", ["normalizer", "stopwords", "stemmer"]))
    pipeline = FilterPipeline(registry, params)
    tset = tokenize(pipeline, "The quick brown fox jumped over the lazy dog")
    assert [t.value for t in tset.tokens] == [
        "the", "quick", "brown", "fox", "jump", "over", "lazi", "dog"]
    assert tset.seen == 9


def test_default_pipeline_normalizes_unicode(tmp_path):
    registry = make_registry(tmp_path)
    params = (Params().set_str("lang", "en")
              .set_strlist("filters", ["normalizer"]))
    pipeline = FilterPipeline(registry, params)
    assert pipeline.run("Łódź") == "lodz"
    assert pipeline.run("Café") == "cafe"
    assert pipeline.run("ŠKOLA") == "skola"
    assert pipeline.run("straße") == "strasse"


def test_unknown_filter_is_missing(tmp_path):
    registry = make_registry(tmp_path)
    with pytest.raises(NxsError) as ei:
        FilterPipeline(registry, Params().set_strlist("filters", ["nope"]))
    assert ei.value.code == ErrorCode.MISSING
