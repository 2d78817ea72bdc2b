"""Native text pipeline parity: C++ fast path == Python pipeline.

The native library (native/nxstext.cpp) must produce bit-identical
token sets to the Python implementation for every ASCII input, and must
reject non-ASCII inputs so they take the Python path.  Fuzzed over
random ASCII soup plus targeted UAX#29 shapes (i.b.m, doesn't,
snake_case -- the reference's tokenizer fidelity cases,
src/tests/t_tokenize.c).
"""

import random
import string

import pytest

from nxsearch_tpu.params import Params
from nxsearch_tpu.text.filters import FilterPipeline, FilterRegistry
from nxsearch_tpu.text.tokenizer import TokenSet, tokenize
from nxsearch_tpu.text.wordbreak import words


@pytest.fixture(scope="module")
def registry(tmp_path_factory):
    basedir = tmp_path_factory.mktemp("nat")
    # Provide a stopword file so the stopwords stage is active.
    sw = basedir / "filters" / "stopwords"
    sw.mkdir(parents=True)
    (sw / "en").write_text("the\na\nan\nof\nand\n")
    reg = FilterRegistry(str(basedir))
    yield reg
    reg.close()


def make_pipeline(registry, names=("normalizer", "stopwords", "stemmer")):
    return FilterPipeline(
        registry, Params({"filters": list(names), "lang": "en"}))


def python_tokenize(pipeline, text):
    """Force the Python path regardless of native availability."""
    tset = TokenSet()
    for word in words(text):
        value = pipeline.run(word)
        if value is None:
            continue
        tset.add(value)
    return tset


def assert_same(tset_a, tset_b, ctx=""):
    assert [t.value for t in tset_a.tokens] == \
        [t.value for t in tset_b.tokens], ctx
    assert [t.count for t in tset_a.tokens] == \
        [t.count for t in tset_b.tokens], ctx
    assert tset_a.seen == tset_b.seen, ctx


CASES = [
    "The quick brown fox jumped over the lazy dog",
    "doesn't it's i.b.m snake_case kebab-case x100 3.14 1,000,000",
    "can't won't o'clock 'quoted' trailing' 'leading",
    "a.b.c.d e:f g;h i,j k_l_m",
    "UPPER lower MiXeD CaSe",
    "  multiple   spaces\tand\ttabs\nnewlines\r\nCRLF  ",
    "123 456.789 1:2 9,9 _underscore_ __dunder__",
    "running runs ran runner happily happiness nationalization",
    "'s 's' ''' .... ;;;; :::: ,,,,",
    "",
    "singleword",
    ".",
    "a",
]


@pytest.mark.parametrize("text", CASES, ids=range(len(CASES)))
def test_native_matches_python(registry, text):
    pipeline = make_pipeline(registry)
    if pipeline.native is None:
        pytest.skip("native library unavailable")
    try:
        native = pipeline.native.process(text)
        assert native is not None
        got = tokenize(pipeline, text)
        want = python_tokenize(pipeline, text)
        assert_same(got, want, repr(text))
    finally:
        pipeline.close()


def test_native_fuzz_parity(registry):
    pipeline = make_pipeline(registry)
    if pipeline.native is None:
        pytest.skip("native library unavailable")
    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + " .,:;'\"_-()\t\n\r"
    try:
        for trial in range(300):
            n = rng.randint(0, 80)
            text = "".join(rng.choice(alphabet) for _ in range(n))
            got = tokenize(pipeline, text)
            want = python_tokenize(pipeline, text)
            assert_same(got, want, f"trial {trial}: {text!r}")
    finally:
        pipeline.close()


def test_native_rejects_non_ascii(registry):
    pipeline = make_pipeline(registry)
    if pipeline.native is None:
        pytest.skip("native library unavailable")
    try:
        assert pipeline.native.process("naïve café") is None
        # tokenize() still works via the Python path.
        tset = tokenize(pipeline, "naïve café")
        want = python_tokenize(pipeline, "naïve café")
        assert_same(tset, want)
    finally:
        pipeline.close()


def test_native_partial_chains(registry):
    for names in (("normalizer",), ("stemmer",),
                  ("normalizer", "stemmer"), ("stopwords", "stemmer")):
        pipeline = make_pipeline(registry, names)
        if pipeline.native is None:
            continue
        try:
            text = "The Runners are RUNNING the race of DOGS"
            assert_same(tokenize(pipeline, text),
                        python_tokenize(pipeline, text), str(names))
        finally:
            pipeline.close()


def test_non_builtin_chain_has_no_native(registry):
    from nxsearch_tpu.text.filters import FilterOps
    registry.register("reverse", FilterOps(filter=lambda c, v: v[::-1]))
    pipeline = FilterPipeline(
        registry, Params({"filters": ["normalizer", "reverse"]}))
    try:
        assert pipeline.native is None
    finally:
        pipeline.close()


def test_filter_token_parity(registry):
    """Single-token native filtering (the query-prep path) matches the
    Python chain for ASCII and defers for non-ASCII."""
    pipeline = make_pipeline(registry)
    if pipeline.native is None:
        pytest.skip("native library unavailable")
    try:
        python_run = lambda v: _python_chain(pipeline, v)
        for value in ("Running", "the", "DOGS", "i.b.m", "doesn't",
                      "nationalization", "x", "", "'quoted'"):
            assert pipeline.run(value) == python_run(value), value
        naive = pipeline.native.filter_token("naïve")
        assert naive is NotImplemented
    finally:
        pipeline.close()


def _python_chain(pipeline, value):
    for ops, ctx in pipeline._entries:
        value = ops.filter(ctx, value)
        if not value:
            return None
    return value


def test_native_large_doc_growth(registry):
    """Buffer growth path: > initial unique-token capacity."""
    pipeline = make_pipeline(registry)
    if pipeline.native is None:
        pytest.skip("native library unavailable")
    try:
        text = " ".join(f"tok{i}x" for i in range(70000))
        got = tokenize(pipeline, text)
        assert got.seen == 70000
        assert got.count == 70000
    finally:
        pipeline.close()


def test_filter_tokens_batch_matches_run(tmp_path):
    """filter_tokens (one native call) must agree token-for-token with
    pipeline.run, including discards and non-ASCII fallbacks."""
    import numpy as np

    from nxsearch_tpu import Nxs

    basedir = tmp_path / "b"
    basedir.mkdir()
    swdir = basedir / "filters" / "stopwords"
    swdir.mkdir(parents=True)
    (swdir / "en").write_text("the\nand\nof\n")
    nxs = Nxs(str(basedir))
    idx = nxs.index_create("t")
    pipeline = idx.pipeline
    if pipeline.native is None:
        nxs.close()
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(11)
    words = ["Running", "the", "QUICKLY", "jumps", "café", "and",
             "connection", "überaus", "x", "ponies", "of", "THE",
             "dogs", "caresses", ""]
    batch = [words[i] for i in rng.integers(0, len(words), 300)]
    got = pipeline.native.filter_tokens(batch)
    assert got is not None
    for value, out in zip(batch, got):
        if out is NotImplemented:
            assert not value.isascii()
            continue
        assert out == pipeline.run(value), value
    # prime() fills the memo so run() afterwards is pure dict hits.
    pipeline.prime(batch)
    for value in batch:
        if value.isascii():
            assert value in pipeline._memo
    nxs.close()
