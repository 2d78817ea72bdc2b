"""Tokenizer parity tests.

Ports the reference's t_tokenize.c cases: the expected token streams
(including the ICU UBRK_WORD behaviors the engine depends on) and the
TokenSet dedupe/count semantics.
"""

import pytest

from nxsearch_tpu.params import Params
from nxsearch_tpu.text import TokenSet, tokenize, words
from nxsearch_tpu.text.filters import FilterPipeline, FilterRegistry

# (text, expected tokens after the "normalizer" filter) --
# reference: src/tests/t_tokenize.c:22-64.
CASES = [
    ("a", ["a"]),
    ("The quick brown fox jumped over the lazy dog.",
     ["the", "quick", "brown", "fox", "jumped", "over", "lazy", "dog"]),
    ("We will play with I.B.M.",
     ["we", "will", "play", "with", "i.b.m"]),
    ("Hello_I_m_arbitrary_concatenated, foo and bar",
     ["hello_i_m_arbitrary_concatenated", "foo", "and", "bar"]),
    ("the [client] is <foo>, some *bold* marks.",
     ["the", "client", "is", "foo", "some", "bold", "marks"]),
    ("Text,which doesn't  have spaces right;one;two;three..",
     ["text", "which", "doesn't", "have", "spaces", "right", "one",
      "two", "three"]),
    ("", []),
]


@pytest.fixture(scope="module")
def normalizer_pipeline(tmp_path_factory):
    basedir = str(tmp_path_factory.mktemp("nxs"))
    registry = FilterRegistry(basedir)
    params = Params().set_str("lang", "en").set_strlist(
        "filters", ["normalizer"])
    return FilterPipeline(registry, params)


@pytest.mark.parametrize("text,expected", CASES,
                         ids=[repr(c[0][:24]) for c in CASES])
def test_tokenize_cases(normalizer_pipeline, text, expected):
    tset = tokenize(normalizer_pipeline, text)
    assert [t.value for t in tset.tokens] == expected


def test_tokenset_dedupe():
    # reference: t_tokenize.c run_tokenset_test (lines 82-120).
    tset = TokenSet()
    for value in ["some-term-1", "another-term-2", "another-term-2"]:
        tset.add(value)
    assert len(tset.tokens) == 2
    assert tset.tokens[0].value == "some-term-1"
    assert tset.tokens[0].count == 1
    assert tset.tokens[1].value == "another-term-2"
    assert tset.tokens[1].count == 2
    assert tset.seen == 3


def test_wordbreak_raw():
    # Segmentation before any filtering: dots/quotes/joins.
    assert words("I.B.M. is big") == ["I.B.M", "is", "big"]
    assert words("doesn't") == ["doesn't"]
    assert words("snake_case stays") == ["snake_case", "stays"]
    assert words("year-end") == ["year", "end"]          # hyphen breaks
    assert words("123.45 42") == ["123.45", "42"]        # numeric joins
    assert words("one;two") == ["one", "two"]            # ; breaks letters
    assert words("1;2") == ["1;2"]                       # ; joins numbers (WB11)


def test_wordbreak_midnum_numeric():
    # WB11/12: MidNum joins numerics.
    assert words("1,000,000") == ["1,000,000"]


def test_wordbreak_unicode():
    assert words("Київ ąžuolas") == ["Київ", "ąžuolas"]
    assert words("🥎 ball") == ["ball"]  # emoji is not a word


def test_doc_len_counts_duplicates(normalizer_pipeline):
    tset = tokenize(normalizer_pipeline, "cat cat dog")
    assert tset.seen == 3
    assert tset.count == 2
