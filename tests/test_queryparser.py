"""Query lexer + parser tests (ports src/tests/t_queryparser.c)."""

import pytest

from nxsearch_tpu.query.lexer import (TOKEN_AND, TOKEN_BR_CLOSE,
                                      TOKEN_BR_OPEN, TOKEN_FF_STRING,
                                      TOKEN_NOT, TOKEN_OR,
                                      TOKEN_QUOTED_STRING, tokenize_query)
from nxsearch_tpu.query.parser import QuerySyntaxError, parse_query

# (query, expected repr or None for syntax error, expected token kinds)
CASES = [
    ("A", "`A`", [TOKEN_FF_STRING]),
    ("(A OR B) AND C", "(AND (OR `A` `B`) `C`)",
     [TOKEN_BR_OPEN, TOKEN_FF_STRING, TOKEN_OR, TOKEN_FF_STRING,
      TOKEN_BR_CLOSE, TOKEN_AND, TOKEN_FF_STRING]),
    ("A OR (B AND C)", "(OR `A` (AND `B` `C`))",
     [TOKEN_FF_STRING, TOKEN_OR, TOKEN_BR_OPEN, TOKEN_FF_STRING,
      TOKEN_AND, TOKEN_FF_STRING, TOKEN_BR_CLOSE]),
    ("A OR B AND C", "(OR `A` (AND `B` `C`))",
     [TOKEN_FF_STRING, TOKEN_OR, TOKEN_FF_STRING, TOKEN_AND,
      TOKEN_FF_STRING]),
    ("A and not B", "(NOT `A` `B`)",
     [TOKEN_FF_STRING, TOKEN_AND, TOKEN_NOT, TOKEN_FF_STRING]),
    (" \"sp ace\" OR 'quo\\'te' OR ąžuolas OR "
     "🇬🇧🇺🇸 AND Київ OR (1 AND NOT (  2   OR   3 ))",
     "(OR (OR (OR (OR `sp ace` `quo\\'te`) `ąžuolas`) "
     "(AND `🇬🇧🇺🇸` `Київ`)) (NOT `1` (OR `2` `3`)))",
     [TOKEN_QUOTED_STRING, TOKEN_OR, TOKEN_QUOTED_STRING, TOKEN_OR,
      TOKEN_FF_STRING, TOKEN_OR, TOKEN_FF_STRING, TOKEN_AND,
      TOKEN_FF_STRING, TOKEN_OR, TOKEN_BR_OPEN, TOKEN_FF_STRING,
      TOKEN_AND, TOKEN_NOT, TOKEN_BR_OPEN, TOKEN_FF_STRING,
      TOKEN_OR, TOKEN_FF_STRING, TOKEN_BR_CLOSE, TOKEN_BR_CLOSE]),
    ("a AND", None, [TOKEN_FF_STRING, TOKEN_AND]),
    ("a b OR (c OR d) AND (e", None,
     [TOKEN_FF_STRING, TOKEN_FF_STRING, TOKEN_OR, TOKEN_BR_OPEN,
      TOKEN_FF_STRING, TOKEN_OR, TOKEN_FF_STRING, TOKEN_BR_CLOSE,
      TOKEN_AND, TOKEN_BR_OPEN, TOKEN_FF_STRING]),
    ("A\nand\nB", "(AND `A` `B`)",
     [TOKEN_FF_STRING, TOKEN_AND, TOKEN_FF_STRING]),
]


@pytest.mark.parametrize("query,_repr,kinds", CASES,
                         ids=[repr(c[0][:24]) for c in CASES])
def test_lexer(query, _repr, kinds):
    tokens = tokenize_query(query)
    assert [t.kind for t in tokens] == kinds


@pytest.mark.parametrize("query,expected,_kinds", CASES,
                         ids=[repr(c[0][:24]) for c in CASES])
def test_parser(query, expected, _kinds):
    if expected is None:
        with pytest.raises(QuerySyntaxError):
            parse_query(query)
    else:
        assert parse_query(query).repr_string() == expected


def test_quoted_values_keep_escapes():
    tokens = tokenize_query("'quo\\'te'")
    assert tokens[0].kind == TOKEN_QUOTED_STRING
    assert tokens[0].value == "quo\\'te"  # escapes retained verbatim


def test_operator_longest_match():
    # Longest-match: runs longer than the operator are strings.
    tokens = tokenize_query("ANDy && & | OR not")
    kinds = [t.kind for t in tokens]
    assert kinds == [TOKEN_FF_STRING, TOKEN_FF_STRING, TOKEN_AND,
                     TOKEN_OR, TOKEN_OR, TOKEN_NOT]


def test_adjacency_binds_loosest():
    # "a b AND c" => (OR a (AND b c)); "a b c" => left-assoc ORs.
    assert parse_query("a b AND c").repr_string() == "(OR `a` (AND `b` `c`))"
    assert parse_query("a b c").repr_string() == "(OR (OR `a` `b`) `c`)"
    # Implicit OR binds looser than explicit OR (lemon shift behavior).
    assert parse_query("a b OR c").repr_string() == "(OR `a` (OR `b` `c`))"


def test_empty_query_is_error():
    with pytest.raises(QuerySyntaxError):
        parse_query("")
    with pytest.raises(QuerySyntaxError):
        parse_query("   ")


def test_lone_not_is_error():
    with pytest.raises(QuerySyntaxError):
        parse_query("NOT a")
    with pytest.raises(QuerySyntaxError):
        parse_query("a NOT b")
    with pytest.raises(QuerySyntaxError):
        parse_query("()")


def test_fast_path_matches_full_parser():
    """The operator-free fast path must produce byte-identical ASTs
    to the precedence-climbing parser (left-folded implicit OR)."""
    import numpy as np
    from nxsearch_tpu.query import parser as P

    rng = np.random.default_rng(3)
    words = ["cat", "dog", "Fox", "i.b.m", "don", "andes", "nott",
             "café", "über", "x", "And1", "orb"]
    for _ in range(200):
        n = int(rng.integers(1, 6))
        q = " ".join(words[i] for i in rng.integers(0, len(words), n))
        fast = P._parse_fast(q)
        assert fast is not None, q
        tokens = P.tokenize_query(q)
        full = P._Parser(tokens, q).parse_binary(P._PREC_ADJ)
        assert fast.repr_string() == full.repr_string(), q

    # Gate correctness: these MUST fall back (operators, quotes,
    # parens, keywords in any case, unicode whitespace edge).
    for q in ["a AND b", "a and b", "(a b)", '"a b"', "a & b",
              "a | b", "not a", "a b", "", "   "]:
        assert P._parse_fast(q) is None or " " in q, q
    # U+00A0 is NOT lexer whitespace: the fast path must keep it
    # inside one token exactly like the lexer.
    q = "a b c"
    fast = P._parse_fast(q)
    tokens = P.tokenize_query(q)
    full = P._Parser(tokens, q).parse_binary(P._PREC_ADJ)
    assert fast.repr_string() == full.repr_string() == "(OR `a b` `c`)"


def test_parser_fuzz_no_crash():
    """Random byte soup must either parse or raise NxsError(INVALID)
    -- never crash, hang, or leak another exception type (the
    reference's lexer/grammar reject malformed input with
    NXS_ERR_INVALID, scan.re / grammar.y error actions)."""
    import random

    from nxsearch_tpu.errors import NxsError
    from nxsearch_tpu.query.parser import QuerySyntaxError, parse_query

    rng = random.Random(1234)
    alphabet = "ab ()\"'&|\\NOTANDR\t\né中\U0001f600" + \
        "".join(chr(rng.randrange(32, 0x300)) for _ in range(32))
    for trial in range(2000):
        n = rng.randrange(0, 24)
        s = "".join(rng.choice(alphabet) for _ in range(n))
        try:
            parse_query(s)
        except (NxsError, QuerySyntaxError):
            pass  # INVALID is the contract for malformed queries

    # Structured stress: deep nesting within and past the limit.
    deep_ok = "(" * 99 + "a" + ")" * 99
    parse_query(deep_ok)
    try:
        parse_query("(" * 200 + "a" + ")" * 200)
    except (NxsError, QuerySyntaxError):
        pass  # nesting limit (search.c:70) maps to INVALID
