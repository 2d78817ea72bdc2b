"""Randomized differential testing: the routed engine vs an
independent numpy oracle.

Random corpora and random boolean query trees run through the full
public API (whatever executor the router picks -- sliced, hybrid,
blockdense, candidate, windowed, head, pair) and must match a
from-scratch numpy implementation of the reference semantics
(search.c:118-271, ranking.c:41-172): recursive bitmap algebra over
per-term document sets, BM25/TF-IDF summed per document, removed
documents invisible.  Knob variations (dense rows, masked hybrid,
window width) reroute the same queries through different executors.
"""

import numpy as np
import pytest

from nxsearch_tpu import Nxs, Params
from nxsearch_tpu.index.device import DeviceIndex

BM25_K1, BM25_B = 1.2, 0.75


def _oracle_scores(doc_tokens, alive_ids, query, algo):
    """Independent scorer: doc_tokens = {doc_id: [token, ...]} (post-
    filter), alive_ids = set of live doc ids.  Returns {doc_id: score}
    for the boolean query tree (parsed with a tiny recursive parser
    over the same grammar subset the generator emits)."""
    # --- corpus statistics over LIVE documents ------------------------
    live = {d: toks for d, toks in doc_tokens.items() if d in alive_ids}
    n_docs = len(live)
    if n_docs == 0:
        return {}
    doc_len = {d: len(t) for d, t in live.items()}
    token_count = sum(doc_len.values())
    adl = token_count // n_docs
    if algo == "BM25" and adl < 1:
        return {}
    df: dict = {}
    tf: dict = {}
    for d, toks in live.items():
        seen = {}
        for t in toks:
            seen[t] = seen.get(t, 0) + 1
        for t, c in seen.items():
            df[t] = df.get(t, 0) + 1
            tf[(d, t)] = c

    # --- tiny parser for the generated queries ------------------------
    # grammar subset: term | (expr) | expr AND expr | expr OR expr |
    # expr AND NOT expr ; adjacency = OR.
    tokens = query.replace("(", " ( ").replace(")", " ) ").split()
    pos = [0]

    # Precedence mirrors the reference grammar (grammar.y:67-84,
    # tests/test_queryparser.py): AND / AND NOT bind tightest, then
    # explicit OR, then adjacency (implicit OR) loosest.
    def parse_adj():
        node = parse_or()
        while pos[0] < len(tokens) and tokens[pos[0]] != ")":
            node = ("OR", node, parse_or())
        return node

    def parse_or():
        node = parse_and()
        while pos[0] < len(tokens) and tokens[pos[0]] == "OR":
            pos[0] += 1
            node = ("OR", node, parse_and())
        return node

    def parse_and():
        node = parse_prim()
        while pos[0] < len(tokens) and tokens[pos[0]] == "AND":
            pos[0] += 1
            if tokens[pos[0]] == "NOT":
                pos[0] += 1
                node = ("ANDNOT", node, parse_prim())
            else:
                node = ("AND", node, parse_prim())
        return node

    def parse_prim():
        t = tokens[pos[0]]
        if t == "(":
            pos[0] += 1
            node = parse_adj()
            assert tokens[pos[0]] == ")"
            pos[0] += 1
            return node
        pos[0] += 1
        return ("LEAF", t)

    root = parse_adj()

    # --- bitmap algebra + scoring (reference semantics) ----------------
    def docs_of(node):
        kind = node[0]
        if kind == "LEAF":
            return {d for d in live if (d, node[1]) in tf}
        a, b = docs_of(node[1]), docs_of(node[2])
        if kind == "AND":
            return a & b
        if kind == "OR":
            return a | b
        return a - b

    def leaves(node):
        if node[0] == "LEAF":
            return [node[1]]
        return leaves(node[1]) + leaves(node[2])

    result_docs = docs_of(root)
    terms = list(dict.fromkeys(leaves(root)))
    scores = {}
    for d in result_docs:
        s = 0.0
        for t in terms:
            c = tf.get((d, t))
            if c is None or t not in df:
                continue
            ltf = np.float32(np.log(np.float64(c + 1)))
            if algo == "BM25":
                idf = np.float32(np.log(
                    (n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0))
                denom = np.float32(ltf + BM25_K1 * (
                    1.0 - BM25_B + BM25_B * doc_len[d] / adl))
                s += float(np.float32(ltf / denom) * idf)
            else:
                idf = np.float32(np.log(n_docs / df[t]) + 1.0)
                s += float(np.float32(ltf * idf))
        scores[d] = s
    return scores


def _random_query(rng, words):
    """Random boolean tree over the vocab (depth <= 3)."""
    def term():
        return str(words[rng.integers(0, len(words))])

    def expr(depth):
        r = rng.random()
        if depth >= 3 or r < 0.35:
            return term()
        a, b = expr(depth + 1), expr(depth + 1)
        op = rng.choice([" ", " AND ", " OR ", " AND NOT "])
        q = f"{a}{op}{b}"
        return f"({q})" if rng.random() < 0.4 else q
    return expr(0)


@pytest.mark.parametrize("trial", range(6))
def test_random_queries_match_oracle(tmp_path, trial):
    rng = np.random.default_rng(100 + trial)
    vocab = int(rng.integers(10, 60))
    n_docs = int(rng.integers(30, 220))
    words = np.array([f"w{i:03d}x" for i in range(vocab)])
    probs = 1.0 / (np.arange(vocab) + 1.5)
    probs /= probs.sum()

    doc_tokens = {}
    docs = []
    for i in range(n_docs):
        n = max(1, int(rng.poisson(8)))
        toks = [str(w) for w in rng.choice(words, size=n, p=probs)]
        doc_tokens[i + 1] = toks
        docs.append((i + 1, " ".join(toks)))

    import nxsearch_tpu.search as S
    knobs = trial % 3
    saved = (S._MASKED_HYBRID, S._WINDOW_T, DeviceIndex.DENSE_DF_DIV)
    if knobs == 1:
        S._MASKED_HYBRID = True
        DeviceIndex.DENSE_DF_DIV = 1024      # everything dense-capable
    elif knobs == 2:
        S._WINDOW_T = 8                      # multi-window planes
    try:
        nxs = Nxs(str(tmp_path))
        # stemming/stopwords off: the oracle sees raw lowercase tokens.
        idx = nxs.index_create("p", Params({"filters": ["normalizer"]}))
        idx.add_many(docs)

        alive = set(doc_tokens)
        removed = rng.choice(n_docs, size=n_docs // 5, replace=False)
        for r in removed:
            idx.remove(int(r) + 1)
            alive.discard(int(r) + 1)

        for algo in ("BM25", "TF-IDF"):
            sp = Params().set_uint("limit", 100000).set_str("algo", algo)
            for _ in range(12):
                q = _random_query(rng, words)
                got = dict(idx.search(q, sp))
                want = _oracle_scores(doc_tokens, alive, q, algo)
                want = {d: s for d, s in want.items() if s > 0.0}
                assert set(got) == set(want), (trial, algo, q)
                for d, s in want.items():
                    assert got[d] == pytest.approx(s, abs=2e-4), \
                        (trial, algo, q, d)
        nxs.close()
    finally:
        (S._MASKED_HYBRID, S._WINDOW_T,
         DeviceIndex.DENSE_DF_DIV) = saved
