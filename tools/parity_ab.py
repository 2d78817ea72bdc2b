"""Head-to-head vs the reference C engine (VERDICT r2 item 4).

Feeds BOTH engines the same synthetic Zipf corpus and query trace:

  - reference: the real C binary built by tools/refbuild/build_ref.sh
    (nxsearch_test, reference benchmark driver utils/benchmark.c),
    indexing a directory of one-file-per-doc and searching one query
    per invocation;
  - this repo: nxsearch_tpu with filters=["normalizer"], matching the
    reference build's effective pipeline (its libstemmer is an
    identity stub and it ships no stopword files).

Reports: index-build wall-clock ratio (BASELINE.md target: >= 5x),
and per-query top-10 doc-id/score agreement over the mixed trace
(recall@10 parity).  Writes PARITY_AB.md.

Usage: python tools/parity_ab.py [--docs N] [--queries N]
       [--ref-bin PATH] [--out PARITY_AB.md]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_corpus_dir(path: str, docs: int, vocab: int, mean_len: int):
    """One file per doc, named d{id:07d} so the reference's readdir
    id assignment can be mapped back to ours."""
    import bench
    os.makedirs(path, exist_ok=True)
    for base in range(0, docs, bench._ZIPF_BLOCK):
        for doc_id, text in bench.zipf_range(
                base, min(base + bench._ZIPF_BLOCK, docs), vocab, mean_len):
            with open(os.path.join(path, f"d{doc_id:07d}"), "w") as f:
                f.write(text)


def run_ref(ref_bin: str, basedir: str, *args: str) -> str:
    env = dict(os.environ, NXS_BASEDIR=basedir)
    out = subprocess.run([ref_bin, *args], env=env, check=True,
                         capture_output=True, text=True)
    return out.stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20_000)
    ap.add_argument("--vocab", type=int, default=20_000)
    ap.add_argument("--mean-len", type=int, default=40)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--ref-bin", default="/tmp/refbuild/src/nxsearch_test")
    ap.add_argument("--out", default=None,
                    help="write PARITY_AB.md to this path")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    if not os.path.exists(args.ref_bin):
        sys.exit(f"reference binary not found: {args.ref_bin} "
                 f"(run tools/refbuild/build_ref.sh first)")

    from nxsearch_tpu.utils.malloc import tune_host_allocator
    tune_host_allocator()

    work = tempfile.mkdtemp(prefix="parity_ab_")
    corpus = os.path.join(work, "corpus")
    ref_base = os.path.join(work, "ref_base")
    tpu_base = os.path.join(work, "tpu_base")
    os.makedirs(ref_base)
    os.makedirs(tpu_base)

    print(f"[corpus] {args.docs} docs, vocab {args.vocab}", flush=True)
    build_corpus_dir(corpus, args.docs, args.vocab, args.mean_len)

    # --- reference: create + index the directory -----------------
    run_ref(args.ref_bin, ref_base, "-i", "bench", "-a")
    t0 = time.perf_counter()
    out = run_ref(args.ref_bin, ref_base, "-i", "bench", "-p", corpus)
    ref_index_s = time.perf_counter() - t0
    # Map the reference's readdir-order ids back to file names.
    ref2doc = {}
    for m in re.finditer(r"Indexing (\d+) -- d(\d+)", out):
        ref2doc[int(m.group(1))] = int(m.group(2))
    m = re.search(r"indexing: (\d+) ms", out)
    ref_index_ms = int(m.group(1)) if m else ref_index_s * 1e3
    print(f"[ref] indexed in {ref_index_ms} ms "
          f"(wall {ref_index_s:.1f}s incl. file reads)", flush=True)

    # --- this repo: same docs, normalizer-only pipeline ----------
    from nxsearch_tpu import Nxs, Params
    import bench as benchmod

    nxs = Nxs(tpu_base)
    idx = nxs.index_create(
        "bench", Params().set_strlist("filters", ["normalizer"]))
    t0 = time.perf_counter()
    for base in range(0, args.docs, benchmod._ZIPF_BLOCK):
        idx.add_many(benchmod.zipf_range(
            base, min(base + benchmod._ZIPF_BLOCK, args.docs),
            args.vocab, args.mean_len))
    tpu_index_s = time.perf_counter() - t0
    print(f"[tpu] indexed in {tpu_index_s * 1e3:.0f} ms", flush=True)

    # --- query trace ---------------------------------------------
    rng = np.random.default_rng(7)
    ranks = np.arange(args.vocab, dtype=np.float64)
    probs = 1.0 / (ranks + 10.0)
    probs /= probs.sum()
    words = np.array([f"w{i:05d}" for i in range(args.vocab)])
    queries = benchmod.make_mixed_queries(args.queries, words, probs, rng)
    # The reference resolves typo terms through its BK-tree with the
    # same tolerance-2 byte semantics; keep them in the trace.

    sp = Params().set_uint("limit", 10)
    n_agree = n_score = n_total = n_fuzzy_div = 0
    ref_search_ms = 0.0
    mismatches = []

    def has_fuzzy_term(q: str) -> bool:
        """True when any query term misses the dictionary and goes
        through fuzzy resolution.  Ranked parity is undefined there:
        the reference's 'most popular candidate' loop never updates
        its running max (idxterm.c:238-244, term_total stays 0), so
        its pick is BK-tree traversal-order-dependent; this repo
        implements the documented intent (true max total)."""
        toks = re.findall(r"[a-z0-9]+", q.lower())
        return any(t not in ("and", "or", "not")
                   and idx.host.term_lookup(t) is None for t in toks)
    # Repo side: batched resolution (the serving shape) -- one
    # search_many compiles a handful of signatures instead of one
    # XLA compile per query width through the remote compile service.
    mine_all = idx.search_many(queries, sp)
    for q, mine in zip(queries, mine_all):
        out = run_ref(args.ref_bin, ref_base, "-i", "bench", "-s", q)
        m = re.search(r"search: (\d+) ms", out)
        ref_search_ms += int(m.group(1)) if m else 0
        json_line = next(l for l in out.splitlines() if l.startswith("{"))
        payload = json.loads(json_line)
        ref_rows = [(ref2doc[r["doc_id"]], r["score"])
                    for r in payload.get("results", [])][:10]
        my_rows = [(d, s) for d, s in mine][:10]
        n_total += 1
        ref_ids = {d for d, _ in ref_rows}
        my_ids = {d for d, _ in my_rows}
        scores_ok = False
        if ref_ids == my_ids:
            ref_s = {d: s for d, s in ref_rows}
            scores_ok = all(
                abs(s - ref_s[d]) <= 1e-3 * max(1.0, abs(s))
                for d, s in my_rows)
        elif ref_rows and my_rows:
            # k-th-place ties: engines order equal scores differently,
            # so the doc SETS differ while every disagreeing doc
            # scores within tolerance of the k-th score.  That is
            # rank-equivalent output, not a mismatch.
            kth = min(ref_rows[-1][1], my_rows[-1][1])
            tol = 1e-3 * max(1.0, abs(kth))
            only = ([s for d, s in ref_rows if d not in my_ids]
                    + [s for d, s in my_rows if d not in ref_ids])
            common = {d: s for d, s in ref_rows if d in my_ids}
            scores_ok = (all(abs(s - kth) <= tol for s in only)
                         and all(abs(s - common[d]) <= tol
                                 for d, s in my_rows if d in common))
        if scores_ok:
            n_agree += 1
            n_score += 1
        elif has_fuzzy_term(q):
            n_fuzzy_div += 1
        elif len(mismatches) < 5:
            mismatches.append((q, ref_rows, my_rows))

    print(f"[parity] top-10 set agreement {n_agree}/{n_total} "
          f"({n_fuzzy_div} fuzzy-pick divergences), "
          f"scores within 1e-3 on {n_score}", flush=True)
    for q, r, m_ in mismatches:
        print(f"  mismatch: {q!r}\n    ref {r[:4]}\n    tpu {m_[:4]}")

    ratio = ref_index_ms / max(tpu_index_s * 1e3, 1e-9)
    report = f"""# Reference head-to-head (A/B)

Date: {time.strftime('%Y-%m-%d')}.  Reference binary: the real C
engine built offline by `tools/refbuild/build_ref.sh` (hand-written
parser shim for re2c/lemon, identity libstemmer, ICU 69-header/72-lib
retarget -- see that script's header for why).  Both engines ran the
same pipeline (normalize only), corpus and trace.

| metric | reference (C) | nxsearch_tpu | ratio |
|---|---|---|---|
| index build, {args.docs} docs x ~{args.mean_len} tokens | \
{ref_index_ms:.0f} ms | {tpu_index_s * 1e3:.0f} ms | \
**{ratio:.1f}x** (target >= 5x) |
| search, {n_total} mixed queries (sequential, per-process) | \
{ref_search_ms:.0f} ms total | see bench.py serving numbers | - |

Parity over {n_total} mixed queries (ranked OR + boolean + fuzzy,
limit 10):

- top-10 agreement (doc sets equal, or differing only by ties at
  the 10th place, with every score within 1e-3 relative):
  **{n_agree}/{n_total}**
- fuzzy-pick divergences (expected, excluded from mismatches):
  {n_fuzzy_div}.  When a query term misses the dictionary, the
  reference's candidate-selection loop never updates its running
  maximum (`src/index/idxterm.c:238-244` -- `term_total` stays 0),
  so its pick is BK-tree traversal-order-dependent rather than the
  documented "most popular term"; this repo implements the
  documented intent (maximum total occurrence count), and the two
  can legitimately choose different replacement terms.
- remaining unexplained mismatches: {len(mismatches)}

Caveats: the reference times include its per-invocation mmap open;
its indexing time includes per-file reads (both noted raw above).
The reference's own printed phase timers are used where available.
"""
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PARITY_AB.md")
    with open(out_path, "w") as f:
        f.write(report)
    print(f"[report] {out_path}")

    nxs.close()
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
