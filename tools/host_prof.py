"""Profile the host-side query-prep + planning path (no device work).

Runs on CPU against a cached bench corpus; prints per-phase wall
times and a cProfile top list for _prepare_many + _build_plans over a
2048-query batch.  Dev tool, not part of the library.
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as benchmod


def main():
    docs, vocab, mean_len = int(os.environ.get("HP_DOCS", 1_000_000)), int(os.environ.get("HP_VOCAB", 200_000)), int(os.environ.get("HP_LEN", 40))
    n_q, batch = 4096, 2048

    benchmod.enable_compile_cache(docs, mean_len)
    rng = np.random.default_rng(42)
    ranks = np.arange(vocab, dtype=np.float64)
    probs = 1.0 / (ranks + 10.0)
    probs /= probs.sum()
    words = np.array([f"w{i:05d}" for i in range(vocab)])
    queries = benchmod.make_queries(n_q, words, probs, rng)

    from nxsearch_tpu import Nxs, Params
    from nxsearch_tpu import search as S

    basedir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache",
        f"d{docs}-v{vocab}-l{mean_len}-s42")
    t0 = time.perf_counter()
    nxs = Nxs(basedir)
    idx = nxs.index_open("bench")
    print(f"opened in {time.perf_counter() - t0:.1f}s", flush=True)

    sp = Params().set_uint("limit", 10)
    sp2 = S.get_search_params(idx.algo, sp)
    idx._read_synced()
    idx._rw.read_release()
    dev, pipeline = idx.dev, idx.pipeline
    fuzzy, prefetch = idx._fuzzy_lookup, idx._fuzzy_prefetch

    batches = [queries[i: i + batch] for i in range(0, n_q, batch)]

    # Warm pass (memo fill, fuzzy vocab build, lazy caches).
    for qs in batches:
        prepared = S._prepare_many(dev, pipeline, qs, sp2, fuzzy, prefetch)
        S._build_plans(dev, prepared, sp2)

    # Timed pass.
    for rep in range(2):
        for b, qs in enumerate(batches):
            t0 = time.perf_counter()
            prepared = S._prepare_many(dev, pipeline, qs, sp2, fuzzy,
                                       prefetch)
            t1 = time.perf_counter()
            plans = S._build_plans(dev, prepared, sp2)
            t2 = time.perf_counter()
            print(f"rep{rep} b{b}: prepare {1e3 * (t1 - t0):.1f} ms  "
                  f"plan {1e3 * (t2 - t1):.1f} ms  "
                  f"({1e6 * (t2 - t0) / len(qs):.0f} us/q)", flush=True)

    pr = cProfile.Profile()
    pr.enable()
    for qs in batches:
        prepared = S._prepare_many(dev, pipeline, qs, sp2, fuzzy, prefetch)
        S._build_plans(dev, prepared, sp2)
    pr.disable()
    out = io.StringIO()
    pstats.Stats(pr, stream=out).sort_stats("cumulative").print_stats(25)
    print(out.getvalue())
    nxs.close()


if __name__ == "__main__":
    main()
