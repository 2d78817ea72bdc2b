"""One-shot r4 profiling probe on the cached 8.8M corpus.

Opens the cached bench index, warms the serving signatures, then:
  1. pipelined batched run with per-group device timing
     (NXS_PROFILE_GROUPS) and batch phase traces at DEBUG level,
  2. a profiled fuzzy 512-miss batch (per-phase prefetch timing).

Prints a compact budget: per-batch host prep / device per group /
dispatch+fetch overhead, plus the prefix exact/fallback split.
Dev tool; run alone on the chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("NXS_LOG_LEVEL", "DEBUG")
os.environ.setdefault("NXS_PROFILE_GROUPS", "1")

import numpy as np

import bench as B


def main():
    docs, vocab, mean_len = 8_800_000, 1_000_000, 60
    B.enable_compile_cache(docs, mean_len)
    rng = np.random.default_rng(42)
    ranks = np.arange(vocab, dtype=np.float64)
    probs = 1.0 / (ranks + 10.0)
    probs /= probs.sum()
    words = np.array([f"w{i:05d}" for i in range(vocab)])
    queries = B.make_queries(4096, words, probs, rng)

    from nxsearch_tpu import Nxs, Params
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    basedir = os.path.join(root, ".bench_cache",
                           f"d{docs}-v{vocab}-l{mean_len}-s42")
    nxs = Nxs(basedir)
    idx = nxs.index_open("bench")
    sp = Params().set_uint("limit", 10)
    batches = [queries[i: i + 2048] for i in range(0, 4096, 2048)]

    t0 = time.perf_counter()
    for b in batches:
        idx.search_many(b, sp)
    print(f"# warmup {time.perf_counter() - t0:.1f}s", flush=True)

    from nxsearch_tpu.search import EXEC_STATS
    EXEC_STATS.clear()
    t0 = time.perf_counter()
    idx.search_pipelined(batches, sp)
    el = time.perf_counter() - t0
    print(f"# pipelined: {len(queries)} q in {el:.2f}s -> "
          f"{len(queries) / el:.0f} QPS", flush=True)
    print(f"# exec: {dict(sorted(EXEC_STATS.items()))}", flush=True)

    if os.environ.get("PROBE_FUZZY", "1") == "1":
        EXEC_STATS.clear()
        for salt in ("p", "q"):
            fq = B.make_fuzzy_queries(512, words, probs, rng, salt)
            t0 = time.perf_counter()
            idx.search_many(fq, sp)
            el = time.perf_counter() - t0
            print(f"# fuzzy[{salt}]: 512 q in {el:.2f}s -> "
                  f"{512 / el:.0f} QPS", flush=True)
        print(f"# exec: {dict(sorted(EXEC_STATS.items()))}", flush=True)
    nxs.close()


if __name__ == "__main__":
    main()
