"""Single-process TPU sweep: QPS + per-group device time per config.

Opens the cached bench index ONCE, then measures several router/plane
configurations in the same process -- compiled executables stay loaded,
so each extra config costs only its own (cached) compiles instead of
the ~6-13 min per-process executable reload through the tunnel.

Per config: warm pass, timed pipelined pass (the driver's serving
shape), and one profiled batch that blocks per dispatch group in launch
order to attribute device time per signature group.

Usage: python tools/tpu_sweep.py [--docs N ...] [--configs a,b,c]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# name -> dict of nxsearch_tpu.search module globals to patch
CONFIGS = {
    "default": {},
    "w512": {"_WINDOW_T": 512},
    "w1024": {"_WINDOW_T": 1024},
    "w2048": {"_WINDOW_T": 2048},
    "w4096": {"_WINDOW_T": 4096},
    "w1024-qs1": {"_WINDOW_T": 1024, "_QS_MIN": 1},
    "w1024-colcap2048": {"_WINDOW_T": 1024, "_WINDOW_MAX_COLS": 2048},
    # Head-term extraction disabled: wide terms stay in the sort plane
    # (the profiled head-merge searchsorted cost ~33 ms/query dwarfs a
    # 512-col full sort at ~2 ms).
    "nohead": {"_HEAD_MIN_DF": 1 << 30, "_HEAD_MIN_DF_PAIR": 1 << 30},
    # Impact-prefix knobs (r3): deeper rescore -> higher certification
    # (fewer classic re-runs) at the cost of wider rescore lanes; group
    # coalescing threshold 2048 merges ALL prefix groups of a batch
    # into one dispatch (r3 profile: ~50 ms fixed cost per group
    # through the tunnel vs near-invisible marginal lane cost).
    "M64": {"_PREFIX_M": 64},
    # Masked dense-row hybrid (VERDICT r2 parked-flag A/B): only
    # affects masked (AND / AND NOT) queries -- run with --mixed.
    "hybrid": {"_MASKED_HYBRID": True},
    # pf coalescing is unconditional since the r3 A/B (2417 -> 2618
    # QPS); "pffine" restores the old fine grouping for comparison.
    "pffine": {"_COALESCE_MIN_ROWS_PF": 64},
    "M16": {"_PREFIX_M": 16},
    # Tiered pf merge: narrow rows (qs <= bound) get their own
    # dispatch instead of padding to the batch-max window count.
    "pft4": {"_PF_TIERS": (4,)},
    "pft8": {"_PF_TIERS": (8,)},
    "pft48": {"_PF_TIERS": (4, 8)},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=8_800_000)
    ap.add_argument("--vocab", type=int, default=1_000_000)
    ap.add_argument("--mean-len", type=int, default=60)
    ap.add_argument("--queries", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--mixed", action="store_true")
    ap.add_argument("--configs", type=str, default="default")
    ap.add_argument("--profile", action="store_true",
                    help="per-group device timing on one batch")
    ap.add_argument("--debug-pipeline", action="store_true",
                    help="log per-phase ms (prepare/collect/submit/"
                         "fallback) during the pipelined pass")
    args = ap.parse_args()

    if args.debug_pipeline:
        import logging
        tl = logging.getLogger("nxsearch_tpu.trace")
        tl.setLevel(logging.DEBUG)
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("    %(message)s"))
        tl.addHandler(h)
        tl.propagate = False

    import bench as benchmod
    benchmod.enable_compile_cache(args.docs, args.mean_len)

    rng = np.random.default_rng(42)
    ranks = np.arange(args.vocab, dtype=np.float64)
    probs = 1.0 / (ranks + 10.0)
    probs /= probs.sum()
    words = np.array([f"w{i:05d}" for i in range(args.vocab)])
    make = benchmod.make_mixed_queries if args.mixed \
        else benchmod.make_queries
    queries = make(args.queries, words, probs, rng)
    batches = [queries[i: i + args.batch]
               for i in range(0, len(queries), args.batch)]

    from nxsearch_tpu import Nxs, Params
    from nxsearch_tpu import search as S

    basedir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
        f"d{args.docs}-v{args.vocab}-l{args.mean_len}-s42")
    nxs = Nxs(basedir)
    t0 = time.perf_counter()
    idx = nxs.index_open("bench")
    print(f"open {time.perf_counter() - t0:.1f}s", flush=True)
    sp = Params().set_uint("limit", 10)

    results = {}
    for name in args.configs.split(","):
        patch = CONFIGS[name]
        saved = {k: getattr(S, k) for k in patch}
        for k, v in patch.items():
            setattr(S, k, v)
        try:
            S.EXEC_STATS.clear()
            t0 = time.perf_counter()
            for b in batches:
                idx.search_many(b, sp)
            warm_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            idx.search_pipelined(batches, sp)
            elapsed = time.perf_counter() - t0
            qps = args.queries / elapsed
            print(f"[{name}] warm {warm_s:.1f}s | pipelined "
                  f"{elapsed:.2f}s -> {qps:.0f} QPS | "
                  f"stats {dict(S.EXEC_STATS)}", flush=True)
            results[name] = round(qps, 1)

            if args.profile:
                _profile_batch(idx, batches[0], sp, S)
        finally:
            for k, v in saved.items():
                setattr(S, k, v)

    print(json.dumps(results))
    nxs.close()


def _profile_batch(idx, batch, sp, S):
    """One batch, blocking per dispatch group in launch order."""
    import jax

    sp2 = S.get_search_params(idx.algo, sp)
    idx._read_synced()
    try:
        prepared = S._prepare_many(idx.dev, idx.pipeline, batch, sp2,
                                   idx._fuzzy_lookup, idx._fuzzy_prefetch)
        t0 = time.perf_counter()
        st = S.submit_query_batch(idx.dev, prepared, sp2)
        t_sub = time.perf_counter() - t0
        t_prev = time.perf_counter()
        total_ms = 0.0
        for (key, members), p in zip(st.chunked, st.pending):
            jax.block_until_ready(
                [x for x in (p[1], p[2]) if hasattr(x, "device")])
            now = time.perf_counter()
            ms = (now - t_prev) * 1e3
            total_ms += ms
            t_prev = now
            print(f"    group {key} n={len(members)} "
                  f"{ms:8.2f} ms ({ms * 1e3 / max(len(members), 1):7.1f}"
                  f" us/q)", flush=True)
        t0 = time.perf_counter()
        S.collect_query_batch(idx.dev, st, sp2)
        print(f"    submit {t_sub * 1e3:.1f} ms | device+block "
              f"{total_ms:.1f} ms | collect "
              f"{(time.perf_counter() - t0) * 1e3:.1f} ms", flush=True)
    finally:
        idx._rw.read_release()


if __name__ == "__main__":
    main()
