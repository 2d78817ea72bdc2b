"""Reproduce the warmup batch@2048 RESOURCE_EXHAUSTED and name the
group that triggers it (dev tool; run alone, never kill mid-compile)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B


def main():
    docs, vocab, mean_len = 8_800_000, 1_000_000, 60
    B.enable_compile_cache(docs, mean_len)
    rng = np.random.default_rng(7)
    ranks = np.arange(vocab, dtype=np.float64)
    probs = 1.0 / (ranks + 10.0)
    probs /= probs.sum()
    words = np.array([f"w{i:05d}" for i in range(vocab)])

    from nxsearch_tpu import Nxs, Params
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    nxs = Nxs(os.path.join(root, ".bench_cache",
                           f"d{docs}-v{vocab}-l{mean_len}-s42"))
    idx = nxs.index_open("bench")
    sp = Params().set_uint("limit", 10)

    # Instrument the submit loop: log every group key + dispatch time.
    from nxsearch_tpu import search as S
    from nxsearch_tpu.ops import executor as E
    for name in ("device_search_prefix_packed",
                 "device_search_sliced_packed",
                 "device_search_blockdense_cached",
                 "device_search_dense_batch", "device_search_batch"):
        orig = getattr(E, name)

        def wrap(*a, _orig=orig, _name=name, **kw):
            stat = {k: v for k, v in kw.items()
                    if isinstance(v, (int, bool))}
            print(f"  call {_name} {stat}", flush=True)
            return _orig(*a, **kw)
        setattr(E, name, wrap)
    orig_admit = S._inflight_admit

    def admit(est):
        print(f"  admit est={est}", flush=True)
        return orig_admit(est)
    S._inflight_admit = admit

    orig_retry = S._dispatch_oom_retry

    def retry(fn):
        t0 = time.perf_counter()
        try:
            out = orig_retry(fn)
            print(f"  dispatched ok in {time.perf_counter()-t0:.1f}s",
                  flush=True)
            return out
        except Exception as e:
            print(f"  DISPATCH FAILED after {time.perf_counter()-t0:.1f}s:"
                  f" {e!r}", flush=True)
            raise
    S._dispatch_oom_retry = retry

    qs = B.make_queries(8192, words, probs, np.random.default_rng(42))
    for bi, at in enumerate(range(0, len(qs), 2048)):
        print(f"batch {bi}:", flush=True)
        t0 = time.perf_counter()
        idx.search_many(qs[at: at + 2048], sp)
        print(f"batch {bi} done in {time.perf_counter()-t0:.1f}s",
              flush=True)
        from nxsearch_tpu.search import EXEC_STATS
        print(f"  stats: {dict(sorted(EXEC_STATS.items()))}", flush=True)
    nxs.close()


if __name__ == "__main__":
    main()
