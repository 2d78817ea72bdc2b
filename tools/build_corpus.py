"""Build (and cache) a bench corpus index without touching the device.

Host-only: generates the synthetic Zipf corpus, ingests it through the
public API, and checkpoints the snapshot -- so a later bench.py run
fast-opens it.  Run with JAX_PLATFORMS=cpu; nothing here dispatches to
an accelerator, keeping the chip free for concurrent measurements.

Usage: JAX_PLATFORMS=cpu python tools/build_corpus.py \
           [--docs 8800000] [--vocab 1000000] [--mean-len 60]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=8_800_000)
    ap.add_argument("--vocab", type=int, default=1_000_000)
    ap.add_argument("--mean-len", type=int, default=60)
    ap.add_argument("--chunk", type=int, default=4096)
    args = ap.parse_args()

    import bench as B

    B.enable_compile_cache(args.docs, args.mean_len)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    key = f"d{args.docs}-v{args.vocab}-l{args.mean_len}-s42"
    basedir = os.path.join(root, ".bench_cache", key)
    if os.path.isdir(os.path.join(basedir, "data", "bench")):
        print(f"cache already present: {basedir}")
        return
    # Build into a sibling .partial dir and rename at the end: bench.py
    # auto-selects a tier by the mere existence of data/<name>/, so a
    # build still in flight (or killed) must never look like a complete
    # cache.
    partial = basedir + ".partial"
    if os.path.isdir(partial):
        import shutil
        shutil.rmtree(partial)
    os.makedirs(partial, exist_ok=True)

    from nxsearch_tpu import Nxs

    nxs = Nxs(partial)
    idx = nxs.index_create("bench")
    t0 = time.perf_counter()
    # Chunk-wise generation (zipf_range composes fixed logical blocks,
    # so any --chunk yields the same corpus bytes) keeps ingest
    # streaming; the full corpus text is never materialized at once.
    for base in range(0, args.docs, args.chunk):
        hi = min(base + args.chunk, args.docs)
        docs = B.zipf_range(base, hi, args.vocab, args.mean_len)
        idx.add_many(docs)
        if (base // args.chunk) % 64 == 0:
            rate = hi / (time.perf_counter() - t0)
            eta = (args.docs - hi) / max(rate, 1.0)
            print(f"  {hi}/{args.docs} docs ({rate:.0f} docs/s, "
                  f"eta {eta:.0f}s)", flush=True)
    dt = time.perf_counter() - t0
    print(f"indexed {args.docs} docs in {dt:.1f}s "
          f"({args.docs / dt:.0f} docs/s)", flush=True)
    t0 = time.perf_counter()
    idx.checkpoint()
    print(f"checkpoint in {time.perf_counter() - t0:.1f}s", flush=True)
    nxs.close()
    # A stale basedir cannot be a complete cache (the data/bench check
    # above already returned), so clear it -- e.g. the leftovers of a
    # killed bench.py fresh build -- or os.rename raises ENOTEMPTY and
    # loses the ~1h build at the publish step.
    if os.path.isdir(basedir):
        import shutil
        shutil.rmtree(basedir)
    os.rename(partial, basedir)
    print(f"cache published: {basedir}", flush=True)


if __name__ == "__main__":
    main()
