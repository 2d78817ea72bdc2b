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
    os.makedirs(basedir, exist_ok=True)

    from nxsearch_tpu import Nxs

    rng = np.random.default_rng(42)
    t0 = time.perf_counter()
    docs, _, _ = B.make_corpus(args.docs, args.vocab, args.mean_len, rng)
    print(f"corpus generated in {time.perf_counter() - t0:.1f}s",
          flush=True)

    nxs = Nxs(basedir)
    idx = nxs.index_create("bench")
    t0 = time.perf_counter()
    for base in range(0, len(docs), args.chunk):
        idx.add_many([(base + i + 1, text) for i, text in
                      enumerate(docs[base: base + args.chunk])])
        if (base // args.chunk) % 256 == 0:
            done = base + args.chunk
            rate = done / (time.perf_counter() - t0)
            print(f"  {done}/{args.docs} docs ({rate:.0f} docs/s)",
                  flush=True)
    dt = time.perf_counter() - t0
    print(f"indexed {args.docs} docs in {dt:.1f}s "
          f"({args.docs / dt:.0f} docs/s)", flush=True)
    t0 = time.perf_counter()
    idx.checkpoint()
    print(f"checkpoint in {time.perf_counter() - t0:.1f}s", flush=True)
    nxs.close()


if __name__ == "__main__":
    main()
