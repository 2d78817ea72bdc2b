"""Microbench: the Pallas Myers fuzzy kernel at serving shapes.

Times myers_distances_pallas_batch over a synthetic 1M-term vocab
(bench-shaped: 6-byte terms) for several (chunk M, BLOCK_TERMS)
configurations, plus the select_best epilogue -- isolates kernel time
from the serving path's memo/dispatch plumbing.

Usage: python tools/fuzzy_prof.py [--vocab N] [--chunks 8,64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=1_000_000)
    ap.add_argument("--chunks", type=str, default="64")
    ap.add_argument("--blocks", type=str, default="1024,4096,8192")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nxsearch_tpu.ops.pallas import fuzzy as F

    rng = np.random.default_rng(0)
    n = args.vocab
    t_pad = 1 << max(12, (n - 1).bit_length())
    words = [f"w{i:05d}".encode() for i in range(n)]
    vb = np.zeros((t_pad, 32), dtype=np.uint8)
    vl = np.zeros((1, t_pad), dtype=np.int32)
    for i, w in enumerate(words):
        vb[i, : len(w)] = np.frombuffer(w, dtype=np.uint8)
        vl[0, i] = len(w)
    vocab_t = jax.device_put(np.ascontiguousarray(vb.T))
    vocab_l = jax.device_put(vl)

    which = os.environ.get("NXS_FUZZY_PROF_KERNELS", "fwd,rev")
    kernels = {k: v for k, v in
               (("fwd", F.myers_distances_pallas_batch),
                ("rev", F.myers_rev_distances_pallas_batch))
               if k in which.split(",")}
    from nxsearch_tpu.ops import levenshtein as L
    totals = jax.device_put(
        np.random.default_rng(1).integers(
            1, 1000, t_pad).astype(np.uint32))
    vlen_flat = jax.device_put(np.ascontiguousarray(vl[0]))

    for blk in (int(b) for b in args.blocks.split(",")):
        for m in (int(c) for c in args.chunks.split(",")):
            qb = np.zeros((m, 32), dtype=np.int32)
            ql = np.zeros((m, 1), dtype=np.int32)
            for i in range(m):
                w = words[int(rng.integers(n))]
                t = b"x" + w[1:]
                qb[i, : len(t)] = np.frombuffer(t, dtype=np.uint8)
                ql[i, 0] = len(t)
            qb_d, ql_d = jnp.asarray(qb), jnp.asarray(ql)
            for name, kern in kernels.items():
                # np.asarray of a reduction forces the full
                # computation through the tunnel (block_until_ready on
                # a remote axon buffer can return at enqueue).
                d = kern(vocab_t, vocab_l, qb_d, ql_d, block=blk)
                _sync = np.asarray(d.min())  # compile + warm
                t0 = time.perf_counter()
                reps = 3
                for _ in range(reps):
                    d = kern(vocab_t, vocab_l, qb_d, ql_d, block=blk)
                    _sync = np.asarray(d.min())
                dt = (time.perf_counter() - t0) / reps
                steps = (t_pad // blk) * m
                print(f"{name} blk={blk:5d} M={m:3d}: {dt * 1e3:8.1f} ms "
                      f"({dt * 1e6 / steps:6.1f} us/step, "
                      f"{m / dt:7.0f} lookups/s)", flush=True)
            # select_best epilogue: distances -> winner per query.
            d = kernels["fwd"](vocab_t, vocab_l, qb_d, ql_d, block=blk)
            sel = jax.jit(jax.vmap(L.select_best,
                                   in_axes=(0, None, None, None)))
            ix, _ = sel(d, vlen_flat, totals, jnp.int32(2))
            _sync = np.asarray(ix)
            t0 = time.perf_counter()
            for _ in range(3):
                ix, _ = sel(d, vlen_flat, totals, jnp.int32(2))
                _sync = np.asarray(ix)
            print(f"select_best M={m:3d}: "
                  f"{(time.perf_counter() - t0) / 3 * 1e3:8.1f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
