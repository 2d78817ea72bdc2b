"""Interactive bench harness: open the cached 8.8M-doc index once,
then exec command files against it.

Usage:
    python -u tools/bench_server.py [--docs N --vocab N --mean-len N] &
    # write python code to /tmp/nxs_cmd.py; it runs with `idx`, `nxs`,
    # `sp`, `queries`, `np`, `time` in scope; stdout+traceback land in
    # /tmp/nxs_out.txt; the cmd file is consumed (removed).
    # touch /tmp/nxs_stop to shut down.

Not part of the library; a development tool for iterating on the
serving path without re-paying the multi-minute snapshot open.
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as benchmod

CMD = "/tmp/nxs_cmd.py"
OUT = "/tmp/nxs_out.txt"
STOP = "/tmp/nxs_stop"


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=8_800_000)
    ap.add_argument("--vocab", type=int, default=1_000_000)
    ap.add_argument("--mean-len", type=int, default=60)
    ap.add_argument("--queries", type=int, default=4096)
    args = ap.parse_args()

    benchmod.enable_compile_cache(args.docs, args.mean_len)
    rng = np.random.default_rng(42)
    ranks = np.arange(args.vocab, dtype=np.float64)
    probs = 1.0 / (ranks + 10.0)
    probs /= probs.sum()
    words = np.array([f"w{i:05d}" for i in range(args.vocab)])
    queries = benchmod.make_queries(args.queries, words, probs, rng)

    from nxsearch_tpu import Nxs, Params

    basedir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache",
        f"d{args.docs}-v{args.vocab}-l{args.mean_len}-s42")
    t0 = time.perf_counter()
    nxs = Nxs(basedir)
    idx = nxs.index_open("bench")
    print(f"[server] opened in {time.perf_counter() - t0:.1f}s",
          flush=True)
    sp = Params().set_uint("limit", 10)

    t0 = time.perf_counter()
    idx.search_many(queries[:2048], sp)
    print(f"[server] warmup batch in {time.perf_counter() - t0:.1f}s; "
          f"ready", flush=True)

    scope = dict(idx=idx, nxs=nxs, sp=sp, queries=queries, np=np,
                 time=time, benchmod=benchmod, words=words, probs=probs,
                 Params=Params)
    while not os.path.exists(STOP):
        if os.path.exists(CMD):
            with open(CMD) as f:
                code = f.read()
            os.remove(CMD)
            import io
            import contextlib
            buf = io.StringIO()
            t0 = time.perf_counter()
            try:
                with contextlib.redirect_stdout(buf):
                    exec(code, scope)
            except Exception:
                buf.write(traceback.format_exc())
            buf.write(f"\n[{time.perf_counter() - t0:.2f}s]\n")
            with open(OUT, "w") as f:
                f.write(buf.getvalue())
            print("[server] cmd done", flush=True)
        time.sleep(0.5)
    os.remove(STOP)
    print("[server] stopped", flush=True)


if __name__ == "__main__":
    main()
