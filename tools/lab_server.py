"""Persistent experiment host for on-chip iteration (dev tool).

Opens the cached 8.8M bench index ONCE (the device snapshot build
costs ~5 min per process through the tunnel), then polls /tmp/lab_cmd.py;
whenever its mtime changes, exec()s it with the live objects in scope
and appends stdout to /tmp/lab_out.log.  Write 'STOP' to the file to
exit.  Namespace exposed to snippets:

    nxs, idx, sp, B (bench module), np, words, probs, rng, jax
"""

import contextlib
import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B

CMD = "/tmp/lab_cmd.py"
OUT = "/tmp/lab_out.log"


def log(msg):
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def main():
    docs, vocab, mean_len = 8_800_000, 1_000_000, 60
    B.enable_compile_cache(docs, mean_len)
    import jax
    rng = np.random.default_rng(7)
    ranks = np.arange(vocab, dtype=np.float64)
    probs = 1.0 / (ranks + 10.0)
    probs /= probs.sum()
    words = np.array([f"w{i:05d}" for i in range(vocab)])

    from nxsearch_tpu import Nxs, Params
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    basedir = os.path.join(root, ".bench_cache",
                           f"d{docs}-v{vocab}-l{mean_len}-s42")
    nxs = Nxs(basedir)
    idx = nxs.index_open("bench")
    sp = Params().set_uint("limit", 10)
    t0 = time.perf_counter()
    qs = B.make_queries(8192, words, probs, np.random.default_rng(42))
    for at in range(0, len(qs), 2048):
        try:
            idx.search_many(qs[at: at + 2048], sp)
        except Exception as e:
            log(f"[lab] warmup batch @{at} failed: {e!r}; retrying")
            time.sleep(5)
            idx.search_many(qs[at: at + 2048], sp)
    try:
        idx.search_many(
            B.make_fuzzy_queries(512, words, probs, rng, "w"), sp)
    except Exception as e:
        log(f"[lab] fuzzy warmup failed: {e!r}")
    for q in qs[:8]:
        idx.search(q, sp)
    log(f"[lab] ready; snapshot build + warmup "
        f"{time.perf_counter() - t0:.1f}s")

    ns = dict(nxs=nxs, idx=idx, sp=sp, B=B, np=np, words=words,
              probs=probs, rng=rng, jax=jax, Params=Params, time=time)
    seen = 0.0
    while True:
        try:
            m = os.stat(CMD).st_mtime
        except OSError:
            time.sleep(0.5)
            continue
        if m == seen:
            time.sleep(0.5)
            continue
        seen = m
        src = open(CMD).read()
        if src.strip() == "STOP":
            log("[lab] stopping")
            break
        buf = io.StringIO()
        t0 = time.perf_counter()
        try:
            with contextlib.redirect_stdout(buf):
                exec(compile(src, CMD, "exec"), ns)
        except Exception:
            buf.write(traceback.format_exc())
        log(f"[lab] --- ran in {time.perf_counter() - t0:.1f}s ---")
        log(buf.getvalue())
    nxs.close()


if __name__ == "__main__":
    main()
