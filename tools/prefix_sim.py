"""Offline simulator for impact-prefix pruned search (no device).

Loads the cached bench index's CSR layout (csr_cache.npz) and, over the
bench query mix, simulates the planned prefix executor exactly:

  - per wide term (df > CAP): the top-CAP postings by BM25 tf-part
    ("impact"), and the tail bound = the (CAP+1)-th largest impact;
  - per query: candidates = union of fetched postings, exact partial
    score s_d, upper bound u_d = s_d + sum of missing wide tails;
  - top-M candidates by u get exact rescoring (the device would binary
    search the full postings); certification = kth exact > max(u of
    out-of-M candidates, total_tail);
  - reports cert rate, exactness vs a full brute-force scorer on a
    sample, and the lane-count reduction vs the current sliced plane.

Usage: python tools/prefix_sim.py [--cap 4096] [--m 32] [--queries 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BM25_K1 = 1.2
BM25_B = 0.75


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=8_800_000)
    ap.add_argument("--vocab", type=int, default=1_000_000)
    ap.add_argument("--mean-len", type=int, default=60)
    ap.add_argument("--cap", type=int, default=4096)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--exact-check", type=int, default=64,
                    help="brute-force verify this many queries")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    key = f"d{args.docs}-v{args.vocab}-l{args.mean_len}-s42"
    idxdir = os.path.join(root, ".bench_cache", key, "data", "bench")
    z = np.load(os.path.join(idxdir, "csr_cache.npz"), mmap_mode="r")
    term_starts = np.asarray(z["term_starts"])
    slot = z["slot"]          # mmap: int32[n_post], device-slot order
    tf16 = z["tf16"]          # mmap: uint16[n_post]
    perm = np.asarray(z["perm"])  # device slot -> host slot

    from nxsearch_tpu.index.hostindex import HostIndex

    t0 = time.perf_counter()
    host = HostIndex(idxdir)
    host.sync()
    n_docs = host.doc_ids.n
    dl = host.doc_len.view()[:n_docs].astype(np.float32)[perm]
    adl = float(host.token_count // host.doc_count)
    print(f"host sync {time.perf_counter() - t0:.1f}s, adl {adl}",
          flush=True)

    c1 = np.float32(BM25_K1 * (1.0 - BM25_B))
    c2 = np.float32(BM25_K1 * BM25_B / adl)
    df = np.diff(term_starts)

    rng = np.random.default_rng(42)
    probs = 1.0 / (np.arange(args.vocab, dtype=np.float64) + 10.0)
    probs /= probs.sum()
    qp = probs ** 0.35
    qp /= qp.sum()
    queries = []
    for _ in range(args.queries):
        n_t = rng.integers(2, 5)
        ids = rng.choice(args.vocab, size=n_t, p=qp)
        queries.append(sorted(set(int(i) + 1 for i in ids)))

    CAP = args.cap
    prefix_cache: dict[int, tuple] = {}

    def impact(lo, hi):
        ltf = np.log(tf16[lo:hi].astype(np.float64) + 1.0).astype(
            np.float32)
        s = np.asarray(slot[lo:hi]).astype(np.int64)
        return ltf / (ltf + c1 + c2 * dl[s]) , s

    def prefix_of(t):
        got = prefix_cache.get(t)
        if got is None:
            lo, hi = int(term_starts[t - 1]), int(term_starts[t])
            part, s = impact(lo, hi)
            if hi - lo <= CAP:
                got = (s, part, np.float32(0.0))
            else:
                ix = np.argpartition(-part, CAP)
                tail = part[ix[CAP:]].max()
                ix = np.sort(ix[:CAP])
                got = (s[ix], part[ix], np.float32(tail))
            prefix_cache[t] = got
        return got

    def idf_of(t):
        d = int(df[t - 1])
        return np.float32(np.log((n_docs - d + 0.5) / (d + 0.5) + 1.0))

    n_cert = 0
    n_exact_ok = 0
    n_checked = 0
    lanes_prefix = 0
    lanes_full = 0
    uncert_reasons = {"u_out": 0, "total_tail": 0}
    t0 = time.perf_counter()
    dense_score = np.zeros(n_docs, np.float32)   # brute-force scratch
    for qi, terms in enumerate(queries):
        idfs = {t: idf_of(t) for t in terms}
        # Gather prefix lanes.
        cs, cc, ct = [], [], []   # slots, contribs, per-lane tail cred
        total_tail = np.float32(0.0)
        for t in terms:
            s, part, tail = prefix_of(t)
            lanes_prefix += len(s)
            lanes_full += int(df[t - 1])
            cs.append(s)
            cc.append(part * idfs[t])
            tb = np.float32(tail * idfs[t])
            total_tail += tb
            ct.append(np.full(len(s), tb, np.float32))
        cs = np.concatenate(cs)
        cc = np.concatenate(cc)
        ct = np.concatenate(ct)
        # Segment-aggregate per doc.
        order = np.argsort(cs, kind="stable")
        cs, cc, ct = cs[order], cc[order], ct[order]
        uniq, inv = np.unique(cs, return_inverse=True)
        s_d = np.zeros(len(uniq), np.float32)
        np.add.at(s_d, inv, cc)
        cred = np.zeros(len(uniq), np.float32)
        np.add.at(cred, inv, ct)
        u_d = s_d + (total_tail - cred)
        cand = uniq

        M = min(args.m, len(cand))
        if len(cand) > M:
            # Ties by ascending slot, like top_k over a slot-sorted
            # plane (cand/u_d are already slot-ascending from unique).
            order_u = np.argsort(-u_d, kind="stable")
            sel = order_u[:M]
            u_out = np.float32(u_d[order_u[M:]].max())
        else:
            sel = np.arange(len(cand))
            u_out = np.float32(0.0)
        # Exact rescore of selected candidates for truncated terms.
        s_ex = s_d[sel].copy()
        for t in terms:
            ps, ppart, tail = prefix_of(t)
            if tail <= 0:
                continue
            lo, hi = int(term_starts[t - 1]), int(term_starts[t])
            part, sarr = impact(lo, hi)
            pos = np.minimum(np.searchsorted(sarr, cand[sel]),
                             hi - lo - 1)
            found = sarr[pos] == cand[sel]
            inpref = np.isin(cand[sel], ps)
            s_ex += np.where(found & ~inpref,
                             part[pos] * idfs[t], 0.0).astype(np.float32)
        # Final ties by ascending slot (the device executor sorts the
        # M candidates by slot before top_k, whose ties take the
        # lowest index).
        slot_order = np.argsort(cand[sel], kind="stable")
        top_ix = slot_order[np.argsort(-s_ex[slot_order],
                                       kind="stable")][: args.k]
        kth = np.float32(s_ex[top_ix[-1]]) if len(top_ix) >= args.k \
            else np.float32(0.0)
        cert = bool(kth > u_out) and bool(kth > total_tail)
        n_cert += cert
        if not cert:
            if kth <= u_out:
                uncert_reasons["u_out"] += 1
            if kth <= total_tail:
                uncert_reasons["total_tail"] += 1

        if qi < args.exact_check:
            dense_score[:] = 0.0
            for t in terms:
                lo, hi = int(term_starts[t - 1]), int(term_starts[t])
                part, sarr = impact(lo, hi)
                np.add.at(dense_score, sarr, part * idfs[t])
            top = np.argsort(-dense_score, kind="stable")[: args.k]
            if cert:
                n_checked += 1
                want_docs = set(top.tolist())
                got_docs = set(int(cand[sel][i]) for i in top_ix)
                if want_docs == got_docs:
                    d_by = {int(cand[sel][i]): float(s_ex[i])
                            for i in top_ix}
                    sdiff = max(abs(float(dense_score[d]) - d_by[d])
                                for d in want_docs) if want_docs else 0.0
                    if sdiff <= 1e-4:
                        n_exact_ok += 1
                    else:
                        print(f"  q{qi} score drift {sdiff:.2e}")
                else:
                    only_w = want_docs - got_docs
                    kth_want = float(dense_score[top[-1]])
                    detail = [(int(d), float(dense_score[d]))
                              for d in only_w]
                    print(f"  q{qi} DOC MISMATCH kth_want "
                          f"{kth_want:.6f} kth_got {float(kth):.6f} "
                          f"missing {detail[:4]} u_out {float(u_out):.6f}"
                          f" total_tail {float(total_tail):.6f}")
    dt = time.perf_counter() - t0
    print(f"cap {CAP} m {args.m}: cert {n_cert}/{len(queries)} "
          f"({100.0 * n_cert / len(queries):.1f}%), "
          f"uncert reasons {uncert_reasons}, "
          f"exact-on-cert {n_exact_ok}/{n_checked}, "
          f"lanes {lanes_prefix / 1e6:.2f}M vs full "
          f"{lanes_full / 1e6:.2f}M "
          f"({lanes_full / max(lanes_prefix, 1):.1f}x), {dt:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
