"""Finish migrating a snapshot to full v2 sidecar layout in place.

Reads an existing snapshot.npz (v1 inline or intermediate v2 with only
p_* sidecars), writes any missing snapshot_<name>.npy sidecars, then
rewrites the meta npz with only counters + term blob.  No journal
replay -- pure array extraction, so converting the 8.8M-doc tier takes
seconds of IO instead of minutes of replay.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nxsearch_tpu.index.hostindex import HostIndex  # noqa: E402


def convert(idxdir: str) -> None:
    path = os.path.join(idxdir, "snapshot.npz")
    with np.load(path) as z:
        keys = set(z.files)
        meta = {k: z[k] for k in
                ("terms_consumed", "dt_consumed", "doc_count",
                 "token_count", "values_blob", "n_terms")}
        n_slots = None
        n_postings = int(z["n_postings"]) if "n_postings" in keys else None
        for name, dtype, group in HostIndex._SIDECARS:
            side = os.path.join(idxdir, f"snapshot_{name}.npy")
            if name in keys:
                arr = np.ascontiguousarray(z[name], dtype=dtype)
                tmp = side + ".tmp"
                with open(tmp, "wb") as f:
                    np.save(f, arr)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, side)
                print(f"extracted {name}: {len(arr)} ({arr.nbytes >> 20} MB)")
            else:
                arr = np.load(side, mmap_mode="r")
                print(f"kept sidecar {name}: {len(arr)}")
            if group == "n_slots":
                n_slots = len(arr)
            elif group == "n_postings":
                n_postings = len(arr)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, version=np.int64(HostIndex.SNAPSHOT_VERSION),
                 n_postings=np.int64(n_postings),
                 n_slots=np.int64(n_slots), **meta)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    print(f"meta rewritten: v{HostIndex.SNAPSHOT_VERSION}, "
          f"{n_postings} postings, {n_slots} slots")


if __name__ == "__main__":
    convert(sys.argv[1])
