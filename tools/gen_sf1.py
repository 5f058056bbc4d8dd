"""Generate deterministic sf1-scale tables (10x sf0.1) for the scale
sweep — /root/testdata carries only sf{0.001,0.01,0.1} and is read-only,
so the sweep's larger input lives under /tmp.

Only the tables the dedup / connected-components / corpus family reads
are produced (documents, embeddings, customer): each sf0.1 row becomes
10 rows with distinct ids; replica 0 keeps the original payload and
replicas 1-9 carry a small deterministic mutation, so the corpus gains
realistic near-dup clusters (~10 members) and the CC pair graph grows
superlinearly — exactly the stress the sweep is after.  No RNG anywhere;
re-running reproduces byte-identical parquet.

Usage: python tools/gen_sf1.py [out_dir]   (default /tmp/testdata_sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
COPIES = 10


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
    os.makedirs(out, exist_ok=True)

    docs = pd.read_parquet(f"{SRC}/documents.parquet")
    parts = []
    for c in range(COPIES):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] * COPIES + c
        if c:
            # append a short per-replica suffix: long texts stay
            # near-duplicates of replica 0 (high shingle Jaccard), short
            # ones drift below threshold — a realistic mixed cluster shape
            d["text"] = d["text"] + f" replica{c} tag" + (
                d["doc_id"] % 89).astype(str)
        d["n_chars"] = d["text"].str.len().astype("int64")
        parts.append(d)
    pd.concat(parts, ignore_index=True).to_parquet(
        f"{out}/documents.parquet", index=False)

    emb = pd.read_parquet(f"{SRC}/embeddings.parquet")
    dim = len(emb["embedding"].iloc[0])
    parts = []
    for c in range(COPIES):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] * COPIES + c
        if c:
            def _perturb(v, c=c):
                v = v.copy()
                v[c % dim] += np.float32(0.01 * c)
                return v
            e["embedding"] = e["embedding"].map(_perturb)
        parts.append(e)
    pd.concat(parts, ignore_index=True).to_parquet(
        f"{out}/embeddings.parquet", index=False)

    cust = pd.read_parquet(f"{SRC}/customer.parquet")
    parts = []
    for c in range(COPIES):
        k = cust.copy()
        k["c_custkey"] = k["c_custkey"] * COPIES + c
        parts.append(k)
    pd.concat(parts, ignore_index=True).to_parquet(
        f"{out}/customer.parquet", index=False)

    for t in ("documents", "embeddings", "customer"):
        n = len(pd.read_parquet(f"{out}/{t}.parquet"))
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
