"""Derive a deterministic sf1 tier (10x sf0.1) for the LOCAL parity gate.

The driver ships sf0.001/0.01/0.1 only; the r3 verdict's stretch item
asks for goldens + parity at sf1 to prove the correctness gate is not
tuned to one input size. /root/testdata is read-only, so this derives
/tmp/sf1 from the committed sf0.1 inputs with PURE integer arithmetic —
no RNG — making the tier bit-reproducible on any machine:

- 10 copies of every fact table; copy k shifts every key column by
  k * 100_000_000 (consistently across tables, so FK joins stay exact);
- document text gets a shard marker prefix `c<k> ` (and n_chars is
  updated) so the corpus is not 10 literal clones — dedup finds the
  real near-dup structure 10x over, not a degenerate 10-clique per doc;
- embeddings get a +-3e-3 deterministic per-(copy, dim) offset so
  cosine rankings are not saturated with exact ties;
- tiny dims (region, nation) stay single-copy, as dims do at any scale;
- events keep their timestamps (10 shards of concurrent traffic).

Usage: python tools/make_sf1.py [out_dir=/tmp/sf1]
Then:  python tools/make_goldens.py /tmp/sf1
       python tools/parity_check.py /tmp/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OFF = 100_000_000
COPIES = 10

# key columns shifted per copy, per table (consistent across FK pairs)
SHIFT = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
SINGLE = ("region", "nation")


def scale_table(name: str, out_dir: str) -> int:
    t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    if name in SINGLE:
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
        return t.num_rows
    copies = []
    for k in range(COPIES):
        cols: dict[str, pa.Array] = {c: t.column(c) for c in t.column_names}
        for key in SHIFT.get(name, ()):
            arr = cols[key].to_numpy(zero_copy_only=False)
            cols[key] = pa.array(arr + k * OFF, type=t.schema.field(key).type)
        if name == "documents" and k > 0:
            txt = cols["text"].to_pylist()
            txt = [f"c{k} {s}" for s in txt]
            cols["text"] = pa.array(txt, type=pa.string())
            cols["n_chars"] = pa.array(
                np.asarray([len(s) for s in txt], dtype=np.int64), type=pa.int64()
            )
        if name == "embeddings" and k > 0:
            emb = cols["embedding"].to_pylist()
            jit = [((k * 31 + j) % 7 - 3) * 1e-3 for j in range(len(emb[0]))]
            emb = [
                [np.float32(v) + np.float32(jit[j]) for j, v in enumerate(row)] for row in emb
            ]
            cols["embedding"] = pa.array(emb, type=pa.list_(pa.float32()))
        copies.append(pa.table({c: cols[c] for c in t.column_names}))
    big = pa.concat_tables(copies)
    pq.write_table(big, os.path.join(out_dir, f"{name}.parquet"))
    return big.num_rows


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out_dir, exist_ok=True)
    names = [
        f[: -len(".parquet")] for f in sorted(os.listdir(SRC)) if f.endswith(".parquet")
    ]
    for n in names:
        rows = scale_table(n, out_dir)
        print(f"{n}: {rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
