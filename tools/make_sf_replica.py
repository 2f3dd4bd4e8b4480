"""Build a local sf1.0-shaped replica of the driver's testdata for
perf measurement ONLY (the driver's round-end bench escalated to
sf=1.0, which this sandbox does not ship — see BENCH_r05.json
"sf_escalated_from": 0.1).

Method: K shifted copies of each sf0.1 table with every key column
offset by copy_index * stride so referential joins stay intact and
per-key distributions match a linearly-scaled generator:

  * fixed-cardinality block keys (c_nationkey, p_brand/p_size, lang,
    length bucket) keep their cardinality, so blocks grow K-fold and
    quadratic pair counts grow K^2 — exactly how the real generator
    scales (e.g. jaro_winkler at sf1.0 = ~450M pairs from 150k rows);
  * entity names are re-derived from the shifted key where the
    original derives from the key (Customer#..., Supplier#...);
  * event timestamps keep their span (K-fold density) with a per-copy
    microsecond jitter so they stay unique.

Output: /root/testdata_replica/sf1.0/<table>.parquet (NOT committed,
NOT read by bench.py unless SPARK_GRAFT_SF_DIR points at it).
Usage: python tools/make_sf_replica.py [K] [outdir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata_replica/sf1.0"

# table -> {column: stride_base}; stride = rows(sf0.1) of the table the
# key refers to
N = dict(customer=15_000, orders=150_000, lineitem=600_000, part=20_000,
         supplier=1_000, events=100_000, documents=5_000, embeddings=2_000)
KEYS = {
    "customer": {"c_custkey": N["customer"]},
    "orders": {"o_orderkey": N["orders"], "o_custkey": N["customer"]},
    "lineitem": {"l_orderkey": N["orders"], "l_partkey": N["part"], "l_suppkey": N["supplier"]},
    "part": {"p_partkey": N["part"]},
    "supplier": {"s_suppkey": N["supplier"]},
    "events": {"event_id": N["events"], "user_id": 1_500},
    "documents": {"doc_id": N["documents"]},
    "embeddings": {"vec_id": N["embeddings"]},
}
COPY_AS_IS = ["nation", "region"]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for t in COPY_AS_IS:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{OUT}/{t}.parquet")
        print(f"{t}: copied")
    for t, keys in KEYS.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        copies = []
        for i in range(K):
            cols = {}
            for name in base.column_names:
                col = base.column(name)
                if name in keys:
                    arr = col.to_numpy() + i * keys[name]
                    cols[name] = pa.array(arr, type=col.type)
                elif t == "customer" and name == "c_name":
                    ck = base.column("c_custkey").to_numpy() + i * keys["c_custkey"]
                    cols[name] = pa.array([f"Customer#{v:09d}" for v in ck])
                elif t == "supplier" and name == "s_name":
                    sk = base.column("s_suppkey").to_numpy() + i * keys["s_suppkey"]
                    cols[name] = pa.array([f"Supplier#{v:09d}" for v in sk])
                elif t == "events" and name == "ts":
                    arr = col.to_numpy(zero_copy_only=False) + np.timedelta64(i, "us")
                    cols[name] = pa.array(arr, type=col.type)
                else:
                    cols[name] = col
            copies.append(pa.table(cols))
        out = pa.concat_tables(copies).combine_chunks()
        pq.write_table(out, f"{OUT}/{t}.parquet")
        print(f"{t}: {out.num_rows} rows")


if __name__ == "__main__":
    main()
