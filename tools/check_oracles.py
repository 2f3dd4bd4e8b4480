"""Local replica of the driver's correctness gate: run every
__spark_entry__ query on Spark and its oracle on DuckDB at sf0.01,
compare row count + column names + order-insensitive values."""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402
from pseudopeople_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main():
    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    qs = E.queries()
    os_ = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spark_rows = [r.asDict() for r in sdf.collect()]
            scols = sorted(sdf.columns)
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in os_:
            print(f"ok   {name}: rows-only ({len(spark_rows)} rows) [{time.time() - t0:.1f}s]")
            continue
        try:
            res = con.execute(os_[name])
            dcols = sorted(d[0] for d in res.description)
            drows = [dict(zip([d[0] for d in res.description], r)) for r in res.fetchall()]
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures += 1
            continue
        if scols != dcols:
            print(f"FAIL {name}: columns differ spark={scols} duck={dcols}")
            failures += 1
            continue
        if len(spark_rows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} duck={len(drows)}")
            failures += 1
            continue
        cs, cd = canon(spark_rows, scols), canon(drows, scols)
        if cs != cd:
            ndiff = sum(1 for a, b in zip(cs, cd) if a != b)
            print(f"FAIL {name}: values differ ({ndiff}/{len(cs)} rows)")
            for a, b in list(zip(cs, cd))[:2000]:
                if a != b:
                    print("  spark:", a)
                    print("  duck :", b)
                    break
            failures += 1
            continue
        print(f"ok   {name}: {len(spark_rows)} rows match [{time.time() - t0:.1f}s]")
    print(f"\n{failures} failures / {len([q for q in qs if not ONLY or q in ONLY])} queries")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
