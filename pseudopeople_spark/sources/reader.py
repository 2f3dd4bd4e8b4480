"""Dataset source reader — parity with the reference's
``load_standard_dataset`` (``/root/reference/src/pseudopeople/loader.py:13-51``):
read a parquet directory/file (or an Iceberg table when the runtime is
on the classpath) applying conjunctive ``(column, op, literal)``
filter triples. In Spark the triples compile to a ``where`` chain that
Catalyst pushes into the scan (PushedFilters / partition pruning), so
the reference's explicit pyarrow ``filters=`` machinery is subsumed.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_OPS = {
    "==": lambda c, v: c == v,
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "in": lambda c, v: c.isin(*v),
}


def _compile_filters(user_filters: "Sequence[tuple[str, str, Any]] | None") -> "Column | None":
    if not user_filters:
        return None
    pred: Column | None = None
    for col, op, lit in user_filters:
        if op not in _OPS:
            raise ValueError(f"unsupported filter op {op!r}")
        p = _OPS[op](F.col(col), lit)
        pred = p if pred is None else (pred & p)
    return pred


def load_standard_dataset(
    spark: SparkSession,
    path: str,
    user_filters: "Sequence[tuple[str, str, Any]] | None" = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Read a dataset with pushdown-able filters.

    fmt='iceberg' requires the iceberg-spark runtime jar; we gate it
    behind a try so parquet-only environments (this sandbox) keep
    working — same reader interface either way."""
    if fmt == "iceberg":
        try:
            df = spark.read.format("iceberg").load(path)
        except Exception as ex:  # runtime jar absent -> parquet fallback
            raise RuntimeError(
                "iceberg runtime not available on the classpath; use fmt='parquet'"
            ) from ex
    elif fmt == "parquet":
        df = spark.read.parquet(path)
    else:
        raise ValueError(f"unsupported format {fmt!r} (reference also rejects non-parquet, loader.py:19-21)")
    pred = _compile_filters(user_filters)
    return df.where(pred) if pred is not None else df
