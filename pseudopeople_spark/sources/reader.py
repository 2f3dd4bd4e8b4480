"""Dataset source reader — parity with the reference's
``load_standard_dataset`` (``/root/reference/src/pseudopeople/loader.py:13-51``):
read a parquet directory/file (or an Iceberg table when the runtime is
on the classpath) applying conjunctive ``(column, op, literal)``
filter triples. In Spark the triples compile to a ``where`` chain that
Catalyst pushes into the scan (PushedFilters / partition pruning), so
the reference's explicit pyarrow ``filters=`` machinery is subsumed.
"""

from __future__ import annotations

import os
import re
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class DataSourceError(Exception):
    """Incompatible simulated-population source data (reference
    ``exceptions.DataSourceError``, used by
    ``interface.py:validate_source_compatibility:184-213``)."""


# The simulated-population data version this engine understands — the
# reference pins exactly one compatible version the same way
# (interface.py:196-207 pins 1.4.2 for pseudopeople's psp_version).
COMPATIBLE_DATA_VERSION = (1, 4, 2)


# ---------------------------------------------------------------------------
# filesystem helpers that work for BOTH local paths and Hadoop-visible
# URIs (s3a://, hdfs://, gs://, ...) — os.path.* is always False for a
# URI, which would silently route a cluster user's multi-dataset source
# root down the single-directory branch and skip the version gate
# ---------------------------------------------------------------------------

def _is_uri(path: str) -> bool:
    return "://" in path and not path.startswith("file:")


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def path_is_dir(path: str, spark: "SparkSession | None" = None) -> bool:
    if spark is None or not _is_uri(path):
        return os.path.isdir(path[len("file://"):] if path.startswith("file://") else path)
    fs, hp = _hadoop_fs(spark, path)
    return bool(fs.exists(hp)) and bool(fs.getFileStatus(hp).isDirectory())


def path_exists(path: str, spark: "SparkSession | None" = None) -> bool:
    if spark is None or not _is_uri(path):
        return os.path.exists(path[len("file://"):] if path.startswith("file://") else path)
    fs, hp = _hadoop_fs(spark, path)
    return bool(fs.exists(hp))


def _read_first_line(path: str, spark: "SparkSession | None" = None) -> str:
    if spark is None or not _is_uri(path):
        with open(path[len("file://"):] if path.startswith("file://") else path) as f:
            return f.readline()
    fs, hp = _hadoop_fs(spark, path)
    stream = fs.open(hp)
    try:
        # commons-io ships on Spark's classpath; CHANGELOGs are tiny
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return text.splitlines()[0] if text else ""


def _changelog_version(changelog_path: str, spark: "SparkSession | None" = None) -> "tuple[int, ...]":
    """First line of CHANGELOG.rst looks like ``**1.4.2 - 2023-05-24**``
    (reference ``_get_data_changelog_version``, interface.py:216-220)."""
    first = _read_first_line(changelog_path, spark)
    try:
        ver = first.split("**")[1].split("-")[0].strip()
        parts = tuple(int(p) for p in re.findall(r"\d+", ver))
        if not parts:
            raise ValueError(first)
    except (IndexError, ValueError) as ex:
        # the reference crashes on a malformed first line; a typed error
        # is strictly more useful
        raise DataSourceError(
            f"Could not parse a data version from the first line of {changelog_path!r}: {first!r}"
        ) from ex
    return parts


def validate_source_compatibility(
    source: str, dataset_name: str, spark: "SparkSession | None" = None
) -> str:
    """Reference-parity source validation
    (``interface.py:validate_source_compatibility:184-213``):

    * the source root must contain a ``<dataset_name>`` subdirectory
      (else ``FileNotFoundError``),
    * a ``CHANGELOG.rst`` must exist at the root and carry exactly the
      compatible data version — newer -> "upgrade the package", older /
      missing -> "re-download / request updated data"
      (``DataSourceError`` either way).

    Returns the dataset subdirectory path.
    """
    sub = source.rstrip("/") + "/" + dataset_name if _is_uri(source) else os.path.join(source, dataset_name)
    if not path_is_dir(sub, spark):
        raise FileNotFoundError(
            f"Could not find '{dataset_name}' in '{source}'. Please check that the "
            "provided source directory is correct. If using the sample data, no "
            "source is required. If providing a source, a directory should be "
            f"provided that has a subdirectory for '{dataset_name}'."
        )
    changelog = (
        source.rstrip("/") + "/CHANGELOG.rst" if _is_uri(source) else os.path.join(source, "CHANGELOG.rst")
    )
    if not path_exists(changelog, spark):
        raise DataSourceError(
            "The provided simulated population data is incompatible with this engine.\n"
            "An older version of simulated population data has been provided."
        )
    version = _changelog_version(changelog, spark)
    if version > COMPATIBLE_DATA_VERSION:
        raise DataSourceError(
            "The provided simulated population data is incompatible with this engine.\n"
            "A newer version of simulated population data has been provided.\n"
            "Please upgrade the package."
        )
    if version < COMPATIBLE_DATA_VERSION:
        raise DataSourceError(
            "The provided simulated population data is incompatible with this engine.\n"
            "The simulated population data has been corrupted.\n"
            "Please re-download the simulated population data."
        )
    return sub

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
