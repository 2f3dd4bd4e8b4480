"""Stage checkpoint / lineage layer (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Each pipeline stage writes:
  * its DataFrame as parquet under ``<root>/<stage>/data``. (Iceberg
    ``writeTo`` with a snapshot per stage is the design target on a
    real cluster — same parquet bytes underneath plus a catalog commit —
    but the runtime jar is absent in this sandbox, so that path is NOT
    implemented here; tests/test_iceberg.py documents the gap and will
    exercise the reader/writer wiring when a jar is present.)
  * a ``_metrics`` parquet with per-partition row counts + stage
    wall-clock + arbitrary stage KPIs (match rates, block histograms),
  * a ``_SUCCESS_STAGE`` JSON manifest (stage name, schema, timestamp,
    upstream stages) — the resume token.

``StageCheckpointer.run`` is idempotent: if a valid manifest exists the
stage is skipped and its data re-read — mid-pipeline restart costs only
the stages after the last valid snapshot.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _capped_local_checkpoint(df: DataFrame) -> DataFrame:
    """localCheckpoint with a partition-count cap and SERIALIZED
    storage.

    Partition cap: stage outputs built from multi-pass unions inherit
    the SUM of their parents' partitions (union is partition-
    concatenation, and AQE only re-plans shuffles), so an 8-pass
    blocking union checkpoints into ~800 partitions and every
    downstream stage pays ~800 task launches. Cap at 4x the cluster
    parallelism — high enough for skew headroom, low enough to kill
    the per-task overhead.

    Serialized storage (MEMORY_AND_DISK_SER vs the deserialized
    default): a deserialized checkpoint of a 42M-row pair set is ~85M
    long-lived small objects (one UnsafeRow + one byte[] per row) in
    the old generation — every full GC walks them, and with 8 task
    threads allocating, the measured effect was the ER scoring stage
    DOUBLING its wall at local[8] (252s -> 710s). Serialized blocks
    are a few large buffers per partition: near-zero GC cost, one
    cheap deserialization per downstream scan (our checkpoints are
    scanned 1-3x). On a 100 TB cluster this is also the executor-heap-
    safe shape."""
    from pyspark.storagelevel import StorageLevel

    sc = df.sparkSession.sparkContext
    cap = 4 * sc.defaultParallelism
    if df.rdd.getNumPartitions() > cap:
        df = df.coalesce(cap)
    # PySpark 4: MEMORY_AND_DISK is the serialized level (deserialized
    # is the explicit MEMORY_AND_DISK_DESER, which is also
    # localCheckpoint's default)
    return df.localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)


class StageCheckpointer:
    def __init__(self, spark: SparkSession, root: str, enabled: bool = True):
        self.spark = spark
        self.root = root
        self.enabled = enabled
        if enabled:
            os.makedirs(root, exist_ok=True)

    def _paths(self, stage: str) -> "tuple[str, str, str]":
        base = os.path.join(self.root, stage)
        return os.path.join(base, "data"), os.path.join(base, "_metrics"), os.path.join(base, "_SUCCESS_STAGE")

    def is_complete(self, stage: str) -> bool:
        return self.enabled and os.path.exists(self._paths(stage)[2])

    def load(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._paths(stage)[0])

    def run(self, stage: str, df_fn, upstream: "list[str] | None" = None, kpis_fn=None) -> DataFrame:
        """Execute (or resume) a stage. ``df_fn() -> DataFrame``;
        ``kpis_fn(df) -> dict`` computes stage KPIs for the metrics
        table."""
        if not self.enabled:
            # No durable checkpoint requested: still cut lineage at the
            # stage boundary (localCheckpoint) — downstream stages and
            # iterative consumers must not re-optimize/re-execute the
            # whole upstream plan on every action.
            return _capped_local_checkpoint(df_fn())
        data_p, metrics_p, manifest_p = self._paths(stage)
        if self.is_complete(stage):
            return self.load(stage)
        t0 = time.time()
        df = df_fn()
        df.write.mode("overwrite").parquet(data_p)
        out = self.spark.read.parquet(data_p)
        elapsed = time.time() - t0
        # per-partition lineage: rows per input split of the written data
        per_part = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .withColumn("stage", F.lit(stage))
            .withColumn("wall_seconds", F.lit(float(elapsed)))
        )
        # one row per partition — collect it for the manifest total so
        # the freshly written data is scanned ONCE, not once for the
        # metrics and again for a count()
        part_rows = per_part.collect()
        self.spark.createDataFrame(part_rows, per_part.schema).write.mode("overwrite").parquet(metrics_p)
        kpis = dict(kpis_fn(out)) if kpis_fn else {}
        manifest = {
            "stage": stage,
            "rows": int(sum(r["rows"] for r in part_rows)),
            "schema": out.schema.jsonValue(),
            "upstream": upstream or [],
            "wall_seconds": elapsed,
            "kpis": kpis,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(manifest_p, "w") as f:
            json.dump(manifest, f, indent=2, default=str)
        return out

    def manifest(self, stage: str) -> "dict | None":
        p = self._paths(stage)[2]
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)
