"""Transitive clustering: iterative large-star / small-star connected
components (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) as a driver-controlled DataFrame loop.

Why this algorithm: it converges in O(log^2 n) rounds on any graph,
every round is two groupBy-aggregations — no vertex-program framework,
no GraphFrames dependency, and it is the shape that survives 10^12
nodes (each round's shuffle is on node id, uniformly distributed by
construction since node ids are xxhash64 of record ids).

Driver responsibilities (SURVEY.md §4 #2):
  * ``localCheckpoint()`` every round to truncate lineage — naive loops
    OOM the driver with exponentially growing plans;
  * convergence = edge-set fingerprint (count + sum of pair hashes)
    unchanged — one lightweight action per round, no expensive
    ``exceptAll``.

Node ids are int64 (xxhash64 of record ids, collision odds ~n²/2⁶⁴;
the id->record mapping is kept and re-joined at the end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's minimum neighbor
    (including u itself)."""
    und = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = und.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    return (
        und.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges high->low, connect all small neighbors (and u) to
    the minimum."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = oriented.join(mins, "u").where(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    selfe = mins.select(F.col("u"), F.col("m").alias("v"))
    return nbrs.union(selfe).distinct()


def _fingerprint(edges: DataFrame) -> "tuple[int, int]":
    row = edges.agg(
        F.count("*").alias("n"),
        # sum in unbounded decimal: int64 sums overflow under ANSI mode
        F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _local_union_find(edges: DataFrame) -> DataFrame:
    """Finish a SMALL edge set with a driver-local union-find.

    Why: each distributed star-round costs 2 shuffles + a checkpoint +
    a fingerprint action of FIXED latency; once the active edge set
    fits comfortably on the driver (cap below — ~16 bytes/edge, tens of
    MB), one local pass replaces the remaining O(log n) rounds and
    their non-scaling per-round latency. This is the same small-graph
    cutover GraphFrames applies in its CC implementation. At 10^12
    nodes the star-edge set never shrinks below the node count, the cap
    never triggers, and the loop stays fully distributed.
    """
    import numpy as np
    import pandas as pd

    pdf = edges.select("u", "v").toPandas()  # Arrow batch transfer
    spark = edges.sparkSession
    if len(pdf) == 0:
        return spark.createDataFrame([], schema="u long, v long")
    u = pdf["u"].to_numpy(dtype="int64")
    v = pdf["v"].to_numpy(dtype="int64")
    # Vectorized min-label propagation with pointer jumping (a scalar
    # union-find loop in Python costs ~8 s/1M edges of pure driver
    # time — a FIXED, parallelism-independent cost that caps scaling
    # efficiency; this converges in O(log diameter) vectorized passes,
    # well under 1 s at the 2M-edge cap). Labels decrease monotonically
    # to the component MIN id — the same label the star-rounds (and the
    # DuckDB oracle) converge to.
    ids = np.unique(np.concatenate([u, v]))
    iu = np.searchsorted(ids, u)
    iv = np.searchsorted(ids, v)
    parent = np.arange(len(ids), dtype="int64")
    while True:
        m = np.minimum(parent[iu], parent[iv])
        nxt = parent.copy()
        np.minimum.at(nxt, iu, m)
        np.minimum.at(nxt, iv, m)
        nxt = nxt[nxt]  # pointer jumping halves chain depth per pass
        if np.array_equal(nxt, parent):
            break
        parent = nxt
    nonroot = parent != np.arange(len(ids), dtype="int64")
    out = pd.DataFrame({"u": ids[nonroot], "v": ids[parent[nonroot]]})
    if len(out) == 0:
        return spark.createDataFrame([], schema="u long, v long")
    return spark.createDataFrame(out)


# Edge-count cap for the driver-local CC finish: 2M edges x ~16 B is
# ~32 MB on the driver — trivially safe, and far below any real match-
# edge set at cluster scale (where the cap simply never triggers).
LOCAL_FINISH_MAX_EDGES = 2_000_000


def connected_components(
    edges: DataFrame,
    max_iterations: int = 25,
    checkpoint_every: int = 1,
    local_finish_max_edges: int = LOCAL_FINISH_MAX_EDGES,
) -> DataFrame:
    """edges: (u:int64, v:int64) -> assignments (u:int64, component:int64).

    Alternates large-star / small-star until the edge set is a fixed
    point (a forest of depth-1 stars pointing at component minima).
    When the active edge set drops under ``local_finish_max_edges`` the
    remaining rounds are replaced by one driver-local union-find pass
    (see :func:`_local_union_find`)."""
    e = edges.select("u", "v").where(F.col("u") != F.col("v")).distinct().localCheckpoint()
    # size the iteration loop's partitioning by DATA, not core count:
    # ~250k edges per partition keeps tasks meaningful while bounding
    # the per-round task-launch overhead that otherwise dominates the
    # O(log n) loop (and makes wall time depend on executor count)
    n_edges = e.count()
    if n_edges <= local_finish_max_edges:
        e = _local_union_find(e)
        assign = e.select(F.col("u"), F.col("v").alias("component"))
        roots = e.select(F.col("v").alias("u"), F.col("v").alias("component")).distinct()
        # no groupBy: union-find output maps each non-root node to its
        # root exactly once and roots are disjoint from non-roots, so
        # the union is already unique on u — a min-aggregate here would
        # be one more full shuffle of the assignment set for nothing
        return assign.union(roots)
    parts = max(1, min(256, n_edges // 250_000 + 1))
    if e.rdd.getNumPartitions() != parts:
        e = e.repartition(parts).localCheckpoint()
    import concurrent.futures

    # Speculative overlap only pays when rounds are expensive: on big
    # edge sets the fingerprint of the PREVIOUS round runs concurrently
    # with the next round's materialization (one serial action per round
    # instead of two); on tiny graphs the wasted speculative round after
    # convergence costs more than it saves.
    speculate = n_edges >= 100_000
    prev_fp = None
    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
        for i in range(max_iterations):
            # two star-rounds per driver round-trip: halves the number
            # of checkpoint+fingerprint jobs (the loop is task-launch-
            # bound on small edge sets; extra converged rounds are
            # idempotent)
            if speculate:
                nxt = _small_star(_large_star(e))
                nxt = _small_star(_large_star(nxt))
                fp_future = pool.submit(_fingerprint, e) if i > 0 else None
                nxt = nxt.localCheckpoint()
                fp = fp_future.result() if fp_future is not None else None
                if fp is not None and fp == prev_fp:
                    break
                prev_fp = fp
                e = nxt
                # star-rounds preserve connectivity, so once the active
                # edge set is small a local union-find finish is exact
                if fp is not None and fp[0] <= local_finish_max_edges:
                    e = _local_union_find(e)
                    break
            else:
                e = _small_star(_large_star(e))
                e = _small_star(_large_star(e))
                e = e.localCheckpoint()
                fp = _fingerprint(e)
                if fp == prev_fp:
                    break
                prev_fp = fp
                if fp[0] <= local_finish_max_edges:
                    e = _local_union_find(e)
                    break
    # star edges now point node -> component min; include roots themselves
    assign = e.select(F.col("u"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("u"), F.col("v").alias("component")).distinct()
    return assign.union(roots).groupBy("u").agg(F.min("component").alias("component"))


def cluster_records(
    edges_by_record: DataFrame,
    all_records: DataFrame,
    id_col: str = "record_id",
    ids_unique: bool = True,
) -> DataFrame:
    """(id_l, id_r) match edges -> (record_id, cluster_id) covering ALL
    records (singletons keep their own hash as cluster id).

    ``ids_unique=True`` (the pipeline's case: record_ids are unique by
    construction — dataset-prefixed, guardian twins suffixed ``_dup``)
    skips a full shuffle of the record set that a defensive
    ``distinct`` would cost; pass False for inputs that may repeat
    ids.

    When the id column AND both edge endpoints are already int64 (the
    rid pipeline, where _assign_int_ids VERIFIED uniqueness on the
    materialized data) they are used as graph node ids directly —
    re-hashing a verified-unique surrogate with a second xxhash64 would
    put the clustering domain on an UNverified hash (a collision there
    silently merges two records) and pay a wasted pass over the record
    set. String-id callers keep the xxhash64 node mapping (collision
    odds ~n²/2⁶⁴, documented above)."""
    ids = all_records.select(F.col(id_col).alias("record_id"))
    if not ids_unique:
        ids = ids.distinct()
    edge_types = dict(edges_by_record.dtypes)
    all_long = (
        dict(all_records.dtypes).get(id_col) == "bigint"
        and edge_types.get("id_l") == "bigint"
        and edge_types.get("id_r") == "bigint"
    )
    if all_long:
        ids = ids.withColumn("u", F.col("record_id"))
        edges = edges_by_record.select(F.col("id_l").alias("u"), F.col("id_r").alias("v"))
    else:
        ids = ids.withColumn("u", F.xxhash64("record_id"))
        edges = edges_by_record.select(
            F.xxhash64("id_l").alias("u"), F.xxhash64("id_r").alias("v")
        )
    comp = connected_components(edges)
    return (
        ids.join(comp, "u", "left")
        .select("record_id", F.coalesce("component", F.col("u")).alias("cluster_id"))
    )
