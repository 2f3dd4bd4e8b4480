"""Constraint-guided cluster refinement — split transitive merges that
violate the dataset-period uniqueness invariant.

An entity appears at most once per dataset-period (one census row per
simulant per year — reference ``interface.py`` generates one row per
simulant per dataset pull; the guardian-duplication twin is the single
exception and shares its original's ``base_rid``).  ``tiered_match``
already uses that invariant as a hard veto on DIRECT edges
(``same_dataset_distinct``), but transitive closure can still merge two
entities through a chain of cross-dataset edges: the measured FP mass
at 300k simulants is dominated by same-household twins (same last name,
same dob, similar first names — JOSH/JOHN, JULIE/JULIA) whose merged
cluster then contains BOTH entities' census rows.  That violation is
machine-detectable, so instead of accepting the k*m amplified
false-positive pairs we split exactly those clusters.

Split = greedy constrained re-agglomeration per violating cluster:
take the cluster's match edges best-score-first and union-find them
back together, refusing any union that would put two different
``base_rid``s into one (dataset, period) slot.  Highest-confidence
edges survive; the bridge edge that caused the merge (by construction
the lowest-evidence link on the violating path) is dropped.  New
sub-cluster ids are the min rid of each sub-cluster — the same label
convention the star-rounds and the local union-find converge to, so
ids stay unique across the whole assignment set (min of disjoint rid
sets, disjoint from untouched clusters).

Scale shape: detection is ONE aggregate over the records-sized
assignment set (slim 4-column frame).  Violating clusters are rare
(~1e-4 of clusters at 300k) and small (entity-sized, not data-sized),
so the rebuild is an ``applyInPandas`` cogroup over only those
clusters' edges + members — no pair-scale shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def find_violating_clusters(assignments: DataFrame, meta: DataFrame) -> DataFrame:
    """Cluster ids holding >1 distinct base_rid in one (dataset, period)
    slot. assignments: (record_id, cluster_id) in rid space; meta:
    (record_id, dataset, period, base_rid)."""
    return (
        assignments.join(meta, "record_id")
        .groupBy("cluster_id", "dataset", "period")
        .agg(F.count_distinct("base_rid").alias("k"))
        .where(F.col("k") >= 2)
        .select("cluster_id")
        .distinct()
    )


def _rebuild(key, edge_pdf, node_pdf):
    """Greedy constrained union-find over one violating cluster.

    Edges best-score-first (ties broken on ids for determinism); a
    union is allowed only if no (dataset, period) slot ends up with two
    base_rids. Runs on entity-sized groups (tens of rows)."""
    import pandas as pd

    nodes = node_pdf["record_id"].tolist()
    # NULL periods arrive as None/NaN; NaN != NaN would split every
    # slot key, so normalize missing to one sentinel (matches the
    # eqNullSafe semantics of the direct-edge veto)
    slot = {
        rid: (ds, "\x00" if pd.isna(per) else per)
        for rid, ds, per in zip(node_pdf["record_id"], node_pdf["dataset"], node_pdf["period"])
    }
    brid = dict(zip(node_pdf["record_id"], node_pdf["base_rid"]))
    parent = {rid: rid for rid in nodes}
    # per-set constraint state: (dataset, period) -> base_rid
    slots: "dict[int, dict]" = {rid: {slot[rid]: brid[rid]} for rid in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    e = edge_pdf.sort_values(["score", "id_l", "id_r"], ascending=[False, True, True])
    for lid, rid_, _s in zip(e["id_l"], e["id_r"], e["score"]):
        if lid not in parent or rid_ not in parent:
            continue  # endpoint pruned upstream; edge no longer binds
        ra, rb = find(lid), find(rid_)
        if ra == rb:
            continue
        sa, sb = slots[ra], slots[rb]
        small, big = (sa, sb) if len(sa) <= len(sb) else (sb, sa)
        ok = all(big.get(k, v) == v for k, v in small.items())
        if not ok:
            continue
        big.update(small)
        winner = ra if big is sa else rb
        loser = rb if winner == ra else ra
        parent[loser] = winner
        slots[winner] = big
        del slots[loser]
    comp: "dict[int, int]" = {}
    for rid in nodes:
        root = find(rid)
        comp[root] = min(comp.get(root, rid), rid)
    return pd.DataFrame(
        {"record_id": nodes, "cluster_id": [comp[find(rid)] for rid in nodes]}
    )


def split_violating_clusters(
    assignments: DataFrame,
    edges: DataFrame,
    records: DataFrame,
    id_col: str = "record_id",
) -> DataFrame:
    """assignments (record_id, cluster_id) -> corrected assignments.

    edges: (id_l, id_r, score) match edges, rid space. records must
    carry (record_id, dataset, period, base_rid)."""
    meta = records.select(
        F.col(id_col).alias("record_id"), "dataset", "period", "base_rid"
    )
    # materialize the (slim, records-sized, 2-column) assignment set
    # once: four consumers below (detection, edge tag, node set, kept)
    # would otherwise each replay the full connected-components lineage
    # (measured: 96s -> ~15s clustering stage at 300k simulants)
    assignments = assignments.localCheckpoint()
    # localCheckpoint: (a) materializes the tiny violating-id set once
    # for its three consumers, (b) detaches lineage so the semi-joins
    # below aren't flagged as an ambiguous self-join (bad descends from
    # assignments); rename the key so join conditions are unambiguous
    bad = (
        find_violating_clusters(assignments, meta)
        .select(F.col("cluster_id").alias("bad_cid"))
        .localCheckpoint()
    )
    n_bad = bad.count()
    if n_bad == 0:
        return assignments
    # every match edge has both endpoints in one cluster, so tagging by
    # id_l's cluster is enough; semi-join keeps only violating clusters
    asg_l = assignments.select(
        F.col("record_id").alias("id_l"), F.col("cluster_id")
    )
    # the edge side's grouping key gets a fresh name (ecid): both
    # cogroup sides otherwise carry the SAME cluster_id attribute from
    # assignments, which the analyzer rejects as an ambiguous self-join
    bad_edges = (
        edges.join(asg_l, "id_l")
        .join(F.broadcast(bad), F.col("cluster_id") == F.col("bad_cid"), "left_semi")
        .select(F.col("cluster_id").alias("ecid"), "id_l", "id_r", "score")
    )
    bad_nodes = (
        assignments.join(
            F.broadcast(bad), F.col("cluster_id") == F.col("bad_cid"), "left_semi"
        )
        .join(meta, "record_id")
        .select("cluster_id", "record_id", "dataset", "period", "base_rid")
    )
    fixed = bad_edges.groupBy("ecid").cogroup(
        bad_nodes.groupBy("cluster_id")
    ).applyInPandas(_rebuild, schema="record_id long, cluster_id long")
    kept = assignments.join(
        F.broadcast(bad), F.col("cluster_id") == F.col("bad_cid"), "left_anti"
    )
    return kept.unionByName(fixed)
