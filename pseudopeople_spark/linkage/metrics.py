"""Evaluation — pairwise precision/recall/F1 against ground-truth
labels (``simulant_id``, never noised — the truth deck,
reference ``tests/integration/test_schema.py:19-38``).

Primary metric (BASELINE.json): pairwise F1 on labeled pairs *within
the same blocking key* — i.e. over the candidate-pair set, a pair is
positive iff both records carry the same simulant_id, predicted
positive iff the pipeline put both in the same cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_f1_on_candidates(
    candidate_pairs: DataFrame,
    assignments: DataFrame,
    truth: DataFrame,
    id_col: str = "record_id",
    label_col: str = "simulant_id",
) -> "dict[str, float]":
    """candidate_pairs: (id_l, id_r); assignments: (record_id,
    cluster_id); truth: (record_id, simulant_id)."""
    lab = truth.select(F.col(id_col).alias("record_id"), F.col(label_col).alias("label"))
    asg = assignments.select("record_id", "cluster_id")
    both = lab.join(asg, "record_id")
    l = both.select(
        F.col("record_id").alias("id_l"), F.col("label").alias("label_l"), F.col("cluster_id").alias("cl_l")
    )
    r = both.select(
        F.col("record_id").alias("id_r"), F.col("label").alias("label_r"), F.col("cluster_id").alias("cl_r")
    )
    # shuffle-hash, not broadcast: the label frames are records-sized
    # (2.5M rows at the 1M-simulant bench) and the candidate set is
    # 100M+ pairs — a broadcast of the label side must be built in the
    # DRIVER, which at that size dies on maxResultSize/MemoryStore
    # (observed live: both 1M hi legs lost their quality numbers to it).
    # Hash-partitioned joins never stage the table driver-side.
    scored = candidate_pairs.join(l.hint("shuffle_hash"), "id_l").join(
        r.hint("shuffle_hash"), "id_r"
    )
    agg = scored.agg(
        F.sum(((F.col("label_l") == F.col("label_r")) & (F.col("cl_l") == F.col("cl_r"))).cast("long")).alias("tp"),
        F.sum(((F.col("label_l") != F.col("label_r")) & (F.col("cl_l") == F.col("cl_r"))).cast("long")).alias("fp"),
        F.sum(((F.col("label_l") == F.col("label_r")) & (F.col("cl_l") != F.col("cl_r"))).cast("long")).alias("fn"),
        F.count("*").alias("n_pairs"),
    ).collect()[0]
    tp, fp, fn = int(agg["tp"] or 0), int(agg["fp"] or 0), int(agg["fn"] or 0)
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "n_candidate_pairs": int(agg["n_pairs"]),
    }


def blocking_recall(
    candidate_pairs: DataFrame, truth: DataFrame, id_col: str = "record_id", label_col: str = "simulant_id"
) -> "dict[str, float]":
    """Fraction of true same-entity pairs that blocking surfaced at all
    (pairs never compared can never be matched — SURVEY.md §7.3)."""
    lab = truth.select(F.col(id_col).alias("record_id"), F.col(label_col).alias("label"))
    l = lab.select(F.col("record_id").alias("id_l"), F.col("label").alias("label_l"))
    r = lab.select(F.col("record_id").alias("id_r"), F.col("label").alias("label_r"))
    true_pairs = (
        l.join(r, F.col("label_l") == F.col("label_r"))
        .where(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r")
    )
    total = true_pairs.count()
    # the candidate side is the BUILD side of a left-semi join and must
    # never broadcast (122M pairs ≈ 11.3 GiB serialized at the 1M bench
    # — observed attempted); a left-side hint is unsupported for semi
    # joins, so pin the strategy on the right side
    found = true_pairs.join(
        candidate_pairs.hint("shuffle_hash"), ["id_l", "id_r"], "left_semi"
    ).count()
    return {"true_pairs": total, "found_pairs": found, "recall": found / total if total else 1.0}
