"""Multi-pass blocking — the recall stage of the ER pipeline.

Each pass maps records to ``(block_key: string, record_id)``; candidate
pairs are generated *within* block keys only (north_rule: "labeled
pairs at the same blocking key"). Passes are complementary — a pair
missed by one key (typo'd surname breaks soundex) is caught by another
(MinHash over n-grams, or SSN exact):

  1. phonetic: soundex(last_name) built-in + double-metaphone primary,
     each salted with the DOB year band;
  2. exact identifier: SSN digits (when present);
  3. sorted neighborhood: window ``lead(record_id, k)`` over a global
     sort on (last_name, first_name, dob) — catches first-character
     corruption that breaks phonetic keys;
  4. MinHash-LSH: b bands × r rows of xxhash64 MinHash over padded name
     3-gram shingles — catches heavy multi-token corruption.

Skew handling (north_rule "partitioning/shuffle/skew handled
explicitly"): block-size histogram → blocks above ``max_block_size``
are NOT exploded quadratically; they fall back to a sorted-neighborhood
sweep *inside* the block (linear in block size), so one Zipf-head
surname cannot produce a straggler task. All passes are pure DataFrame
ops; the only Python is the metaphone pandas UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pseudopeople_spark.functions.similarity import double_metaphone_udf, ngrams_padded

BLOCK_SCHEMA = ["block_key", "record_id"]


def _kv(df: DataFrame, key: Column, prefix: str, id_col: str) -> DataFrame:
    return (
        df.select(F.concat(F.lit(prefix + ":"), key).alias("block_key"), F.col(id_col).alias("record_id"))
        .where(F.col("block_key").isNotNull())
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    sort_cols: "list[str]",
    id_col: str = "record_id",
    window_size: int = 3,
    partition_expr: Column | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking: sort by a composite key, pair each
    record with its next ``window_size`` neighbors via ``lead()``
    (SURVEY.md §2.E "window functions" — absent in the reference, core
    for us).

    At cluster scale a single global sort is one range-partitioned
    shuffle; we additionally partition the window by the first character
    of the sort key (``partition_expr``) so the window itself never
    funnels through one task. Returns (id_l, id_r, block_key)."""
    key = F.concat_ws("\x01", *[F.coalesce(F.col(c), F.lit("")) for c in sort_cols])
    base = df.select(F.col(id_col), key.alias("_snk"))
    # window partitioned by a 2-char sort-key prefix: a 1-char prefix
    # gives ~26 Zipf-skewed partitions whose head serializes the stage
    # (Amdahl) at high parallelism; 2 chars -> ~500 partitions. Pairs
    # that straddle a prefix boundary are the standard windowed-SNB
    # loss, covered by the phonetic/MinHash passes.
    part = partition_expr if partition_expr is not None else F.substring(F.col("_snk"), 1, 2)
    w = Window.partitionBy(part).orderBy(F.col("_snk"), F.col(id_col))
    # all lead(k) neighbors in ONE window pass — a per-k union would
    # re-exchange and re-sort the whole table window_size times
    leads = base.select(
        F.col(id_col).alias("id_l"),
        F.array(*[F.lead(F.col(id_col), k).over(w) for k in range(1, window_size + 1)]).alias("_nbrs"),
    )
    pairs = leads.select("id_l", F.explode("_nbrs").alias("id_r")).where(F.col("id_r").isNotNull())
    return pairs.select(
        F.least("id_l", "id_r").alias("id_l"),
        F.greatest("id_l", "id_r").alias("id_r"),
        F.lit("snb").alias("block_key"),
    )


def minhash_blocks(
    df: DataFrame,
    text_expr: Column,
    id_col: str = "record_id",
    bands: int = 4,
    rows_per_band: int = 2,
    seed: int = 1337,
) -> DataFrame:
    """MinHash-LSH banding over character 3-gram shingles, implemented
    directly with built-ins (explicit variant of Spark ML's MinHashLSH —
    SURVEY.md §7.2): per hash function h_i, signature_i = min over
    shingles of xxhash64(shingle, i); band key = concat of r signatures.
    Pure JVM expressions: shingles via sequence/transform, min via
    array_min of transform — no UDF, no explode, no extra shuffle."""
    sigs = _minhash_signatures(text_expr, bands * rows_per_band, seed)
    out = None
    for b in range(bands):
        sig_parts = [
            _sig_str(sigs[f"c{b * rows_per_band + r}"]) for r in range(rows_per_band)
        ]
        key = F.concat_ws("_", *sig_parts)
        kv = _kv(df.where(text_expr.isNotNull() & (F.length(text_expr) > 0)), key, f"mh{b}", id_col)
        out = kv if out is None else out.unionByName(kv)
    return out


def _minhash_signatures(text_expr: Column, n_hashes: int, seed: int) -> Column:
    """All MinHash signatures in ONE traversal of the shingle array:
    ``aggregate`` folds the shingles into an n_hashes-field struct of
    running minima. The naive form — one
    ``array_min(transform(shingles, xxhash64))`` per hash function —
    rebuilds the shingle array and re-walks it n_hashes times (codegen
    does not common-subexpression-eliminate across higher-order-function
    lambdas); measured 3-4x slower and GC-unstable at 750k rows."""
    shingles = ngrams_padded(text_expr, 3)
    max_long = (1 << 63) - 1
    acc0 = F.struct(*[F.lit(max_long).cast("long").alias(f"c{i}") for i in range(n_hashes)])

    def merge(acc: Column, s: Column) -> Column:
        return F.struct(
            *[
                F.least(acc[f"c{i}"], F.xxhash64(F.lit(seed + i), s)).alias(f"c{i}")
                for i in range(n_hashes)
            ]
        )

    return F.aggregate(shingles, acc0, merge)


def _sig_str(sig: Column) -> Column:
    # pmod (not abs): abs(Long.MIN_VALUE) overflows under ANSI
    return F.conv(F.pmod(sig, F.lit(2**62)).cast("string"), 10, 36)


def all_block_keys(
    df: DataFrame,
    id_col: str = "record_id",
    last_col: str = "last_name",
    first_col: str = "first_name",
    dob_col: str = "dob",
    ssn_col: str = "ssn_digits",
    minhash_bands: int = 4,
    minhash_rows: int = 2,
) -> DataFrame:
    """All blocking passes in ONE narrow projection + one ``stack``
    unpivot: a single scan of the records and a single metaphone-UDF
    evaluation, instead of one scan (and Python worker round-trip) per
    pass. At 10^12 docs the blocking stage is scan-bound, so pass count
    must not multiply scans.

    Emits (block_key, record_id) for: soundex+year, double-metaphone
    primary/secondary+year, SSN exact, and b MinHash band keys."""
    year = F.coalesce(F.substring(F.col(dob_col), 1, 4), F.lit("x"))
    dm = double_metaphone_udf(F.col(last_col))
    name_text = F.concat_ws(
        " ", F.coalesce(F.col(first_col), F.lit("")), F.coalesce(F.col(last_col), F.lit(""))
    )
    sigs = _minhash_signatures(name_text, minhash_bands * minhash_rows, 1337) if minhash_bands else None

    key_cols = {
        "sdx": F.when(
            F.col(last_col).isNotNull(),
            F.concat(F.lit("sdx:"), F.soundex(F.upper(F.col(last_col))), F.lit("|"), year),
        ),
        "dmp": F.when(dm["primary"] != "", F.concat(F.lit("dmp:"), dm["primary"], F.lit("|"), year)),
        "dms": F.when(
            dm["secondary"] != dm["primary"],
            F.concat(F.lit("dms:"), dm["secondary"], F.lit("|"), year),
        ),
        "ssn": F.when(F.length(ssn_col) == 9, F.concat(F.lit("ssn:"), F.col(ssn_col))),
    }
    for b in range(minhash_bands):
        sig_parts = [_sig_str(sigs[f"c{b * minhash_rows + r}"]) for r in range(minhash_rows)]
        key_cols[f"mh{b}"] = F.when(
            F.length(name_text) > 1, F.concat(F.lit(f"mh{b}:"), F.concat_ws("_", *sig_parts))
        )

    keyed = df.select(F.col(id_col).alias("record_id"), *[v.alias(k) for k, v in key_cols.items()])
    names = list(key_cols)
    stack_expr = f"stack({len(names)}, " + ", ".join(f"{n}" for n in names) + ") AS block_key"
    return keyed.selectExpr("record_id", stack_expr).where(F.col("block_key").isNotNull())


def block_size_stats(blocks: DataFrame) -> DataFrame:
    """Block-size histogram — the skew diagnostic recorded in stage
    metrics (SURVEY.md §7.3)."""
    sizes = blocks.groupBy("block_key").agg(F.count("*").alias("n"))
    return sizes.groupBy().agg(
        F.count("*").alias("n_blocks"),
        F.max("n").alias("max_block"),
        F.expr("percentile_approx(n, 0.5)").alias("p50"),
        F.expr("percentile_approx(n, 0.99)").alias("p99"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("candidate_pairs_upper_bound"),
    )
