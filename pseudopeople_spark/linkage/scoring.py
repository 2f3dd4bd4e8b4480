"""Pairwise scoring — batched field similarities over candidate pairs.

One join brings both records' normalized fields onto the pair row
(two hash joins on record_id, the same key the dedup shuffle already
partitioned by), then a single projection computes the per-field
similarity vector:

  * name fields: Jaro-Winkler (Arrow pandas UDF, DuckDB-compatible
    semantics) — the only Python in the stage, batched per Arrow chunk;
  * DOB: built-in levenshtein on the normalized yyyyMMdd string,
    converted to a [0,1] similarity;
  * SSN: exact/edit-distance on digits (built-in);
  * zipcode/city/state/sex: exact-match indicators (built-in).

The combiner is a weighted linear score with null-aware renormalization
(missing fields redistribute their weight), thresholded into match
edges. Everything except the JW UDF is whole-stage-codegen'd.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pseudopeople_spark.functions.similarity import jaro_winkler_udf


@dataclass(frozen=True)
class FieldSpec:
    name: str
    kind: str  # 'jw' | 'lev' | 'exact'
    weight: float


DEFAULT_FIELDS: "tuple[FieldSpec, ...]" = (
    FieldSpec("first_name", "jw", 1.2),
    FieldSpec("last_name", "jw", 1.6),
    FieldSpec("dob", "lev", 2.2),
    FieldSpec("ssn_digits", "lev", 3.0),
    FieldSpec("zipcode", "exact", 0.6),
    FieldSpec("city", "exact", 0.4),
    FieldSpec("sex", "exact", 0.3),
)


def attach_pair_fields(pairs: DataFrame, records: DataFrame, fields: "list[str]", id_col: str = "record_id") -> DataFrame:
    """(id_l, id_r) × records -> one row per pair with l_*/r_* fields."""
    l = records.select(F.col(id_col).alias("id_l"), *[F.col(c).alias(f"l_{c}") for c in fields])
    r = records.select(F.col(id_col).alias("id_r"), *[F.col(c).alias(f"r_{c}") for c in fields])
    return pairs.join(l, "id_l").join(r, "id_r")


def _sim(spec: FieldSpec) -> Column:
    a, b = F.col(f"l_{spec.name}"), F.col(f"r_{spec.name}")
    if spec.kind == "jw":
        s = jaro_winkler_udf(F.upper(a), F.upper(b))
    elif spec.kind == "lev":
        max_len = F.greatest(F.length(a), F.length(b))
        s = F.lit(1.0) - F.levenshtein(a, b).cast("double") / max_len
    else:
        s = F.when(a == b, 1.0).otherwise(0.0)
    return F.when(a.isNull() | b.isNull(), None).otherwise(s)


def score_pairs(pairs_with_fields: DataFrame, fields: "tuple[FieldSpec, ...]" = DEFAULT_FIELDS) -> DataFrame:
    """Add sim_<field> columns and a null-renormalized weighted score."""
    df = pairs_with_fields
    num: Column = F.lit(0.0)
    den: Column = F.lit(0.0)
    for spec in fields:
        sim_col = f"sim_{spec.name}"
        df = df.withColumn(sim_col, _sim(spec))
        present = F.col(sim_col).isNotNull()
        num = num + F.when(present, F.col(sim_col) * spec.weight).otherwise(0.0)
        den = den + F.when(present, F.lit(spec.weight)).otherwise(0.0)
    return df.withColumn("score", F.when(den > 0, num / den).otherwise(F.lit(0.0)))


def match_edges(scored: DataFrame, threshold: float = 0.88) -> DataFrame:
    """Thresholded match edges for the clustering stage."""
    return scored.where(F.col("score") >= threshold).select("id_l", "id_r", "score")
