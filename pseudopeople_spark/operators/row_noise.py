"""Row-noise operators — cardinality-changing transforms
(SURVEY.md §2.B; reference ``src/pseudopeople/noise_functions.py:33-303``).

All row selection is CRN-keyed on the stable record key — NEVER
``df.sample()`` (partition-dependent) — matching the reference's
shard-count-invariance contract
(``tests/integration/test_interface.py:90-153``).
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pseudopeople_spark.crn import hash_u01

U01 = Callable[[Column, int, str], Column]

# Demographic non-response model constants (reference
# constants/data_values.py:8-45): base + race additive + sex×age-bin
# additive, clipped to [0,1]. Ours are behavior-compatible stand-ins
# with the same structure.
DNR_BASE = 0.0024
DNR_RACE_ADJ: "dict[str, float]" = {
    "White": 0.0,
    "Black": 0.0067,
    "Latino": 0.0043,
    "Asian": 0.0022,
    "AIAN": 0.0086,
    "NHOPI": 0.0086,
    "Multiracial or Other": 0.0051,
}
# (sex, age_lo, age_hi_exclusive) -> additive
DNR_SEX_AGE_ADJ: "list[tuple[str, int, int, float]]" = [
    ("Male", 0, 5, 0.0091), ("Male", 5, 10, 0.0049), ("Male", 10, 18, 0.0022),
    ("Male", 18, 30, 0.0152), ("Male", 30, 50, 0.0109), ("Male", 50, 65, 0.0068),
    ("Male", 65, 200, 0.0022), ("Female", 0, 5, 0.0091), ("Female", 5, 10, 0.0049),
    ("Female", 10, 18, 0.0022), ("Female", 18, 30, 0.0109), ("Female", 30, 50, 0.0086),
    ("Female", 50, 65, 0.0049), ("Female", 65, 200, 0.0022),
]
DNR_DEFAULT_LEVEL = 0.0145


def omit_rows(
    df: DataFrame, key_col: str, p: float = 0.005, seed: int = 0, u01: U01 = hash_u01
) -> DataFrame:
    """Uniform random row deletion (reference ``omit_rows``,
    noise_functions.py:33-59). Key-deterministic hash filter — a single
    columnar pass, no shuffle."""
    return df.where(u01(F.col(key_col), seed, "omit_row") >= p)


def do_not_respond(
    df: DataFrame,
    key_col: str,
    configured_level: float = DNR_DEFAULT_LEVEL,
    seed: int = 0,
    sex_col: str = "sex",
    age_col: str = "age",
    race_col: str = "race_ethnicity",
    oversample_adjust: bool = False,
    u01: U01 = hash_u01,
) -> DataFrame:
    """Demographic non-response (reference ``apply_do_not_respond``,
    noise_functions.py:99-142): per-row probability = clip(base +
    race additive + sex×age-bin additive), scaled by
    configured/default; ACS/CPS oversampling transform 0.5 + p/2.
    Realized as nested ``when`` chains over the tiny lookup tables —
    pure JVM expressions, no join needed (the reference's pd.cut
    age-binning collapses to a CASE chain)."""
    race_expr: Column = F.lit(0.0)
    for race, adj in DNR_RACE_ADJ.items():
        race_expr = F.when(F.col(race_col) == race, F.lit(adj)).otherwise(race_expr)
    sexage_expr: Column = F.lit(0.0)
    age = F.col(age_col).cast("bigint")
    for sex, lo, hi, adj in DNR_SEX_AGE_ADJ:
        sexage_expr = F.when(
            (F.col(sex_col) == sex) & (age >= lo) & (age < hi), F.lit(adj)
        ).otherwise(sexage_expr)
    p = F.least(F.greatest(F.lit(DNR_BASE) + race_expr + sexage_expr, F.lit(0.0)), F.lit(1.0))
    p = p * F.lit(configured_level / DNR_DEFAULT_LEVEL)
    if oversample_adjust:
        p = F.lit(0.5) + p / 2
    p = F.least(p, F.lit(1.0))
    return df.where(u01(F.col(key_col), seed, "do_not_respond") >= p)


def duplicate_rows(
    df: DataFrame, key_col: str, p: float = 0.05, seed: int = 0, u01: U01 = hash_u01
) -> DataFrame:
    """Uniform row duplication — the reference's commented-out stub
    (noise_functions.py:145-158, 'todo actually duplicate rows'),
    implemented for parity behind this explicit call."""
    dupes = df.where(u01(F.col(key_col), seed, "duplicate_row") < p)
    return df.unionByName(dupes)


def duplicate_with_guardian(
    df: DataFrame,
    key_col: str,
    address_columns: Sequence[str],
    p_under_18: float = 0.02,
    p_college: float = 0.05,
    seed: int = 0,
    guardian_cols: "tuple[str, str]" = ("guardian_1", "guardian_2"),
    simulant_col: str = "simulant_id",
    age_col: str = "age",
    housing_col: str = "housing_type",
    relationship_col: str = "relationship_to_reference_person",
    u01: U01 = hash_u01,
    guardians_unique: bool = True,
) -> DataFrame:
    """Duplicate dependents at their guardian's address (reference
    ``duplicate_with_guardian``, noise_functions.py:161-303; address
    column list constants/noise_type_metadata.py:4-14).

    Eligible: age<18 in standard housing (p_under_18) or age<24 in
    college group quarters (p_college), with at least one guardian at a
    DIFFERENT address. The duplicate row takes the guardian's address
    block; at most one duplicate per row; duplicates are appended.

    Plan shape: filter → seeded guardian choice → ONE left equi-join
    against the guardian address projection (broadcast when small,
    sort-merge otherwise — the reference's only join, SURVEY.md §2.A)
    → unionByName. Join key is (guardian simulant_id), so AQE handles
    skew; no driver-side loops."""
    g1, g2 = guardian_cols
    age = F.col(age_col).cast("bigint")
    in_college = F.col(housing_col) == "College" if housing_col in df.columns else F.lit(False)
    eligible = (age < 18) & ~in_college
    eligible_col = (age < 24) & in_college
    p_row = F.when(eligible_col, F.lit(p_college)).when(eligible, F.lit(p_under_18)).otherwise(F.lit(0.0))
    selected = df.where(u01(F.col(key_col), seed, "duplicate_with_guardian") < p_row)

    # choose among available guardians with one CRN draw
    u_g = u01(F.col(key_col), seed, "dwg_guardian_choice")
    chosen = F.when(
        F.col(g1).isNotNull() & F.col(g2).isNotNull(), F.when(u_g < 0.5, F.col(g1)).otherwise(F.col(g2))
    ).otherwise(F.coalesce(F.col(g1), F.col(g2)))
    selected = selected.withColumn("_chosen_guardian", chosen).where(F.col("_chosen_guardian").isNotNull())

    guardians = df.select(
        F.col(simulant_col).alias("_g_sid"),
        *[F.col(c).alias(f"_g_{c}") for c in address_columns],
    )
    if not guardians_unique:
        # only shuffle for dedup when the extract may repeat a simulant
        guardians = guardians.dropDuplicates(["_g_sid"])

    # The selected side is p% of dependents — small relative to the
    # guardian projection; AQE turns this into a broadcast join at any
    # realistic p, and a shuffled hash join otherwise.
    joined = selected.join(guardians, selected["_chosen_guardian"] == guardians["_g_sid"], "inner")
    # keep only duplicates whose guardian lives at a different address
    diff_addr = None
    for c in address_columns:
        neq = ~F.col(c).eqNullSafe(F.col(f"_g_{c}"))
        diff_addr = neq if diff_addr is None else (diff_addr | neq)
    joined = joined.where(diff_addr)

    dup_cols = []
    for c in df.columns:
        if c in address_columns:
            dup_cols.append(F.col(f"_g_{c}").alias(c))
        elif c == relationship_col and relationship_col in df.columns:
            dup_cols.append(F.lit("Other relative").alias(c))
        elif c == key_col:
            dup_cols.append(F.concat(F.col(key_col).cast("string"), F.lit("_dup")).alias(c))
        else:
            dup_cols.append(F.col(c))
    duplicates = joined.select(*dup_cols)
    return df.unionByName(duplicates)
