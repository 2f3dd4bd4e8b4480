"""Per-operator column-noise tests, modeled on the reference's
tests/unit/test_column_noise.py strategy (SURVEY.md §5.2): noise level
matches config, non-selected cells untouched, missing cells never
selected, seed sensitivity."""

import pytest
from pyspark.sql import functions as F

from pseudopeople_spark.operators import column_noise as cn
from tests.conftest import assert_proportion

N = 20_000


def _base(spark):
    return spark.range(N).select(
        F.col("id").alias("key"),
        F.when(F.pmod("id", F.lit(10)) == 0, None)  # 10% planted missing
        .otherwise(F.concat(F.lit("val"), F.col("id").cast("string")))
        .alias("v"),
        F.format_string("%05d", F.pmod(F.col("id") * 7919, F.lit(99999))).alias("zip"),
        (F.pmod("id", F.lit(90)) + 1).cast("string").alias("age"),
        F.lit("03/15/1984").alias("date"),
        F.format_string("%09d", F.col("id")).alias("digits"),
        F.when(F.pmod("id", F.lit(2)) == 0, "OptA").otherwise("OptB").alias("opt"),
        F.concat(F.lit("copy"), F.col("id").cast("string")).alias("copy_v"),
    )


def test_leave_blank_level_and_untouched(spark):
    df = _base(spark)
    out = cn.leave_blank(df, "v", "key", p=0.05, seed=3)
    blanked = out.where(F.col("v").isNull()).count() - N // 10
    assert_proportion(blanked, N - N // 10, 0.05, "leave_blank")
    # non-selected cells bit-identical
    joined = df.alias("a").join(out.alias("b"), "key").where(
        F.col("b.v").isNotNull() & (F.col("a.v") != F.col("b.v"))
    )
    assert joined.count() == 0


def test_missing_cells_never_selected(spark):
    df = _base(spark)
    out = cn.choose_wrong_option(df, "v", "key", options=["x", "y"], p=0.5, seed=1)
    # originally-missing rows stay missing
    assert out.where((F.pmod("key", F.lit(10)) == 0) & F.col("v").isNotNull()).count() == 0


def test_choose_wrong_option_level(spark):
    df = _base(spark)
    out = cn.choose_wrong_option(df, "opt", "key", options=["OptA", "OptB", "OptC", "OptD"], p=0.2, seed=5)
    changed = df.alias("a").join(out.alias("b"), "key").where(F.col("a.opt") != F.col("b.opt")).count()
    assert_proportion(changed, N, 0.2, "choose_wrong_option observed change rate")
    # all outputs legal options
    assert out.where(~F.col("opt").isin("OptA", "OptB", "OptC", "OptD")).count() == 0


def test_copy_from_household_member(spark):
    df = _base(spark)
    out = cn.copy_from_household_member(df, "v", "key", "copy_v", p=0.3, seed=2)
    copied = out.where(F.col("v").startswith("copy")).count()
    assert_proportion(copied, N - N // 10, 0.3, "copy_from_household_member")


def test_swap_month_and_day_formats(spark):
    df = _base(spark)
    out = cn.swap_month_and_day(df, "date", "key", date_format="MM/dd/yyyy", p=1.0, seed=4)
    assert out.select("date").distinct().collect()[0]["date"] == "15/03/1984"
    df2 = df.withColumn("date", F.lit("19840315"))
    out2 = cn.swap_month_and_day(df2, "date", "key", date_format="yyyyMMdd", p=1.0, seed=4)
    assert out2.select("date").distinct().collect()[0]["date"] == "19841503"
    df3 = df.withColumn("date", F.lit("03151984"))
    out3 = cn.swap_month_and_day(df3, "date", "key", date_format="MMddyyyy", p=1.0, seed=4)
    assert out3.select("date").distinct().collect()[0]["date"] == "15031984"


def test_write_wrong_zipcode_digits(spark):
    df = _base(spark)
    out = cn.write_wrong_zipcode_digits(df, "zip", "key", p=1.0, seed=6)
    # output stays 5 digits
    assert out.where(~F.col("zip").rlike("^[0-9]{5}$")).count() == 0
    # per-position change rates ~ digit_probabilities (0.04,0.04,0.2,0.36,0.36)
    j = df.alias("a").join(out.alias("b"), "key")
    for i, p_i in enumerate([0.04, 0.04, 0.2, 0.36, 0.36]):
        changed = j.where(F.substring("a.zip", i + 1, 1) != F.substring("b.zip", i + 1, 1)).count()
        assert_proportion(changed, N, p_i, f"zip digit {i}")


def test_misreport_age(spark):
    df = _base(spark)
    out = cn.misreport_age(df, "age", "key", p=1.0, seed=7)
    j = df.alias("a").join(out.alias("b"), "key").select(
        F.col("a.age").cast("int").alias("old"), F.col("b.age").cast("int").alias("new")
    )
    deltas = {r["d"]: r["c"] for r in j.groupBy((F.col("new") - F.col("old")).alias("d")).agg(F.count("*").alias("c")).collect()}
    # perturbations in {-2,-1,+1,+2}; reflection/collision may add -3 (age 1 -> -1 -> 1 -> 0? no: 1-2=-1 ->abs 1 ==orig -> 0) and small ages
    assert set(deltas) <= {-3, -2, -1, 1, 2, 3}
    assert_proportion(deltas.get(1, 0), N, 0.4, "age +1", slack_sigmas=6)
    assert_proportion(deltas.get(-1, 0) + deltas.get(-3, 0), N, 0.4, "age -1", slack_sigmas=6)
    assert 0 not in deltas, "age never unchanged when selected"


def test_write_wrong_digits(spark):
    df = _base(spark)
    out = cn.write_wrong_digits(df, "digits", "key", p=1.0, token_probability=0.3, seed=8)
    assert out.where(F.length("digits") != 9).count() == 0
    j = df.alias("a").join(out.alias("b"), "key")
    changed_chars = j.select(
        F.sum(
            sum(
                (F.substring("a.digits", i + 1, 1) != F.substring("b.digits", i + 1, 1)).cast("int")
                for i in range(9)
            )
        ).alias("c")
    ).collect()[0]["c"]
    # each digit replaced w.p. (0.3/0.9) * (9/10 actually-different) = 0.3
    assert_proportion(changed_chars, N * 9, 0.3, "write_wrong_digits per-char", slack_sigmas=6)


def test_use_nickname_and_fake_name(spark):
    df = _base(spark).withColumn("first", F.lit("Robert"))
    out = cn.use_nickname(df, "first", "key", {"Robert": ["Bob", "Rob"]}, p=0.4, seed=9)
    dist = {r["first"]: r["c"] for r in out.groupBy("first").agg(F.count("*").alias("c")).collect()}
    assert set(dist) == {"Robert", "Bob", "Rob"}
    assert_proportion(dist["Bob"] + dist["Rob"], N, 0.4, "use_nickname level")

    out2 = cn.use_fake_name(df, "first", "key", ["Girl", "Boy"], p=0.2, seed=10)
    fake = out2.where(F.col("first").isin("Girl", "Boy")).count()
    assert_proportion(fake, N, 0.2, "use_fake_name level")


def test_seed_sensitivity(spark):
    df = _base(spark)
    a = cn.leave_blank(df, "v", "key", p=0.1, seed=1).where(F.col("v").isNull()).count()
    a2 = cn.leave_blank(df, "v", "key", p=0.1, seed=1).where(F.col("v").isNull()).count()
    b_rows = {
        r["key"]
        for r in cn.leave_blank(df, "v", "key", p=0.1, seed=2).where(F.col("v").isNull()).collect()
    }
    a_rows = {
        r["key"]
        for r in cn.leave_blank(df, "v", "key", p=0.1, seed=1).where(F.col("v").isNull()).collect()
    }
    assert a == a2, "same seed must reproduce identical output"
    assert a_rows != b_rows, "different seeds must select different cells"


def test_partitioning_invariance(spark):
    """The reference's hardest contract: output independent of shard
    count (its test_generate_dataset_from_multiple_shards)."""
    df = _base(spark)
    out1 = sorted(
        r["key"] for r in cn.leave_blank(df.repartition(2), "v", "key", p=0.1, seed=3).where(F.col("v").isNull()).collect()
    )
    out2 = sorted(
        r["key"] for r in cn.leave_blank(df.repartition(23), "v", "key", p=0.1, seed=3).where(F.col("v").isNull()).collect()
    )
    assert out1 == out2


def test_full_fidelity_assets_loaded():
    """The shipped data tables are at reference scale (VERDICT.md
    missing #1): 1,080 nicknames, 297 phonetic rule groups (356 raw
    rules), 39 OCR groups (49 raw), full QWERTY adjacency, NORC fake
    names, 7 option columns."""
    from pseudopeople_spark.operators import assets

    assert len(assets.NICKNAMES) == 1080
    assert max(len(v) for v in assets.NICKNAMES.values()) <= 15
    assert len(assets.PHONETIC_VARIANTS) == 297
    assert assets.PHONETIC_VARIANTS["h"] == ("",)  # ALL,h,@ deletion rule
    assert len(assets.OCR_ERRORS) == 39
    assert "S" in assets.OCR_ERRORS["5"]
    assert set("was") == set(assets.QWERTY_NEIGHBORS["q"])
    assert len(assets.FAKE_FIRST_NAMES) == 90 and len(assets.FAKE_LAST_NAMES) == 87
    assert len(assets.SELECT_OPTIONS["state"]) == 51
    assert len(assets.SELECT_OPTIONS["relationship_to_reference_person"]) == 19


def test_use_nickname_overall_rate_matches_scaling(spark):
    """Eligibility scaling (noise_scaling.py:26-34): the observed change
    rate over ALL cells ~= p even though only names with nicknames can
    change."""
    from pseudopeople_spark import synth
    from pseudopeople_spark.operators import assets
    from pseudopeople_spark.operators.column_noise import use_nickname
    from tests.conftest import assert_proportion

    pop = synth.simulants(spark, 30_000, seed=11).select(
        F.col("simulant_id").alias("record_id"), F.col("first_name")
    )
    p = 0.05
    out = use_nickname(pop, "first_name", "record_id", assets.NICKNAMES, p=p, seed=3)
    changed = (
        out.withColumnRenamed("first_name", "noised")
        .join(pop, "record_id")
        .where(F.col("noised") != F.col("first_name"))
        .count()
    )
    n = pop.count()
    # a nickname can collide with the original name; allow small shortfall
    assert_proportion(changed, n, p, "use_nickname overall rate", slack_sigmas=8)
