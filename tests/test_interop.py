"""Interop: generate_* over the REFERENCE's shipped sample parquet —
the first path a real pseudopeople user exercises (timestamp dates,
shadow copy_*/guardian columns, category-decoded strings; reference
interface.py:223-293)."""

import pytest
from pyspark.sql import functions as F

from pseudopeople_spark import datasets as D
from pseudopeople_spark.api import generate_decennial_census, generate_social_security

SAMPLES = "/root/reference/src/pseudopeople/data/sample_datasets"


def test_generate_census_from_reference_sample(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{SAMPLES}/decennial_census/decennial_census.parquet")
    raw_2020 = raw.where(F.col("year") == 2020)
    out = generate_decennial_census(spark, source=f"{SAMPLES}/decennial_census", seed=5, year=2020)
    out = out.localCheckpoint()

    # schema: exactly the declared census output columns (+ record key)
    assert out.columns == ["record_id"] + D.DECENNIAL_CENSUS.column_names

    # row noise: omission/non-response drop some rows, guardian dup adds a few
    n_raw, n_out = raw_2020.count(), out.count()
    assert 0.90 * n_raw < n_out < 1.02 * n_raw

    # ground-truth columns are NEVER noised: every output simulant_id
    # exists in the raw extract
    raw_sids = raw_2020.select("simulant_id").distinct()
    assert out.join(raw_sids, "simulant_id", "left_anti").count() == 0

    # dates reformatted to zero-padded MM/DD/YYYY strings
    dob = out.where(F.col("date_of_birth").isNotNull()).select("date_of_birth")
    bad = dob.where(~F.col("date_of_birth").rlike(r"^\d{2}/\d{2}/\d{4}$"))
    # swap_month_and_day can produce day>12 in the month slot — still 2/2/4 digits
    assert bad.count() == 0

    # age has no trailing .0
    assert out.where(F.col("age").rlike(r"\.")).count() == 0

    # column noise actually applied: some first names differ from raw
    joined = out.join(
        raw_2020.select("simulant_id", F.col("first_name").alias("raw_first")),
        "simulant_id",
    )
    assert joined.where(
        F.col("first_name").isNotNull() & (F.col("first_name") != F.col("raw_first"))
    ).count() > 0


def test_generate_census_from_sample_is_seed_deterministic(spark):
    a = generate_decennial_census(
        spark, source=f"{SAMPLES}/decennial_census", seed=5, year=2020
    ).localCheckpoint()
    b = generate_decennial_census(
        spark, source=f"{SAMPLES}/decennial_census", seed=5, year=2020
    ).localCheckpoint()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = generate_decennial_census(
        spark, source=f"{SAMPLES}/decennial_census", seed=6, year=2020
    ).localCheckpoint()
    assert c.exceptAll(a).count() > 0


def test_generate_ssa_from_reference_sample(spark):
    out = generate_social_security(spark, source=f"{SAMPLES}/social_security", seed=5, year=2025)
    out = out.localCheckpoint()
    assert out.columns == ["record_id"] + D.SOCIAL_SECURITY.column_names
    # the year filter applies BEFORE noising (write_wrong_digits may
    # later corrupt year digits, like the reference) — check it on the
    # un-noised output
    from pseudopeople_spark.config import NO_NOISE

    clean = generate_social_security(
        spark, source=f"{SAMPLES}/social_security", seed=5, year=2025, config=NO_NOISE
    ).localCheckpoint()
    assert clean.where(F.substring("event_date", 1, 4).cast("int") > 2025).count() == 0
    # yyyyMMdd strings (swap_month_and_day keeps the 8-digit shape)
    assert clean.where(
        F.col("event_date").isNotNull() & ~F.col("event_date").rlike(r"^\d{8}$")
    ).count() == 0
    # SSA ssn is NEVER noised (reference DEFAULT_NOISE_VALUES)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{SAMPLES}/social_security/social_security.parquet")
    raw_ssns = raw.select(F.col("ssn").cast("string").alias("ssn")).distinct()
    assert out.where(F.col("ssn").isNotNull()).join(raw_ssns, "ssn", "left_anti").count() == 0


def test_source_compatibility_validation(spark, tmp_path):
    """Reference-parity source-root validation (reference
    interface.py:validate_source_compatibility:184-213 and its
    test_interface.py failure cases): missing dataset subdir ->
    FileNotFoundError; missing CHANGELOG -> DataSourceError (older
    data); newer / older changelog version -> DataSourceError."""
    from pseudopeople_spark.api import generate_decennial_census
    from pseudopeople_spark.sources.reader import (
        DataSourceError,
        validate_source_compatibility,
    )

    root = tmp_path / "srcroot"
    root.mkdir()

    # no dataset subdirectory at all
    with pytest.raises(FileNotFoundError, match="decennial_census"):
        validate_source_compatibility(str(root), "decennial_census")

    # subdir present, CHANGELOG absent -> "older version" DataSourceError,
    # and the API path raises it before touching parquet
    sub = root / "decennial_census"
    sub.mkdir()
    with pytest.raises(DataSourceError, match="older version"):
        validate_source_compatibility(str(root), "decennial_census")
    with pytest.raises(DataSourceError, match="older version"):
        generate_decennial_census(spark, source=str(root), seed=1, year=2020)

    # newer data version -> upgrade-the-package error
    cl = root / "CHANGELOG.rst"
    cl.write_text("**9.0.0 - 2030-01-01**\n\n - stuff\n")
    with pytest.raises(DataSourceError, match="newer version"):
        validate_source_compatibility(str(root), "decennial_census")

    # older data version -> corrupted / re-download error
    cl.write_text("**0.1.0 - 2020-01-01**\n\n - stuff\n")
    with pytest.raises(DataSourceError, match="corrupted"):
        validate_source_compatibility(str(root), "decennial_census")

    # exactly-compatible version passes and returns the subdir
    cl.write_text("**1.4.2 - 2023-05-24**\n\n - stuff\n")
    assert validate_source_compatibility(str(root), "decennial_census") == str(sub)
