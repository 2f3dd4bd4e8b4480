"""Similarity function tests: Jaro-Winkler matches DuckDB bit-for-bit
(the oracle contract), metaphone blocking properties, n-gram expression."""

import duckdb
import random
import string

from pyspark.sql import functions as F

from pseudopeople_spark.functions.similarity import (
    _double_metaphone_one,
    jaro_winkler,
    jaro_winkler_udf,
    ngrams,
    token_set_ratio_udf,
)


def test_jaro_winkler_matches_duckdb_exactly():
    con = duckdb.connect()
    random.seed(7)
    cases = [("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("", ""), ("", "A"), ("SMITH", "SMYTH")]
    cases += [
        (
            "".join(random.choices(string.ascii_uppercase[:8], k=random.randint(0, 12))),
            "".join(random.choices(string.ascii_uppercase[:8], k=random.randint(0, 12))),
        )
        for _ in range(800)
    ]
    for a, b in cases:
        d = con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert jaro_winkler(a, b) == d, (a, b)


def test_jaro_winkler_udf(spark):
    df = spark.createDataFrame([("MARTHA", "MARHTA"), ("A", None)], ["a", "b"])
    rows = df.select(jaro_winkler_udf("a", "b").alias("s")).collect()
    assert abs(rows[0]["s"] - jaro_winkler("MARTHA", "MARHTA")) < 1e-12
    assert rows[1]["s"] is None


def test_double_metaphone_blocking_properties():
    # phonetically-similar surnames share a primary code
    assert _double_metaphone_one("SMITH")[0] == _double_metaphone_one("SMYTH")[0]
    assert _double_metaphone_one("PHILLIPS")[0] == _double_metaphone_one("FILLIPS")[0]
    assert _double_metaphone_one("CATHERINE")[0] == _double_metaphone_one("KATHERINE")[0]
    # secondary differs from primary where alternate codings exist
    p, s = _double_metaphone_one("SCHMIDT")
    assert p  # non-empty
    assert _double_metaphone_one("")[0] == ""
    assert _double_metaphone_one("123")[0] == ""


def test_ngrams_expression(spark):
    df = spark.createDataFrame([("abcd",)], ["s"])
    row = df.select(ngrams("s", 3).alias("g")).first()
    assert row["g"] == ["abc", "bcd"]
    row2 = df.select(ngrams(F.lit("ab"), 3).alias("g")).first()
    assert row2["g"] == ["ab"]  # shorter than n -> single truncated gram


def test_token_set_ratio(spark):
    df = spark.createDataFrame([("ACME CORP LLC", "CORP ACME"), ("X", "Y")], ["a", "b"])
    rows = df.select(token_set_ratio_udf("a", "b").alias("s")).collect()
    assert abs(rows[0]["s"] - 2 / 3) < 1e-12
    assert rows[1]["s"] == 0.0
