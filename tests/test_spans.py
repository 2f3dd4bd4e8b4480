"""Span codec invariants (BASELINE.json input_hint): decode(encode(x))
== x, span-sequence equality (kind, text, media_ref, order), offsets
are running character offsets, media spans interleave deterministically."""

from pyspark.sql import functions as F

from pseudopeople_spark import synth
from pseudopeople_spark.spans import SPAN_SCHEMA, decode_records, encode_records, span_sequence_signature

FIELDS = ["first_name", "last_name", "age", "date_of_birth", "city"]


def _records(spark, n=300):
    pop = synth.simulants(spark, n, seed=11)
    return synth.census_records(pop, 2020).select("record_id", *FIELDS)


def test_roundtrip_identity(spark):
    rec = _records(spark)
    enc = encode_records(rec, "record_id", FIELDS)
    # same shape modulo nullability (literals produce non-nullable fields)
    assert enc.schema["spans"].dataType.simpleString() == SPAN_SCHEMA.simpleString()
    dec = decode_records(enc, FIELDS)
    orig = rec.select(F.col("record_id").cast("string").alias("doc_id"), *FIELDS)
    assert orig.exceptAll(dec).count() == 0
    assert dec.exceptAll(orig).count() == 0


def test_roundtrip_preserves_nulls(spark):
    rec = _records(spark).withColumn("city", F.lit(None).cast("string"))
    dec = decode_records(encode_records(rec, "record_id", FIELDS), FIELDS)
    assert dec.where(F.col("city").isNotNull()).count() == 0


def test_offsets_are_running_character_offsets(spark):
    enc = encode_records(_records(spark, 50), "record_id", FIELDS, media_every=2)
    rows = enc.select("spans").collect()
    for row in rows:
        expect = 0
        for s in row["spans"]:
            assert s["offset"] == expect, f"span {s} expected offset {expect}"
            expect += len(s["text"])


def test_media_spans_interleaved(spark):
    enc = encode_records(_records(spark, 20), "record_id", FIELDS, media_every=2)
    row = enc.select("spans").first()["spans"]
    kinds = [s["kind"] for s in row]
    assert kinds.count("media") == 2  # 5 fields, media after every 2
    media = [s for s in row if s["kind"] == "media"]
    assert all(s["media_ref"].startswith("media://") and s["text"] == "" for s in media)


def test_span_sequence_signature_order_sensitive(spark):
    enc = encode_records(_records(spark, 20), "record_id", FIELDS)
    sig = enc.select(span_sequence_signature().alias("sig"))
    n_distinct = sig.distinct().count()
    assert n_distinct == 20  # distinct records -> distinct signatures
    # reversing the span order must change the signature
    rev = enc.select(F.reverse("spans").alias("spans"))
    joined = (
        enc.select(span_sequence_signature().alias("a"))
        .crossJoin(rev.select(span_sequence_signature().alias("b")).limit(1))
        .where(F.col("a") == F.col("b"))
    )
    assert joined.count() == 0
