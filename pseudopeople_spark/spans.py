"""Interleaved text+media span document codec.

The engine's storage model (BASELINE.json ``input_hint``) is an
Iceberg/parquet table of interleaved documents:

    (doc_id: string,
     spans: array<struct<kind:string, text:string, media_ref:string, offset:int>>)

Each pseudopeople-style record (one row of a Census / W2 / SSA extract,
cf. ``/root/reference/src/pseudopeople/schema_entities.py:594-811``) is
serialized as an ordered span sequence: one ``text`` span per field
(kind = ``"field:<column>"``), interleaved with opaque media spans
(kind = ``"media"``, ``media_ref`` = a URI, text empty). ``offset`` is
the span's starting character offset in the concatenation of all text
so far, so re-assembly order is recoverable and auditable.

Per-row invariant (BASELINE.json): decode(encode(record)) == record and
span-sequence equality of (kind, text, media_ref, order).

Everything below is pure Spark array/struct expressions — no explode,
no shuffle, no UDF: encode/decode are narrow maps that scale linearly
with input splits at 10^12 documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("media_ref", T.StringType(), True),
            T.StructField("offset", T.IntegerType(), True),
        ]
    )
)

FIELD_KIND_PREFIX = "field:"
MEDIA_KIND = "media"


def _text_span(kind: str, text_col: Column, offset_col: Column) -> Column:
    return F.struct(
        F.lit(kind).alias("kind"),
        text_col.alias("text"),
        F.lit("").alias("media_ref"),
        offset_col.cast("int").alias("offset"),
    )


def _media_span(media_ref_col: Column, offset_col: Column) -> Column:
    return F.struct(
        F.lit(MEDIA_KIND).alias("kind"),
        F.lit("").alias("text"),
        media_ref_col.alias("media_ref"),
        offset_col.cast("int").alias("offset"),
    )


def encode_records(
    df: DataFrame,
    doc_id_col: str,
    field_columns: "list[str]",
    media_every: int = 4,
) -> DataFrame:
    """Serialize flat records to (doc_id, spans).

    * null field values encode as empty text (the reference likewise
      normalizes '' <-> missing, ``interface.py:223-238``).
    * after every ``media_every`` fields a media span is interleaved,
      referencing a deterministic URI derived from (doc_id, position) —
      the opaque-binary stand-in for scanned-form images.
    * offsets are running character offsets of the concatenated text;
      computed at plan-build time as a chain of length() sums (pure
      column arithmetic, single narrow projection).
    """
    spans: list[Column] = []
    offset: Column = F.lit(0)
    for i, c in enumerate(field_columns):
        txt = F.coalesce(F.col(c).cast("string"), F.lit(""))
        spans.append(_text_span(FIELD_KIND_PREFIX + c, txt, offset))
        offset = offset + F.length(txt)
        if media_every and (i + 1) % media_every == 0:
            ref = F.concat(F.lit("media://"), F.col(doc_id_col).cast("string"), F.lit(f"/{i + 1}"))
            spans.append(_media_span(ref, offset))
    return df.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        F.array(*spans).alias("spans"),
    )


def decode_records(df: DataFrame, field_columns: "list[str]") -> DataFrame:
    """Deserialize (doc_id, spans) back to flat records.

    No explode: build a field->text map with pure array functions
    (filter/transform/map_from_entries) and project each declared
    column. Empty text decodes to null (missingness round-trip).
    """
    fields_map = F.map_from_entries(
        F.transform(
            F.filter(F.col("spans"), lambda s: s["kind"].startswith(FIELD_KIND_PREFIX)),
            lambda s: F.struct(s["kind"].substr(F.lit(len(FIELD_KIND_PREFIX) + 1), F.length(s["kind"])), s["text"]),
        )
    )
    out = [F.col("doc_id")]
    for c in field_columns:
        v = fields_map.getItem(c)
        out.append(F.when(v == "", None).otherwise(v).alias(c))
    return df.select(*out)


def span_sequence_signature(spans_col: Column | str = "spans") -> Column:
    """Canonical string signature of a span sequence: order-sensitive
    concatenation of (kind, text, media_ref). Two documents are
    span-sequence equal iff signatures match (the per-row invariant the
    driver/judge checks against the reference ordering)."""
    spans_col = F.col(spans_col) if isinstance(spans_col, str) else spans_col
    return F.sha2(
        F.concat_ws(
            "",
            F.transform(spans_col, lambda s: F.concat_ws("", s["kind"], s["text"], s["media_ref"])),
        ),
        256,
    )
