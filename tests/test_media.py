"""Multimodal media-operator tests: span extraction, payload fetch
batching, decode/resize/frame-sample plumbing (the pixel codec is the
documented deterministic PPSF stand-in; see functions/media.py)."""

import pytest
from pyspark.sql import functions as F

from pseudopeople_spark.functions import media as M
from pseudopeople_spark.spans import encode_records

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media_df(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").limit(50).select(
        "doc_id", "lang", "source", F.substring("text", 1, 100).alias("t"), 
    )
    docs = encode_records(d, "doc_id", ["lang", "source", "t"], media_every=2)
    return M.media_spans(docs)


def test_media_spans_shape(media_df):
    rows = media_df.collect()
    assert len(rows) == 50  # 3 fields, media_every=2 -> 1 media span/doc
    assert all(r["media_ref"].startswith("media://") for r in rows)


def test_attach_payload_and_decode(media_df):
    with_payload = M.attach_media_payload(media_df)
    meta = with_payload.withColumn("meta", M.decode_media_meta("payload"))
    rows = meta.select("media_ref", "payload", "meta.*").collect()
    assert all(bytes(r["payload"][:4]) == b"PPSF" for r in rows)
    assert all(r["kind"] in ("image", "audio", "video") for r in rows)
    assert all(64 <= r["width"] <= 2048 and 64 <= r["height"] <= 2048 for r in rows)
    # deterministic across partitionings (the fetch is ref-keyed)
    rows2 = {
        r["media_ref"]: bytes(r["payload"])
        for r in M.attach_media_payload(media_df.repartition(7)).collect()
    }
    assert all(bytes(r["payload"]) == rows2[r["media_ref"]] for r in rows)


def test_resize_and_frame_sample(media_df):
    with_payload = M.attach_media_payload(media_df)
    resized = with_payload.withColumn("small", M.make_resize_udf(64, 64)("payload"))
    m = resized.select(M.decode_media_meta("small").alias("meta")).select("meta.*")
    assert m.where((F.col("width") != 64) | (F.col("height") != 64)).count() == 0

    frames = with_payload.withColumn("frames", M.make_frame_sample_udf(every_n=30)("payload"))
    got = frames.select(
        M.decode_media_meta("payload").alias("meta"), F.size("frames").alias("nf")
    ).select("meta.n_frames", "nf").collect()
    for r in got:
        assert r["nf"] == (r["n_frames"] + 29) // 30


def test_non_ppsf_payload_raises_without_pil(spark):
    if M._pil() is not None:
        pytest.skip("Pillow installed: non-PPSF payloads take the real decode path")
    df = spark.createDataFrame([(bytearray(b"JPEGnotreally"),)], "payload binary")
    with pytest.raises(Exception, match="NotImplementedError|PPSF|decode"):
        df.select(M.decode_media_meta("payload")).collect()


def test_real_image_decode_with_pil(spark):
    """Optional-dependency real decode: with Pillow installed a genuine
    PNG payload decodes (width/height from the actual pixels) and
    resizes through the SAME UDFs the PPSF stand-in drives; without it,
    skip-with-reason (the gate is `media._pil()`)."""
    Image = M._pil()
    if Image is None:
        pytest.skip("Pillow not installed in this environment (documented gate)")
    import io

    buf = io.BytesIO()
    Image.new("RGB", (20, 10)).save(buf, format="PNG")
    df = spark.createDataFrame([(bytearray(buf.getvalue()),)], "payload binary")
    meta = df.select(M.decode_media_meta("payload").alias("m")).select("m.*").collect()[0]
    assert (meta["kind"], meta["width"], meta["height"], meta["n_frames"]) == ("image", 20, 10, 1)
    small = df.select(M.make_resize_udf(8, 8)("payload").alias("p")).collect()[0]["p"]
    with Image.open(io.BytesIO(bytes(small))) as im:
        assert im.size == (8, 8)
