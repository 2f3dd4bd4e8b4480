"""Dedup + ANN operator tests: SimHash properties, IVF recall vs the
brute-force baseline, streaming noising."""

from pyspark.sql import functions as F

from pseudopeople_spark.functions.ann import ivf_topk
from pseudopeople_spark.functions.textdedup import simhash64_udf, simhash_near_dups

SF = "/root/testdata/sf0.001"


def test_simhash_identical_and_near_texts(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # identical
            (3, "the quick brown fox jumps over the lazy cat"),  # near
            (4, "completely different words entirely unrelated totally"),
        ],
        ["doc_id", "text"],
    )
    sigs = {r["doc_id"]: r["s"] for r in df.select("doc_id", simhash64_udf("text").alias("s")).collect()}
    assert sigs[1] == sigs[2]
    ham = lambda a, b: bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1")
    assert ham(1, 3) < ham(1, 4)

    pairs = simhash_near_dups(df, max_hamming=10)
    got = {(r["id_l"], r["id_r"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 4) not in got


def test_ivf_topk_recall_vs_brute_force(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 5)
    ivf = ivf_topk(e, q, k=10, n_buckets=8, nprobe=8)  # nprobe = all buckets -> exact
    got = {(r["qid"], r["cid"]) for r in ivf.collect()}
    # brute force reference
    import __spark_entry__ as E

    exact = {(r["qid"], r["cid"]) for r in E.queries()["ann_cosine_topk"](spark, SF).collect()}
    # probing every bucket must reproduce the exact top-k (modulo ties
    # at the rounded-sim boundary)
    overlap = len(got & exact) / len(exact)
    assert overlap >= 0.9, overlap

    # partial probe keeps good recall at a fraction of the candidates
    ivf2 = ivf_topk(e, q, k=10, n_buckets=8, nprobe=3)
    got2 = {(r["qid"], r["cid"]) for r in ivf2.collect()}
    assert len(got2 & exact) / len(exact) >= 0.6


def test_streaming_noise_matches_batch(spark, tmp_path):
    """The stateless noise plan yields IDENTICAL output on a stream and
    a batch of the same records (determinism carries across execution
    modes)."""
    from pseudopeople_spark import config, datasets as D, noise, synth
    from pseudopeople_spark.streaming.stream_noise import noise_stream

    pop = synth.simulants(spark, 300, seed=4)
    census = synth.census_records(pop, 2020)
    src = str(tmp_path / "src")
    census.write.mode("overwrite").parquet(src)
    cfg = config.get_config()

    stream = noise_stream(spark, src, D.DECENNIAL_CENSUS, cfg, seed=6)
    out = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(out)

    batch_cfg = {**cfg}
    # streams can't host the eligibility-scaling aggregate -> compare
    # against the batch plan under the same streaming semantics
    batch = noise.noise_dataset(
        spark.read.parquet(src), D.DECENNIAL_CENSUS, batch_cfg, seed=6, scale_by_eligibility=False
    )
    # guardian duplication is excluded on the stream; exclude from batch compare
    batch = batch.where(~F.col("record_id").endswith("_dup"))
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_simhash_banding_recall_guarantee(spark):
    """Pigeonhole completeness: with uncapped buckets, EVERY pair within
    max_hamming must be found — verified against a brute-force cross
    join of the signatures (the round-1 fixed-4-band version lost pairs
    at Hamming 4-6)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.substring("text", 1, 120).alias("text")
    ).limit(200)
    for h in (3, 6):
        pairs = simhash_near_dups(docs, max_hamming=h, max_bucket_size=None)
        got = {(r["id_l"], r["id_r"]) for r in pairs.collect()}
        sigs = docs.select("doc_id", simhash64_udf("text").alias("s"))
        l, r = sigs.alias("l"), sigs.alias("r")
        brute = (
            l.crossJoin(r)
            .where(F.col("l.doc_id") < F.col("r.doc_id"))
            .where(F.bit_count(F.col("l.s").bitwiseXOR(F.col("r.s"))) <= h)
            .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        )
        want = {(r["a"], r["b"]) for r in brute.collect()}
        assert got == want, f"h={h}: missed {len(want - got)}, extra {len(got - want)}"


def test_simhash_bucket_cap_linearizes_hot_buckets(spark):
    """A degenerate corpus (every doc identical -> one band bucket)
    must produce O(n * window) pairs under the cap, not n^2/2."""
    n = 400
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("same same same text").alias("text")
    )
    capped = simhash_near_dups(docs, max_hamming=3, max_bucket_size=50).count()
    assert capped <= n * 3 * 4  # <= window(3) x bands(4) per doc
    uncapped = simhash_near_dups(docs, max_hamming=3, max_bucket_size=None).count()
    assert uncapped == n * (n - 1) // 2


def test_simhash_max_hamming_zero_exact_dupes(spark):
    """max_hamming=0 (bands=1, band width 64) is the exact-signature
    dedup degenerate case — the band key is the full signature and must
    not overflow a long literal (1 << 64)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "totally different text here")],
        "doc_id long, text string",
    )
    pairs = simhash_near_dups(docs, max_hamming=0, max_bucket_size=None).collect()
    assert {(r["id_l"], r["id_r"]) for r in pairs} == {(1, 2)}
    assert all(r["hamming"] == 0 for r in pairs)


def test_dedup_char_jaccard_block_cap(spark, tmp_path):
    """One oversized (lang, length-bucket) block must yield linear
    sweep pairs, never the quadratic join (the 100 TB straggler
    guard)."""
    import __spark_entry__ as E

    n = 400
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("aaaa bbbb cccc dddd").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.lit(19).cast("int").alias("n_chars"),
    )
    sf = str(tmp_path / "sf")
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = E.queries()["dedup_char_jaccard"](spark, sf)
    cnt = out.count()
    assert 0 < cnt <= n * 8, f"expected <= n*sweep_window pairs, got {cnt}"


def test_ivf_centroids_partition_invariant(spark):
    """Deterministic (hash-sampled, id-ordered) training: identical
    centroids at 2 vs 29 partitions — the fix for the round-1
    nondeterministic limit() sample."""
    import numpy as np

    from pseudopeople_spark.functions.ann import train_ivf_centroids

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    c1 = train_ivf_centroids(e.repartition(2), k=8, sample_limit=300, seed=7)
    c2 = train_ivf_centroids(e.repartition(29), k=8, sample_limit=300, seed=7)
    assert np.array_equal(c1, c2)


def test_streaming_stateful_dedup_first_seen(spark, tmp_path):
    """applyInPandasWithState exact dedup: the first record per key is
    emitted ONCE across micro-batches (state persists between
    triggers); later duplicates — same batch or later batches — are
    dropped; ties inside the first batch break on order_col."""
    import pyspark.sql.types as T

    from pseudopeople_spark.streaming.stateful import dedup_stream_first_seen

    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("payload", T.StringType()),
    ])
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    import os

    os.makedirs(src)

    def feed(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    # batch 1: key a twice (seq 2 then 1 -> seq 1 wins), key b once
    feed([("a", 2, "a2"), ("a", 1, "a1"), ("b", 7, "b7")], "b1")
    stream = spark.readStream.schema(schema).parquet(src)
    dd = dedup_stream_first_seen(stream, ["k"], "seq")
    q = (
        dd.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got1 = {(r["k"], r["seq"]) for r in spark.read.parquet(out).collect()}
    assert got1 == {("a", 1), ("b", 7)}

    # batch 2: duplicate of a (must be dropped — state crossed the
    # trigger boundary via the checkpoint) + new key c
    feed([("a", 0, "late-dup"), ("c", 3, "c3")], "b2")
    q = (
        dedup_stream_first_seen(
            spark.readStream.schema(schema).parquet(src), ["k"], "seq"
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got2 = {(r["k"], r["seq"]) for r in spark.read.parquet(out).collect()}
    assert got2 == {("a", 1), ("b", 7), ("c", 3)}


def test_simhash_first_band_only_equals_distinct(spark):
    """The Spark runtime path's first-band-only banding (which deletes
    the cross-band DISTINCT exchange) must emit exactly the DISTINCT
    formulation's pair set — same ids, same hamming."""
    from pseudopeople_spark.functions import portable as PT

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {'epsilon' if i % 7 else 'zeta'} tok{i % 3}") for i in range(300)],
        ["doc_id", "text"],
    ).repartition(4)
    docs.createOrReplaceTempView("documents")
    sigs = spark.sql(PT.simhash_sigs_relation_sql(PT.SPARK)).localCheckpoint()
    sigs.createOrReplaceTempView("_sigs_fbo_test")
    a = spark.sql(
        PT.simhash_pairs_from_sigs_sql(PT.SPARK, "_sigs_fbo_test", max_hamming=3)
    ).collect()
    b = spark.sql(
        PT.simhash_pairs_from_sigs_sql(PT.SPARK, "_sigs_fbo_test", max_hamming=3, first_band_only=True)
    ).collect()
    ka = sorted((r["id_l"], r["id_r"], r["hamming"]) for r in a)
    kb = sorted((r["id_l"], r["id_r"], r["hamming"]) for r in b)
    assert ka == kb and len(ka) > 0
