"""Incremental streaming linkage (streaming/stateful.py::link_stream_incremental).

Spec under test: the emitted pair set equals the batch self-join
"same block AND seq_l < seq_r AND score >= threshold" regardless of
how the stream is chopped into micro-batches, with scores bit-equal
to the batch sim engine's; the per-block state ring forgets records
past max_state_per_block arrivals.
"""

import os

import pytest
from pyspark.sql import types as T

from pseudopeople_spark.functions import similarity as S
from pseudopeople_spark.linkage.scoring import FieldSpec
from pseudopeople_spark.streaming.stateful import link_stream_incremental

SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.LongType()),
        T.StructField("blk", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)

B1 = [(1, "A", "martha", 1), (2, "A", "marhta", 2), (3, "B", "xavier", 3)]
B2 = [(4, "A", "martha", 4), (5, "B", "xavir", 5), (6, "B", None, 6)]
B3 = [(7, "A", "martha", 7)]


def _expected(rows, threshold, cap=None):
    """The batch-equivalent truth, from the same public JW kernel."""
    out = set()
    seen = {}
    for rid, blk, name, _seq in sorted(rows, key=lambda r: r[3]):
        members = seen.setdefault(blk, [])
        for mid, mname in members:
            if name is None or mname is None:
                continue
            if S.jaro_winkler(mname.upper(), name.upper()) >= threshold:
                out.add((mid, rid))
        members.append((rid, name))
        if cap is not None and len(members) > cap:
            del members[: len(members) - cap]
    return out


def _run_stream(spark, tmp_path, batches, tag, **kw):
    src = str(tmp_path / f"src_{tag}")
    out = str(tmp_path / f"out_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    os.makedirs(src)
    fields = [FieldSpec("name", "jw", 1.0)]
    for rows in batches:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            link_stream_incremental(
                stream, "blk", "seq", fields, id_col="record_id", **kw
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    return spark.read.parquet(out)


def test_stream_link_matches_batch_truth_across_triggers(spark, tmp_path):
    got = _run_stream(spark, tmp_path, [B1, B2], "a", threshold=0.9)
    pairs = {(r["id_l"], r["id_r"]) for r in got.collect()}
    assert pairs == _expected(B1 + B2, 0.9)
    # scores are the sim engine's (here a single jw spec): bit-equal
    # to the public kernel over the uppercased pair
    by_pair = {(r["id_l"], r["id_r"]): r["score"] for r in got.collect()}
    assert by_pair[(1, 2)] == S.jaro_winkler("MARTHA", "MARHTA")
    assert by_pair[(1, 4)] == 1.0


def test_stream_link_single_trigger_equals_split_triggers(spark, tmp_path):
    one = _run_stream(spark, tmp_path, [B1 + B2], "b", threshold=0.9)
    split = _run_stream(spark, tmp_path, [B1, B2], "c", threshold=0.9)
    key = lambda r: (r["id_l"], r["id_r"], r["score"])
    assert sorted(map(key, one.collect())) == sorted(map(key, split.collect()))


def test_stream_link_state_ring_forgets_past_cap(spark, tmp_path):
    got = _run_stream(
        spark, tmp_path, [B1, B2, B3], "d", threshold=0.9, max_state_per_block=2
    )
    rows = got.collect()
    pairs = {(r["id_l"], r["id_r"]) for r in rows}
    assert pairs == _expected(B1 + B2 + B3, 0.9, cap=2)
    # record 1 aged out of block A's 2-slot ring before 7 arrived
    assert (1, 7) not in pairs and (4, 7) in pairs
    # eviction observability: every pair is stamped with the block's
    # cumulative eviction count at scoring time — (1,2) scored before
    # any eviction; by the time 7 arrived, block A had evicted record 1
    evs = {(r["id_l"], r["id_r"]): r["block_evictions"] for r in rows}
    assert evs[(1, 2)] == 0
    assert evs[(4, 7)] == 1


def test_stream_link_no_cap_reports_zero_evictions(spark, tmp_path):
    got = _run_stream(spark, tmp_path, [B1, B2], "g", threshold=0.9)
    assert all(r["block_evictions"] == 0 for r in got.collect())


def test_stream_link_null_field_never_matches(spark, tmp_path):
    got = _run_stream(spark, tmp_path, [B1 + B2], "e", threshold=0.0)
    pairs = {(r["id_l"], r["id_r"]) for r in got.collect()}
    # threshold 0: every non-null same-block ordered pair emits; the
    # all-null-sims row (6) renormalizes to score 0 which passes >= 0.0
    assert (3, 6) in pairs and (5, 6) in pairs
    got9 = _run_stream(spark, tmp_path, [B1 + B2], "f", threshold=0.9)
    assert all(r["id_r"] != 6 for r in got9.collect())


def test_stream_link_out_of_order_arrival_divergence_documented(spark, tmp_path):
    """Round-5 verdict #5: the pair set is batching-invariant only when
    trigger boundaries respect order_col (stateful.py docstring). This
    test DEMONSTRATES the documented divergence for a late arrival: a
    record with a SMALLER seq landing in a LATER trigger emits with
    id_l/id_r flipped relative to the batch replay (id_l is the earlier
    ARRIVAL, which is now the later-seq record). The pair COVERAGE and
    the score are unchanged — the divergence is orientation only, plus
    (for capped rings) a different eviction order, which is why the
    production contract requires order-respecting triggers rather than
    silently reordering state."""
    late1 = [(1, "A", "martha", 10)]
    late2 = [(2, "A", "marhta", 5)]  # arrives second, but seq-earlier
    got = _run_stream(spark, tmp_path, [late1, late2], "ooo", threshold=0.9)
    pairs = {(r["id_l"], r["id_r"]) for r in got.collect()}
    # stream orientation: by arrival
    assert pairs == {(1, 2)}
    # batch truth orientation: by seq — the documented divergence
    assert _expected(late1 + late2, 0.9) == {(2, 1)}
    # coverage and score are preserved modulo orientation
    by_pair = {(r["id_l"], r["id_r"]): r["score"] for r in got.collect()}
    assert by_pair[(1, 2)] == S.jaro_winkler("MARTHA", "MARHTA")
