"""Worker-side cascade (scoring.cascade_match_mask) must decide exactly
like the JVM Column cascade (scoring.tiered_match over _tier_columns).

The decide-mode fused scorer emits only matched rows, so a divergence
here silently changes the edge set. Parity is checked two ways:

  1. an adversarial randomized grid (seeded): records drawn from value
     pools dense in the cascade's boundary cases — nulls, empty strings,
     1/2/5-digit-apart SSNs, 7-digit truncations, swapped dobs, insane
     byears, same dataset-period slots, dup twins — paired ~quadratically,
     then JVM cascade vs decide-mode fused output compared as sets;
  2. the same comparison over a real noised 1.5k-simulant resolve input
     (tests/test_e2e.py's generator), via the pipeline's own attach set.

Both use the SAME sims (fused scorer) on both sides, so any mismatch is
the cascade translation itself, not float drift in the sims.
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from pseudopeople_spark.linkage import scoring
from pseudopeople_spark.linkage.pipeline import CANONICAL_FIELDS

ATTACH = [c for c in CANONICAL_FIELDS if c != "state"] + ["base_rid"]


def _pool_records(n=400, seed=7):
    rng = random.Random(seed)
    firsts = [None, "", "WILLIAM", "BILL", "WILLIA", "MARY", "MARIE", "M", "JOSÉ", "JOSE"]
    lasts = [None, "", "SMITH", "SMYTH", "SMITHE", "GARCÍA", "GARCIA", "LEE"]
    mids = [None, "J", "K"]
    dobs = [None, "", "19800102", "19800201", "19800103", "19801002", "7013AB01", "19840312"]
    ssns = [None, "", "123456789", "123456780", "123456700", "987654321", "1234567", "12345678901"]
    zips = [None, "99501", "99502"]
    cities = [None, "ANCHORAGE", "JUNEAU"]
    sexes = [None, "M", "F"]
    byears = [None, "1980", "1981", "1984", "1990", "7013", "1763"]
    datasets = ["census", "w2", "ssa"]
    periods = [None, "2020", "2030", "creation"]
    rows = []
    for i in range(n):
        rows.append(
            (
                i,  # record_id
                rng.choice(datasets),
                rng.choice(periods),
                rng.choice(firsts),
                rng.choice(mids),
                rng.choice(lasts),
                rng.choice(dobs),
                rng.choice(byears),
                rng.choice(ssns),
                rng.choice(zips),
                rng.choice(cities),
                rng.choice(sexes),
                # a few dup-twin base_rid collisions on purpose
                i if rng.random() > 0.1 else max(0, i - 1),
            )
        )
    return rows


def _pairs(n_records, k=6000, seed=11):
    rng = random.Random(seed)
    seen = set()
    out = []
    while len(out) < k:
        a, b = rng.randrange(n_records), rng.randrange(n_records)
        if a == b or (a, b) in seen:
            continue
        seen.add((a, b))
        out.append((a, b))
    return out


def _match_set(df):
    return {
        (r["id_l"], r["id_r"], round(r["score"], 12), r["l_ssn_digits"], r["r_ssn_digits"])
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def grid(spark):
    recs = spark.createDataFrame(
        _pool_records(),
        "record_id long, dataset string, period string, first_name string, "
        "middle string, last_name string, dob string, byear string, "
        "ssn_digits string, zipcode string, city string, sex string, base_rid long",
    ).localCheckpoint()
    pairs = spark.createDataFrame(_pairs(400), "id_l long, id_r long").localCheckpoint()
    return recs, pairs


@pytest.mark.parametrize("same_ds", [False, True])
def test_cascade_parity_on_adversarial_grid(spark, grid, same_ds):
    recs, pairs = grid
    decide = {"threshold": 0.92, "same_dataset_distinct": same_ds}
    got = _match_set(
        scoring.score_pairs_fused(spark, pairs, recs, ATTACH, decide=decide)
    )
    ref_scored = scoring.score_pairs_fused(
        spark, pairs, recs, ATTACH,
        emit_attach=["dataset", "period", "first_name", "byear", "ssn_digits", "base_rid"],
    )
    ref = _match_set(
        scoring.tiered_match(ref_scored, 0.92, same_dataset_distinct=same_ds)
        .where(F.col("is_match"))
        .select("id_l", "id_r", "score", "is_match", "l_ssn_digits", "r_ssn_digits")
    )
    assert got == ref


def test_resolve_decide_toggle_same_edges(spark):
    """resolve() with PP_SCORING_DECIDE on vs off -> identical match
    edge set on a real noised multi-dataset input (the e2e recipe at
    reduced scale)."""
    from pseudopeople_spark import config, datasets as D, noise, synth
    from pseudopeople_spark.linkage.pipeline import ResolveConfig, normalize_records, resolve

    pop = synth.simulants(spark, 800, seed=21)
    cfg = config.get_config()
    census = noise.noise_dataset(synth.census_records(pop, 2020), D.DECENNIAL_CENSUS, cfg, seed=7)
    w2 = noise.noise_dataset(synth.w2_records(pop, 2020), D.TAXES_W2_AND_1099, cfg, seed=8)
    nc = normalize_records(census, "census", "MM/dd/yyyy", ref_year=2020)
    nw = normalize_records(
        w2, "w2", "MM/dd/yyyy",
        column_map={
            "zipcode": "mailing_address_zipcode",
            "city": "mailing_address_city",
            "state": "mailing_address_state",
        },
        ref_year=2020,
    )
    records = nc.unionByName(nw).localCheckpoint()

    def run():
        out = resolve(spark, records, ResolveConfig())
        return {(r["id_l"], r["id_r"], round(r["score"], 12)) for r in out["edges"].collect()}

    os.environ["PP_SCORING_DECIDE"] = "1"
    try:
        on = run()
        os.environ["PP_SCORING_DECIDE"] = "0"
        off = run()
    finally:
        os.environ.pop("PP_SCORING_DECIDE", None)
    assert on and on == off
