"""Public API surface — parity with the reference's entry points
(``/root/reference/src/pseudopeople/__init__.py:11-21``): seven
``generate_*`` functions + ``get_config`` + ``NO_NOISE``.

Each generator: (1) obtains source data — a user-supplied DataFrame of
pre-synthesized population rows, a parquet/Iceberg path, or (default)
the deterministic in-Spark synthesizer; (2) builds year/state
predicates (pushed to the source scan by Catalyst — the reference's
``user_filters``, interface.py:382-388); (3) resolves the 3-layer noise
config; (4) runs the Spark-native noise plan; (5) projects to the
declared output schema. Lazy end-to-end: one DataFrame, no collect.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pseudopeople_spark import datasets as D
from pseudopeople_spark import noise as N
from pseudopeople_spark import synth
from pseudopeople_spark.config import NO_NOISE, get_config  # noqa: F401 (re-exported)

DEFAULT_POPULATION = 10_000


def _population(spark: SparkSession, source: "DataFrame | str | None", n: int, seed: int) -> DataFrame:
    if isinstance(source, DataFrame):
        return source
    if isinstance(source, str):
        return spark.read.parquet(source)
    return synth.simulants(spark, n, seed=seed)


def _finish(
    df: DataFrame,
    spec: D.DatasetSpec,
    config: "Mapping[str, Any] | None",
    seed: int,
    state: "str | None",
) -> DataFrame:
    if state is not None:
        for c in ("state", "mailing_address_state"):
            if c in df.columns:
                df = df.where(F.col(c) == state)  # pushed down when source is a scan
                break
    # `config` is user OVERRIDES, ALWAYS merged onto the baseline (the
    # reference's get_configuration always layers user config over
    # defaults, configuration/generator.py:83-157). The only value used
    # verbatim is the NO_NOISE sentinel, detected by IDENTITY — a user
    # override that happens to look like {dataset: {column_noise: ...}}
    # must still be merged, not swallowed whole.
    cfg = config if config is NO_NOISE else get_config(config)
    return N.noise_dataset(df, spec, cfg, seed=seed)


def generate_decennial_census(
    spark: SparkSession,
    source: "DataFrame | str | None" = None,
    seed: int = 0,
    config: "Mapping[str, Any] | None" = None,
    year: int = 2020,
    state: "str | None" = None,
    population: int = DEFAULT_POPULATION,
) -> DataFrame:
    """Reference: ``interface.py:303-391``."""
    pop = _population(spark, source, population, seed)
    return _finish(synth.census_records(pop, year, seed=seed), D.DECENNIAL_CENSUS, config, seed, state)


def generate_american_community_survey(
    spark: SparkSession,
    source: "DataFrame | str | None" = None,
    seed: int = 0,
    config: "Mapping[str, Any] | None" = None,
    year: int = 2020,
    state: "str | None" = None,
    population: int = DEFAULT_POPULATION,
) -> DataFrame:
    """Reference: ``interface.py:394-503``."""
    pop = _population(spark, source, population, seed)
    return _finish(synth.acs_records(pop, year, seed=seed), D.AMERICAN_COMMUNITY_SURVEY, config, seed, state)


def generate_current_population_survey(
    spark: SparkSession,
    source: "DataFrame | str | None" = None,
    seed: int = 0,
    config: "Mapping[str, Any] | None" = None,
    year: int = 2020,
    state: "str | None" = None,
    population: int = DEFAULT_POPULATION,
) -> DataFrame:
    """Reference: ``interface.py:506-619``."""
    pop = _population(spark, source, population, seed)
    return _finish(synth.cps_records(pop, year, seed=seed), D.CURRENT_POPULATION_SURVEY, config, seed, state)


def generate_women_infants_and_children(
    spark: SparkSession,
    source: "DataFrame | str | None" = None,
    seed: int = 0,
    config: "Mapping[str, Any] | None" = None,
    year: int = 2020,
    state: "str | None" = None,
    population: int = DEFAULT_POPULATION,
) -> DataFrame:
    """Reference: ``interface.py:622-710``."""
    pop = _population(spark, source, population, seed)
    return _finish(synth.wic_records(pop, year, seed=seed), D.WOMEN_INFANTS_AND_CHILDREN, config, seed, state)


def generate_social_security(
    spark: SparkSession,
    source: "DataFrame | str | None" = None,
    seed: int = 0,
    config: "Mapping[str, Any] | None" = None,
    year: int = 2020,
    state: "str | None" = None,
    population: int = DEFAULT_POPULATION,
) -> DataFrame:
    """Reference: ``interface.py:713-898`` (year filter = events up to
    Dec 31 of ``year``)."""
    pop = _population(spark, source, population, seed)
    ssa = synth.ssa_records(pop, seed=seed)
    ssa = ssa.where(F.substring("event_date", 1, 4).cast("int") <= year)
    return _finish(ssa, D.SOCIAL_SECURITY, config, seed, state)


def generate_taxes_w2_and_1099(
    spark: SparkSession,
    source: "DataFrame | str | None" = None,
    seed: int = 0,
    config: "Mapping[str, Any] | None" = None,
    year: int = 2020,
    state: "str | None" = None,
    population: int = DEFAULT_POPULATION,
) -> DataFrame:
    """Reference: ``interface.py:804-898``."""
    pop = _population(spark, source, population, seed)
    return _finish(synth.w2_records(pop, year, seed=seed), D.TAXES_W2_AND_1099, config, seed, state)


def generate_taxes_1040(
    spark: SparkSession,
    source: "DataFrame | str | None" = None,
    seed: int = 0,
    config: "Mapping[str, Any] | None" = None,
    year: int = 2020,
    state: "str | None" = None,
    population: int = DEFAULT_POPULATION,
) -> DataFrame:
    """Reference: ``interface.py:901-989``."""
    pop = _population(spark, source, population, seed)
    return _finish(synth.tax1040_records(pop, year, seed=seed), D.TAXES_1040, config, seed, state)
