"""Deterministic simulated-population synthesis, Spark-native.

The reference ships pre-simulated parquet (sample ~10k simulants,
``docs/source/simulated_populations/index.rst:16-18``); this sandbox
has no external data, so we synthesize an equivalent labeled population
*inside Spark*: ``spark.range(n)`` plus pure hash-derived attribute
expressions. Every attribute is a deterministic function of the
simulant id, so:

  * synthesis is join-free, shuffle-free and embarrassingly parallel —
    a narrow map over ``range(n)`` splits, which is exactly what scales
    to 10^12 documents;
  * the shadow ``copy_*`` columns (another household member's values,
    reference ``constants/noise_type_metadata.py:17-26``) are computed
    by evaluating the same attribute functions at the partner's id —
    no self-join needed;
  * ``simulant_id``/``household_id`` are the ground-truth cluster
    labels (never noised — reference ``schema_entities.py:277-279``).

Households have 4 members: 2 adults + 2 children sharing last name and
address; member 0 is the children's guardian.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pseudopeople_spark import datasets as D
from pseudopeople_spark.operators import assets

HH_SIZE = 4


def _pick(arr_vals, h: Column) -> Column:
    arr = F.array(*[F.lit(v) for v in arr_vals])
    return F.element_at(arr, (F.pmod(h, F.lit(len(arr_vals))) + 1).cast("int"))


def _h(seed: int, decision: str, *cols: Column) -> Column:
    return F.pmod(F.xxhash64(F.lit(str(seed)), F.lit(decision), *cols), F.lit(2**40))


def _attrs(sid: Column, seed: int) -> "dict[str, Column]":
    """All person attributes as pure expressions of the simulant id."""
    hh = F.floor(sid / HH_SIZE)
    member = F.pmod(sid, F.lit(HH_SIZE))
    is_child = member >= 2

    first = _pick(assets.FIRST_NAMES, _h(seed, "first_name", sid))
    middle = F.substring(_pick(assets.FIRST_NAMES, _h(seed, "middle", sid)), 1, 1)
    # surname space: base pool + 25% hyphenated compounds — real surname
    # vocabularies are heavy-tailed and far larger than any literal
    # list; without this, large synthesized populations have an
    # unrealistic density of full-name collisions
    last_base = _pick(assets.LAST_NAMES, _h(seed, "last_name", hh))
    last_second = _pick(assets.LAST_NAMES, _h(seed, "last_name2", hh))
    last = F.when(
        (F.pmod(_h(seed, "hyph", hh), F.lit(4)) == 0) & (last_base != last_second),
        F.concat(last_base, F.lit("-"), last_second),
    ).otherwise(last_base)

    sex = F.when(F.pmod(_h(seed, "sex", sid), F.lit(2)) == 0, "Female").otherwise("Male")
    race = _pick(D.RACES, _h(seed, "race", hh))

    # adults born 1950-1994, children 2002-2015, deterministic day-of-year
    byear = F.when(
        is_child, (F.lit(2002) + F.pmod(_h(seed, "byear_c", sid), F.lit(14)))
    ).otherwise(F.lit(1950) + F.pmod(_h(seed, "byear_a", sid), F.lit(45)))
    doy = F.pmod(_h(seed, "dob_doy", sid), F.lit(364)) + 1
    dob = F.date_add(F.make_date(byear, F.lit(1), F.lit(1)), (doy - 1).cast("int"))

    ssn_num = F.pmod(sid * F.lit(48271) + _h(seed, "ssn", sid), F.lit(799_999_999)) + F.lit(100_000_000)
    ssn9 = F.format_string("%09d", ssn_num)
    ssn = F.concat(ssn9.substr(1, 3), F.lit("-"), ssn9.substr(4, 2), F.lit("-"), ssn9.substr(6, 4))

    street_number = (F.pmod(_h(seed, "street_no", hh), F.lit(9899)) + 101).cast("string")
    street_name = F.concat(_pick(assets.STREET_NAMES, _h(seed, "street", hh)), F.lit(" St"))
    unit_number = F.when(
        F.pmod(_h(seed, "has_unit", hh), F.lit(5)) == 0,
        (F.pmod(_h(seed, "unit", hh), F.lit(99)) + 1).cast("string"),
    ).otherwise(F.lit(None).cast("string"))
    city = _pick(assets.CITIES, _h(seed, "city", hh))
    state = _pick(D.STATES, _h(seed, "state", hh))
    zipcode = F.format_string("%05d", F.pmod(_h(seed, "zip", hh), F.lit(89999)) + 10000)

    relationship = (
        F.when(member == 0, "Reference person")
        .when(member == 1, "Opposite-sex spouse")
        .otherwise("Biological child")
    )
    guardian_sid = hh * HH_SIZE  # member 0 of the household
    guardian_1 = F.when(is_child, F.format_string("%09d", guardian_sid)).otherwise(F.lit(None).cast("string"))
    guardian_2 = F.when(
        is_child & (F.pmod(_h(seed, "g2", sid), F.lit(2)) == 0),
        F.format_string("%09d", guardian_sid + 1),
    ).otherwise(F.lit(None).cast("string"))

    return {
        "simulant_id": F.format_string("%09d", sid),
        "household_id": F.format_string("%07d", hh),
        "member": member,
        "first_name": first,
        "middle_initial": middle,
        "last_name": last,
        "sex": sex,
        "race_ethnicity": race,
        "date_of_birth_date": dob,
        "birth_year": byear,
        "ssn": ssn,
        "street_number": street_number,
        "street_name": street_name,
        "unit_number": unit_number,
        "city": city,
        "state": state,
        "zipcode": zipcode,
        "relationship_to_reference_person": relationship,
        "guardian_1": guardian_1,
        "guardian_2": guardian_2,
        # ~2% group-quarters population (deterministic), rest household —
        # gives choose_wrong_option a real value universe and exercises
        # the guardian-duplication College path (reference GQ types,
        # incorrect_select_options.csv housing_type column)
        "housing_type": F.when(
            F.pmod(_h(seed, "gq", sid), F.lit(50)) == 0,
            _pick(D.HOUSING_TYPES[1:], _h(seed, "gq_type", sid)),
        ).otherwise("Household"),
    }


def simulants(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Ground-truth population: one row per simulant, all attributes."""
    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    sid = F.col("id")
    a = _attrs(sid, seed)
    partner = (F.floor(sid / HH_SIZE) * HH_SIZE) + F.pmod(sid + 1, F.lit(HH_SIZE))
    pa = _attrs(partner, seed)
    cols = [v.alias(k) for k, v in a.items()]
    cols += [
        pa["ssn"].alias("copy_ssn"),
        pa["date_of_birth_date"].alias("copy_date_of_birth_date"),
        pa["birth_year"].alias("copy_birth_year"),
    ]
    return rng.select(sid.alias("sid"), *cols)


def _age_at(year_col: Column, birth_year: Column) -> Column:
    return (year_col - birth_year).cast("bigint")


def census_records(pop: DataFrame, year: int, seed: int = 42) -> DataFrame:
    """Decennial-census extract for one year (schema
    ``schema_entities.py:597-628``); dates stringified MM/dd/yyyy
    (reference date reformat, ``interface.py:255-285``)."""
    y = F.lit(year)
    return pop.select(
        F.format_string(f"census_{year}_%09d", F.col("sid")).alias("record_id"),
        "simulant_id",
        "household_id",
        "first_name",
        "middle_initial",
        "last_name",
        _age_at(y, F.col("birth_year")).cast("string").alias("age"),
        F.date_format("date_of_birth_date", "MM/dd/yyyy").alias("date_of_birth"),
        "street_number", "street_name", "unit_number", "city", "state", "zipcode",
        "relationship_to_reference_person", "sex", "race_ethnicity",
        y.alias("year"),
        # shadow columns consumed by noise, never emitted
        _age_at(y, F.col("copy_birth_year")).cast("string").alias("copy_age"),
        F.date_format("copy_date_of_birth_date", "MM/dd/yyyy").alias("copy_date_of_birth"),
        "guardian_1", "guardian_2", "housing_type",
    )


def w2_records(pop: DataFrame, tax_year: int, seed: int = 42) -> DataFrame:
    """W2/1099 extract (schema ``schema_entities.py:737-772``): one
    filing per adult, wages/employer hash-derived."""
    y = F.lit(tax_year)
    adults = pop.where(_age_at(y, F.col("birth_year")) >= 18)
    wages = (F.pmod(_h(seed, f"wages_{tax_year}", F.col("sid")), F.lit(180_000)) + 12_000).cast("string")
    employer_id = F.format_string("%06d", F.pmod(_h(seed, "employer", F.col("sid")), F.lit(5000)))
    employer_name = F.concat(_pick(assets.LAST_NAMES, _h(seed, "emp_name", F.col("sid"))), F.lit(" Corp"))
    tax_form = F.when(F.pmod(_h(seed, "tax_form", F.col("sid")), F.lit(5)) == 0, "1099").otherwise("W2")
    return adults.select(
        F.format_string(f"w2_{tax_year}_%09d", F.col("sid")).alias("record_id"),
        "simulant_id",
        "household_id",
        "first_name",
        "middle_initial",
        "last_name",
        _age_at(y, F.col("birth_year")).cast("string").alias("age"),
        F.date_format("date_of_birth_date", "MM/dd/yyyy").alias("date_of_birth"),
        "ssn",
        F.col("street_number").alias("mailing_address_street_number"),
        F.col("street_name").alias("mailing_address_street_name"),
        F.col("unit_number").alias("mailing_address_unit_number"),
        F.col("city").alias("mailing_address_city"),
        F.col("state").alias("mailing_address_state"),
        F.col("zipcode").alias("mailing_address_zipcode"),
        employer_id.alias("employer_id"),
        employer_name.alias("employer_name"),
        wages.alias("wages"),
        tax_form.alias("tax_form"),
        y.alias("tax_year"),
        _age_at(y, F.col("copy_birth_year")).cast("string").alias("copy_age"),
        F.date_format("copy_date_of_birth_date", "MM/dd/yyyy").alias("copy_date_of_birth"),
        F.col("copy_ssn"),
    )


def _survey_date(seed: int, decision: str, year: int) -> Column:
    doy = F.pmod(_h(seed, decision, F.col("sid")), F.lit(364)) + 1
    return F.date_format(
        F.date_add(F.make_date(F.lit(year), F.lit(1), F.lit(1)), (doy - 1).cast("int")), "MM/dd/yyyy"
    )


def acs_records(pop: DataFrame, year: int, sample_rate: float = 0.2, seed: int = 42) -> DataFrame:
    """American Community Survey extract (schema
    ``schema_entities.py:629-659``): a deterministic hash-sample of the
    population surveyed on a random date within the year."""
    y = F.lit(year)
    sampled = pop.where(F.pmod(_h(seed, f"acs_{year}", F.col("sid")), F.lit(1_000_000)) < int(sample_rate * 1_000_000))
    return sampled.select(
        F.format_string(f"acs_{year}_%09d", F.col("sid")).alias("record_id"),
        "simulant_id", "household_id", "first_name", "middle_initial", "last_name",
        _age_at(y, F.col("birth_year")).cast("string").alias("age"),
        F.date_format("date_of_birth_date", "MM/dd/yyyy").alias("date_of_birth"),
        "street_number", "street_name", "unit_number", "city", "state", "zipcode",
        "housing_type", "relationship_to_reference_person",
        "sex", "race_ethnicity",
        _survey_date(seed, f"acs_date_{year}", year).alias("survey_date"),
        _age_at(y, F.col("copy_birth_year")).cast("string").alias("copy_age"),
        F.date_format("copy_date_of_birth_date", "MM/dd/yyyy").alias("copy_date_of_birth"),
    )


def cps_records(pop: DataFrame, year: int, sample_rate: float = 0.1, seed: int = 42) -> DataFrame:
    """Current Population Survey extract (``schema_entities.py:660-688``);
    same shape as ACS minus housing_type/relationship (the reference CPS
    column list omits both)."""
    return (
        acs_records(pop, year, sample_rate=sample_rate, seed=seed + 1)
        .drop("housing_type", "relationship_to_reference_person")
        .withColumn("record_id", F.regexp_replace("record_id", "^acs_", "cps_"))
    )


def wic_records(pop: DataFrame, year: int, seed: int = 42) -> DataFrame:
    """WIC extract (``schema_entities.py:689-715``): children under 5
    plus a sample of mothers."""
    y = F.lit(year)
    age = _age_at(y, F.col("birth_year"))
    eligible = pop.where(
        ((age < 5) & (age >= 0))
        | ((F.col("member") == 1) & (F.pmod(_h(seed, "wic_mother", F.col("sid")), F.lit(10)) == 0))
    )
    # NO age column — reference WIC schema, schema_entities.py:689-715
    return eligible.select(
        F.format_string(f"wic_{year}_%09d", F.col("sid")).alias("record_id"),
        "simulant_id", "household_id", "first_name", "middle_initial", "last_name",
        F.date_format("date_of_birth_date", "MMddyyyy").alias("date_of_birth"),
        "street_number", "street_name", "unit_number", "city", "state", "zipcode",
        "sex", "race_ethnicity",
        y.alias("year"),
        F.date_format("copy_date_of_birth_date", "MMddyyyy").alias("copy_date_of_birth"),
    )


def tax1040_records(pop: DataFrame, tax_year: int, seed: int = 42) -> DataFrame:
    """1040 extract (``schema_entities.py:773-811``): one joint filing
    per household — filer (member 0) + spouse (member 1) + up to 4
    dependent columns, all derived attribute-functionally (no join)."""
    y = F.lit(tax_year)
    filers = pop.where(F.col("member") == 0)
    sid = F.col("sid")
    spouse = _attrs(sid + 1, seed)
    dep1 = _attrs(sid + 2, seed)
    dep2 = _attrs(sid + 3, seed)
    return filers.select(
        F.format_string(f"t1040_{tax_year}_%09d", sid).alias("record_id"),
        "simulant_id", "household_id", "first_name", "middle_initial", "last_name",
        _age_at(y, F.col("birth_year")).cast("string").alias("age"),
        F.date_format("date_of_birth_date", "MM/dd/yyyy").alias("date_of_birth"),
        "ssn",
        spouse["first_name"].alias("spouse_first_name"),
        spouse["last_name"].alias("spouse_last_name"),
        spouse["ssn"].alias("spouse_ssn"),
        F.col("street_number").alias("mailing_address_street_number"),
        F.col("street_name").alias("mailing_address_street_name"),
        F.col("unit_number").alias("mailing_address_unit_number"),
        F.col("city").alias("mailing_address_city"),
        F.col("state").alias("mailing_address_state"),
        F.col("zipcode").alias("mailing_address_zipcode"),
        dep1["first_name"].alias("dependent_1_first_name"),
        dep1["last_name"].alias("dependent_1_last_name"),
        dep1["ssn"].alias("dependent_1_ssn"),
        dep2["first_name"].alias("dependent_2_first_name"),
        dep2["last_name"].alias("dependent_2_last_name"),
        dep2["ssn"].alias("dependent_2_ssn"),
        F.lit(None).cast("string").alias("dependent_3_first_name"),
        F.lit(None).cast("string").alias("dependent_3_last_name"),
        F.lit(None).cast("string").alias("dependent_3_ssn"),
        F.lit(None).cast("string").alias("dependent_4_first_name"),
        F.lit(None).cast("string").alias("dependent_4_last_name"),
        F.lit(None).cast("string").alias("dependent_4_ssn"),
        y.alias("tax_year"),
        # shadow copy columns consumed by copy_from_household_member
        _age_at(y, F.col("copy_birth_year")).cast("string").alias("copy_age"),
        F.date_format("copy_date_of_birth_date", "MM/dd/yyyy").alias("copy_date_of_birth"),
        F.col("copy_ssn"),
        F.col("ssn").alias("spouse_copy_ssn"),
        dep2["ssn"].alias("dependent_1_copy_ssn"),
        dep1["ssn"].alias("dependent_2_copy_ssn"),
        F.lit(None).cast("string").alias("dependent_3_copy_ssn"),
        F.lit(None).cast("string").alias("dependent_4_copy_ssn"),
    )


def ssa_records(pop: DataFrame, seed: int = 42) -> DataFrame:
    """SSA extract (schema ``schema_entities.py:716-736``): an ssn
    creation event per simulant; dates yyyyMMdd."""
    return pop.select(
        F.format_string("ssa_%09d", F.col("sid")).alias("record_id"),
        "simulant_id",
        "first_name",
        F.col("middle_initial").alias("middle_name"),
        "last_name",
        F.date_format("date_of_birth_date", "yyyyMMdd").alias("date_of_birth"),
        "ssn",
        F.lit("creation").alias("event_type"),
        F.date_format("date_of_birth_date", "yyyyMMdd").alias("event_date"),
    )
