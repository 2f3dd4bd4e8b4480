"""Dataset descriptors — the engine's fixed-schema data model.

Mirrors the reference's ``Dataset``/``Column`` dataclasses
(``/root/reference/src/pseudopeople/schema_entities.py:10-14,584-591``)
as plan metadata: a named table with an ordered column list, each column
carrying the noise types that may apply to it, plus dataset-level row
noise and a date format. Schemas are fixed and declared, never inferred
(cf. ``interface.py:296-300`` projection and ``:241-252`` dtype coercion).

``simulant_id`` and ``household_id`` are never noised — they are the
ground-truth cluster labels the ER metric compares against
(``schema_entities.py:277-279,423-425``; asserted by the reference's
``tests/integration/test_schema.py:19-38``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Column-noise operator names (SURVEY.md §2.C; reference noise_entities.py:40-114)
LEAVE_BLANK = "leave_blank"
CHOOSE_WRONG_OPTION = "choose_wrong_option"
COPY_FROM_HOUSEHOLD_MEMBER = "copy_from_household_member"
SWAP_MONTH_AND_DAY = "swap_month_and_day"
WRITE_WRONG_ZIPCODE_DIGITS = "write_wrong_zipcode_digits"
MISREPORT_AGE = "misreport_age"
WRITE_WRONG_DIGITS = "write_wrong_digits"
USE_NICKNAME = "use_nickname"
USE_FAKE_NAME = "use_fake_name"
MAKE_PHONETIC_ERRORS = "make_phonetic_errors"
MAKE_OCR_ERRORS = "make_ocr_errors"
MAKE_TYPOS = "make_typos"

# Row-noise operator names (SURVEY.md §2.B; reference noise_entities.py:13-37)
DUPLICATE_WITH_GUARDIAN = "duplicate_with_guardian"
DO_NOT_RESPOND = "do_not_respond"
OMIT_ROW = "omit_row"

# Application order — row noise first, then column noise per column, in
# declaration order (reference noise.py:68-113; order asserted by its
# tests/unit/test_noise_form.py:111-203).
ROW_NOISE_ORDER = [DUPLICATE_WITH_GUARDIAN, DO_NOT_RESPOND, OMIT_ROW]
COLUMN_NOISE_ORDER = [
    LEAVE_BLANK,
    CHOOSE_WRONG_OPTION,
    COPY_FROM_HOUSEHOLD_MEMBER,
    SWAP_MONTH_AND_DAY,
    WRITE_WRONG_ZIPCODE_DIGITS,
    MISREPORT_AGE,
    WRITE_WRONG_DIGITS,
    USE_NICKNAME,
    USE_FAKE_NAME,
    MAKE_PHONETIC_ERRORS,
    MAKE_OCR_ERRORS,
    MAKE_TYPOS,
]

_NAME_NOISE = (LEAVE_BLANK, USE_FAKE_NAME, MAKE_PHONETIC_ERRORS, MAKE_OCR_ERRORS, MAKE_TYPOS)
_FIRST_NAME_NOISE = (LEAVE_BLANK, USE_NICKNAME, USE_FAKE_NAME, MAKE_PHONETIC_ERRORS, MAKE_OCR_ERRORS, MAKE_TYPOS)
_STREET_NOISE = (LEAVE_BLANK, MAKE_PHONETIC_ERRORS, MAKE_OCR_ERRORS, MAKE_TYPOS)


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    noise_types: tuple = ()
    dtype: str = "string"
    options: tuple = ()  # for choose_wrong_option
    copy_column: str | None = None  # for copy_from_household_member


@dataclass(frozen=True)
class DatasetSpec:
    name: str
    columns: "tuple[ColumnSpec, ...]"
    date_format: str = "MM/dd/yyyy"  # Spark datetime pattern
    row_noise_types: tuple = (OMIT_ROW,)
    date_column: str | None = None

    @property
    def column_names(self) -> "list[str]":
        return [c.name for c in self.columns]

    def column(self, name: str) -> ColumnSpec:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)


SEXES = ("Female", "Male")
# synth value-draw order (stable); the choose_wrong_option DRAW universe
# comes from assets.SELECT_OPTIONS (reference incorrect_select_options.csv
# order), wired in noise.py — not from this tuple
RACES = ("White", "Black", "Latino", "Asian", "AIAN", "NHOPI", "Multiracial or Other")
HOUSING_TYPES = (
    "Household", "Carceral", "Nursing home", "Other institutional",
    "College", "Military", "Other noninstitutional",
)
# Full 19-option list (reference data/incorrect_select_options.csv /
# sample data distinct values)
RELATIONSHIPS = (
    "Reference person", "Opposite-sex spouse", "Opposite-sex unmarried partner",
    "Same-sex spouse", "Same-sex unmarried partner", "Biological child",
    "Adopted child", "Stepchild", "Sibling", "Parent", "Grandchild",
    "Parent-in-law", "Child-in-law", "Other relative", "Roommate or housemate",
    "Foster child", "Other nonrelative",
    "Institutionalized group quarters population",
    "Noninstitutionalized group quarters population",
)
STATES = (
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA", "HI", "ID", "IL",
    "IN", "IA", "KS", "KY", "LA", "ME", "MD", "MA", "MI", "MN", "MS", "MO", "MT",
    "NE", "NV", "NH", "NJ", "NM", "NY", "NC", "ND", "OH", "OK", "OR", "PA", "RI",
    "SC", "SD", "TN", "TX", "UT", "VT", "VA", "WA", "WV", "WI", "WY", "DC",
)
TAX_FORMS = ("W2", "1099")
SSA_EVENT_TYPES = ("creation", "death")  # reference incorrect_select_options.csv


def _person_core() -> "list[ColumnSpec]":
    return [
        ColumnSpec("simulant_id"),  # never noised (ground truth)
        ColumnSpec("household_id"),  # never noised
        ColumnSpec("first_name", _FIRST_NAME_NOISE),
        ColumnSpec("middle_initial", (LEAVE_BLANK, MAKE_PHONETIC_ERRORS, MAKE_OCR_ERRORS, MAKE_TYPOS)),
        ColumnSpec("last_name", _NAME_NOISE),
        ColumnSpec("age", (LEAVE_BLANK, COPY_FROM_HOUSEHOLD_MEMBER, MISREPORT_AGE), copy_column="copy_age"),
        ColumnSpec(
            "date_of_birth",
            (LEAVE_BLANK, COPY_FROM_HOUSEHOLD_MEMBER, SWAP_MONTH_AND_DAY, WRITE_WRONG_DIGITS),
            copy_column="copy_date_of_birth",
        ),
    ]


def _address_block(prefix: str = "") -> "list[ColumnSpec]":
    p = prefix
    return [
        ColumnSpec(p + "street_number", (LEAVE_BLANK, WRITE_WRONG_DIGITS)),
        ColumnSpec(p + "street_name", _STREET_NOISE),
        ColumnSpec(p + "unit_number", (LEAVE_BLANK, WRITE_WRONG_DIGITS)),
        ColumnSpec(p + "city", _STREET_NOISE),
        ColumnSpec(p + "state", (LEAVE_BLANK, CHOOSE_WRONG_OPTION), options=STATES),
        ColumnSpec(p + "zipcode", (LEAVE_BLANK, WRITE_WRONG_ZIPCODE_DIGITS)),
    ]


DECENNIAL_CENSUS = DatasetSpec(
    name="decennial_census",
    columns=tuple(
        _person_core()
        + _address_block()
        + [
            ColumnSpec("housing_type", (LEAVE_BLANK, CHOOSE_WRONG_OPTION), options=HOUSING_TYPES),
            ColumnSpec("relationship_to_reference_person", (LEAVE_BLANK, CHOOSE_WRONG_OPTION), options=RELATIONSHIPS),
            ColumnSpec("sex", (LEAVE_BLANK, CHOOSE_WRONG_OPTION), options=SEXES),
            ColumnSpec("race_ethnicity", (LEAVE_BLANK, CHOOSE_WRONG_OPTION), options=RACES),
            ColumnSpec("year", (), dtype="int"),
        ]
    ),
    date_format="MM/dd/yyyy",
    row_noise_types=(DUPLICATE_WITH_GUARDIAN, DO_NOT_RESPOND, OMIT_ROW),
    date_column="year",
)

TAXES_W2_AND_1099 = DatasetSpec(
    name="taxes_w2_and_1099",
    columns=tuple(
        _person_core()
        + [
            ColumnSpec(
                "ssn",
                (LEAVE_BLANK, COPY_FROM_HOUSEHOLD_MEMBER, WRITE_WRONG_DIGITS),
                copy_column="copy_ssn",
            )
        ]
        + _address_block("mailing_address_")
        + [
            ColumnSpec("employer_id", (LEAVE_BLANK, WRITE_WRONG_DIGITS)),
            ColumnSpec("employer_name", (LEAVE_BLANK, MAKE_OCR_ERRORS, MAKE_TYPOS)),
            ColumnSpec("wages", (LEAVE_BLANK, WRITE_WRONG_DIGITS)),
            ColumnSpec("tax_form", (LEAVE_BLANK, CHOOSE_WRONG_OPTION), options=TAX_FORMS),
            ColumnSpec("tax_year", (), dtype="int"),
        ]
    ),
    date_format="MM/dd/yyyy",
    row_noise_types=(OMIT_ROW,),
    date_column="tax_year",
)

SOCIAL_SECURITY = DatasetSpec(
    name="social_security",
    columns=(
        ColumnSpec("simulant_id"),
        ColumnSpec("first_name", _FIRST_NAME_NOISE),
        ColumnSpec("middle_name", _NAME_NOISE),
        ColumnSpec("last_name", _NAME_NOISE),
        ColumnSpec("date_of_birth", (LEAVE_BLANK, SWAP_MONTH_AND_DAY, WRITE_WRONG_DIGITS)),
        ColumnSpec("ssn", (LEAVE_BLANK, WRITE_WRONG_DIGITS)),
        ColumnSpec("event_type", (LEAVE_BLANK, CHOOSE_WRONG_OPTION), options=SSA_EVENT_TYPES),
        ColumnSpec("event_date", (LEAVE_BLANK, SWAP_MONTH_AND_DAY, WRITE_WRONG_DIGITS)),
    ),
    date_format="yyyyMMdd",
    row_noise_types=(OMIT_ROW,),
    date_column="event_date",
)

AMERICAN_COMMUNITY_SURVEY = DatasetSpec(
    name="american_community_survey",
    columns=tuple(
        _person_core()
        + _address_block()
        + [
            ColumnSpec("housing_type", (LEAVE_BLANK, CHOOSE_WRONG_OPTION), options=HOUSING_TYPES),
            ColumnSpec("relationship_to_reference_person", (LEAVE_BLANK, CHOOSE_WRONG_OPTION), options=RELATIONSHIPS),
            ColumnSpec("sex", (LEAVE_BLANK, CHOOSE_WRONG_OPTION), options=SEXES),
            ColumnSpec("race_ethnicity", (LEAVE_BLANK, CHOOSE_WRONG_OPTION), options=RACES),
            ColumnSpec("survey_date", ()),
        ]
    ),
    date_format="MM/dd/yyyy",
    row_noise_types=(DO_NOT_RESPOND, OMIT_ROW),
    date_column="survey_date",
)

CURRENT_POPULATION_SURVEY = DatasetSpec(
    name="current_population_survey",
    columns=tuple(
        _person_core()
        + _address_block()
        + [
            ColumnSpec("sex", (LEAVE_BLANK, CHOOSE_WRONG_OPTION), options=SEXES),
            ColumnSpec("race_ethnicity", (LEAVE_BLANK, CHOOSE_WRONG_OPTION), options=RACES),
            ColumnSpec("survey_date", ()),
        ]
    ),
    date_format="MM/dd/yyyy",
    row_noise_types=(DO_NOT_RESPOND, OMIT_ROW),
    date_column="survey_date",
)

WOMEN_INFANTS_AND_CHILDREN = DatasetSpec(
    name="women_infants_and_children",
    # the reference WIC schema has NO age column (schema_entities.py:
    # 689-715 — simulant, household, names, dob, address, sex, race,
    # year), unlike the other person-core datasets
    columns=tuple(
        [c for c in _person_core() if c.name != "age"]
        + _address_block()
        + [
            ColumnSpec("sex", (LEAVE_BLANK, CHOOSE_WRONG_OPTION), options=SEXES),
            ColumnSpec("race_ethnicity", (LEAVE_BLANK, CHOOSE_WRONG_OPTION), options=RACES),
            ColumnSpec("year", (), dtype="int"),
        ]
    ),
    date_format="MMddyyyy",
    row_noise_types=(OMIT_ROW,),
    date_column="year",
)


def _dependent_cols(k: int) -> "list[ColumnSpec]":
    return [
        ColumnSpec(f"dependent_{k}_first_name", _FIRST_NAME_NOISE),
        ColumnSpec(f"dependent_{k}_last_name", _NAME_NOISE),
        ColumnSpec(
            f"dependent_{k}_ssn",
            (LEAVE_BLANK, COPY_FROM_HOUSEHOLD_MEMBER, WRITE_WRONG_DIGITS),
            copy_column=f"dependent_{k}_copy_ssn",
        ),
    ]


TAXES_1040 = DatasetSpec(
    name="taxes_1040",
    columns=tuple(
        _person_core()
        + [
            ColumnSpec("ssn", (LEAVE_BLANK, COPY_FROM_HOUSEHOLD_MEMBER, WRITE_WRONG_DIGITS), copy_column="copy_ssn"),
            ColumnSpec("spouse_first_name", _FIRST_NAME_NOISE),
            ColumnSpec("spouse_last_name", _NAME_NOISE),
            ColumnSpec(
                "spouse_ssn",
                (LEAVE_BLANK, COPY_FROM_HOUSEHOLD_MEMBER, WRITE_WRONG_DIGITS),
                copy_column="spouse_copy_ssn",
            ),
        ]
        + _address_block("mailing_address_")
        + _dependent_cols(1)
        + _dependent_cols(2)
        + _dependent_cols(3)
        + _dependent_cols(4)
        + [ColumnSpec("tax_year", (), dtype="int")]
    ),
    date_format="MM/dd/yyyy",
    row_noise_types=(OMIT_ROW,),
    date_column="tax_year",
)

DATASETS = {
    d.name: d
    for d in (
        DECENNIAL_CENSUS,
        AMERICAN_COMMUNITY_SURVEY,
        CURRENT_POPULATION_SURVEY,
        WOMEN_INFANTS_AND_CHILDREN,
        SOCIAL_SECURITY,
        TAXES_W2_AND_1099,
        TAXES_1040,
    )
}
