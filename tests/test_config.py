"""Config-system tests (reference tests/unit/test_configuration.py
model): 3-layer structure, dataset-specific defaults, strict override
validation failures, NO_NOISE semantics."""

import pytest

from pseudopeople_spark.config import NO_NOISE, ConfigurationError, get_config


def test_dataset_specific_defaults():
    cfg = get_config()
    # W2/WIC omit_row 0.005, others 0.0145 (generator.py:50-66)
    assert cfg["taxes_w2_and_1099"]["row_noise"]["omit_row"]["row_probability"] == 0.005
    assert cfg["women_infants_and_children"]["row_noise"]["omit_row"]["row_probability"] == 0.005
    assert cfg["social_security"]["row_noise"]["omit_row"]["row_probability"] == 0.0145
    # CPS do_not_respond 0.2905 (data_values.py:41-45)
    assert cfg["current_population_survey"]["row_noise"]["do_not_respond"]["row_probability"] == 0.2905
    # SSA ssn: every noise type zeroed (generator.py:69-79)
    for nt, params in cfg["social_security"]["column_noise"]["ssn"].items():
        assert params["cell_probability"] == 0.0, nt
    # W2 ssn copy_from_household_member zeroed
    assert (
        cfg["taxes_w2_and_1099"]["column_noise"]["ssn"]["copy_from_household_member"]["cell_probability"]
        == 0.0
    )


def test_override_merges_onto_baseline():
    cfg = get_config({"decennial_census": {"column_noise": {"age": {"misreport_age": {"cell_probability": 0.3}}}}})
    assert cfg["decennial_census"]["column_noise"]["age"]["misreport_age"]["cell_probability"] == 0.3
    # everything else untouched (the round-1 'already-resolved' heuristic
    # silently dropped ALL other noise for overrides of this exact shape)
    assert cfg["decennial_census"]["row_noise"]["omit_row"]["row_probability"] == 0.0145
    assert cfg["decennial_census"]["column_noise"]["first_name"]["make_typos"]["cell_probability"] == 0.01


@pytest.mark.parametrize(
    "overrides",
    [
        {"fake_dataset": {}},
        {"decennial_census": {"fake_key": {}}},
        {"decennial_census": {"row_noise": {"fake_noise": {}}}},
        {"decennial_census": {"row_noise": {"omit_row": {"fake_param": 0.1}}}},
        {"decennial_census": {"column_noise": {"fake_column": {}}}},
        {"decennial_census": {"column_noise": {"age": {"leave_blank": {"bogus": 1}}}}},
        {"decennial_census": {"column_noise": {"age": {"make_typos": {"cell_probability": 0.1}}}}},
    ],
)
def test_unknown_keys_rejected(overrides):
    """Reference validator.py:16-105 rejects unknown datasets, noise
    types, columns and parameters (age has no make_typos)."""
    with pytest.raises(ConfigurationError):
        get_config(overrides)


@pytest.mark.parametrize(
    "overrides",
    [
        {"decennial_census": {"row_noise": {"omit_row": {"row_probability": 1.5}}}},
        {"decennial_census": {"row_noise": {"omit_row": {"row_probability": -0.1}}}},
        {"decennial_census": {"column_noise": {"zipcode": {"write_wrong_zipcode_digits": {
            "digit_probabilities": [0.1, 0.2]}}}}},
        {"decennial_census": {"column_noise": {"age": {"misreport_age": {
            "possible_age_differences": {0: 1.0}}}}}},
        {"decennial_census": {"column_noise": {"age": {"misreport_age": {
            "possible_age_differences": {1: -2.0}}}}}},
    ],
)
def test_invalid_values_rejected(overrides):
    with pytest.raises(ConfigurationError):
        get_config(overrides)


@pytest.mark.parametrize(
    "overrides",
    [
        {"decennial_census": {"row_noise": {"omit_row": 0.01}}},
        {"decennial_census": {"column_noise": {"age": {"misreport_age": 0.3}}}},
        {"decennial_census": {"row_noise": 0.5}},
    ],
)
def test_scalar_where_subtree_expected_rejected(overrides):
    """A scalar in place of a params dict must fail AT CONFIG TIME with
    a ConfigurationError (reference validator.py rejects wrong-typed
    nodes), not later in noise_dataset with an AttributeError."""
    with pytest.raises(ConfigurationError):
        get_config(overrides)


def test_age_differences_list_normalized():
    cfg = get_config({"decennial_census": {"column_noise": {"age": {"misreport_age": {
        "possible_age_differences": [-1, 1]}}}}})
    got = cfg["decennial_census"]["column_noise"]["age"]["misreport_age"]["possible_age_differences"]
    assert got == {-1: 0.5, 1: 0.5}


def test_no_noise_produces_unnoised_output(spark):
    from pseudopeople_spark.api import generate_decennial_census

    a = generate_decennial_census(spark, seed=3, population=500, config=NO_NOISE)
    b = generate_decennial_census(spark, seed=3, population=500, config="no_noise")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
