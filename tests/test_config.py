"""Config-system tests (reference tests/unit/test_configuration.py
model): structure, overrides, validation failures, NO_NOISE."""

import pytest

from pseudopeople_spark import config as C
from pseudopeople_spark import datasets as D


def test_structure_covers_all_datasets_and_noise_types():
    cfg = C.get_config()
    assert set(cfg) == set(D.DATASETS)
    census = cfg["decennial_census"]
    assert set(census["row_noise"]) == set(D.DECENNIAL_CENSUS.row_noise_types)
    fn = census["column_noise"]["first_name"]
    assert set(fn) == set(D.DECENNIAL_CENSUS.column("first_name").noise_types)
    assert fn[D.MAKE_TYPOS]["cell_probability"] == C.DEFAULT_CELL_PROBABILITY
    assert fn[D.MAKE_TYPOS]["token_probability"] == C.DEFAULT_TOKEN_PROBABILITY


def test_overrides_merge():
    cfg = C.get_config(
        {"decennial_census": {"column_noise": {"first_name": {"make_typos": {"cell_probability": 0.25}}}}}
    )
    assert cfg["decennial_census"]["column_noise"]["first_name"]["make_typos"]["cell_probability"] == 0.25
    # untouched siblings keep defaults
    assert cfg["decennial_census"]["column_noise"]["last_name"]["make_typos"]["cell_probability"] == 0.01
    assert cfg["taxes_w2_and_1099"]["row_noise"]["omit_row"]["row_probability"] == 0.005


def test_invalid_probability_rejected():
    with pytest.raises(C.ConfigurationError):
        C.get_config({"decennial_census": {"row_noise": {"omit_row": {"row_probability": 1.5}}}})


def test_unknown_dataset_rejected():
    with pytest.raises(C.ConfigurationError):
        C.get_config({"no_such_dataset": {}})


def test_no_noise_sentinel():
    for ds, tree in C.NO_NOISE.items():
        for col, noises in tree["column_noise"].items():
            for nt, params in noises.items():
                assert params["cell_probability"] == 0.0
