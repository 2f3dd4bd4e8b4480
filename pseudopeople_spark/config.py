"""Three-layer noise configuration — baseline / defaults / user
(reference ``configuration/generator.py:111-157`` layer list and
``DEFAULT_NOISE_VALUES`` :20-80; validation semantics
``configuration/validator.py:16-105``).

Structure (same shape as the reference's LayeredConfigTree.to_dict()):

    {dataset: {"row_noise": {noise_type: {param: value}},
               "column_noise": {column: {noise_type: {param: value}}}}}
"""

from __future__ import annotations

import copy
from typing import Any, Mapping

from pseudopeople_spark import datasets as D

DEFAULT_CELL_PROBABILITY = 0.01  # reference entity_types.py:79
DEFAULT_TOKEN_PROBABILITY = 0.1  # reference noise_entities.py:74-114
# Per-dataset row-noise defaults (reference DEFAULT_NOISE_VALUES,
# configuration/generator.py:20-80): W2/WIC omit_row 0.005, everything
# else the 0.0145 baseline; do_not_respond census/ACS 0.0145, CPS 0.2905
# (constants/data_values.py:41-45).
DEFAULT_OMIT_ROW = {"taxes_w2_and_1099": 0.005, "women_infants_and_children": 0.005}
DEFAULT_DO_NOT_RESPOND = {"decennial_census": 0.0145, "american_community_survey": 0.0145,
                          "current_population_survey": 0.2905}
TOKEN_NOISE_TYPES = {D.MAKE_PHONETIC_ERRORS, D.MAKE_OCR_ERRORS, D.MAKE_TYPOS, D.WRITE_WRONG_DIGITS}


class ConfigurationError(ValueError):
    """Raised on structurally invalid user overrides (reference
    ``exceptions.py:1-9``)."""


def baseline_config(dataset: D.DatasetSpec) -> "dict[str, Any]":
    row_noise: dict[str, Any] = {}
    for rn in dataset.row_noise_types:
        if rn == D.OMIT_ROW:
            row_noise[rn] = {"row_probability": DEFAULT_OMIT_ROW.get(dataset.name, 0.0145)}
        elif rn == D.DO_NOT_RESPOND:
            row_noise[rn] = {"row_probability": DEFAULT_DO_NOT_RESPOND.get(dataset.name, 0.0145)}
        elif rn == D.DUPLICATE_WITH_GUARDIAN:
            row_noise[rn] = {
                "row_probability_in_households_under_18": 0.02,
                "row_probability_in_college_group_quarters_under_24": 0.05,
            }
    column_noise: dict[str, Any] = {}
    for col in dataset.columns:
        if not col.noise_types:
            continue
        entry: dict[str, Any] = {}
        for nt in col.noise_types:
            params = {"cell_probability": DEFAULT_CELL_PROBABILITY}
            if nt in TOKEN_NOISE_TYPES:
                params["token_probability"] = DEFAULT_TOKEN_PROBABILITY
            if nt == D.WRITE_WRONG_ZIPCODE_DIGITS:
                params = {
                    "cell_probability": DEFAULT_CELL_PROBABILITY,
                    "digit_probabilities": [0.04, 0.04, 0.2, 0.36, 0.36],
                }
            if nt == D.MISREPORT_AGE:
                params["possible_age_differences"] = {-2: 0.1, -1: 0.4, 1: 0.4, 2: 0.1}
            entry[nt] = params
        column_noise[col.name] = entry
    # Dataset-specific column exceptions (reference DEFAULT_NOISE_VALUES,
    # configuration/generator.py:52-79): no noise of ANY kind for SSN in
    # the SSA observer; W2/1099 ssn copy_from_household_member defaults
    # to 0.
    if dataset.name == "social_security" and "ssn" in column_noise:
        for nt in column_noise["ssn"]:
            column_noise["ssn"][nt]["cell_probability"] = 0.0
    if dataset.name == "taxes_w2_and_1099" and "ssn" in column_noise:
        cfm = column_noise["ssn"].get("copy_from_household_member")
        if cfm is not None:
            cfm["cell_probability"] = 0.0
    return {"row_noise": row_noise, "column_noise": column_noise}


def get_config(overrides: "Mapping[str, Any] | str | None" = None) -> "dict[str, Any]":
    """Resolved config for all datasets with user overrides merged on
    top (the reference's ``get_config``,
    ``configuration/interface.py:7-51``). A string is treated as a path
    to a YAML override file (reference ``generator.py:96-101``); any
    other non-mapping raises ConfigurationError instead of crashing
    deep in the merge."""
    if isinstance(overrides, str):
        import os

        if not os.path.exists(overrides):
            raise ConfigurationError(
                f"String config {overrides!r} is not a path to an override file "
                "(pass a mapping, a YAML file path, or NO_NOISE)"
            )
        try:
            import yaml
        except ImportError as ex:  # pragma: no cover
            raise ConfigurationError(
                f"Reading the YAML config {overrides!r} requires PyYAML, which is not installed"
            ) from ex
        with open(overrides) as f:
            overrides = yaml.safe_load(f)
    if overrides is not None and not isinstance(overrides, Mapping):
        raise ConfigurationError(
            f"config overrides must be a mapping (or a YAML file path); got {type(overrides).__name__}"
        )
    cfg = {name: baseline_config(spec) for name, spec in D.DATASETS.items()}
    if overrides:
        _merge(cfg, overrides, path=())
    return cfg


NO_NOISE: "dict[str, Any]" = {
    name: {
        "row_noise": {rn: {k: 0.0 for k in baseline_config(spec)["row_noise"].get(rn, {})}
                      for rn in spec.row_noise_types},
        "column_noise": {
            c.name: {nt: {"cell_probability": 0.0} for nt in c.noise_types}
            for c in spec.columns if c.noise_types
        },
    }
    for name, spec in D.DATASETS.items()
}


def _merge(base: "dict[str, Any]", over: "Mapping[str, Any]", path: tuple) -> None:
    """Strict merge with reference-parity validation
    (``configuration/validator.py:16-105``): every user key must exist
    in the baseline tree at every level — unknown datasets, noise
    types, columns AND parameters are all rejected (round 1 accepted
    any unknown key below the dataset level); parameter values are
    range-checked (``_validate_parameter``)."""
    kinds = ("dataset", "configuration key", "noise type / column", "noise type", "parameter")
    for k, v in over.items():
        if k not in base:
            kind = kinds[min(len(path), len(kinds) - 1)]
            raise ConfigurationError(
                f"Invalid {kind} '{k}' provided at '{'.'.join(path) or '<root>'}'. "
                f"Valid options: {sorted(base)}"
            )
        if isinstance(v, Mapping) and isinstance(base.get(k), dict) and len(path) < 4:
            _merge(base[k], v, path + (str(k),))
        elif isinstance(base.get(k), dict) and len(path) < 4:
            # base expects a subtree here (e.g. row_noise.omit_row is a
            # params dict) — a scalar override would silently replace the
            # dict and crash far away in noise_dataset (reference
            # validator.py rejects wrong-typed nodes at config time)
            raise ConfigurationError(
                f"'{'.'.join(path + (str(k),))}' must be a mapping of parameters "
                f"(e.g. {{'{next(iter(base[k]), 'row_probability')}': ...}}); got {v!r}"
            )
        else:
            base[k] = _validate_parameter(str(k), v, path)


def _validate_parameter(key: str, value: Any, path: tuple) -> Any:
    """Value checks mirroring the reference's parameter validators
    (``validator.py:108-257``)."""
    where = ".".join(path + (key,))
    if key == "digit_probabilities":
        if not isinstance(value, (list, tuple)) or len(value) != 5 or not all(
            isinstance(x, (int, float)) and 0.0 <= float(x) <= 1.0 for x in value
        ):
            raise ConfigurationError(
                f"'{where}' must be a list of 5 probabilities in [0,1]; got {value!r}"
            )
        return list(value)
    if key == "possible_age_differences":
        # reference accepts a list (uniform weights) or a dict of weights
        # (validator.py:186-231); normalize to the dict form
        if isinstance(value, (list, tuple)):
            value = {d: 1.0 / len(value) for d in value}
        if not isinstance(value, Mapping) or not value:
            raise ConfigurationError(f"'{where}' must be a non-empty list or dict; got {value!r}")
        for d, wt in value.items():
            if not isinstance(d, int) or d == 0:
                raise ConfigurationError(f"'{where}' keys must be non-zero ints; got {d!r}")
            if not isinstance(wt, (int, float)) or wt < 0:
                raise ConfigurationError(f"'{where}' weights must be >= 0; got {wt!r}")
        if sum(value.values()) <= 0:
            raise ConfigurationError(f"'{where}' weights must sum > 0")
        return dict(value)
    if "probability" in key:
        if not isinstance(value, (int, float)) or not (0.0 <= float(value) <= 1.0):
            raise ConfigurationError(f"probability '{where}'={value!r} outside [0,1]")
        return float(value)
    return copy.deepcopy(value)
