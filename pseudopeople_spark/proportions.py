"""Noise-level proportion guard — warn when a configured noise level
exceeds the maximum achievable for the queried (dataset, state, year)
slice (reference ``configuration/validator.py:258-339``:
``validate_noise_level_proportions``).

The source data distribution ships a ``metadata_proportions.csv`` with
one row per (dataset, state, year, column, noise_type): the PROPORTION
of rows/cells that are even eligible for that noise type (e.g. the
share of under-18s living in households for guardian duplication, the
share of names that have a nickname). A configured level above it
cannot be realized — the engine noises as many rows as possible (the
operators' ``least(1, p/proportion)`` scaling saturates) and the user
is warned, exactly like the reference.

Driver-side pandas over a ~39k-row CSV — never a Spark job.
"""

from __future__ import annotations

import os
import warnings
from typing import Any, Mapping

# reference constants/metadata.py:86 — the CSV's "all years" sentinel
YEAR_AGGREGATION_VALUE = 3000
_GUARDIAN_NOISE = "duplicate_with_guardian"

_cache: "dict[str, Any]" = {}


def _load_proportions(source_root: str):
    """metadata_proportions.csv from the source data root (the same
    directory layout pseudopeople distributes; reference
    constants/paths.py:16). Returns None when absent (synthesized
    sources carry no metadata)."""
    if source_root in _cache:
        return _cache[source_root]
    out = None
    # the CSV sits at the distribution root; a direct dataset-subdir
    # source (our extension) finds it one level up
    for d in (source_root, os.path.dirname(source_root.rstrip("/"))):
        path = os.path.join(d, "metadata_proportions.csv")
        if os.path.exists(path):
            import pandas as pd

            out = pd.read_csv(path)
            break
    _cache[source_root] = out
    return out


def validate_noise_level_proportions(
    source_root: "str | None",
    spec,
    cfg: "Mapping[str, Any]",
    state: "str | None",
    year: "int | None",
) -> "list[str]":
    """Warn for every configured noise level above the max achievable
    proportion in the queried slice (reference validator.py:258-339).
    Returns the warning messages (for tests); noising proceeds — the
    operators' eligibility scaling saturates at the achievable maximum.
    """
    if source_root is None:
        return []
    props = _load_proportions(source_root)
    if props is None:
        return []
    import pandas as pd

    ds = props.loc[props["dataset"] == spec.name]
    if ds.empty:
        return []
    # default slice keys (reference validator.py:271-292): SSA is
    # national; otherwise a single-state distribution (the shipped
    # sample is all-RI) implies that state, else USA. A user state
    # filter overrides; a user year filter overrides the all-years
    # aggregation sentinel.
    if spec.name == "social_security":
        eff_state = "USA"
    else:
        uniq = ds["state"].unique()
        eff_state = uniq[0] if len(uniq) == 1 else "USA"
    if state is not None:
        eff_state = state
    eff_year = year if year is not None else YEAR_AGGREGATION_VALUE

    slice_ = ds.loc[(ds["state"] == eff_state) & (ds["year"] == eff_year)]
    dataset_columns = {c.name for c in spec.columns}
    dcfg = cfg.get(spec.name, {})
    messages: "list[str]" = []
    for row in slice_.itertuples(index=False):
        col = row.column
        if pd.isnull(row.proportion):
            continue
        if pd.isnull(col):
            # row-noise proportions: guardian-duplication groups
            if _GUARDIAN_NOISE not in getattr(spec, "row_noise_types", ()):
                continue
            level = dcfg.get("row_noise", {}).get(_GUARDIAN_NOISE, {}).get(row.noise_type)
            entity = f"row_noise '{_GUARDIAN_NOISE}'"
        else:
            if col not in dataset_columns:
                continue
            level = (
                dcfg.get("column_noise", {}).get(col, {}).get(row.noise_type, {})
                .get("cell_probability")
            )
            entity = f"column_noise '{col}'"
        if level is not None and level > row.proportion:
            messages.append(
                f"The configured '{row.noise_type}' noise level for {entity} is {level}, "
                f"which is higher than the maximum possible value {row.proportion:.5f} "
                f"based on the provided data for '{spec.name}' "
                f"(state={eff_state}, year={eff_year}). Noising as many rows as possible."
            )
    for m in messages:
        warnings.warn(m)
    return messages
