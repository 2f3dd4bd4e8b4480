"""Shared test fixtures. One SparkSession per test run (JVM startup is
~10s); every test keys its randomness off explicit seeds, so sharing a
session never leaks state between tests."""

from __future__ import annotations

import math

import pytest

from pseudopeople_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


def assert_proportion(observed: int, total: int, expected_p: float, label: str = "", slack_sigmas: float = 4.0):
    """Binomial sanity check in the spirit of the reference's
    FuzzyChecker (its tests/conftest.py Bayesian check) — simpler: the
    observed count must sit within ``slack_sigmas`` standard deviations
    of the binomial expectation (plus a 1-count absolute floor for tiny
    samples)."""
    exp = total * expected_p
    sigma = math.sqrt(max(total * expected_p * (1 - expected_p), 1e-9))
    tol = slack_sigmas * sigma + 1.0
    assert abs(observed - exp) <= tol, (
        f"{label}: observed {observed}/{total} = {observed / max(total, 1):.4f}, "
        f"expected p={expected_p:.4f} (exp count {exp:.1f} ± {tol:.1f})"
    )
