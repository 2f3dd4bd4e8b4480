"""Bayesian fuzzy checking for stochastic assertions — a from-scratch,
numpy-only re-derivation of the reference's FuzzyChecker test harness
(spec: reference ``tests/conftest.py:68-333``; statistics documented at
vivarium-research "fuzzy checking").

The hypothesis test: observed count k out of n opportunities.
  * H_bug:  k ~ BetaBinomial(n, 0.5, 0.5)  (Jeffreys prior — "if the
    code were wrong the rate could be anything, leaning to extremes")
  * H_ok:   k ~ Binomial(n, p) for an exact target p, or
            k ~ BetaBinomial(n, a, b) with (a, b) fit so the Beta's
            2.5/97.5 percentiles match a (lower, upper) target interval.
  * Bayes factor BF = P(k | bug) / P(k | ok); the assertion FAILS when
    BF > 100 ("decisive" evidence of a bug), warns when BF > 0.1
    (inconclusive) and warns when the sample size could never produce a
    decisive result in a given direction.

The container has no scipy, so the three pieces scipy provided are
re-derived here from their public definitions: log-pmfs via lgamma,
the regularized incomplete beta function via the standard continued
fraction (Lentz's algorithm), and a compact Nelder-Mead simplex for the
2-parameter interval fit.
"""

from __future__ import annotations

import math
import warnings

_FMAX = 1.7976931348623157e308


def _log_comb(n: int, k: int) -> float:
    return math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)


def _betaln(a: float, b: float) -> float:
    return math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)


def binom_logpmf(k: int, n: int, p: float) -> float:
    if p <= 0.0:
        return 0.0 if k == 0 else -math.inf
    if p >= 1.0:
        return 0.0 if k == n else -math.inf
    return _log_comb(n, k) + k * math.log(p) + (n - k) * math.log1p(-p)


def betabinom_logpmf(k: int, n: int, a: float, b: float) -> float:
    return _log_comb(n, k) + _betaln(k + a, n - k + b) - _betaln(a, b)


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz's method)."""
    MAXIT, EPS, FPMIN = 300, 3e-14, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def beta_cdf(x: float, a: float, b: float) -> float:
    """Regularized incomplete beta I_x(a, b) — the Beta(a, b) CDF."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = a * math.log(x) + b * math.log1p(-x) - _betaln(a, b)
    bt = math.exp(ln_bt) if ln_bt > -745 else 0.0
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def _logit(p: float) -> float:
    return math.log(p / (1.0 - p))


def _nelder_mead(f, x0, steps=(0.5, 0.5), max_iter=400, tol=1e-10):
    """Compact Nelder-Mead simplex minimizer (standard 1/2/0.5/0.5
    reflection/expansion/contraction/shrink coefficients)."""
    n = len(x0)
    simplex = [list(x0)]
    for i in range(n):
        pt = list(x0)
        pt[i] += steps[i]
        simplex.append(pt)
    vals = [f(p) for p in simplex]
    for _ in range(max_iter):
        order = sorted(range(n + 1), key=lambda i: vals[i])
        simplex = [simplex[i] for i in order]
        vals = [vals[i] for i in order]
        if abs(vals[-1] - vals[0]) < tol:
            break
        centroid = [sum(p[i] for p in simplex[:-1]) / n for i in range(n)]
        refl = [centroid[i] + (centroid[i] - simplex[-1][i]) for i in range(n)]
        fr = f(refl)
        if fr < vals[0]:
            exp = [centroid[i] + 2.0 * (centroid[i] - simplex[-1][i]) for i in range(n)]
            fe = f(exp)
            simplex[-1], vals[-1] = (exp, fe) if fe < fr else (refl, fr)
        elif fr < vals[-2]:
            simplex[-1], vals[-1] = refl, fr
        else:
            con = [centroid[i] + 0.5 * (simplex[-1][i] - centroid[i]) for i in range(n)]
            fc = f(con)
            if fc < vals[-1]:
                simplex[-1], vals[-1] = con, fc
            else:
                for j in range(1, n + 1):
                    simplex[j] = [simplex[0][i] + 0.5 * (simplex[j][i] - simplex[0][i]) for i in range(n)]
                    vals[j] = f(simplex[j])
    best = min(range(n + 1), key=lambda i: vals[i])
    return simplex[best], vals[best]


_interval_fit_cache: "dict[tuple[float, float], tuple[float, float]]" = {}


def fit_beta_to_interval(lower: float, upper: float) -> "tuple[float, float]":
    """Fit Beta(a, b) whose 2.5th/97.5th percentiles are (lower, upper)
    by minimizing squared logit-space quantile error (the reference's
    objective, conftest.py:254-305), multi-starting over concentrations."""
    assert 0.0 < lower <= upper < 1.0
    key = (lower, upper)
    if key in _interval_fit_cache:
        return _interval_fit_cache[key]

    def objective(x):
        a, b = math.exp(min(x[0], 350.0)), math.exp(min(x[1], 350.0))
        err = 0.0
        for bound, q in ((lower, 0.025), (upper, 0.975)):
            c = beta_cdf(bound, a, b)
            if 0.0 < c < 1.0:
                err += (_logit(c) - _logit(q)) ** 2
            else:
                return _FMAX
        return err

    mid = (lower + upper) / 2.0
    best_x, best_v = None, _FMAX
    for conc in (10_000, 1_000, 100, 10, 1, 0.5):
        x0 = [math.log(mid * conc), math.log((1.0 - mid) * conc)]
        x, v = _nelder_mead(objective, x0)
        if v < best_v:
            best_x, best_v = x, v
        if v < 1e-8:
            break
    assert best_v < 1e-5, f"beta interval fit failed for ({lower}, {upper}): err={best_v}"
    ab = (math.exp(best_x[0]), math.exp(best_x[1]))
    _interval_fit_cache[key] = ab
    return ab


def _bayes_factor(k: int, n: int, null_logpmf) -> float:
    """BF = P(k | bug: BetaBinomial(n, .5, .5)) / P(k | no bug)."""
    log_bug = betabinom_logpmf(k, n, 0.5, 0.5)
    log_ok = null_logpmf(k)
    if log_ok == -math.inf:
        return _FMAX
    lr = log_bug - log_ok
    return math.exp(lr) if lr < 709 else _FMAX


def fuzzy_assert_proportion(
    name: str,
    observed_numerator: int,
    observed_denominator: int,
    target_proportion: "float | tuple[float, float]",
    fail_bayes_factor_cutoff: float = 100.0,
    inconclusive_bayes_factor_cutoff: float = 0.1,
) -> float:
    """Reference-parity fuzzy proportion assertion (spec
    ``reference tests/conftest.py:87-232``). Returns the Bayes factor."""
    if isinstance(target_proportion, tuple):
        lo, hi = target_proportion
    else:
        lo = hi = target_proportion
    assert observed_numerator <= observed_denominator, (
        f"more events ({observed_numerator}) than opportunities ({observed_denominator})"
    )
    assert hi >= lo

    n = observed_denominator
    if lo == hi:
        null_logpmf = lambda k: binom_logpmf(k, n, lo)  # noqa: E731
    else:
        a, b = fit_beta_to_interval(lo, hi)
        null_logpmf = lambda k: betabinom_logpmf(k, n, a, b)  # noqa: E731

    bf = _bayes_factor(observed_numerator, n, null_logpmf)
    observed = observed_numerator / n if n else 0.0

    if bf > fail_bayes_factor_cutoff:
        if observed < lo:
            raise AssertionError(
                f"{name}: value {observed:g} significantly LESS than expected {lo:g}, "
                f"bayes factor = {bf:g} (k={observed_numerator}, n={n})"
            )
        raise AssertionError(
            f"{name}: value {observed:g} significantly GREATER than expected {hi:g}, "
            f"bayes factor = {bf:g} (k={observed_numerator}, n={n})"
        )
    if lo > 0 and _bayes_factor(0, n, null_logpmf) < fail_bayes_factor_cutoff:
        warnings.warn(f"sample too small to ever catch '{name}' below expectation")
    if hi < 1 and _bayes_factor(n, n, null_logpmf) < fail_bayes_factor_cutoff:
        warnings.warn(f"sample too small to ever catch '{name}' above expectation")
    if fail_bayes_factor_cutoff > bf > inconclusive_bayes_factor_cutoff:
        warnings.warn(f"Bayes factor for '{name}' is not conclusive ({bf:g})")
    return bf
