"""Small special-function kernels (no scipy in this environment).

Regularized incomplete beta via the Lentz continued fraction
(Numerical Recipes §6.4, public algorithm) → Student-t two-sided
p-values for the univariate significance tests
(/root/reference/tanml/ui/views/ranking.py:310-341 uses statsmodels;
identical distributionally).
"""

from __future__ import annotations

import math


def _betacf(a: float, b: float, x: float) -> float:
    MAXIT, EPS, FPMIN = 200, 3e-14, 1e-300
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


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
                + a * math.log(x) + b * math.log1p(-x))
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def student_t_sf(t: float, df: float) -> float:
    """One-sided survival P(T > t) for Student-t with df degrees."""
    if df <= 0 or t != t:
        return float("nan")
    x = df / (df + t * t)
    p = 0.5 * betainc_reg(df / 2.0, 0.5, x)
    return p if t >= 0 else 1.0 - p


def t_pvalue_two_sided(t: float, df: float) -> float:
    return 2.0 * student_t_sf(abs(t), df)


def pearson_r_pvalue(r: float, n: int) -> float:
    """Two-sided p-value of Pearson r (equivalently the univariate OLS
    slope t-test, ranking.py:310-341)."""
    if n <= 2 or abs(r) >= 1.0:
        return 0.0 if abs(r) >= 1.0 else float("nan")
    t = r * math.sqrt((n - 2) / (1.0 - r * r))
    return t_pvalue_two_sided(t, n - 2)
