"""PSI / KS drift statistics and the reference's classification bands.

Reference semantics reproduced exactly (citations into /root/reference):
  - PSI formula with 1e-8 zero-replacement and bins taken from the
    *expected* distribution: tanml/analysis/drift.py:34-84
  - KS two-sample statistic + asymptotic p-value:
    tanml/analysis/drift.py:87-113 (scipy.stats.ks_2samp semantics)
  - drift bands: psi >= 0.2 severe / >= 0.1 moderate / else none,
    summary fail/warning/pass: tanml/analysis/drift.py:159-206
"""

from __future__ import annotations

import math

import numpy as np

PSI_SEVERE = 0.2
PSI_MODERATE = 0.1


def psi_from_counts(expected_counts: np.ndarray, actual_counts: np.ndarray,
                    eps: float = 1e-8,
                    expected_n: float | None = None,
                    actual_n: float | None = None) -> float:
    """PSI = Σ (a% − e%) · ln(a% / e%), zero proportions → eps.

    Exact reproduction of drift.py:71-84 given identical bin counts.
    The reference normalizes by ``len(expected)`` / ``len(actual)`` —
    the FULL non-null sample size, including values that fall outside
    the baseline bin range (np.histogram drops them from the counts but
    they still appear in the denominator). Callers that track
    out-of-range mass separately must pass the full totals via
    ``expected_n`` / ``actual_n``; when omitted, the counts are assumed
    to cover the whole sample (categorical / integer-bin cases).
    """
    e = np.asarray(expected_counts, dtype=np.float64)
    a = np.asarray(actual_counts, dtype=np.float64)
    ne = float(e.sum()) if expected_n is None else float(expected_n)
    na = float(a.sum()) if actual_n is None else float(actual_n)
    if ne == 0 or na == 0:
        return float("nan")
    ep = e / ne
    ap = a / na
    ep = np.where(ep == 0, eps, ep)
    ap = np.where(ap == 0, eps, ap)
    return float(np.sum((ap - ep) * np.log(ap / ep)))


def psi_level(psi: float) -> str:
    """drift.py:159-171 bands."""
    if psi != psi:  # NaN
        return "unknown"
    if psi >= PSI_SEVERE:
        return "severe"
    if psi >= PSI_MODERATE:
        return "moderate"
    return "none"


def drift_summary_status(levels: list[str]) -> str:
    """fail if any severe, warning if any moderate, else pass
    (drift.py:184-206)."""
    if any(l == "severe" for l in levels):
        return "fail"
    if any(l == "moderate" for l in levels):
        return "warning"
    return "pass"


def ks_asymp_pvalue(d: float, n1: float, n2: float) -> float:
    """Two-sided asymptotic KS p-value (Kolmogorov distribution),
    matching scipy.stats.ks_2samp(mode='asymp')."""
    if n1 <= 0 or n2 <= 0 or d != d:
        return float("nan")
    en = math.sqrt(n1 * n2 / (n1 + n2))
    t = (en + 0.12 + 0.11 / en) * d
    # Kolmogorov survival function: 2 Σ (−1)^{k−1} exp(−2 k² t²)
    s = 0.0
    for k in range(1, 101):
        term = (-1.0) ** (k - 1) * math.exp(-2.0 * (k * t) ** 2)
        s += term
        if abs(term) < 1e-10:
            break
    return float(min(max(2.0 * s, 0.0), 1.0))


def ks_exact_pvalue(d: float, n1: int, n2: int) -> float:
    """Exact two-sided two-sample KS p-value P(D ≥ d) under H0 for
    continuous data, via lattice-path counting: of the C(m+n, n) equally
    likely interleavings of the two samples, count the paths whose ECDF
    difference stays strictly below d everywhere (standard
    Hodges/Drion path-counting construction; same quantity
    scipy.stats.ks_2samp(mode='exact') computes). Python big-int DP —
    exact, no overflow; intended for m·n ≤ ~250k."""
    m, n = int(n1), int(n2)
    if m <= 0 or n <= 0 or d != d:
        return float("nan")
    # |ECDF_x − ECDF_y| at any point = |i·n − j·m| / (m·n): integer grid
    lim = int(round(d * m * n))
    if lim <= 0:
        return 1.0
    prev = [0] * (n + 1)
    for i in range(m + 1):
        cur = [0] * (n + 1)
        for j in range(n + 1):
            if abs(i * n - j * m) >= lim:
                cur[j] = 0
            elif i == 0 and j == 0:
                cur[j] = 1
            else:
                cur[j] = (prev[j] if i > 0 else 0) + (cur[j - 1] if j > 0 else 0)
        prev = cur
    return float(1.0 - prev[n] / math.comb(m + n, n))


# Above this product of sample sizes the O(m·n) exact DP is slower than
# useful and the asymptotic formula is accurate anyway. NOTE: this
# criterion INTENTIONALLY differs from scipy.stats.ks_2samp(mode=
# 'auto'), which switches on max(n1, n2) <= 10000 — scipy's exact mode
# uses an O(n²)-cells C implementation; the pure-Python big-int DP here
# is exact but only tractable to m·n ≈ 2.5×10⁵. Two ~600-sample groups
# therefore get an asymptotic p here where scipy gives an exact one;
# the divergence is confined to the p-value (the KS statistic D is
# always exact, and the reference's drift BANDS key on the statistic,
# so drift classification is unaffected).
KS_EXACT_MAX_MN = 250_000


def ks_2samp_exact(x: np.ndarray, y: np.ndarray) -> tuple[float, float]:
    """Exact two-sample KS statistic (sup |ECDF_x − ECDF_y|). P-value is
    EXACT (path-counting) when m·n ≤ KS_EXACT_MAX_MN, else the
    asymptotic Kolmogorov formula (see the KS_EXACT_MAX_MN note for
    where this regime intentionally differs from scipy's mode='auto').
    Used for small/bounded samples; the at-scale path uses
    ks_from_histograms below."""
    x = np.sort(np.asarray(x, dtype=np.float64))
    y = np.sort(np.asarray(y, dtype=np.float64))
    n1, n2 = x.size, y.size
    if n1 == 0 or n2 == 0:
        return float("nan"), float("nan")
    both = np.concatenate([x, y])
    cdf_x = np.searchsorted(x, both, side="right") / n1
    cdf_y = np.searchsorted(y, both, side="right") / n2
    d = float(np.abs(cdf_x - cdf_y).max())
    if n1 * n2 <= KS_EXACT_MAX_MN:
        return d, ks_exact_pvalue(d, n1, n2)
    return d, ks_asymp_pvalue(d, n1, n2)


def ks_from_value_counts(vals_e: np.ndarray, cnts_e: np.ndarray,
                         vals_a: np.ndarray, cnts_a: np.ndarray) -> tuple[float, float]:
    """EXACT two-sample KS from per-value count tables (sorted distinct
    values + multiplicities — the single-pass drift representation for
    integer-valued metrics). D = sup |ECDF_e − ECDF_a| evaluated on the
    union of values; p-value exact (path-counting) when n_e·n_a ≤
    KS_EXACT_MAX_MN, else asymptotic (same intentional divergence from
    scipy's mode='auto' criterion as ks_2samp_exact — see the
    KS_EXACT_MAX_MN note). D itself is always exact, at O(distinct
    values) cost instead of O(n)."""
    ve = np.asarray(vals_e, dtype=np.float64)
    va = np.asarray(vals_a, dtype=np.float64)
    ce = np.asarray(cnts_e, dtype=np.int64)
    ca = np.asarray(cnts_a, dtype=np.int64)
    ne, na = int(ce.sum()), int(ca.sum())
    if ne == 0 or na == 0:
        return float("nan"), float("nan")
    allv = np.union1d(ve, va)
    cum_e = np.concatenate([[0], np.cumsum(ce)])
    cum_a = np.concatenate([[0], np.cumsum(ca)])
    cdf_e = cum_e[np.searchsorted(ve, allv, side="right")] / ne
    cdf_a = cum_a[np.searchsorted(va, allv, side="right")] / na
    d = float(np.abs(cdf_e - cdf_a).max())
    if ne * na <= KS_EXACT_MAX_MN:
        return d, ks_exact_pvalue(d, ne, na)
    return d, ks_asymp_pvalue(d, ne, na)


def ks_from_histograms(expected_counts: np.ndarray, actual_counts: np.ndarray,
                       expected_below: int = 0, actual_below: int = 0,
                       expected_above: int = 0, actual_above: int = 0) -> tuple[float, float]:
    """Approximate KS statistic from shared-edge histogram counts:
    sup-norm of the difference of the binned ECDFs evaluated at bin
    edges. Error ≤ max bin mass; with fine equi-depth bins from the
    baseline t-digest the error is ≤ 1/n_bins (SURVEY.md §7.5 item 1).

    The p-value here is always the ASYMPTOTIC Kolmogorov formula (the
    statistic itself is binned, so an exact small-sample p-value would
    be false precision) — a documented divergence from the reference's
    scipy mode='auto' at small n; the drift BANDS use the statistic, so
    classification is unaffected. Exact small-sample p-values are
    available on the sample path via ks_2samp_exact."""
    e = np.asarray(expected_counts, dtype=np.float64)
    a = np.asarray(actual_counts, dtype=np.float64)
    ne = e.sum() + expected_below + expected_above
    na = a.sum() + actual_below + actual_above
    if ne == 0 or na == 0:
        return float("nan"), float("nan")
    ce = (np.cumsum(e) + expected_below) / ne
    ca = (np.cumsum(a) + actual_below) / na
    # include the below-range mass point as well
    d = float(np.abs(np.concatenate([[expected_below / ne - actual_below / na], ce - ca])).max())
    return d, ks_asymp_pvalue(d, ne, na)
