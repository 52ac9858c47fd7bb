"""Property-based kernel tests (hypothesis): merge associativity /
commutativity / split-invariance under arbitrary data and splits —
the §4.1 'merge-order independence' contract, fuzzed."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tanml_ray.kernels import FixedHistogram, HyperLogLog, NumericMoments, TDigest
from tanml_ray.kernels.drift_math import psi_from_counts

floats = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)


@settings(max_examples=40, deadline=None)
@given(xs=st.lists(floats, min_size=2, max_size=300),
       cut=st.integers(min_value=1, max_value=299))
def test_moments_split_invariance(xs, cut):
    x = np.asarray(xs)
    cut = min(cut, len(x) - 1)
    whole = NumericMoments()
    whole.update(x)
    a, b = NumericMoments(), NumericMoments()
    a.update(x[:cut])
    b.update(x[cut:])
    a.merge(b)
    assert a.n == whole.n
    assert a.mean == pytest.approx(whole.mean, rel=1e-9, abs=1e-9)
    assert a.m2 == pytest.approx(whole.m2, rel=1e-6, abs=1e-6)
    assert a.vmin == whole.vmin and a.vmax == whole.vmax


@settings(max_examples=40, deadline=None)
@given(xs=st.lists(floats, min_size=1, max_size=300),
       ys=st.lists(floats, min_size=1, max_size=300))
def test_moments_commutative(xs, ys):
    x, y = np.asarray(xs), np.asarray(ys)
    a1, b1 = NumericMoments(), NumericMoments()
    a1.update(x)
    b1.update(y)
    ab = NumericMoments.from_state(a1.to_state()).merge(b1)
    ba = NumericMoments.from_state(b1.to_state()).merge(a1)
    # commutative up to float roundoff (values may span ±1e6, so the
    # achievable agreement is ~1e-10 relative of the magnitude)
    assert ab.mean == pytest.approx(ba.mean, rel=1e-9, abs=1e-6)
    assert ab.m2 == pytest.approx(ba.m2, rel=1e-6, abs=1e-3)


@settings(max_examples=30, deadline=None)
@given(xs=st.lists(st.floats(min_value=-100, max_value=100,
                             allow_nan=False), min_size=1, max_size=500),
       parts=st.integers(min_value=1, max_value=10))
def test_histogram_exact_any_split(xs, parts):
    x = np.asarray(xs)
    edges = np.linspace(-100, 100, 21)
    whole = FixedHistogram(edges=edges)
    whole.update(x)
    merged = FixedHistogram(edges=edges)
    for chunk in np.array_split(x, parts):
        p = FixedHistogram(edges=edges)
        p.update(chunk)
        merged.merge(p)
    np.testing.assert_array_equal(merged.counts, whole.counts)
    assert merged.below == whole.below and merged.above == whole.above


@settings(max_examples=20, deadline=None)
@given(vals=st.lists(st.integers(min_value=0, max_value=10**9),
                     min_size=1, max_size=2000),
       parts=st.integers(min_value=1, max_value=8))
def test_hll_merge_equals_single(vals, parts):
    x = np.asarray(vals, dtype=np.int64)
    whole = HyperLogLog()
    whole.update(x)
    merged = HyperLogLog()
    for chunk in np.array_split(x, parts):
        p = HyperLogLog()
        if len(chunk):
            p.update(chunk)
        merged.merge(p)
    # register-max merge is exactly split-invariant
    np.testing.assert_array_equal(merged.registers, whole.registers)


@settings(max_examples=20, deadline=None)
@given(xs=st.lists(st.floats(min_value=0, max_value=1000, allow_nan=False),
                   min_size=10, max_size=1000),
       parts=st.integers(min_value=2, max_value=8))
def test_tdigest_quantiles_bounded_error(xs, parts):
    x = np.asarray(xs)
    merged = TDigest()
    for chunk in np.array_split(x, parts):
        p = TDigest()
        p.update(chunk)
        merged.merge(p)
    lo, hi = x.min(), x.max()
    for q in (0.25, 0.5, 0.75):
        v = merged.quantile(q)
        assert lo <= v <= hi
        exact = np.quantile(x, q)
        span = max(hi - lo, 1e-9)
        assert abs(v - exact) <= 0.25 * span  # coarse but universal bound


@settings(max_examples=40, deadline=None)
@given(e=st.lists(st.integers(min_value=0, max_value=10**6), min_size=2,
                  max_size=20),
       a=st.lists(st.integers(min_value=0, max_value=10**6), min_size=2,
                  max_size=20))
def test_psi_nonnegative_and_zero_on_identical(e, a):
    n = min(len(e), len(a))
    e, a = np.asarray(e[:n], float), np.asarray(a[:n], float)
    if e.sum() > 0:
        assert psi_from_counts(e, e) == pytest.approx(0.0, abs=1e-12)
    if e.sum() > 0 and a.sum() > 0:
        assert psi_from_counts(e, a) >= -1e-12


@settings(max_examples=60, deadline=None)
@given(xs=st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                   min_size=1, max_size=200))
def test_popcount64_matches_bit_count(xs):
    from tanml_ray.pipelines.dedup import popcount64

    arr = np.array(xs, dtype=np.uint64)
    got = popcount64(arr)
    want = np.array([int(x).bit_count() for x in xs], dtype=np.int64)
    assert np.array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(m=st.integers(min_value=1, max_value=12),
       n=st.integers(min_value=1, max_value=12),
       frac=st.floats(min_value=0.0, max_value=1.0))
def test_ks_exact_pvalue_properties(m, n, frac):
    """Exact p-value is a valid probability, 1 at d=0, monotonically
    non-increasing in d, and 0-ish beyond the max possible D."""
    from tanml_ray.kernels.drift_math import ks_exact_pvalue

    d = frac  # any d in [0,1]
    p = ks_exact_pvalue(d, m, n)
    assert 0.0 <= p <= 1.0
    assert ks_exact_pvalue(0.0, m, n) == 1.0
    # monotone: p(d) >= p(d + step)
    step = 0.13
    if d + step <= 1.0:
        assert p >= ks_exact_pvalue(d + step, m, n) - 1e-12
    # D = 1 is always achievable (all x below all y) → p > 0
    assert ks_exact_pvalue(1.0, m, n) > 0.0


@settings(max_examples=30, deadline=None)
@given(vals=st.lists(st.integers(min_value=0, max_value=500), min_size=2,
                     max_size=60),
       split=st.floats(min_value=0.2, max_value=0.8))
def test_ks_from_value_counts_equals_expanded_samples(vals, split):
    from tanml_ray.kernels.drift_math import ks_2samp_exact, ks_from_value_counts

    arr = np.array(vals, dtype=np.float64)
    k = max(1, min(len(arr) - 1, int(len(arr) * split)))
    x, y = arr[:k], arr[k:]

    def counts(v):
        u, c = np.unique(v, return_counts=True)
        return u, c

    vx, cx = counts(x)
    vy, cy = counts(y)
    d1, p1 = ks_from_value_counts(vx, cx, vy, cy)
    d2, p2 = ks_2samp_exact(x, y)
    assert d1 == pytest.approx(d2, abs=1e-12)
    assert p1 == pytest.approx(p2, abs=1e-12)


@settings(max_examples=30, deadline=None)
@given(text=st.text(min_size=0, max_size=300))
def test_winnow_fingerprints_total_and_deterministic(text):
    from tanml_ray.stages.text import winnow_fingerprints, winnow_similarity

    fp = winnow_fingerprints(text)
    assert np.array_equal(fp, winnow_fingerprints(text))
    assert winnow_similarity(text, text) == 1.0
    s = winnow_similarity(text, text + " suffix words added")
    assert 0.0 <= s <= 1.0


@settings(max_examples=40, deadline=None)
@given(k=st.integers(2, 12), rep=st.integers(0, 6),
       start=st.integers(0, 10**9))
def test_repeated_fold_properties(k, rep, start):
    """Deterministic, complete (every fold hit on a dense key range),
    and roughly balanced; repeat 0 must equal key % k exactly."""
    from tanml_ray.pipelines.ranking import repeated_fold

    keys = np.arange(start, start + 4000, dtype=np.int64)
    f = repeated_fold(keys, rep, k)
    assert np.array_equal(f, repeated_fold(keys, rep, k))
    assert f.min() >= 0 and f.max() < k
    if rep == 0:
        assert np.array_equal(f, keys % k)
    _, counts = np.unique(f, return_counts=True)
    assert counts.size == k                    # every fold non-empty
    assert counts.max() <= 3 * (4000 // k)     # no collapsed assignment


def test_repeated_fold_repartitions_between_repeats():
    """Different repeats must produce genuinely different SPLITS (not a
    relabeling): some key pair co-foldered at rep r is separated at
    rep r+1."""
    from tanml_ray.pipelines.ranking import repeated_fold

    keys = np.arange(5000, dtype=np.int64)
    for k in (3, 4, 5):
        for r in (0, 1, 2):
            a = repeated_fold(keys, r, k)
            b = repeated_fold(keys, r + 1, k)
            # keys sharing a fold at rep r must not all share one at
            # rep r+1 — otherwise the repeat is a mere relabeling of
            # the same split
            members = np.flatnonzero(a == a[0])
            assert np.unique(b[members]).size > 1, (k, r)


def _naive_lev(a: str, b: str) -> int:
    x, y = a.encode("utf-8"), b.encode("utf-8")
    prev = list(range(len(y) + 1))
    for i, ca in enumerate(x, 1):
        curr = [i]
        for j, cb in enumerate(y, 1):
            curr.append(min(prev[j] + 1, curr[-1] + 1,
                            prev[j - 1] + (ca != cb)))
        prev = curr
    return prev[-1]


@given(st.lists(st.tuples(st.text(max_size=16), st.text(max_size=16)),
                min_size=1, max_size=20))
@settings(max_examples=60, deadline=None)
def test_levenshtein_pairs_properties(pairs):
    """Vectorized kernel == naive DP on arbitrary unicode; symmetric;
    zero iff equal; bounded by max byte length."""
    from tanml_ray.kernels.editdist import levenshtein_pairs

    xs = [a for a, _ in pairs]
    ys = [b for _, b in pairs]
    d = levenshtein_pairs(xs, ys)
    d_rev = levenshtein_pairs(ys, xs)
    for i, (a, b) in enumerate(pairs):
        assert d[i] == _naive_lev(a, b)
        assert d[i] == d_rev[i]
        assert (d[i] == 0) == (a == b)
        assert d[i] <= max(len(a.encode()), len(b.encode()))
