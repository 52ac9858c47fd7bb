"""Kernel unit tests: every accumulator vs a pandas/numpy oracle, plus
merge associativity / split-invariance (SURVEY.md §5 item 1)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tanml_ray.kernels import (
    ColumnProfileAcc,
    FixedHistogram,
    HyperLogLog,
    MisraGries,
    NumericMoments,
    TDigest,
)
from tanml_ray.kernels.drift_math import (
    drift_summary_status,
    ks_2samp_exact,
    ks_from_histograms,
    psi_from_counts,
    psi_level,
)

RNG = np.random.default_rng(42)


def _split(x: np.ndarray, parts: int) -> list[np.ndarray]:
    return np.array_split(x, parts)


class TestNumericMoments:
    def test_matches_pandas(self):
        x = RNG.normal(10, 3, 10_000)
        acc = NumericMoments()
        acc.update(pa.array(x))
        s = pd.Series(x)
        assert acc.n == 10_000
        assert acc.mean == pytest.approx(s.mean(), rel=1e-12)
        assert acc.std == pytest.approx(s.std(), rel=1e-10)
        assert acc.vmin == s.min() and acc.vmax == s.max()
        assert acc.total == pytest.approx(s.sum(), rel=1e-12)

    @pytest.mark.parametrize("parts", [1, 3, 8, 64])
    def test_split_invariance(self, parts):
        x = RNG.exponential(5, 5000)
        whole = NumericMoments()
        whole.update(x)
        merged = NumericMoments()
        for chunk in _split(x, parts):
            part = NumericMoments()
            part.update(chunk)
            merged.merge(part)
        assert merged.n == whole.n
        assert merged.mean == pytest.approx(whole.mean, rel=1e-12)
        assert merged.variance == pytest.approx(whole.variance, rel=1e-9)

    def test_merge_commutative(self):
        a, b = NumericMoments(), NumericMoments()
        a.update(RNG.normal(0, 1, 100))
        b.update(RNG.normal(5, 2, 200))
        ab = NumericMoments.from_state(a.to_state()).merge(b)
        ba = NumericMoments.from_state(b.to_state()).merge(a)
        assert ab.mean == pytest.approx(ba.mean, rel=1e-12)
        assert ab.m2 == pytest.approx(ba.m2, rel=1e-12)

    def test_nulls_and_empty(self):
        acc = NumericMoments()
        acc.update(pa.array([None, None], type=pa.float64()))
        assert acc.n == 0
        assert math.isnan(acc.variance)


class TestFixedHistogram:
    def test_matches_numpy(self):
        x = RNG.normal(0, 1, 20_000)
        edges = np.linspace(-4, 4, 31)
        h = FixedHistogram(edges=edges)
        h.update(x)
        expect, _ = np.histogram(x, bins=edges)
        np.testing.assert_array_equal(h.counts, expect)

    def test_split_invariance_exact(self):
        x = RNG.normal(0, 1, 9999)
        edges = np.linspace(-3, 3, 11)
        whole = FixedHistogram(edges=edges)
        whole.update(x)
        merged = FixedHistogram(edges=edges)
        for chunk in _split(x, 7):
            p = FixedHistogram(edges=edges)
            p.update(chunk)
            merged.merge(p)
        np.testing.assert_array_equal(merged.counts, whole.counts)
        assert merged.below == whole.below and merged.above == whole.above

    def test_out_of_range(self):
        h = FixedHistogram(edges=np.array([0.0, 1.0, 2.0]))
        h.update(np.array([-5.0, 0.5, 1.5, 2.0, 99.0]))
        assert h.below == 1 and h.above == 1
        assert h.counts.tolist() == [1, 2]  # 2.0 in right-closed last bin


class TestTDigest:
    def test_quantiles_close_to_exact(self):
        x = RNG.normal(100, 15, 50_000)
        t = TDigest()
        for chunk in _split(x, 20):
            t.update(chunk)
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            exact = np.quantile(x, q)
            assert t.quantile(q) == pytest.approx(exact, abs=15 * 0.05)

    def test_merge_split_invariance(self):
        x = RNG.exponential(10, 30_000)
        whole = TDigest()
        whole.update(x)
        merged = TDigest()
        for chunk in _split(x, 16):
            p = TDigest()
            p.update(chunk)
            merged.merge(p)
        for q in (0.25, 0.5, 0.75):
            assert merged.quantile(q) == pytest.approx(whole.quantile(q), rel=0.05)

    def test_cdf_monotone(self):
        x = RNG.normal(0, 1, 10_000)
        t = TDigest()
        t.update(x)
        pts = [t.cdf(v) for v in np.linspace(-3, 3, 20)]
        assert all(b >= a - 1e-12 for a, b in zip(pts, pts[1:]))
        assert t.cdf(0.0) == pytest.approx(0.5, abs=0.03)

    def test_empty(self):
        assert math.isnan(TDigest().quantile(0.5))


class TestHLL:
    def test_accuracy(self):
        vals = np.arange(100_000)
        h = HyperLogLog(p=12)
        for chunk in _split(vals, 10):
            h.update(chunk)
        assert h.estimate() == pytest.approx(100_000, rel=0.05)

    def test_small_exactish(self):
        h = HyperLogLog()
        h.update(pa.array(["a", "b", "c", "a", None]))
        assert h.estimate() == 3

    def test_merge_equals_union(self):
        a, b = HyperLogLog(), HyperLogLog()
        a.update(np.arange(0, 5000))
        b.update(np.arange(2500, 7500))
        u = HyperLogLog()
        u.update(np.arange(0, 7500))
        a.merge(b)
        assert a.estimate() == u.estimate()  # register-max merge is exact

    def test_string_int_hash_stability(self):
        h1 = HyperLogLog()
        h1.update(pa.array(["x", "y"]))
        h2 = HyperLogLog.from_state(h1.to_state())
        h2.update(pa.array(["x", "y"]))
        assert h1.estimate() == h2.estimate() == 2


class TestMisraGries:
    def test_heavy_hitters_found(self):
        vals = ["common"] * 5000 + ["second"] * 2000 + [f"rare{i}" for i in range(500)]
        rng = np.random.default_rng(7)
        rng.shuffle(vals)
        m = MisraGries(k=16)
        for chunk in np.array_split(np.array(vals, dtype=object), 10):
            m.update(pa.array(chunk.tolist()))
        top = dict(m.top(2))
        assert set(top) == {"common", "second"}

    def test_merge(self):
        a, b = MisraGries(k=8), MisraGries(k=8)
        a.update(pa.array(["x"] * 100 + ["y"] * 50))
        b.update(pa.array(["x"] * 100 + ["z"] * 30))
        a.merge(b)
        assert a.top(1)[0][0] == "x"


class TestColumnProfile:
    def test_numeric_profile(self):
        x = np.concatenate([RNG.normal(50, 10, 5000), [np.nan] * 500])
        arr = pa.array(x)
        acc = ColumnProfileAcc("c", "numeric")
        acc.update(arr)
        out = acc.finalize()
        s = pd.Series(x)
        assert out["count"] == 5500
        assert out["null_count"] == 500
        assert out["null_pct"] == pytest.approx(100 * 500 / 5500)
        assert out["mean"] == pytest.approx(s.mean(), rel=1e-9)
        assert out["std"] == pytest.approx(s.std(), rel=1e-9)
        assert "high_missing" in out["risk_flags"]  # 9% > 5% threshold

    def test_all_null_numeric_stable_schema(self):
        acc = ColumnProfileAcc("c", "numeric")
        acc.update(pa.array([None] * 50, type=pa.float64()))
        out = acc.finalize()
        assert out["null_pct"] == 100.0
        assert out["mean"] is None and out["q50"] is None  # keys present, None
        assert "high_missing" in out["risk_flags"]

    def test_constant_flag(self):
        acc = ColumnProfileAcc("c", "numeric")
        acc.update(pa.array([3.0] * 100))
        assert "constant" in acc.finalize()["risk_flags"]

    def test_high_cardinality_flag(self):
        acc = ColumnProfileAcc("c", "string")
        acc.update(pa.array([f"v{i}" for i in range(200)]))
        out = acc.finalize()
        assert "high_cardinality" in out["risk_flags"]
        assert out["approx_distinct"] == pytest.approx(200, rel=0.05)

    def test_string_minmax_and_top(self):
        acc = ColumnProfileAcc("c", "string")
        acc.update(pa.array(["b", "a", "c", "a", None]))
        out = acc.finalize()
        assert out["min"] == "a" and out["max"] == "c"
        assert out["top_values"][0][0] == "a"

    def test_roundtrip_state_and_merge(self):
        a = ColumnProfileAcc("c", "numeric")
        b = ColumnProfileAcc("c", "numeric")
        x = RNG.normal(0, 1, 4000)
        a.update(pa.array(x[:2000]))
        b.update(pa.array(x[2000:]))
        restored = ColumnProfileAcc.from_state(a.to_state())
        restored.merge(b)
        whole = ColumnProfileAcc("c", "numeric")
        whole.update(pa.array(x))
        assert restored.finalize()["mean"] == pytest.approx(whole.finalize()["mean"], rel=1e-10)


class TestDriftMath:
    def test_psi_identical_is_zero(self):
        c = np.array([100, 200, 300, 200, 100])
        assert psi_from_counts(c, c) == pytest.approx(0.0, abs=1e-12)

    def test_psi_shift_positive(self):
        e = np.array([500, 300, 150, 50, 0])
        a = np.array([0, 50, 150, 300, 500])
        assert psi_from_counts(e, a) > 0.05

    def test_psi_empty_nan(self):
        assert math.isnan(psi_from_counts(np.zeros(5), np.ones(5)))

    def test_psi_levels_and_summary(self):
        assert psi_level(0.25) == "severe"
        assert psi_level(0.15) == "moderate"
        assert psi_level(0.05) == "none"
        assert drift_summary_status(["severe", "none"]) == "fail"
        assert drift_summary_status(["moderate"]) == "warning"
        assert drift_summary_status(["none", "none"]) == "pass"

    def test_ks_matches_scipy_semantics(self):
        x = RNG.normal(0, 1, 2000)
        y = RNG.normal(0.5, 1, 2500)
        d, p = ks_2samp_exact(x, y)
        try:
            from scipy.stats import ks_2samp
            ref = ks_2samp(x, y)
            assert d == pytest.approx(ref.statistic, abs=1e-12)
            assert p == pytest.approx(ref.pvalue, rel=0.05, abs=1e-6)
        except ImportError:
            assert 0.15 < d < 0.35  # ~0.5σ shift

    def test_ks_exact_pvalue_matches_brute_force(self):
        """Exact path-counting p-value == enumeration over all C(m+n,n)
        interleavings (the definition of the exact two-sample test)."""
        from itertools import combinations

        from tanml_ray.kernels.drift_math import ks_exact_pvalue

        rng = np.random.default_rng(7)
        for m, n in [(3, 4), (5, 5), (4, 6), (2, 7)]:
            x = np.sort(rng.normal(0, 1, m))
            y = np.sort(rng.normal(0.8, 1, n))
            d_obs, p_got = ks_2samp_exact(x, y)
            # brute force: all ways to label m+n distinct values
            vals = np.sort(np.concatenate([x, y]))
            total = 0
            ge = 0
            for xs_idx in combinations(range(m + n), m):
                xs = vals[list(xs_idx)]
                ys = np.delete(vals, list(xs_idx))
                cdf_x = np.searchsorted(xs, vals, side="right") / m
                cdf_y = np.searchsorted(ys, vals, side="right") / n
                d = np.abs(cdf_x - cdf_y).max()
                total += 1
                if d >= d_obs - 1e-12:
                    ge += 1
            assert p_got == pytest.approx(ge / total, abs=1e-12), (m, n)
            assert ks_exact_pvalue(0.0, m, n) == 1.0

    def test_ks_identical_zero(self):
        x = RNG.normal(0, 1, 1000)
        d, _ = ks_2samp_exact(x, x)
        assert d == pytest.approx(0.0, abs=1e-12)

    def test_ks_from_histograms_approximates(self):
        x = RNG.normal(0, 1, 50_000)
        y = RNG.normal(0.3, 1, 50_000)
        edges = np.quantile(x, np.linspace(0, 1, 201))
        ex, _ = np.histogram(x, bins=edges)
        ay, _ = np.histogram(y, bins=edges)
        d_hist, _ = ks_from_histograms(ex, ay,
                                       actual_below=int((y < edges[0]).sum()),
                                       actual_above=int((y > edges[-1]).sum()))
        d_exact, _ = ks_2samp_exact(x, y)
        assert d_hist == pytest.approx(d_exact, abs=0.01)


class TestCountMin:
    def test_one_sided_and_bounded_error(self):
        from collections import Counter

        from tanml_ray.kernels.countmin import CountMin

        rng = np.random.default_rng(7)
        # zipf-ish stream: heavy skew is CMS's target regime
        items = [f"tok{int(v)}" for v in rng.zipf(1.5, 20_000) if v < 5000]
        truth = Counter(items)
        sk = CountMin(width=2048, depth=4)
        sk.update(items)
        eps_n = (np.e / 2048) * len(items)
        for tok, true_c in list(truth.items())[:500]:
            est = sk.query(tok)
            assert est >= true_c  # one-sided
            assert est <= true_c + 3 * eps_n

    def test_merge_equals_single_pass(self):
        from tanml_ray.kernels.countmin import CountMin

        a = CountMin(width=256, depth=3)
        b = CountMin(width=256, depth=3)
        a.update(["x", "y", "x"])
        b.update(["x", "z"], counts=[5, 2])
        whole = CountMin(width=256, depth=3)
        whole.update(["x", "y", "x"])
        whole.update(["x", "z"], counts=[5, 2])
        a.merge(b)
        assert np.array_equal(a.table, whole.table) and a.n == whole.n

    def test_roundtrip_bytes(self):
        from tanml_ray.kernels.countmin import CountMin

        sk = CountMin(width=128, depth=5)
        sk.update(list("abcabcababc"))
        rt = CountMin.from_bytes(sk.to_bytes())
        assert np.array_equal(rt.table, sk.table)
        assert (rt.width, rt.depth, rt.n) == (sk.width, sk.depth, sk.n)
        assert rt.query("a") == sk.query("a")

    def test_shape_mismatch_raises(self):
        from tanml_ray.kernels.countmin import CountMin

        with pytest.raises(ValueError):
            CountMin(width=64, depth=2).merge(CountMin(width=32, depth=2))


class TestLevenshteinPairs:
    """Vectorized byte-level Levenshtein vs a brute-force DP oracle."""

    @staticmethod
    def _naive(a: str, b: str) -> int:
        x, y = a.encode("utf-8"), b.encode("utf-8")
        prev = list(range(len(y) + 1))
        for i, ca in enumerate(x, 1):
            curr = [i]
            for j, cb in enumerate(y, 1):
                curr.append(min(prev[j] + 1, curr[-1] + 1,
                                prev[j - 1] + (ca != cb)))
            prev = curr
        return prev[-1]

    def test_matches_naive_on_random_pairs(self):
        from tanml_ray.kernels.editdist import levenshtein_pairs

        rng = np.random.default_rng(7)
        alphabet = list("abcdé字 ")
        xs, ys = [], []
        for _ in range(200):
            la, lb = rng.integers(0, 12, size=2)
            xs.append("".join(rng.choice(alphabet, size=la)))
            ys.append("".join(rng.choice(alphabet, size=lb)))
        got = levenshtein_pairs(xs, ys)
        want = np.array([self._naive(a, b) for a, b in zip(xs, ys)])
        assert np.array_equal(got, want)

    def test_empty_and_identical(self):
        from tanml_ray.kernels.editdist import levenshtein_pairs

        assert levenshtein_pairs([], []).tolist() == []
        assert levenshtein_pairs(["", "abc", "abc"],
                                 ["", "abc", ""]).tolist() == [0, 0, 3]

    def test_length_mismatch_raises(self):
        from tanml_ray.kernels.editdist import levenshtein_pairs

        with pytest.raises(ValueError):
            levenshtein_pairs(["a"], [])
