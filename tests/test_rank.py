"""stages/rank.spearman_continuous: exact continuous-column Spearman
(no integer-grid precondition) vs pandas midrank/corrcoef, tie
handling, partition + cut-count invariance, degenerate inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl, parts=4):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(parts)


def _pandas_rho(x, y):
    rx = pd.Series(x).rank(method="average")
    ry = pd.Series(y).rank(method="average")
    return float(np.corrcoef(rx, ry)[0, 1])


@pytest.mark.usefixtures("ray_session")
class TestSpearmanContinuous:
    def test_continuous_matches_pandas(self):
        """Raw float columns — the case the grid LUT could not rank."""
        from tanml_ray.stages.rank import spearman_continuous

        rng = np.random.default_rng(23)
        n = 20_000
        x = rng.normal(0, 1, n)
        y = 0.4 * x + rng.normal(0, 1, n)     # all values distinct
        out = spearman_continuous(_ds(pa.table({"x": x, "y": y})), "x", "y")
        assert out["n"] == n
        assert out["rho"] == pytest.approx(_pandas_rho(x, y), abs=1e-12)

    def test_heavy_ties_match_midrank_semantics(self):
        """Tie groups larger than a range partition must still get the
        exact global midrank (side='right' binning keeps them whole)."""
        from tanml_ray.stages.rank import spearman_continuous

        rng = np.random.default_rng(7)
        n = 5_000
        x = rng.integers(0, 5, n).astype(np.float64)   # 5 huge tie groups
        y = x + rng.integers(0, 3, n)                   # correlated + ties
        out = spearman_continuous(_ds(pa.table({"x": x, "y": y}), parts=7),
                                  "x", "y", n_partitions=16)
        assert out["rho"] == pytest.approx(_pandas_rho(x, y), abs=1e-12)

    def test_partition_and_cut_invariance(self):
        """Exactness must not depend on data layout or on the sampled
        cut values (cuts steer balance only)."""
        from tanml_ray.stages.rank import spearman_continuous

        rng = np.random.default_rng(11)
        n = 8_000
        x = np.exp(rng.normal(0, 2, n))                 # heavy skew
        y = rng.permutation(x)
        t = pa.table({"x": x, "y": y})
        a = spearman_continuous(_ds(t, 2), "x", "y", n_partitions=4)
        b = spearman_continuous(_ds(t, 13), "x", "y", n_partitions=97)
        assert a["rho"] == pytest.approx(b["rho"], abs=0)
        assert a["rho"] == pytest.approx(_pandas_rho(x, y), abs=1e-12)

    def test_perfect_monotone_and_degenerate(self):
        from tanml_ray.stages.rank import spearman_continuous

        x = np.linspace(0, 1, 1000)
        up = spearman_continuous(_ds(pa.table({"x": x, "y": x ** 3})),
                                 "x", "y")
        dn = spearman_continuous(_ds(pa.table({"x": x, "y": -x})), "x", "y")
        assert up["rho"] == pytest.approx(1.0, abs=0)
        assert dn["rho"] == pytest.approx(-1.0, abs=0)
        # constant column → undefined rho
        const = spearman_continuous(
            _ds(pa.table({"x": x, "y": np.zeros_like(x)})), "x", "y")
        assert np.isnan(const["rho"])
