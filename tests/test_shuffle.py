"""Skew-aware shuffle utilities: salted == plain groupby; sessionize
matches a pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tanml_ray.functions.collect import collect_pylist
from tanml_ray.stages.shuffle import combiner_group_sum, salted_group_sum, sessionize


def _ds(tbl, parts=4):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(parts)


@pytest.mark.usefixtures("ray_session")
class TestSaltedGroupby:
    def _skewed(self, n=20_000):
        rng = np.random.default_rng(42)
        # 80% of rows share one hot key
        keys = np.where(rng.random(n) < 0.8, "hot",
                        rng.choice([f"k{i}" for i in range(50)], n))
        return pa.table({"k": keys, "v": rng.integers(0, 100, n)})

    def test_salted_equals_plain(self):
        tbl = self._skewed()
        expect = (pd.DataFrame({"k": tbl.column("k").to_pylist(),
                                "v": tbl.column("v").to_numpy()})
                  .groupby("k")["v"].sum().to_dict())
        salted = {r["k"]: r["v"] for r in collect_pylist(
            salted_group_sum(_ds(tbl), ["k"], "v", salt_buckets=16))}
        combined = {r["k"]: r["v"] for r in collect_pylist(
            combiner_group_sum(_ds(tbl), ["k"], "v"))}
        assert salted == expect
        assert combined == expect


@pytest.mark.usefixtures("ray_session")
class TestSessionize:
    def test_matches_pandas_oracle(self):
        rng = np.random.default_rng(7)
        rows = []
        base = pd.Timestamp("2025-01-01")
        for user in range(20):
            t = base
            for _ in range(rng.integers(3, 30)):
                t = t + pd.Timedelta(minutes=int(rng.integers(1, 120)))
                rows.append({"user_id": user, "ts": t})
        tbl = pa.Table.from_pylist(rows)
        out = collect_pylist(sessionize(_ds(tbl), "user_id", "ts", 30.0))

        df = pd.DataFrame(rows)
        oracle = []
        for user, g in df.groupby("user_id"):
            g = g.sort_values("ts")
            gap = g["ts"].diff() > pd.Timedelta(minutes=30)
            sid = gap.cumsum()
            agg = g.groupby(sid).agg(n=("ts", "size"), start=("ts", "min"))
            for s, (_, row) in enumerate(agg.iterrows()):
                oracle.append((user, s, int(row["n"])))
        got = sorted((r["user"], int(r["session_id"]), int(r["n_events"]))
                     for r in out)
        assert got == sorted(oracle)
