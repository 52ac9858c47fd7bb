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


@pytest.mark.usefixtures("ray_session")
def test_funnel_strict_ordering(tmp_path):
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tanml_ray.pipelines.queries import funnel_events

    def ev(uid, t, typ):
        return {"user_id": uid, "ts": pd.Timestamp(t), "event_type": typ}

    rows = [
        # user 1: full funnel in order
        ev(1, "2024-01-01 10:00", "view"),
        ev(1, "2024-01-01 11:00", "click"),
        ev(1, "2024-01-01 12:00", "purchase"),
        # user 2: click BEFORE the first view -> stops at view
        ev(2, "2024-01-01 09:00", "click"),
        ev(2, "2024-01-01 10:00", "view"),
        # user 3: purchase before click -> stops at click
        ev(3, "2024-01-01 10:00", "view"),
        ev(3, "2024-01-01 10:30", "purchase"),
        ev(3, "2024-01-01 11:00", "click"),
        # user 4: never views
        ev(4, "2024-01-01 10:00", "purchase"),
    ]
    t = pa.Table.from_pylist(rows)
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    out = {r["step"]: r["users"]
           for r in funnel_events(str(tmp_path)).to_pylist()}
    assert out == {"1_view": 3, "2_click": 2, "3_purchase": 1}


@pytest.mark.usefixtures("ray_session")
def test_with_coarse_partition_covers_each_key_once():
    """Every key's rows land in exactly ONE partition (the correctness
    contract every coarse-partition consumer relies on), for both
    integer and string keys, regardless of layout."""
    import ray.data as rd

    from tanml_ray.stages.shuffle import with_coarse_partition

    ids = list(range(500)) * 2
    for col, vals in [("k", ids),
                      ("k", [f"user-{i}" for i in ids])]:
        ds = rd.from_arrow(pa.table({col: vals})).repartition(7)
        out = with_coarse_partition(ds, col, n_partitions=16).take_all()
        parts: dict = {}
        for r in out:
            parts.setdefault(r[col], set()).add(r["__upart"])
        assert len(out) == 1000
        assert all(len(p) == 1 for p in parts.values())
        assert all(0 <= next(iter(p)) < 16 for p in parts.values())
