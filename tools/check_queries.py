"""Local stand-in for the driver's correctness gate: run every
queries() entry and its oracle_sql() twin on the same sf dir, compare
row count + column names + order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype(float), 9)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # fixture-path oracles (validate/drift/link-graph) must read the
    # SAME fixture instance as the engine at THIS sf — parquet file
    # names double as partition ids, so a pinned sf0.01 default would
    # mismatch at any other scale (queries._oracle_sf)
    import os

    os.environ["TANML_ORACLE_SF_DIR"] = sf_dir

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    # Spill budget: some brute-force oracle twins (e.g. the curate
    # near-dup all-pairs trigram join) explode at sf0.1 — cap DuckDB's
    # temp usage in /tmp so a runaway oracle fails fast with a clear
    # error instead of filling the repo filesystem (observed: 70+ GB
    # of .tmp spill at 99% disk).
    con.execute("SET temp_directory='/tmp/duckdb_gate_spill'")
    con.execute("SET max_temp_directory_size='20GiB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(mine)} rows (no SQL oracle)")
            continue
        try:
            ref = canon(con.sql(oracles[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(ref.columns)}")
            failures.append(name)
            continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}")
            failures.append(name)
            continue
        eq = mine.equals(ref)
        if not eq:
            diff = (mine != ref) & ~(mine.isna() & ref.isna())
            ndiff = int(diff.values.sum())
            print(f"FAIL {name}: {ndiff} differing cells")
            bad = diff.any(axis=1)
            print(pd.concat([mine[bad].head(3).add_suffix("_mine"),
                             ref[bad].head(3).add_suffix("_ref")], axis=1).to_string())
            failures.append(name)
        else:
            print(f"OK   {name}: {len(mine)} rows, {len(mine.columns)} cols exact")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
