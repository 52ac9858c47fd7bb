"""Operator-coverage queries over the driver testdata tables.

Each function here is one `__ray_entry__.queries()` entry with a DuckDB
`oracle_sql()` twin. Implementations are Ray-Data-first: vectorized
Arrow/numpy map_batches with per-batch PARTIAL aggregation before any
groupby shuffle (the combiner pattern, SURVEY.md §2.5 legend), and
broadcast small sides instead of shuffle joins (§2.4 J3).

Determinism contract with the SQL oracles: fractional "money" columns
are integerized (cents / micro-units) before summation so engine and
DuckDB produce bit-identical doubles regardless of partitioning or
summation order; genuinely real-valued statistics (means, correlation,
PSI) are rounded to 6 decimals on BOTH sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from tanml_ray.functions.collect import from_pandas_clean, collect_pylist
from tanml_ray.sources.ingest import read_parquet_clean


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data as rd

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _round6(x):
    return float(np.round(x, 6)) if x is not None else None


# ---------------------------------------------------------------------------
# A1/A2/A4: per-column profile stats (count / nulls / min / max / mean / std)
# Reference: profiling.py:85-102,222-224. The lineitem decimal columns are
# fixed-point (quantities integral, money in cents), so the engine computes
# EXACT integer unit sums (Σu, Σu² merged as Python bigints — overflow-free)
# and derives mean/std with the same IEEE op sequence as the SQL oracle →
# bit-identical doubles under any partitioning, no rounding races.
# The generic float path (stages/profile.py Welford) stays for non-decimal
# data and is tolerance-tested in pytest instead.
# ---------------------------------------------------------------------------

_PROFILE_COLS = [("l_quantity", 1), ("l_extendedprice", 100),
                 ("l_discount", 100), ("l_tax", 100)]


def profile_lineitem(sf_dir: str) -> pa.Table:
    import math

    cols = [c for c, _ in _PROFILE_COLS]
    ds = _read(sf_dir, "lineitem", cols)

    def exact_sum_sq(u: np.ndarray) -> int:
        """Σu² as an exact Python bigint (chunked so int64 can't overflow)."""
        if not len(u):
            return 0
        m = int(np.abs(u).max())
        if m == 0:
            return 0
        chunk = max(1, (1 << 62) // (m * m))
        return sum(int(np.dot(v, v)) for v in
                   (u[i:i + chunk] for i in range(0, len(u), chunk)))

    def partial(batch: pa.Table) -> pa.Table:
        rows = []
        for c, scale in _PROFILE_COLS:
            x = batch.column(c).to_numpy(zero_copy_only=False)
            valid = x[~np.isnan(x)]
            u = np.rint(valid * scale).astype(np.int64)
            rows.append({"col": c, "n": len(x), "nulls": len(x) - len(valid),
                         "su": int(u.sum()), "suu": str(exact_sum_sq(u)),  # str: bigint > int64
                         "umin": int(u.min()) if len(u) else None,
                         "umax": int(u.max()) if len(u) else None})
        return pa.Table.from_pylist(rows)

    # partials are tiny (cols × blocks rows) → exact bigint merge on driver
    merged: dict[str, dict] = {}
    for t in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=4096, batch_format="pyarrow"):
        for r in t.to_pylist():
            m = merged.setdefault(r["col"], {"n": 0, "nulls": 0, "su": 0, "suu": 0,
                                             "umin": None, "umax": None})
            m["n"] += r["n"]
            m["nulls"] += r["nulls"]
            m["su"] += r["su"]
            m["suu"] += int(r["suu"])
            for k, f in (("umin", min), ("umax", max)):
                if r[k] is not None:
                    m[k] = r[k] if m[k] is None else f(m[k], r[k])

    rows = []
    for c, scale in _PROFILE_COLS:
        m = merged[c]
        n = m["n"] - m["nulls"]
        mean = float(m["su"]) / scale / n
        num = n * m["suu"] - m["su"] * m["su"]          # exact bigint
        std = math.sqrt(float(num) / (n * (n - 1))) / scale
        rows.append({"col": c, "n": m["n"], "null_count": m["nulls"],
                     "min_v": m["umin"] / scale, "max_v": m["umax"] / scale,
                     "mean_v": mean, "std_v": std})
    return pa.Table.from_pylist(rows)


def _profile_sql_one(col: str, scale: int, first: bool) -> str:
    u = f"CAST(round({col}*{scale}) AS BIGINT)"
    aliases = (" AS col", " AS n", " AS null_count", " AS min_v", " AS max_v",
               " AS mean_v", " AS std_v") if first else ("",) * 7
    return f"""
  SELECT '{col}'{aliases[0]}, count(*){aliases[1]},
         CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT){aliases[2]},
         CAST(min({u}) AS DOUBLE) / {scale}{aliases[3]},
         CAST(max({u}) AS DOUBLE) / {scale}{aliases[4]},
         CAST(sum({u}) AS DOUBLE) / {scale} / count({col}){aliases[5]},
         sqrt(CAST(count({col}) * sum({u}*{u}) - sum({u}) * sum({u}) AS DOUBLE)
              / (count({col}) * (count({col}) - 1))) / {scale}{aliases[6]}
  FROM lineitem"""


PROFILE_LINEITEM_SQL = ("SELECT * FROM (" + "\n  UNION ALL".join(
    _profile_sql_one(c, s, i == 0) for i, (c, s) in enumerate(_PROFILE_COLS)) + "\n)")


# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary: the canonical pre-aggregated groupby.
# Partial per-batch combine (pandas groupby inside map_batches) → streaming
# driver merge over the tiny (blocks × ~6-key) partial table. Money
# integerized (exact).
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str) -> pa.Table:
    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate"]
    ds = _read(sf_dir, "lineitem", cols)
    cutoff = np.datetime64("1998-09-02T00:00:00.000000")

    def partial(batch: pa.Table) -> pd.DataFrame:
        t = batch.filter(pc.less_equal(batch.column("l_shipdate"),
                                       pa.scalar(pd.Timestamp(cutoff))))
        if t.num_rows == 0:
            return pd.DataFrame({"l_returnflag": pd.Series([], dtype=str),
                                 "l_linestatus": pd.Series([], dtype=str),
                                 "qty": pd.Series([], dtype="int64"),
                                 "price_c": pd.Series([], dtype="int64"),
                                 "disc_price_u": pd.Series([], dtype="int64"),
                                 "charge_u": pd.Series([], dtype="int64"),
                                 "disc_c": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        price_c = np.rint(t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc_c = np.rint(t.column("l_discount").to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        tax_c = np.rint(t.column("l_tax").to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame({
            "l_returnflag": t.column("l_returnflag").to_pylist(),
            "l_linestatus": t.column("l_linestatus").to_pylist(),
            "qty": qty.astype(np.int64),
            "price_c": price_c,
            "disc_price_u": price_c * (100 - disc_c),            # 1e-4 units
            "charge_u": price_c * (100 - disc_c) * (100 + tax_c),  # 1e-6 units
            "disc_c": disc_c,
        })
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
        g["n"] = df.groupby(["l_returnflag", "l_linestatus"]).size().values
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow")
    # The group key space is tiny (return-flag × line-status ≈ 6) while
    # the partial table is O(blocks × keys) rows, so a streaming driver
    # merge with Python ints (exact at ANY corpus size — int64 Sum
    # aggregation could overflow the 1e-6-unit charge column at extreme
    # scale) replaces the sort-based all-to-all Aggregate, whose fixed
    # shuffle cost dominated this query at bench scale.
    _metrics = ("qty", "price_c", "disc_price_u", "charge_u", "disc_c", "n")
    totals: dict[tuple, list] = {}
    for t in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        if t.num_rows == 0:
            continue
        rf = t.column("l_returnflag").to_pylist()
        ls = t.column("l_linestatus").to_pylist()
        mcols = [t.column(c).to_pylist() for c in _metrics]
        for i in range(t.num_rows):
            acc = totals.setdefault((rf[i], ls[i]), [0] * len(_metrics))
            for j, col in enumerate(mcols):
                acc[j] += col[i]
    rows = []
    for (rf_k, ls_k), (qty, price_c, disc_price_u, charge_u, disc_c, n) in totals.items():
        rows.append({
            "l_returnflag": rf_k, "l_linestatus": ls_k,
            "sum_qty": float(qty),
            "sum_base_price": price_c / 100.0,
            "sum_disc_price": disc_price_u / 10000.0,
            "sum_charge": charge_u / 1000000.0,
            "avg_qty": _round6(qty / n),
            "avg_price": _round6(price_c / 100.0 / n),
            "avg_disc": _round6(disc_c / 100.0 / n),
            "count_order": n,
        })
    return pa.Table.from_pylist(sorted(rows, key=lambda r: (r["l_returnflag"], r["l_linestatus"])))


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 AS sum_base_price,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS sum_disc_price,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))
           * (100 + CAST(round(l_tax*100) AS BIGINT))) / 1000000.0 AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*), 6) AS avg_qty,
       round(sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 / count(*), 6) AS avg_price,
       round(sum(CAST(round(l_discount*100) AS BIGINT)) / 100.0 / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Grouped counts with skew-safe partial aggregation (lang distribution).
# Reference analog: value_counts in profiling; at scale this is the
# salted-key pattern's first stage (partials shrink the shuffle).
# ---------------------------------------------------------------------------

def lang_distribution_documents(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"lang": batch.column("lang").to_pylist(),
                           "chars": batch.column("n_chars").to_numpy(zero_copy_only=False)})
        g = df.groupby("lang", as_index=False).agg(n=("chars", "size"),
                                                   chars=("chars", "sum"))
        return g

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("lang")
           .aggregate(Sum("n", alias_name="n"), Sum("chars", alias_name="chars")))
    rows = [{"lang": r["lang"], "n": r["n"],
             "avg_chars": _round6(r["chars"] / r["n"])} for r in collect_pylist(agg)]
    return pa.Table.from_pylist(sorted(rows, key=lambda r: r["lang"]))


LANG_DIST_SQL = """
SELECT lang, count(*) AS n, round(sum(n_chars) / CAST(count(*) AS DOUBLE), 6) AS avg_chars
FROM documents GROUP BY lang ORDER BY lang
"""


# D4: distinct values (ds.unique — a shuffle, bounded output)
def distinct_orderpriority(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "orders", ["o_orderpriority"])
    vals = sorted(ds.unique("o_orderpriority"))
    return pa.table({"o_orderpriority": pa.array(vals, type=pa.string())})


DISTINCT_SQL = "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority"


# A6: fixed-bin histogram via integer bin ids + groupby-sum of partials
def histogram_quantity(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        q = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        bins = np.floor((q - 1) / 5).astype(np.int64)
        b, c = np.unique(bins, return_counts=True)
        return pa.table({"bin": b, "n": c.astype(np.int64)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("bin").aggregate(Sum("n", alias_name="n")))
    rows = sorted(collect_pylist(agg), key=lambda r: r["bin"])
    return pa.Table.from_pylist([{"bin": r["bin"], "n": r["n"]} for r in rows])


HISTOGRAM_SQL = """
SELECT CAST(floor((l_quantity - 1) / 5) AS BIGINT) AS bin, count(*) AS n
FROM lineitem GROUP BY 1 ORDER BY 1
"""


# K2/K3: top-k via distributed sort + limit
def top10_orders(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    top = ds.sort("o_totalprice", descending=True).limit(10)
    return pa.Table.from_pylist(collect_pylist(top)).select(["o_orderkey", "o_totalprice"])


TOP10_SQL = """
SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC LIMIT 10
"""


# Time-bucketed aggregation (pc.floor_temporal as groupby key — the
# warc_ts bucketing pattern from the north_star, on the events table)
def events_daily(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        val_u = np.rint(batch.column("value").to_numpy(zero_copy_only=False) * 1e6).astype(np.int64)
        df = pd.DataFrame({"day": day.to_numpy(zero_copy_only=False),
                           "event_type": batch.column("event_type").to_pylist(),
                           "value_u": val_u})
        g = df.groupby(["day", "event_type"], as_index=False).agg(
            n=("value_u", "size"), value_u=("value_u", "sum"))
        return g[["day", "event_type", "n", "value_u"]]

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["day", "event_type"])
           .aggregate(Sum("n", alias_name="n"), Sum("value_u", alias_name="value_u")))
    rows = [{"day": pd.Timestamp(r["day"]), "event_type": r["event_type"],
             "n": r["n"], "sum_value": r["value_u"] / 1e6} for r in collect_pylist(agg)]
    rows.sort(key=lambda r: (r["day"], r["event_type"]))
    return pa.Table.from_pylist(rows)


EVENTS_DAILY_SQL = """
SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n,
       sum(CAST(round(value*1000000) AS BIGINT)) / 1000000.0 AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def pivot_priority_status_orders(sf_dir: str) -> pa.Table:
    """Pivot/crosstab: order counts by priority (rows) × status
    (columns). Per-batch pandas crosstab partials pre-aggregate, one
    tiny groupby ships (priority, status, n) rows, and the bounded
    category matrix assembles on the driver (a pivot's output is
    category²-bounded by definition). Full SQL oracle."""
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"pri": batch.column("o_orderpriority").to_pylist(),
                           "st": batch.column("o_orderstatus").to_pylist()})
        g = df.groupby(["pri", "st"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["pri", "st"]).aggregate(Sum("n", alias_name="n")))
    cells = {(r["pri"], r["st"]): r["n"] for r in collect_pylist(agg)}
    pris = sorted({p for p, _ in cells})
    # the column set is PINNED (TPC-H's three order statuses, matching
    # PIVOT_SQL) — deriving it from observed values would make the
    # output schema data-dependent and break on a slice where one
    # status is absent
    stats = ["F", "O", "P"]
    rows = [{"o_orderpriority": p,
             **{f"n_{s}": int(cells.get((p, s), 0)) for s in stats}}
            for p in pris]
    return pa.Table.from_pylist(rows)


PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def daily_active_users_events(sf_dir: str) -> pa.Table:
    """Grouped DISTINCT count (daily active users): per-batch
    (day, user) dedupe is the combiner — the shuffle moves unique
    pairs, never raw events — then one bounded groupby(day) counts
    uniques per group. Full SQL oracle."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def local(batch: pa.Table) -> pd.DataFrame:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        df = pd.DataFrame({"day": day.to_numpy(zero_copy_only=False),
                           "user_id": batch.column("user_id")
                           .to_numpy(zero_copy_only=False)})
        return df.drop_duplicates()

    def dau_of_day(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"day": [g["day"].iloc[0]],
                             "dau": [int(g["user_id"].nunique())]})

    agg = (ds.map_batches(local, batch_format="pyarrow")
           .groupby("day").map_groups(dau_of_day, batch_format="pandas"))
    rows = [{"day": pd.Timestamp(r["day"]), "dau": r["dau"]}
            for r in collect_pylist(agg)]
    rows.sort(key=lambda r: r["day"])
    return pa.Table.from_pylist(rows)


DAU_SQL = """
SELECT date_trunc('day', ts) AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS dau
FROM events GROUP BY 1 ORDER BY 1
"""


def _active_users_hll(sf_dir: str, unit: str, time_col: str,
                      val_col: str) -> pa.Table:
    """The SKETCH-based scale path beside daily_active_users_events:
    per-batch HLL register partials per day (one 2^p-byte blob per
    (batch, day) — never user ids) merge under one bounded
    groupby(day). At 10¹² rows the exact path's unique-pair shuffle
    scales with distinct (day, user) pairs; this one ships a constant
    ~4 KB per day per block.

    An HLL sketch is fully DETERMINISTIC given the hash function
    (register max is order-independent), so with md5-lower-64 user
    hashes (= DuckDB ``md5_number_lower``) the whole estimator is
    bit-reproducible in SQL: DAU_HLL_SQL recomputes every register,
    the exact-integer harmonic denominator Σ 2^(53−M_j) (HUGEINT —
    no float-sum order sensitivity), and the Flajolet linear-counting
    branch. rho uses exact bit-length (frexp / bin()), not float
    log2, which rounds UP at w = 2^k − 1 for k ≳ 48."""
    import hashlib
    import math

    import pandas as pd

    ds = _read(sf_dir, "events", ["ts", "user_id"])
    P = 12
    M = 1 << P
    WBITS = 64 - P  # 52: frexp-exact (< 2^53)

    def partial(batch: pa.Table) -> pd.DataFrame:
        day = pc.floor_temporal(batch.column("ts"), unit=unit) \
            .to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(uid, return_inverse=True)
        hu = np.fromiter(
            (int.from_bytes(hashlib.md5(str(int(u)).encode()).digest()[8:],
                            "little") for u in uniq),
            dtype=np.uint64, count=len(uniq))
        h = hu[inv]
        rows = []
        for d in np.unique(day):
            hd = h[day == d]
            idx = (hd >> np.uint64(WBITS)).astype(np.int64)
            w = (hd & np.uint64((1 << WBITS) - 1)).astype(np.float64)
            # exact bit-length via frexp exponent (w < 2^53 ⇒ exact);
            # rho = WBITS - (bitlen-1), and frexp(0).exp = 0 ⇒ rho 53.
            rho = (WBITS + 1 - np.frexp(w)[1]).astype(np.uint8)
            regs = np.zeros(M, dtype=np.uint8)
            np.maximum.at(regs, idx, rho)
            rows.append({"day": d, "regs": regs.tobytes()})
        return pd.DataFrame(rows)

    def merge_day(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(M, dtype=np.uint8)
        for blob in g["regs"]:
            np.maximum(regs, np.frombuffer(blob, dtype=np.uint8), out=regs)
        # exact integer denominator, scaled by 2^53: Σ 2^(53 - M_j)
        cnt = np.bincount(regs, minlength=WBITS + 2)
        s = sum(int(c) << (WBITS + 1 - r) for r, c in enumerate(cnt) if c)
        alpha = 0.7213 / (1.0 + 1.079 / M)
        raw = alpha * M * M * float(1 << (WBITS + 1)) / float(s)
        v = int(cnt[0])
        est = M * math.log(M / v) if (raw <= 2.5 * M and v > 0) else raw
        return pd.DataFrame([{"day": g["day"].iloc[0],
                              val_col: float(est)}])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("day").map_groups(merge_day, batch_format="pandas"))
    rows = [{time_col: pd.Timestamp(r["day"]), val_col: r[val_col]}
            for r in collect_pylist(agg)]
    rows.sort(key=lambda r: r[time_col])
    return pa.Table.from_pylist(rows)


def daily_active_users_hll_events(sf_dir: str) -> pa.Table:
    return _active_users_hll(sf_dir, "day", "day", "dau_approx")


def weekly_active_users_hll_events(sf_dir: str) -> pa.Table:
    """Weekly active users from the SAME HLL machinery — the register
    MAX is associative and order-free, so coarsening the time bucket is
    just a different groupby key; at 10^12 rows the weekly estimate
    still ships ~4 KB per (block, week). Oracle: DAU_HLL_SQL with the
    week truncation (WEEKLY_HLL_SQL below)."""
    return _active_users_hll(sf_dir, "week", "week", "wau_approx")


# The HLL estimator replayed in pure SQL: identical md5 hashes,
# identical registers (order-free MAX), identical exact-HUGEINT
# harmonic denominator, identical float op order in the estimate.
DAU_HLL_SQL = """
WITH h AS (
  SELECT date_trunc('day', ts) AS day,
         md5_number_lower(CAST(user_id AS VARCHAR)) AS h
  FROM events
),
reg AS (
  SELECT day,
         CAST(h >> 52 AS INTEGER) AS idx,
         MAX(CASE WHEN (h & ((1::UBIGINT << 52) - 1)) = 0 THEN 53
                  ELSE 53 - length(bin(h & ((1::UBIGINT << 52) - 1)))
             END) AS m_j
  FROM h GROUP BY day, idx
),
agg AS (
  SELECT day,
         SUM(1::HUGEINT << (53 - m_j)) AS s_present,
         COUNT(*) AS n_regs
  FROM reg GROUP BY day
),
est AS (
  SELECT day,
         4096 - n_regs AS v_zero,
         0.7213 / (1.0 + 1.079 / 4096) * 4096 * 4096
           * 9007199254740992.0
           / CAST(s_present
                  + (4096::HUGEINT - n_regs) * (1::HUGEINT << 53)
                  AS DOUBLE) AS raw
  FROM agg
)
SELECT day,
       CASE WHEN raw <= 2.5 * 4096 AND v_zero > 0
            THEN 4096 * ln(4096.0 / v_zero)
            ELSE raw END AS dau_approx
FROM est ORDER BY day
"""

WEEKLY_HLL_SQL = (DAU_HLL_SQL
                  .replace("date_trunc('day', ts)", "date_trunc('week', ts)")
                  .replace(" AS day", " AS week")
                  .replace("SELECT day", "SELECT week")
                  .replace("GROUP BY day", "GROUP BY week")
                  .replace("ORDER BY day", "ORDER BY week")
                  .replace("dau_approx", "wau_approx"))


def price_quantiles_by_priority(sf_dir: str) -> pa.Table:
    """Per-group EXACT quantiles (p25/p50/p75/p95 of o_totalprice by
    o_orderpriority): integerized micro-money sorts within each
    bounded group; linear-interpolation percentiles match DuckDB's
    quantile_cont bit-for-bit on the integer grid. (The unbounded-
    cardinality scale path is the t-digest sketch, kernels/tdigest.py
    — this exact kernel is the oracle anchor.) Full SQL oracle."""
    import pandas as pd

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def local(batch: pa.Table) -> pd.DataFrame:
        u = np.rint(batch.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pd.DataFrame({"pri": batch.column("o_orderpriority").to_pylist(),
                             "cents": u})

    def q_of_group(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["cents"].to_numpy(dtype=np.int64)).astype(np.float64)
        qs = {f"p{int(p*100):02d}": round(float(np.percentile(v, p * 100)
                                                / 100.0), 6)
              for p in (0.25, 0.50, 0.75, 0.95)}
        return pd.DataFrame([{"o_orderpriority": g["pri"].iloc[0],
                              "n": int(len(v)), **qs}])

    out = (ds.map_batches(local, batch_format="pyarrow")
           .groupby("pri").map_groups(q_of_group, batch_format="pandas"))
    rows = sorted(collect_pylist(out), key=lambda r: r["o_orderpriority"])
    return pa.Table.from_pylist(rows)


def price_quantiles_by_priority_tdigest(sf_dir: str) -> pa.Table:
    """The SKETCH path beside price_quantiles_by_priority: per-batch
    per-group t-digest partials (bounded centroid state per (block,
    group) — never raw values) merge under one bounded groupby. At
    unbounded group cardinality the exact path's per-group sort stops
    fitting a task; this one ships ~KB-sized digests. Rows-only driver
    check; the ±2% accuracy contract vs the exact SQL-oracled path is
    pytest-enforced."""
    import pandas as pd

    from tanml_ray.kernels.tdigest import TDigest

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        pri = np.asarray(batch.column("o_orderpriority").to_pylist(),
                         dtype=object)
        val = batch.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        rows = []
        import pickle

        for p in np.unique(pri):
            d = TDigest()
            d.update(val[pri == p])
            rows.append({"pri": str(p), "state": pickle.dumps(d.to_state())})
        return pd.DataFrame(rows)

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        import pickle

        from tanml_ray.kernels.tdigest import TDigest as TD

        d = None
        for blob in g["state"]:
            o = TD.from_state(pickle.loads(blob))
            d = o if d is None else d.merge(o)
        return pd.DataFrame([{
            "o_orderpriority": g["pri"].iloc[0],
            "n": int(round(d.n)),
            **{f"p{int(q*100):02d}": round(float(d.quantile(q)), 6)
               for q in (0.25, 0.50, 0.75, 0.95)}}])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("pri").map_groups(merge_group, batch_format="pandas"))
    rows = sorted(collect_pylist(out), key=lambda r: r["o_orderpriority"])
    return pa.Table.from_pylist(rows)


GROUP_QUANTILES_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.25) / 100.0, 6) AS p25,
       round(quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.50) / 100.0, 6) AS p50,
       round(quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.75) / 100.0, 6) AS p75,
       round(quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.95) / 100.0, 6) AS p95
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# J3: referential constraint as broadcast anti-join (violations table).
# Allowed set deliberately restricted so real violations exist.
REF_ALLOWED_LANGS = ("en", "es", "zh")


def referential_lang_violations(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    allowed = pa.array(REF_ALLOWED_LANGS, type=pa.string())

    def anti(batch: pa.Table) -> pa.Table:
        bad = pc.invert(pc.is_in(batch.column("lang"), value_set=allowed))
        return batch.filter(pc.fill_null(bad, True))

    out = ds.map_batches(anti, batch_format="pyarrow")
    rows = sorted(collect_pylist(out), key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"doc_id": pa.array([], type=pa.int64()), "lang": pa.array([], type=pa.string())})


REF_LANG_SQL = """
SELECT doc_id, lang FROM documents WHERE lang NOT IN ('en', 'es', 'zh') ORDER BY doc_id
"""


# A10/D1: duplicate detection via groupby count>1 (uniqueness violations)
def duplicate_user_event_pairs(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"user_id": batch.column("user_id").to_numpy(zero_copy_only=False),
                           "event_type": batch.column("event_type").to_pylist()})
        return from_pandas_clean(
            df.groupby(["user_id", "event_type"], as_index=False).size().rename(
                columns={"size": "n"}))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["user_id", "event_type"])
           .aggregate(Sum("n", alias_name="n")))
    dups = agg.map_batches(lambda t: t.filter(pc.greater(t.column("n"), 1)),
                           batch_format="pyarrow")
    rows = sorted(collect_pylist(dups), key=lambda r: (r["user_id"], r["event_type"]))
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"user_id": pa.array([], type=pa.int64()),
         "event_type": pa.array([], type=pa.string()),
         "n": pa.array([], type=pa.int64())})


DUP_PAIRS_SQL = """
SELECT user_id, event_type, count(*) AS n
FROM events GROUP BY 1, 2 HAVING count(*) > 1 ORDER BY 1, 2
"""


# A11: Pearson correlation from single-pass partials (n, Σx, Σy, Σxy, Σx², Σy²)
# Reference: analysis/correlation.py:23-42 (df.corr on full frame).
def pearson_corr_lineitem(sf_dir: str) -> pa.Table:
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _read(sf_dir, "lineitem", cols)
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]

    def partial(batch: pa.Table) -> pa.Table:
        arrs = {c: batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                for c in cols}
        rows = []
        for a, b in pairs:
            x, y = arrs[a], arrs[b]
            rows.append({"pair": f"{a}|{b}", "n": float(len(x)),
                         "sx": float(x.sum()), "sy": float(y.sum()),
                         "sxy": float((x * y).sum()),
                         "sxx": float((x * x).sum()), "syy": float((y * y).sum())})
        return pa.Table.from_pylist(rows)

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("pair")
           .aggregate(*[Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy")]))
    rows = []
    for r in collect_pylist(agg):
        n, sx, sy, sxy, sxx, syy = (r[k] for k in ("n", "sx", "sy", "sxy", "sxx", "syy"))
        denom = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        corr = (n * sxy - sx * sy) / denom if denom > 0 else float("nan")
        a, b = r["pair"].split("|")
        rows.append({"col_x": a, "col_y": b, "r": _round6(corr)})
    rows.sort(key=lambda r: (r["col_x"], r["col_y"]))
    return pa.Table.from_pylist(rows)


PEARSON_SQL = """
SELECT col_x, col_y, round(r, 6) AS r FROM (
  SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
         corr(l_quantity, l_extendedprice) AS r FROM lineitem
  UNION ALL SELECT 'l_quantity', 'l_discount', corr(l_quantity, l_discount) FROM lineitem
  UNION ALL SELECT 'l_quantity', 'l_tax', corr(l_quantity, l_tax) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', 'l_discount', corr(l_extendedprice, l_discount) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', 'l_tax', corr(l_extendedprice, l_tax) FROM lineitem
  UNION ALL SELECT 'l_discount', 'l_tax', corr(l_discount, l_tax) FROM lineitem
) ORDER BY col_x, col_y
"""


# A7: PSI between two categorical distributions (even vs odd doc_id) —
# the grouped-drift formula with a full SQL oracle.
def psi_documents_even_odd(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.kernels.drift_math import psi_from_counts

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"lang": batch.column("lang").to_pylist(),
                           "side": batch.column("doc_id").to_numpy(zero_copy_only=False) % 2})
        return df.groupby(["lang", "side"], as_index=False).size().rename(columns={"size": "n"})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["lang", "side"]).aggregate(Sum("n", alias_name="n")))
    counts: dict[str, list[int]] = {}
    for r in collect_pylist(agg):
        counts.setdefault(r["lang"], [0, 0])[int(r["side"])] = r["n"]
    langs = sorted(counts)
    even = np.array([counts[l][0] for l in langs], dtype=np.float64)
    odd = np.array([counts[l][1] for l in langs], dtype=np.float64)
    return pa.table({"psi": pa.array([_round6(psi_from_counts(even, odd))], type=pa.float64())})


PSI_SQL = """
WITH e AS (SELECT lang, count(*) AS n FROM documents WHERE doc_id % 2 = 0 GROUP BY lang),
     o AS (SELECT lang, count(*) AS n FROM documents WHERE doc_id % 2 = 1 GROUP BY lang),
     tot AS (SELECT (SELECT sum(n) FROM e) AS te, (SELECT sum(n) FROM o) AS tn),
     p AS (SELECT coalesce(e.lang, o.lang) AS lang,
                  greatest(coalesce(e.n, 0) / (SELECT te FROM tot), 1e-8) AS pe,
                  greatest(coalesce(o.n, 0) / (SELECT tn FROM tot), 1e-8) AS po
           FROM e FULL OUTER JOIN o ON e.lang = o.lang)
SELECT round(sum((po - pe) * ln(po / pe)), 6) AS psi FROM p
"""


# M10: label encoding — distinct+sort broadcast vocab → index_in map
# Reference: preprocessing.py:226-229 (LabelEncoder per column).
def label_encode_mktsegment(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    vocab = pa.array(sorted(ds.unique("c_mktsegment")), type=pa.string())

    def encode(batch: pa.Table) -> pa.Table:
        code = pc.index_in(batch.column("c_mktsegment"), value_set=vocab)
        return pa.table({"c_custkey": batch.column("c_custkey"),
                         "code": pc.cast(code, pa.int64())})

    out = ds.map_batches(encode, batch_format="pyarrow")
    rows = sorted(collect_pylist(out), key=lambda r: r["c_custkey"])
    return pa.Table.from_pylist(rows)


LABEL_ENCODE_SQL = """
SELECT c_custkey, CAST(dense_rank() OVER (ORDER BY c_mktsegment) - 1 AS BIGINT) AS code
FROM customer ORDER BY c_custkey
"""


# M9: one-hot encoding — bounded distinct vocab → 0/1 indicator columns
# Reference: preprocessing.py:223-224 (pd.get_dummies).
def onehot_orderpriority(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    vocab = sorted(ds.unique("o_orderpriority"))

    def encode(batch: pa.Table) -> pa.Table:
        cols = {"o_orderkey": batch.column("o_orderkey")}
        vals = batch.column("o_orderpriority")
        for v in vocab:
            name = "p_" + v.split("-")[0].lower()
            cols[name] = pc.cast(pc.equal(vals, v), pa.int64())
        return pa.table(cols)

    out = ds.map_batches(encode, batch_format="pyarrow")
    rows = sorted(collect_pylist(out), key=lambda r: r["o_orderkey"])
    return pa.Table.from_pylist(rows)


def onehot_sql() -> str:
    # vocab is the 5 TPC-H priorities: 1-URGENT..5-LOW
    cases = ",\n       ".join(
        f"CAST(CASE WHEN o_orderpriority = '{i}-{name}' THEN 1 ELSE 0 END AS BIGINT) AS p_{i}"
        for i, name in [("1", "URGENT"), ("2", "HIGH"), ("3", "MEDIUM"),
                        ("4", "NOT SPECIFIED"), ("5", "LOW")])
    return f"SELECT o_orderkey,\n       {cases}\nFROM orders ORDER BY o_orderkey"


# Text analysis: token counting (whitespace regex — exact SQL parity)
def token_counts_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count_tokens(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"), r"\S+")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_tokens": pc.cast(n, pa.int64())})

    out = ds.map_batches(count_tokens, batch_format="pyarrow")
    rows = sorted(collect_pylist(out), key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows)


TOKEN_COUNTS_SQL = """
SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
FROM documents ORDER BY doc_id
"""


# Exact dedup representative: first (min doc_id) per (lang, source) group
# — hash-partition groupby + per-group min, the keep="first" semantics.
def dedup_first_per_group(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Min

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source"])
    agg = ds.groupby(["lang", "source"]).aggregate(Min("doc_id", alias_name="first_doc_id"))
    rows = sorted(collect_pylist(agg), key=lambda r: (r["lang"], r["source"]))
    return pa.Table.from_pylist(rows)


DEDUP_FIRST_SQL = """
SELECT lang, source, min(doc_id) AS first_doc_id
FROM documents GROUP BY lang, source ORDER BY lang, source
"""


# ---------------------------------------------------------------------------
# Text analysis (stages/text.py) — quality features + md5 fingerprints
# with full SQL parity; lang-ID is heuristic (rows-only check).
# ---------------------------------------------------------------------------

def text_quality_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.stages.text import quality_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(lambda b: quality_batch(b), batch_format="pyarrow")
    rows = sorted(collect_pylist(out.select_columns(
        ["doc_id", "n_chars", "n_tokens", "n_punct", "punct_ratio"])),
        key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows)


TEXT_QUALITY_SQL = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT) AS n_punct,
       round(CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
             / length(text), 6) AS punct_ratio
FROM documents ORDER BY doc_id
"""


def fingerprint_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.stages.text import fingerprint_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(lambda b: fingerprint_batch(b), batch_format="pyarrow")
    rows = sorted(collect_pylist(out), key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows)


FINGERPRINT_SQL = """
SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents ORDER BY doc_id
"""


def langid_documents(sf_dir: str) -> pa.Table:
    """Heuristic language-ID; LANGID_SQL mirrors the full heuristic
    (CJK branch, stopword ratios, tie-break, und branches) exactly."""
    from tanml_ray.stages.text import langid_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(lambda b: langid_batch(b), batch_format="pyarrow")
    rows = sorted(collect_pylist(out), key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows)


# ---------------------------------------------------------------------------
# J1: leakage row-hash overlap (reference ui/services/data.py:75-96) —
# md5-of-normalized-text semi-join between two deterministic splits.
# Broadcast the (small) baseline hash set; no shuffle.
# ---------------------------------------------------------------------------

def leakage_overlap_documents(sf_dir: str) -> pa.Table:
    import ray

    from tanml_ray.stages.text import fingerprint_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    train = ds.map_batches(
        lambda b: fingerprint_batch(b.filter(pc.less(b.column("doc_id"), 300))),
        batch_format="pyarrow")
    train_hashes = {r["fingerprint"] for r in collect_pylist(train)}
    ref = ray.put(train_hashes)

    def overlap_partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        hs = _ray.get(ref)
        sub = batch.filter(pc.greater_equal(batch.column("doc_id"), 200))
        fp = fingerprint_batch(sub)
        hits = sum(1 for f in fp.column("fingerprint").to_pylist() if f in hs)
        return pa.table({"n_test": pa.array([sub.num_rows], type=pa.int64()),
                         "n_overlap": pa.array([hits], type=pa.int64())})

    parts = collect_pylist(ds.map_batches(overlap_partial, batch_format="pyarrow"))
    n_test = sum(r["n_test"] for r in parts)
    n_overlap = sum(r["n_overlap"] for r in parts)
    return pa.table({"n_test": pa.array([n_test], type=pa.int64()),
                     "n_overlap": pa.array([n_overlap], type=pa.int64()),
                     "overlap_pct": pa.array([_round6(100.0 * n_overlap / n_test)],
                                             type=pa.float64())})


LEAKAGE_SQL = """
WITH train AS (SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h
               FROM documents WHERE doc_id < 300),
     test AS (SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h
              FROM documents WHERE doc_id >= 200)
SELECT (SELECT count(*) FROM test) AS n_test,
       (SELECT count(*) FROM test WHERE h IN (SELECT h FROM train)) AS n_overlap,
       round(100.0 * (SELECT count(*) FROM test WHERE h IN (SELECT h FROM train))
             / (SELECT count(*) FROM test), 6) AS overlap_pct
"""


# ---------------------------------------------------------------------------
# Similarity search (pipelines/similarity.py)
# ---------------------------------------------------------------------------

_KNN_QUERY_IDS = (0, 1, 2)


def _query_vectors(sf_dir: str, ids: tuple[int, ...]) -> dict[int, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    want = set(ids)
    out = {}
    for vid, vec in zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()):
        if vid in want:
            out[vid] = np.asarray(vec, dtype=np.float64)
    return out


def knn_cosine_embeddings(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.similarity import knn_cosine

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_cosine(ds, _query_vectors(sf_dir, _KNN_QUERY_IDS), k=10)


KNN_SQL = """
SELECT q.vec_id AS query_id, e.vec_id, round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS sim
FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
WHERE q.vec_id IN (0, 1, 2)
QUALIFY row_number() OVER (PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC,
                                    e.vec_id) <= 10
ORDER BY query_id, sim DESC, e.vec_id
"""


def knn_cosine_lsh_embeddings(sf_dir: str) -> pa.Table:
    """LSH bucketed top-k, full-oracle configuration: (n_bits=5,
    multiprobe=4) probes every bucket within Hamming 4 of the query's
    5-bit hyperplane code, which on BOTH the sf0.01 and sf0.1 fixtures
    covers the true top-10 (verified equal to the exact scan at both
    scales), so the exact-KNN SQL is a real end-to-end oracle of the
    bucketing + multiprobe + re-rank machinery. The RECALL-oriented
    operating point (more bits, fewer probes) keeps its
    recall/determinism contract in tests/test_dedup_text.py."""
    from tanml_ray.pipelines.similarity import knn_cosine_lsh

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_cosine_lsh(ds, _query_vectors(sf_dir, _KNN_QUERY_IDS), k=10,
                          n_bits=5, multiprobe=4)


def knn_cosine_ivf_embeddings(sf_dir: str) -> pa.Table:
    """Approximate IVF top-k over a centroid-partitioned index built
    under /tmp. Driver oracle: the exact KNN_SQL — n_probe=6 covers
    the true top-10 on both fixture scales (verified), so the
    build→prune→re-rank machinery is checked end-to-end; recall vs
    exact also stays a pytest contract (tests/test_dedup_text.py
    TestIvfIndexedKnn)."""
    import os

    from tanml_ray.pipelines.similarity import (
        build_ivf_index,
        knn_cosine_ivf_indexed,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # cache key carries the source file's identity (size + mtime_ns),
    # so a regenerated embeddings table — or another sf dir sharing a
    # basename — can never serve a stale index; the atomic build means
    # a present _ivf_meta.json implies a complete index
    st = os.stat(f"{sf_dir}/embeddings.parquet")
    tag = sf_dir.rstrip("/").split("/")[-1]
    idx = f"/tmp/tanml_ivf_{tag}_{st.st_size}_{st.st_mtime_ns}"
    if not os.path.exists(os.path.join(idx, "_ivf_meta.json")):
        build_ivf_index(ds, idx)
    return knn_cosine_ivf_indexed(idx, _query_vectors(sf_dir, _KNN_QUERY_IDS),
                                  k=10, n_probe=6)


def embedding_near_dup_pairs(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.dedup import embedding_near_dups

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_near_dups(ds, threshold=0.4)


EMB_NEAR_DUP_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# Dedup suite (pipelines/dedup.py) — rows-only checks for the LSH family
# (not SQL-expressible); exact dedup has a full oracle.
# ---------------------------------------------------------------------------

def exact_dedup_documents(sf_dir: str) -> pa.Table:
    """Exact dedup keep-first by content hash. Content hashes are
    engine-internal (pd.util.hash_array), so the oracle checks the
    RESULT semantics: one kept id per distinct text, min doc_id."""
    from tanml_ray.pipelines.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    agg = exact_dedup(ds)
    rows = sorted(({"keep_id": r["keep_id"], "n": r["n"]} for r in collect_pylist(agg)),
                  key=lambda r: r["keep_id"])
    return pa.Table.from_pylist(rows)


EXACT_DEDUP_SQL = """
SELECT min(doc_id) AS keep_id, count(*) AS n
FROM documents GROUP BY text ORDER BY keep_id
"""


def minhash_near_dup_documents(sf_dir: str) -> pa.Table:
    """MinHash+LSH near-dup pairs with exact-Jaccard verify on the
    survivors. Because the emitted jaccard is EXACT (the signatures
    only gate candidacy) and 16-band/64-perm LSH recall at the 0.6
    threshold is ≈1 (miss prob (1−0.6⁴)¹⁶ ≈ 10⁻²; zero misses on the
    sf0.01/sf0.1 fixtures, verified), the brute-force shingle-Jaccard
    SQL is a full value oracle, not just a row check."""
    from tanml_ray.pipelines.dedup import minhash_lsh_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_pairs(ds, threshold=0.6)


MINHASH_NEAR_DUP_SQL = r"""
WITH norm AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
  FROM documents WHERE text IS NOT NULL
), sh AS (
  SELECT doc_id, CASE WHEN length(t) < 5 THEN [t] ELSE
     list_transform(generate_series(1, length(t)-4), i -> substr(t, i, 5))
     END AS gl
  FROM norm WHERE length(t) > 0
), d AS (
  SELECT DISTINCT doc_id, unnest(gl) AS g FROM sh
), cnt AS (
  SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM d a JOIN d b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(CAST(i AS DOUBLE)/(ca.n + cb.n - i), 6) AS jaccard
FROM inter JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
WHERE CAST(i AS DOUBLE)/(ca.n + cb.n - i) >= 0.6
ORDER BY id_a, id_b
"""


def simhash_near_dup_documents(sf_dir: str) -> pa.Table:
    """SimHash hamming≤3 pairs. md5-lower-64 token hashes + the exact
    4-block pigeonhole make the whole operator SQL-reproducible: the
    oracle recomputes every fingerprint with md5_number_lower() and
    bit arithmetic, then brute-forces the hamming≤3 pair set."""
    from tanml_ray.pipelines.dedup import simhash_near_dups

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_near_dups(ds, max_hamming=3)


SIMHASH_NEAR_DUP_SQL = r"""
WITH toks AS (
  SELECT doc_id, md5_number_lower(unnest(regexp_extract_all(lower(text), '\S+'))) AS h
  FROM documents WHERE text IS NOT NULL
), bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM toks CROSS JOIN generate_series(0, 63) t(b)
  GROUP BY 1, 2
), fp AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN CAST(CAST(1 AS UBIGINT) << b AS HUGEINT)
                       ELSE 0 END) AS UBIGINT) AS f
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.f, b.f)) AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.f, b.f)) <= 3
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# A15/A16: model evaluation metrics (pipelines/metrics.py) over a
# deterministic closed-form scorer so the SQL oracle can reproduce the
# exact same predictions: score = sigmoid((9131 − order_day)/365),
# label = (o_orderstatus = 'F'). AUC is the exact Mann-Whitney midrank
# statistic on both sides.
# ---------------------------------------------------------------------------

def _scored_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_orderdate",
                                  "o_totalprice"])

    def score(batch: pa.Table) -> pa.Table:
        days = (batch.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
                // 86_400_000_000)
        x = (9131 - days) / 365.0
        s = 1.0 / (1.0 + np.exp(-x))
        y = pc.cast(pc.equal(batch.column("o_orderstatus"), "F"), pa.int64())
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "label": y, "score": pa.array(s, type=pa.float64()),
                         "o_totalprice": batch.column("o_totalprice")})

    return ds.map_batches(score, batch_format="pyarrow")


def classification_metrics_orders(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.metrics import classification_metrics

    m = classification_metrics(_scored_orders(sf_dir), "label", "score")
    row = {k: (_round6(v) if isinstance(v, float) else v) for k, v in m.items()}
    return pa.Table.from_pylist([row])


CLASSIFICATION_METRICS_SQL = """
WITH scored AS (
  SELECT CAST(o_orderstatus = 'F' AS BIGINT) AS y,
         1.0 / (1.0 + exp(-((9131 - datediff('day', DATE '1970-01-01',
                                             CAST(o_orderdate AS DATE))) / 365.0))) AS s
  FROM orders
), conf AS (
  SELECT count(*) AS n,
         sum(CASE WHEN s >= 0.5 AND y = 1 THEN 1 ELSE 0 END) AS tp,
         sum(CASE WHEN s >= 0.5 AND y = 0 THEN 1 ELSE 0 END) AS fp,
         sum(CASE WHEN s < 0.5 AND y = 0 THEN 1 ELSE 0 END) AS tn,
         sum(CASE WHEN s < 0.5 AND y = 1 THEN 1 ELSE 0 END) AS fn,
         avg((s - y) * (s - y)) AS brier,
         avg(-(y * ln(greatest(least(s, 1 - 1e-15), 1e-15))
               + (1 - y) * ln(1 - greatest(least(s, 1 - 1e-15), 1e-15)))) AS log_loss
  FROM scored
), ranked AS (
  SELECT y, avg(rn) OVER (PARTITION BY s) AS midrank
  FROM (SELECT y, s, row_number() OVER (ORDER BY s) AS rn FROM scored)
), auc_t AS (
  SELECT (sum(CASE WHEN y = 1 THEN midrank ELSE 0 END)
          - (sum(y) * (sum(y) + 1)) / 2.0)
         / (sum(y) * (count(*) - sum(y))) AS auc
  FROM ranked
)
SELECT n,
       round(CAST(tp + tn AS DOUBLE) / n, 6) AS accuracy,
       round(CASE WHEN tp + fp = 0 THEN 0.0
                  ELSE CAST(tp AS DOUBLE) / (tp + fp) END, 6) AS precision,
       round(CASE WHEN tp + fn = 0 THEN 0.0
                  ELSE CAST(tp AS DOUBLE) / (tp + fn) END, 6) AS recall,
       round(CASE WHEN tp = 0 THEN 0.0
                  ELSE 2.0 * (CAST(tp AS DOUBLE) / (tp + fp)) * (CAST(tp AS DOUBLE) / (tp + fn))
                       / (CAST(tp AS DOUBLE) / (tp + fp) + CAST(tp AS DOUBLE) / (tp + fn)) END, 6) AS f1,
       round((CASE WHEN tp + fn = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / (tp + fn) END
              + CASE WHEN tn + fp = 0 THEN 0.0 ELSE CAST(tn AS DOUBLE) / (tn + fp) END) / 2, 6)
           AS balanced_accuracy,
       round(CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) = 0 THEN 0.0
                  ELSE (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                       / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn) * (tn + fp) * (tn + fn)) END, 6) AS mcc,
       round(brier, 6) AS brier,
       round(log_loss, 6) AS log_loss,
       round((SELECT auc FROM auc_t), 6) AS roc_auc,
       round(2 * (SELECT auc FROM auc_t) - 1, 6) AS gini
FROM conf
"""


def regression_metrics_orders(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.metrics import regression_metrics

    ds = _scored_orders(sf_dir)

    def pred(batch: pa.Table) -> pa.Table:
        y = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        k = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        p = y * 0.9 + ((k % 1000) - 500.0)
        return pa.table({"y": pa.array(y, type=pa.float64()),
                         "pred": pa.array(p, type=pa.float64())})

    m = regression_metrics(ds.map_batches(pred, batch_format="pyarrow"), "y", "pred")
    row = {k: (_round6(v) if isinstance(v, float) else v) for k, v in m.items()}
    return pa.Table.from_pylist([row])


REGRESSION_METRICS_SQL = """
WITH p AS (
  SELECT o_totalprice AS y,
         o_totalprice * 0.9 + ((o_orderkey % 1000) - 500.0) AS pred
  FROM orders
)
SELECT count(*) AS n,
       round(sqrt(avg((pred - y) * (pred - y))), 6) AS rmse,
       round(avg(abs(pred - y)), 6) AS mae,
       round(median(abs(pred - y)), 6) AS median_ae,
       round(1 - sum((pred - y) * (pred - y))
                 / (sum(y * y) - sum(y) * sum(y) / count(*)), 6) AS r2
FROM p
"""


# ---------------------------------------------------------------------------
# ML-ops operators (pipelines/mlops.py): coverage, stress, VIF, split,
# sampling, imputation — each with a full SQL oracle.
# ---------------------------------------------------------------------------

# fixed reference centers for the coverage oracle (config constants, so
# the static SQL can reproduce the broadcast-predict map exactly)
_COVERAGE_CENTERS = [[10.0, 0.02, 0.02], [25.0, 0.05, 0.04],
                     [40.0, 0.08, 0.06], [50.0, 0.10, 0.08]]
_COVERAGE_THRESHOLD = 12.0
_COVERAGE_COLS = ["l_quantity", "l_discount", "l_tax"]


def cluster_coverage_lineitem(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import cluster_coverage

    ds = _read(sf_dir, "lineitem", _COVERAGE_COLS)
    return cluster_coverage(ds, _COVERAGE_COLS, np.asarray(_COVERAGE_CENTERS),
                            _COVERAGE_THRESHOLD)


def _coverage_sql() -> str:
    dists = []
    for c in _COVERAGE_CENTERS:
        dists.append(f"sqrt((l_quantity - {c[0]})*(l_quantity - {c[0]})"
                     f" + (l_discount - {c[1]})*(l_discount - {c[1]})"
                     f" + (l_tax - {c[2]})*(l_tax - {c[2]}))")
    d_cols = ", ".join(f"{d} AS d{i}" for i, d in enumerate(dists))
    least = "least(d0, d1, d2, d3)"
    argmin = ("CASE " + " ".join(
        f"WHEN d{i} = {least} THEN {i}" for i in range(4)) + " END")
    return f"""
WITH d AS (SELECT {d_cols} FROM lineitem),
     a AS (SELECT {argmin} AS cluster, {least} AS mind FROM d)
SELECT cluster, count(*) AS n,
       CAST(sum(CASE WHEN mind > {_COVERAGE_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT) AS n_ood
FROM a GROUP BY cluster ORDER BY cluster
"""


def stress_test_orders(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import stress_test_regression

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def pred_fn(feat, keys):
        return feat * 0.9 + ((keys % 1000) - 500.0)

    out = stress_test_regression(ds, "o_orderkey", "o_totalprice", pred_fn,
                                 epsilons=(0.1, -0.1), mod=5)
    rows = [{"feature": r["feature"], "perturbation": r["perturbation"],
             "rmse": _round6(r["rmse"]), "delta": _round6(r["delta"])}
            for r in out.to_pylist()]
    return pa.Table.from_pylist(rows)


STRESS_SQL = """
WITH eps(e) AS (VALUES (0.0), (0.1), (-0.1)),
     scored AS (
       SELECT e.e,
              o_totalprice AS y,
              (CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * (1.0 + e.e)
                    ELSE o_totalprice END) * 0.9
              + ((o_orderkey % 1000) - 500.0) AS pred
       FROM orders CROSS JOIN eps e
     ),
     m AS (SELECT e, sqrt(avg((pred - y) * (pred - y))) AS rmse
           FROM scored GROUP BY e)
SELECT 'o_totalprice' AS feature, e AS perturbation,
       round(rmse, 6) AS rmse,
       round(rmse - (SELECT rmse FROM m WHERE e = 0.0), 6) AS delta
FROM m ORDER BY CASE WHEN e = 0.0 THEN 0 WHEN e = 0.1 THEN 1 ELSE 2 END
"""


def vif_lineitem(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import vif

    cols = ["l_quantity", "l_discount", "l_tax"]
    out = vif(_read(sf_dir, "lineitem", cols), cols)
    return pa.Table.from_pylist(
        [{"col": c, "vif": _round6(v)} for c, v in sorted(out.items())])


VIF_SQL = """
WITH c AS (
  SELECT corr(l_quantity, l_discount) AS r_qd,
         corr(l_quantity, l_tax) AS r_qt,
         corr(l_discount, l_tax) AS r_dt
  FROM lineitem
)
SELECT col, round(vif, 6) AS vif FROM (
  SELECT 'l_quantity' AS col,
         1.0 / (1.0 - (r_qd*r_qd + r_qt*r_qt - 2*r_qd*r_qt*r_dt) / (1.0 - r_dt*r_dt)) AS vif
  FROM c
  UNION ALL
  SELECT 'l_discount',
         1.0 / (1.0 - (r_qd*r_qd + r_dt*r_dt - 2*r_qd*r_dt*r_qt) / (1.0 - r_qt*r_qt))
  FROM c
  UNION ALL
  SELECT 'l_tax',
         1.0 / (1.0 - (r_qt*r_qt + r_dt*r_dt - 2*r_qt*r_dt*r_qd) / (1.0 - r_qd*r_qd))
  FROM c
) ORDER BY col
"""


def hash_split_orders(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import hash_split_counts

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return hash_split_counts(ds, "o_orderkey", "o_totalprice")


HASH_SPLIT_SQL = """
SELECT CASE WHEN o_orderkey % 10 < 8 THEN 'train' ELSE 'test' END AS split,
       count(*) AS n,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_value
FROM orders GROUP BY 1 ORDER BY 1
"""


def first3_per_lang_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import first_n_per_group

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return first_n_per_group(ds, "lang", "doc_id", 3)


FIRST3_SQL = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn <= 3 ORDER BY lang, doc_id
"""


def mean_impute_quantity(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import mean_impute_stats

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    return mean_impute_stats(ds, "l_orderkey", "l_quantity", mod=97, scale=1)


MEAN_IMPUTE_SQL = """
WITH m AS (
  SELECT CAST(sum(CASE WHEN l_orderkey % 97 <> 0
                       THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS DOUBLE)
         / sum(CASE WHEN l_orderkey % 97 <> 0 THEN 1 ELSE 0 END) AS fill,
         CAST(sum(CASE WHEN l_orderkey % 97 <> 0
                       THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS DOUBLE) AS sum_kept,
         CAST(sum(CASE WHEN l_orderkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null
  FROM lineitem
)
SELECT n_null AS n_imputed, round(fill, 6) AS fill_value,
       round(sum_kept + fill * n_null, 4) AS sum_after
FROM m
"""


def mode_impute_orderpriority(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import mode_impute_value

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    return mode_impute_value(ds, "o_orderkey", "o_orderpriority", mod=89)


MODE_IMPUTE_SQL = """
WITH kept AS (SELECT o_orderpriority v FROM orders WHERE o_orderkey % 89 <> 0)
SELECT (SELECT v FROM kept GROUP BY v ORDER BY count(*) DESC, v LIMIT 1) AS fill_value,
       (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_orderkey % 89 = 0) AS n_imputed
"""


# ---------------------------------------------------------------------------
# A19-A21: feature ranking power scores (pipelines/ranking.py) and the
# one-pass closed-form K-fold CV of a univariate linear model.
# ---------------------------------------------------------------------------

def feature_ranking_lineitem(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.ranking import feature_ranking

    cols = ["l_quantity", "l_discount", "l_tax"]
    ds = _read(sf_dir, "lineitem", cols + ["l_extendedprice"])
    out = feature_ranking(ds, cols, "l_extendedprice")
    rows = [{"feature": r["feature"], "r": _round6(r["r"]),
             "abs_r": _round6(r["abs_r"]), "power": _round6(r["power"]),
             "pseudo_iv": _round6(r["pseudo_iv"]),
             "pseudo_gini": _round6(r["pseudo_gini"])}
            for r in out.to_pylist()]
    return pa.Table.from_pylist(rows)


RANKING_SQL = """
WITH r AS (
  SELECT 'l_quantity' AS feature, corr(l_quantity, l_extendedprice) AS r FROM lineitem
  UNION ALL SELECT 'l_discount', corr(l_discount, l_extendedprice) FROM lineitem
  UNION ALL SELECT 'l_tax', corr(l_tax, l_extendedprice) FROM lineitem
), m AS (SELECT max(abs(r)) AS mx FROM r)
SELECT feature, round(r, 6) AS r, round(abs(r), 6) AS abs_r,
       round(100.0 * abs(r) / mx, 6) AS power,
       round(abs(r) / mx * 0.5, 6) AS pseudo_iv,
       round(abs(r) / mx * 0.8, 6) AS pseudo_gini
FROM r, m ORDER BY power DESC
"""


def linear_cv_orders(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.ranking import linear_cv

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])

    def derive(batch: pa.Table) -> pa.Table:
        days = (batch.column("o_orderdate").cast(pa.int64())
                .to_numpy(zero_copy_only=False) // 86_400_000_000)
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "x": pa.array(days.astype(np.float64), type=pa.float64()),
                         "y": batch.column("o_totalprice")})

    out = linear_cv(ds.map_batches(derive, batch_format="pyarrow"),
                    "x", "y", "o_orderkey", k=5)
    rows = [{"fold": r["fold"], "n_test": r["n_test"],
             "rmse": float(np.round(r["rmse"], 2)), "r2": _round6(r["r2"])}
            for r in out.to_pylist()]
    return pa.Table.from_pylist(rows)


def tfidf_top_terms_documents(sf_dir: str) -> pa.Table:
    """Per-doc top-3 TF-IDF terms (smoothed sklearn idf, raw-count tf)
    — full SQL oracle; the Ray side is two streaming passes with one
    (term, partial_df) shuffle (stages/text.py tfidf_top_terms)."""
    from tanml_ray.stages.text import tfidf_top_terms

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tfidf_top_terms(ds, top_k=3)


TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
  WHERE t.term <> ''
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
), n AS (
  SELECT count(*) AS n FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) AS s
  FROM tf JOIN df USING (term), n
), ranked AS (
  SELECT doc_id, term, s,
         row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, CAST(rnk AS BIGINT) AS rank, term, round(s, 6) AS tfidf
FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rank
"""


def order_shipweek_counts(sf_dir: str) -> pa.Table:
    """RANGE (band) join: per order, how many lineitem rows (any order)
    shipped within [o_orderdate, o_orderdate + 7 days). Bucketed
    replication + per-bucket searchsorted — never a joined row set
    (pipelines/join.py range_join_count). Full SQL oracle."""
    from tanml_ray.pipelines.join import range_join_count

    left = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    right = _read(sf_dir, "lineitem", ["l_shipdate"])
    out = range_join_count(left, right, "o_orderdate", "l_shipdate",
                           "o_orderkey", window_days=7,
                           out_count_col="n_shipped")
    return out.sort("o_orderkey")


RANGE_JOIN_SQL = """
SELECT o.o_orderkey,
       CAST(count(l.l_shipdate) AS BIGINT) AS n_shipped
FROM orders o
LEFT JOIN lineitem l
  ON CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
 AND CAST(l.l_shipdate AS DATE) < CAST(o.o_orderdate AS DATE) + 7
GROUP BY o.o_orderkey
ORDER BY o.o_orderkey
"""


def linear_cv_repeated_orders(sf_dir: str) -> pa.Table:
    """Repeated K-fold CV (reference ui/services/cv.py:37-48
    Repeated*KFold semantics, deterministic prime-modulus re-keying
    per repeat) — per-(rep, fold) rows, full SQL oracle."""
    from tanml_ray.pipelines.ranking import linear_cv_repeated

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])

    def derive(batch: pa.Table) -> pa.Table:
        days = (batch.column("o_orderdate").cast(pa.date32()).cast(pa.int32())
                .to_numpy(zero_copy_only=False))
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "x": pa.array(days.astype(np.float64), type=pa.float64()),
                         "y": batch.column("o_totalprice")})

    out = linear_cv_repeated(ds.map_batches(derive, batch_format="pyarrow"),
                             "x", "y", "o_orderkey", k=4, n_repeats=3)
    rows = [{"rep": r["rep"], "fold": r["fold"], "n_test": r["n_test"],
             "rmse": float(np.round(r["rmse"], 2)), "r2": _round6(r["r2"])}
            for r in out.to_pylist()]
    return pa.Table.from_pylist(rows)


LINEAR_CV_REPEATED_SQL = """
WITH reps AS (
  SELECT CAST(r AS BIGINT) AS rep FROM range(0, 3) t(r)
), p AS (
  SELECT rep,
         CASE WHEN rep = 0 THEN o_orderkey % 4
              ELSE ((o_orderkey % 1000003) * (48271*rep + 12345)) % 1000003 % 4
         END AS fold,
         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE) AS x,
         o_totalprice AS y
  FROM orders, reps
), fs AS (
  SELECT rep, fold, CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
  FROM p GROUP BY rep, fold
), tot AS (
  SELECT rep, sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy, sum(sxy) AS sxy,
         sum(sxx) AS sxx, sum(syy) AS syy
  FROM fs GROUP BY rep
), fit AS (
  SELECT f.rep, f.fold, f.n AS n_te, f.sx AS sx_te, f.sy AS sy_te,
         f.sxy AS sxy_te, f.sxx AS sxx_te, f.syy AS syy_te,
         ((t.n - f.n) * (t.sxy - f.sxy) - (t.sx - f.sx) * (t.sy - f.sy))
         / ((t.n - f.n) * (t.sxx - f.sxx) - (t.sx - f.sx) * (t.sx - f.sx)) AS b,
         ((t.sy - f.sy) - ((t.n - f.n) * (t.sxy - f.sxy) - (t.sx - f.sx) * (t.sy - f.sy))
          / ((t.n - f.n) * (t.sxx - f.sxx) - (t.sx - f.sx) * (t.sx - f.sx)) * (t.sx - f.sx))
         / (t.n - f.n) AS a
  FROM fs f JOIN tot t ON f.rep = t.rep
)
SELECT rep, CAST(fold AS BIGINT) AS fold, CAST(n_te AS BIGINT) AS n_test,
       round(sqrt(greatest(syy_te + n_te*a*a + b*b*sxx_te - 2*a*sy_te
                           - 2*b*sxy_te + 2*a*b*sx_te, 0) / n_te), 2) AS rmse,
       round(1 - (syy_te + n_te*a*a + b*b*sxx_te - 2*a*sy_te - 2*b*sxy_te
                  + 2*a*b*sx_te) / (syy_te - sy_te*sy_te / n_te), 6) AS r2
FROM fit ORDER BY rep, fold
"""


def linear_cv_repeated_summary_orders(sf_dir: str) -> pa.Table:
    """The reference's CV distribution roll-up (ui/services/cv.py:
    205-222: mean/std/min/max/p05/p50/p95 over all folds×repeats) as a
    one-row SQL-oracled summary of the repeated-CV rmse values."""
    from tanml_ray.pipelines.ranking import linear_cv_repeated

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])

    def derive(batch: pa.Table) -> pa.Table:
        days = (batch.column("o_orderdate").cast(pa.date32()).cast(pa.int32())
                .to_numpy(zero_copy_only=False))
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "x": pa.array(days.astype(np.float64), type=pa.float64()),
                         "y": batch.column("o_totalprice")})

    out = linear_cv_repeated(ds.map_batches(derive, batch_format="pyarrow"),
                             "x", "y", "o_orderkey", k=4, n_repeats=3)
    vals = np.round(np.asarray(out.column("rmse").to_pylist()), 2)
    return pa.Table.from_pylist([{
        "n_folds": int(vals.size),
        "mean": _round6(float(vals.mean())),
        "std": _round6(float(vals.std(ddof=1))),
        "min": _round6(float(vals.min())),
        "max": _round6(float(vals.max())),
        "p05": _round6(float(np.percentile(vals, 5))),
        "p50": _round6(float(np.percentile(vals, 50))),
        "p95": _round6(float(np.percentile(vals, 95))),
    }])


LINEAR_CV_REPEATED_SUMMARY_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_folds,
       round(avg(rmse), 6) AS mean,
       round(stddev_samp(rmse), 6) AS std,
       round(min(rmse), 6) AS "min",
       round(max(rmse), 6) AS "max",
       round(quantile_cont(rmse, 0.05), 6) AS p05,
       round(quantile_cont(rmse, 0.50), 6) AS p50,
       round(quantile_cont(rmse, 0.95), 6) AS p95
FROM ({{inner}}) per
""".replace("{inner}", LINEAR_CV_REPEATED_SQL)


LINEAR_CV_SQL = """
WITH p AS (
  SELECT o_orderkey % 5 AS fold,
         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE) AS x,
         o_totalprice AS y
  FROM orders
), fs AS (
  SELECT fold, CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
  FROM p GROUP BY fold
), tot AS (
  SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy, sum(sxy) AS sxy,
         sum(sxx) AS sxx, sum(syy) AS syy
  FROM fs
), fit AS (
  SELECT f.fold, f.n AS n_te, f.sx AS sx_te, f.sy AS sy_te, f.sxy AS sxy_te,
         f.sxx AS sxx_te, f.syy AS syy_te,
         ((t.n - f.n) * (t.sxy - f.sxy) - (t.sx - f.sx) * (t.sy - f.sy))
         / ((t.n - f.n) * (t.sxx - f.sxx) - (t.sx - f.sx) * (t.sx - f.sx)) AS b,
         ((t.sy - f.sy) - ((t.n - f.n) * (t.sxy - f.sxy) - (t.sx - f.sx) * (t.sy - f.sy))
          / ((t.n - f.n) * (t.sxx - f.sxx) - (t.sx - f.sx) * (t.sx - f.sx)) * (t.sx - f.sx))
         / (t.n - f.n) AS a
  FROM fs f, tot t
)
SELECT CAST(fold AS BIGINT) AS fold, CAST(n_te AS BIGINT) AS n_test,
       round(sqrt(greatest(syy_te + n_te*a*a + b*b*sxx_te - 2*a*sy_te
                           - 2*b*sxy_te + 2*a*b*sx_te, 0) / n_te), 2) AS rmse,
       round(1 - (syy_te + n_te*a*a + b*b*sxx_te - 2*a*sy_te - 2*b*sxy_te
                  + 2*a*b*sx_te) / (syy_te - sy_te*sy_te / n_te), 6) AS r2
FROM fit ORDER BY fold
"""


# ---------------------------------------------------------------------------
# Flagship pages pipelines exposed as queries (rows-only driver checks —
# the fixture derivation is hash-based and not SQL-expressible; full
# oracle coverage lives in tests/test_validate.py / test_drift.py).
# ---------------------------------------------------------------------------

def _pages_dir_for(sf_dir: str, variant: str = "baseline") -> str:
    from tanml_ray.sources.pages import synthesize_pages_parquet

    tag = sf_dir.rstrip("/").split("/")[-1]
    return synthesize_pages_parquet(sf_dir, f"/tmp/tanml_pages_{tag}_{variant}",
                                    variant=variant)


def _oracle_sf(sf_dir: str | None) -> str:
    """Resolve the sf_dir a fixture-path SQL oracle should read.

    The driver contract calls ``oracle_sql()`` with no arguments and
    compares at sf0.01, so that is the default; a local multi-sf gate
    (tools/check_queries.py) exports TANML_ORACLE_SF_DIR so the oracle
    reads the SAME fixture instance as the engine — fixture parquet
    file names (= partition ids) differ per directory, so a pinned
    default would mismatch at any other scale."""
    import os

    return sf_dir or os.environ.get("TANML_ORACLE_SF_DIR",
                                    "/root/testdata/sf0.01")


def validate_pages_status(sf_dir: str) -> pa.Table:
    """Flagship validation per-(partition, constraint) status (without
    the nondeterministic elapsed_us column)."""
    from tanml_ray.pipelines.validate import run_pages_validation

    rep = run_pages_validation(_pages_dir_for(sf_dir))
    return rep.status.select(["partition_id", "constraint_id", "rows",
                              "violations", "status"])


def validate_pages_sql(sf_dir: str | None = None) -> str:
    """Full SQL oracle for validate_pages_status: reads the SAME cached
    pages fixture the query reads (ensured here, so oracle-first
    execution order also works), reproduces partition_id = input-file
    basename via read_parquet(filename=true), and restates each of the
    six default constraints as an independent SQL predicate. The
    extraction-match constraint is restated from the fixture's defect
    spec (page_id % 700 == 17 tampered, where both sides non-null,
    sources/pages.py) — an independent derivation, not a re-run of the
    engine's extractor."""
    from tanml_ray.functions.langcodes import ISO_639_1

    pages_dir = _pages_dir_for(_oracle_sf(sf_dir))
    iso = ", ".join(f"'{c}'" for c in sorted(set(ISO_639_1)))
    return f"""
WITH p AS (
  SELECT page_id, url, warc_ts, html, text, lang,
         parse_filename(filename) AS partition_id
  FROM read_parquet('{pages_dir}/*.parquet', filename=true)
), agg AS (
  SELECT partition_id, count(*) AS n_rows,
    count(*) FILTER (WHERE html IS NULL) AS not_null_html,
    count(*) FILTER (WHERE text IS NULL) AS not_null_text,
    count(*) FILTER (WHERE warc_ts IS NOT NULL
        AND (warc_ts < TIMESTAMP '2025-01-01'
             OR warc_ts >= TIMESTAMP '2025-04-01')) AS range_warc_ts,
    count(*) FILTER (WHERE lang IS NOT NULL
        AND lang NOT IN ({iso})) AS referential_lang,
    count(*) FILTER (WHERE url IS NOT NULL
        AND NOT regexp_matches(url, '^https?://')) AS format_url,
    count(*) FILTER (WHERE html IS NOT NULL AND text IS NOT NULL
        AND page_id % 700 = 17) AS text_extraction_match
  FROM p GROUP BY partition_id
), unp AS (
  SELECT partition_id, 'not_null_html' AS constraint_id, n_rows,
         not_null_html AS violations FROM agg
  UNION ALL SELECT partition_id, 'not_null_text', n_rows, not_null_text FROM agg
  UNION ALL SELECT partition_id, 'range_warc_ts', n_rows, range_warc_ts FROM agg
  UNION ALL SELECT partition_id, 'referential_lang', n_rows, referential_lang FROM agg
  UNION ALL SELECT partition_id, 'format_url', n_rows, format_url FROM agg
  UNION ALL SELECT partition_id, 'text_extraction_match', n_rows,
         text_extraction_match FROM agg
)
SELECT partition_id, constraint_id, n_rows AS "rows", violations,
       CASE WHEN violations > 0 THEN 'fail' ELSE 'pass' END AS status
FROM unp ORDER BY partition_id, constraint_id
"""


def drift_pages_sql(sf_dir: str | None = None) -> str:
    """Full SQL oracle for drift_pages_report: recomputes grouped PSI
    (reference equal-width bins from the BASELINE min/max, full-n
    denominators, zero→1e-8) and the exact two-sample KS statistic from
    the two cached pages fixtures. Bin edges are built with the same
    float64 expression np.linspace uses (lo + i*step, last edge pinned
    to hi) and np.histogram's half-open/last-closed semantics, so bin
    counts are bit-identical, not approximately equal."""
    base_dir = _pages_dir_for(_oracle_sf(sf_dir), "baseline")
    cur_dir = _pages_dir_for(_oracle_sf(sf_dir), "current")
    return f"""
WITH b AS (
  SELECT lang, strftime(date_trunc('week', warc_ts), '%Y-%m-%d') AS bucket,
         CAST(length(text) AS DOUBLE) AS v
  FROM read_parquet('{base_dir}/*.parquet') WHERE text IS NOT NULL
), c AS (
  SELECT lang, strftime(date_trunc('week', warc_ts), '%Y-%m-%d') AS bucket,
         CAST(length(text) AS DOUBLE) AS v
  FROM read_parquet('{cur_dir}/*.parquet') WHERE text IS NOT NULL
), bs AS (
  SELECT lang, bucket, count(*) AS n_e, min(v) AS vmin, max(v) AS vmax
  FROM b GROUP BY 1, 2
), cs AS (
  SELECT lang, bucket, count(*) AS n_a FROM c GROUP BY 1, 2
), eg AS (
  SELECT lang, bucket, n_e, vmin,
         CASE WHEN vmax > vmin THEN vmax ELSE vmin + 1.0 END AS vhi
  FROM bs
), bins AS (
  SELECT eg.lang, eg.bucket, i,
         vmin + i * ((vhi - vmin) / 10.0) AS lo,
         CASE WHEN i = 9 THEN vhi
              ELSE vmin + (i + 1) * ((vhi - vmin) / 10.0) END AS hi
  FROM eg CROSS JOIN generate_series(0, 9) t(i)
), eh AS (
  SELECT bn.lang, bn.bucket, bn.i, count(b.v) AS ce
  FROM bins bn LEFT JOIN b ON b.lang = bn.lang AND b.bucket = bn.bucket
       AND b.v >= bn.lo AND (b.v < bn.hi OR (bn.i = 9 AND b.v <= bn.hi))
  GROUP BY 1, 2, 3
), ah AS (
  SELECT bn.lang, bn.bucket, bn.i, count(c.v) AS ca
  FROM bins bn LEFT JOIN c ON c.lang = bn.lang AND c.bucket = bn.bucket
       AND c.v >= bn.lo AND (c.v < bn.hi OR (bn.i = 9 AND c.v <= bn.hi))
  GROUP BY 1, 2, 3
), props AS (
  SELECT eh.lang, eh.bucket, eh.i,
         CASE WHEN eh.ce / CAST(bs.n_e AS DOUBLE) = 0 THEN 1e-8
              ELSE eh.ce / CAST(bs.n_e AS DOUBLE) END AS ep,
         CASE WHEN ah.ca / CAST(cs.n_a AS DOUBLE) = 0 THEN 1e-8
              ELSE ah.ca / CAST(cs.n_a AS DOUBLE) END AS ap
  FROM eh JOIN ah USING (lang, bucket, i)
       JOIN bs USING (lang, bucket) JOIN cs USING (lang, bucket)
), psi_t AS (
  SELECT lang, bucket, sum((ap - ep) * ln(ap / ep)) AS psi
  FROM props GROUP BY 1, 2
), vca AS (
  SELECT lang, bucket, v, sum(nb) AS nb, sum(nc) AS nc FROM (
    SELECT lang, bucket, v, count(*) AS nb, 0 AS nc FROM b GROUP BY 1, 2, 3
    UNION ALL
    SELECT lang, bucket, v, 0, count(*) FROM c GROUP BY 1, 2, 3
  ) GROUP BY 1, 2, 3
), kss AS (
  SELECT vca.lang, vca.bucket,
         sum(vca.nb) OVER w / CAST(bs.n_e AS DOUBLE) AS fb,
         sum(vca.nc) OVER w / CAST(cs.n_a AS DOUBLE) AS fc
  FROM vca JOIN bs USING (lang, bucket) JOIN cs USING (lang, bucket)
  WINDOW w AS (PARTITION BY vca.lang, vca.bucket ORDER BY vca.v
               ROWS UNBOUNDED PRECEDING)
), ks_t AS (
  SELECT lang, bucket, max(abs(fb - fc)) AS d FROM kss GROUP BY 1, 2
)
SELECT g.lang, g.bucket,
       coalesce(bs.n_e, 0) AS n_expected,
       coalesce(cs.n_a, 0) AS n_actual,
       CASE WHEN bs.lang IS NULL OR cs.lang IS NULL THEN NULL
            ELSE round(psi_t.psi, 6) END AS psi,
       CASE WHEN bs.lang IS NULL THEN 'new_group'
            WHEN cs.lang IS NULL THEN 'unknown'
            WHEN psi_t.psi >= 0.2 THEN 'severe'
            WHEN psi_t.psi >= 0.1 THEN 'moderate'
            ELSE 'none' END AS psi_level,
       CASE WHEN bs.lang IS NULL OR cs.lang IS NULL THEN 'unknown'
            WHEN ks_t.d > 0.3 THEN 'severe'
            WHEN ks_t.d > 0.2 THEN 'moderate'
            WHEN ks_t.d > 0.1 THEN 'mild'
            ELSE 'none' END AS ks_level
FROM (SELECT lang, bucket FROM bs UNION SELECT lang, bucket FROM cs) g
LEFT JOIN bs USING (lang, bucket) LEFT JOIN cs USING (lang, bucket)
LEFT JOIN psi_t USING (lang, bucket) LEFT JOIN ks_t USING (lang, bucket)
ORDER BY g.lang, g.bucket
"""


def drift_pages_report(sf_dir: str) -> pa.Table:
    """Grouped PSI/KS of the shifted current vs baseline, per
    (lang, week) on text_len."""
    from tanml_ray.pipelines.drift import build_drift_baseline, compute_drift
    from tanml_ray.sources.pages import pages_dataset

    baseline = build_drift_baseline(pages_dataset(sf_dir), "text_len", "week")
    table, _ = compute_drift(baseline, pages_dataset(sf_dir, variant="current"))
    rows = [{"lang": r["lang"], "bucket": r["bucket"],
             "n_expected": r["n_expected"], "n_actual": r["n_actual"],
             "psi": _round6(r["psi"]) if r["psi"] == r["psi"] else None,
             "psi_level": r["psi_level"], "ks_level": r["ks_level"]}
            for r in table.to_pylist()]
    rows.sort(key=lambda r: (r["lang"], r["bucket"]))
    return pa.Table.from_pylist(rows)


# ---------------------------------------------------------------------------
# Skew utilities + streaming-shaped ops + remaining correlation ops
# ---------------------------------------------------------------------------

def salted_lang_counts(sf_dir: str) -> pa.Table:
    """Explicit two-stage salted groupby (stages/shuffle.py) — result
    identical to a plain GROUP BY; the salt spreads hot keys (en≈44%)
    over 16 reducers."""
    from tanml_ray.stages.shuffle import salted_group_sum

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def one(batch: pa.Table) -> pa.Table:
        return batch.append_column("one", pa.array([1] * batch.num_rows,
                                                   type=pa.int64()))

    agg = salted_group_sum(ds.map_batches(one, batch_format="pyarrow"),
                           ["lang"], "one", salt_buckets=16)
    rows = sorted(({"lang": r["lang"], "n": r["one"]} for r in collect_pylist(agg)),
                  key=lambda r: r["lang"])
    return pa.Table.from_pylist(rows)


SALTED_LANG_SQL = "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang"


def user_sessions_events(sf_dir: str) -> pa.Table:
    """Sessionization over the events stream (30-minute gap rule)."""
    from tanml_ray.stages.shuffle import sessionize

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    out = sessionize(ds, "user_id", "ts", gap_minutes=30.0)
    rows = sorted(collect_pylist(out),
                  key=lambda r: (r["user"], r["session_id"]))
    return pa.Table.from_pylist([
        {"user": r["user"], "session_id": int(r["session_id"]),
         "n_events": int(r["n_events"]), "start_us": int(r["start_us"]),
         "end_us": int(r["end_us"])} for r in rows])


SESSIONS_SQL = """
WITH e AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM e
)
SELECT user_id AS user, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
       CAST(epoch_us(max(ts)) AS BIGINT) AS end_us
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""


def high_corr_pairs_lineitem(sf_dir: str) -> pa.Table:
    """A12: pair mining sorted by |r| desc (reference threshold 0.8
    applied at report time; emitting the full ranked triangle keeps the
    oracle meaningful on weakly-correlated data)."""
    base = pearson_corr_lineitem(sf_dir).to_pylist()
    rows = sorted(base, key=lambda r: -abs(r["r"] if r["r"] is not None else 0.0))
    return pa.Table.from_pylist([
        {"col_x": r["col_x"], "col_y": r["col_y"], "r": r["r"],
         "abs_r": _round6(abs(r["r"])),
         "flag_high": bool(abs(r["r"]) >= 0.8)} for r in rows])


HIGH_CORR_SQL = """
WITH r AS (
  SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
         corr(l_quantity, l_extendedprice) AS r FROM lineitem
  UNION ALL SELECT 'l_quantity', 'l_discount', corr(l_quantity, l_discount) FROM lineitem
  UNION ALL SELECT 'l_quantity', 'l_tax', corr(l_quantity, l_tax) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', 'l_discount', corr(l_extendedprice, l_discount) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', 'l_tax', corr(l_extendedprice, l_tax) FROM lineitem
  UNION ALL SELECT 'l_discount', 'l_tax', corr(l_discount, l_tax) FROM lineitem
)
SELECT col_x, col_y, round(r, 6) AS r, round(abs(r), 6) AS abs_r,
       abs(r) >= 0.8 AS flag_high
FROM r ORDER BY abs_r DESC
"""


def spearman_sample_lineitem(sf_dir: str) -> pa.Table:
    """A11 Spearman on a bounded deterministic sample (l_orderkey ≤
    4000) — the documented at-scale approach (SURVEY §2.5 A11: rank
    shuffle is a non-goal; compute on bounded sample). Midranks for
    ties, Pearson of the ranks."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_extendedprice"])

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less_equal(batch.column("l_orderkey"), 4000))

    sample = collect_pylist(ds.map_batches(pick, batch_format="pyarrow"))
    df = pd.DataFrame(sample)
    rq = df["l_quantity"].rank(method="average")
    rp = df["l_extendedprice"].rank(method="average")
    rho = float(np.corrcoef(rq, rp)[0, 1])
    return pa.table({"n": pa.array([len(df)], type=pa.int64()),
                     "spearman_rho": pa.array([_round6(rho)], type=pa.float64())})


SPEARMAN_SQL = """
WITH s AS (
  SELECT l_quantity, l_extendedprice FROM lineitem WHERE l_orderkey <= 4000
), ranked AS (
  SELECT avg(rnq) OVER (PARTITION BY l_quantity) AS rq,
         avg(rnp) OVER (PARTITION BY l_extendedprice) AS rp
  FROM (SELECT l_quantity, l_extendedprice,
               row_number() OVER (ORDER BY l_quantity) AS rnq,
               row_number() OVER (ORDER BY l_extendedprice) AS rnp
        FROM s)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS n,
       round(corr(rq, rp), 6) AS spearman_rho
FROM ranked
"""


# ---------------------------------------------------------------------------
# A11 exact FULL-CORPUS Spearman (reference analysis/correlation.py:
# 23-42 method="spearman") over the RAW CONTINUOUS columns — no
# integer-grid precondition: stages/rank.spearman_continuous range-
# partitions each column by sampled cut values (side='right' binning
# keeps tie groups whole, so within-bin midranks are globally exact
# for ANY cut choice), chains the x-rank pass into the y-rank pass so
# no row-id join is needed, and reduces per-bin arbitrary-precision
# sufficient statistics — exact at any corpus size, no driver LUT.
# The retired grid-LUT variant required both columns on bounded
# integer grids; this path ranks arbitrary float columns, matching
# the oracle's rank-over-raw-value semantics term for term.
# ---------------------------------------------------------------------------

def spearman_lineitem(sf_dir: str) -> pa.Table:
    from tanml_ray.stages.rank import spearman_continuous

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    out = spearman_continuous(ds, "l_quantity", "l_extendedprice")
    return pa.table({"n": pa.array([out["n"]], type=pa.int64()),
                     "spearman_rho": pa.array([_round6(out["rho"])],
                                              type=pa.float64())})




SPEARMAN_FULL_SQL = """
WITH ranked AS (
  SELECT avg(rnq) OVER (PARTITION BY l_quantity) AS rq,
         avg(rnp) OVER (PARTITION BY l_extendedprice) AS rp
  FROM (SELECT l_quantity, l_extendedprice,
               row_number() OVER (ORDER BY l_quantity) AS rnq,
               row_number() OVER (ORDER BY l_extendedprice) AS rnp
        FROM lineitem)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n,
       round(corr(rq, rp), 6) AS spearman_rho
FROM ranked
"""


# ---------------------------------------------------------------------------
# Exact n-gram (word-set) Jaccard similarity with a full SQL oracle —
# the verification kernel the MinHash pipeline approximates, checked
# end-to-end on a bounded pair set (doc_id ≤ 60 cross pairs).
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less_equal(batch.column("doc_id"), 60))

    rows = collect_pylist(ds.map_batches(pick, batch_format="pyarrow"))
    docs = {r["doc_id"]: set(r["text"].split(" ")) for r in rows}
    ids = sorted(docs)
    out = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(docs[a] & docs[b])
            union = len(docs[a] | docs[b])
            j = inter / union if union else 0.0
            if j >= 0.5:
                out.append({"id_a": a, "id_b": b, "jaccard": _round6(j)})
    return pa.Table.from_pylist(out) if out else pa.table(
        {"id_a": pa.array([], type=pa.int64()),
         "id_b": pa.array([], type=pa.int64()),
         "jaccard": pa.array([], type=pa.float64())})


NGRAM_JACCARD_SQL = """
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS words
  FROM documents WHERE doc_id <= 60
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
         / (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words))) AS j
  FROM d a JOIN d b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, round(j, 6) AS jaccard FROM p WHERE j >= 0.5 ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# A5: exact IQR outlier bounds (stages/quantiles.py, distributed sort)
# and windowed aggregates over the events stream.
# ---------------------------------------------------------------------------

def iqr_outliers_extendedprice(sf_dir: str) -> pa.Table:
    from tanml_ray.stages.quantiles import iqr_outlier_summary

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    s = iqr_outlier_summary(ds, "l_extendedprice")
    return pa.Table.from_pylist([{
        "q1": _round6(s["q1"]), "q3": _round6(s["q3"]),
        "iqr_lo": _round6(s["iqr_lo"]), "iqr_hi": _round6(s["iqr_hi"]),
        "n": s["n"], "n_outliers": s["n_outliers"],
        "outlier_pct": _round6(s["outlier_pct"]),
    }])


IQR_SQL = """
WITH q AS (
  SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
         quantile_cont(l_extendedprice, 0.75) AS q3
  FROM lineitem
)
SELECT round(q1, 6) AS q1, round(q3, 6) AS q3,
       round(q1 - 1.5 * (q3 - q1), 6) AS iqr_lo,
       round(q3 + 1.5 * (q3 - q1), 6) AS iqr_hi,
       (SELECT count(*) FROM lineitem) AS n,
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem, q
        WHERE l_extendedprice < q1 - 1.5 * (q3 - q1)
           OR l_extendedprice > q3 + 1.5 * (q3 - q1)) AS n_outliers,
       round(100.0 * (SELECT count(*) FROM lineitem, q
                      WHERE l_extendedprice < q1 - 1.5 * (q3 - q1)
                         OR l_extendedprice > q3 + 1.5 * (q3 - q1))
             / (SELECT count(*) FROM lineitem), 6) AS outlier_pct
FROM q
"""


def rolling_7day_events(sf_dir: str) -> pa.Table:
    """Sliding 7-day event-count window per event_type: daily counts
    (combiner pattern) then a per-type pandas rolling sum inside
    map_groups — the guide's 'windows as groupby(key).map_groups over
    the sorted group' recipe."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def daily(batch: pa.Table) -> pd.DataFrame:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        df = pd.DataFrame({"day": day.to_numpy(zero_copy_only=False),
                           "event_type": batch.column("event_type").to_pylist()})
        return df.groupby(["day", "event_type"], as_index=False).size().rename(
            columns={"size": "n"})

    dailies = (ds.map_batches(daily, batch_format="pyarrow")
               .groupby(["day", "event_type"])
               .aggregate(Sum("n", alias_name="n")))

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day").set_index("day")
        g["n7"] = g["n"].rolling("7D").sum().astype(np.int64)
        return g.reset_index()[["day", "event_type", "n", "n7"]]

    out = dailies.groupby("event_type").map_groups(roll, batch_format="pandas")
    rows = sorted(collect_pylist(out), key=lambda r: (r["event_type"], r["day"]))
    return pa.Table.from_pylist([
        {"day": pd.Timestamp(r["day"]), "event_type": r["event_type"],
         "n": int(r["n"]), "n7": int(r["n7"])} for r in rows])


ROLLING_SQL = """
WITH d AS (
  SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT day, event_type, n,
       CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
                         RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS n7
FROM d ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# Hopping (sliding) streaming window aggregate: 2-hour windows hopping
# every 30 minutes, per event_type — the standard stream-analytics
# window shape (Flink/Beam HOP). Each event belongs to exactly
# window_len/hop = 4 windows; the expansion happens INSIDE map_batches
# with a per-batch (window, type) combiner groupby, so the one shuffle
# moves per-block window partials, never 4× the events. Windows are
# epoch-aligned; count and integer-cents revenue ride the same
# aggregate (exact — no float partials cross tasks).
# ---------------------------------------------------------------------------

_HOP_US = 30 * 60 * 1_000_000
_WINDOW_HOPS = 4  # 2-hour window / 30-min hop


def hopping_window_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def expand(batch: pa.Table) -> pd.DataFrame:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        base_hop = ts // _HOP_US  # last hop whose window contains ts
        frames = []
        for off in range(_WINDOW_HOPS):
            frames.append(pd.DataFrame({
                "window_start": (base_hop - off) * _HOP_US,
                "event_type": et, "n": 1, "cents": cents}))
        df = pd.concat(frames, ignore_index=True)
        return (df.groupby(["window_start", "event_type"], as_index=False)
                .agg(n=("n", "sum"), cents=("cents", "sum")))

    agg = (ds.map_batches(expand, batch_format="pyarrow")
           .groupby(["window_start", "event_type"])
           .aggregate(Sum("n", alias_name="n"),
                      Sum("cents", alias_name="cents")))
    rows = sorted(collect_pylist(agg),
                  key=lambda r: (r["window_start"], r["event_type"]))
    return pa.Table.from_pylist([
        {"window_start": pd.Timestamp(int(r["window_start"]), unit="us"),
         "event_type": r["event_type"], "n": int(r["n"]),
         "revenue": _round6(int(r["cents"]) / 100.0)} for r in rows])


HOPPING_WINDOW_SQL = """
WITH e AS (
  SELECT epoch_us(ts) AS us, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), x AS (
  SELECT (us // 1800000000 - off) * 1800000000 AS ws, event_type, cents
  FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS off)
)
SELECT make_timestamp(ws) AS window_start, event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(cents) AS DOUBLE) / 100.0, 6) AS revenue
FROM x GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# ROC curve points at fixed thresholds (A15 adjunct) + stratified fold
# balance (K5, RepeatedStratifiedKFold analog) — full SQL oracles.
# ---------------------------------------------------------------------------

def roc_curve_orders(sf_dir: str) -> pa.Table:
    """TPR/FPR at thresholds 0.05..0.95 step 0.05 over the sigmoid-age
    scorer — computed from per-batch confusion partials per threshold."""
    ds = _scored_orders(sf_dir)
    thresholds = [round(0.05 * i, 2) for i in range(1, 20)]

    def partial(batch: pa.Table) -> pa.Table:
        y = batch.column("label").to_numpy(zero_copy_only=False)
        s = batch.column("score").to_numpy(zero_copy_only=False)
        rows = []
        for t in thresholds:
            pred = s >= t
            rows.append({"threshold": t,
                         "tp": int((pred & (y == 1)).sum()),
                         "fp": int((pred & (y == 0)).sum()),
                         "pos": int((y == 1).sum()),
                         "neg": int((y == 0).sum())})
        return pa.Table.from_pylist(rows)

    agg: dict[float, list[int]] = {}
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        a = agg.setdefault(r["threshold"], [0, 0, 0, 0])
        a[0] += r["tp"]
        a[1] += r["fp"]
        a[2] += r["pos"]
        a[3] += r["neg"]
    rows = [{"threshold": t, "tpr": _round6(a[0] / a[2]) if a[2] else None,
             "fpr": _round6(a[1] / a[3]) if a[3] else None}
            for t, a in sorted(agg.items())]
    return pa.Table.from_pylist(rows)


ROC_CURVE_SQL = """
WITH scored AS (
  SELECT CAST(o_orderstatus = 'F' AS BIGINT) AS y,
         1.0 / (1.0 + exp(-((9131 - datediff('day', DATE '1970-01-01',
                                             CAST(o_orderdate AS DATE))) / 365.0))) AS s
  FROM orders
), th AS (SELECT round(0.05 * i, 2) AS threshold FROM range(1, 20) t(i))
SELECT th.threshold,
       round(CAST(sum(CASE WHEN s >= th.threshold AND y = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / sum(y), 6) AS tpr,
       round(CAST(sum(CASE WHEN s >= th.threshold AND y = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / sum(1 - y), 6) AS fpr
FROM scored CROSS JOIN th
GROUP BY th.threshold ORDER BY th.threshold
"""


def stratified_fold_counts_orders(sf_dir: str) -> pa.Table:
    """K5 stratified fold assignment: within each class, rank by key
    and take rank % k — per-(label, fold) counts prove the balance.
    Implemented as groupby(label).map_groups (rank within group)."""
    ds = _scored_orders(sf_dir).select_columns(["o_orderkey", "label"])

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("o_orderkey")
        g["fold"] = np.arange(len(g)) % 5
        return (g.groupby(["label", "fold"], as_index=False).size()
                .rename(columns={"size": "n"}))

    out = ds.groupby("label").map_groups(assign, batch_format="pandas")
    rows = sorted(collect_pylist(out), key=lambda r: (r["label"], r["fold"]))
    return pa.Table.from_pylist([{"label": int(r["label"]), "fold": int(r["fold"]),
                                  "n": int(r["n"])} for r in rows])


STRATIFIED_SQL = """
WITH s AS (
  SELECT CAST(o_orderstatus = 'F' AS BIGINT) AS label,
         (row_number() OVER (PARTITION BY (o_orderstatus = 'F') ORDER BY o_orderkey) - 1) % 5 AS fold
  FROM orders
)
SELECT label, CAST(fold AS BIGINT) AS fold, count(*) AS n
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Model benchmarking (reference evaluation tab order 50): side-by-side
# metrics for two scorers over the same labels.
# ---------------------------------------------------------------------------

def model_benchmark_orders(sf_dir: str) -> pa.Table:
    """Two deterministic scorers: the sigmoid-age model vs a weaker
    price-rank heuristic; accuracy/precision/recall/brier per model."""
    from tanml_ray.pipelines.metrics import classification_metrics

    base = _scored_orders(sf_dir)

    def alt_score(batch: pa.Table) -> pa.Table:
        price = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        s = 1.0 / (1.0 + np.exp(-((price - 150000.0) / 100000.0)))
        return pa.table({"label": batch.column("label"),
                         "score": pa.array(s, type=pa.float64())})

    rows = []
    for model, ds in (("age_sigmoid", base),
                      ("price_sigmoid", base.map_batches(alt_score,
                                                         batch_format="pyarrow"))):
        m = classification_metrics(ds, "label", "score", with_auc=False)
        rows.append({"model": model,
                     "accuracy": _round6(m["accuracy"]),
                     "precision": _round6(m["precision"]),
                     "recall": _round6(m["recall"]),
                     "brier": _round6(m["brier"])})
    return pa.Table.from_pylist(sorted(rows, key=lambda r: r["model"]))


MODEL_BENCHMARK_SQL = """
WITH scored AS (
  SELECT CAST(o_orderstatus = 'F' AS BIGINT) AS y,
         1.0 / (1.0 + exp(-((9131 - datediff('day', DATE '1970-01-01',
                                             CAST(o_orderdate AS DATE))) / 365.0))) AS s_age,
         1.0 / (1.0 + exp(-((o_totalprice - 150000.0) / 100000.0))) AS s_price
  FROM orders
)
SELECT model, accuracy, precision, recall, brier FROM (
  SELECT 'age_sigmoid' AS model,
         round(avg(CASE WHEN (s_age >= 0.5) = (y = 1) THEN 1.0 ELSE 0.0 END), 6) AS accuracy,
         round(CAST(sum(CASE WHEN s_age >= 0.5 AND y = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / sum(CASE WHEN s_age >= 0.5 THEN 1 ELSE 0 END), 6) AS precision,
         round(CAST(sum(CASE WHEN s_age >= 0.5 AND y = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / sum(y), 6) AS recall,
         round(avg((s_age - y) * (s_age - y)), 6) AS brier
  FROM scored
  UNION ALL
  SELECT 'price_sigmoid',
         round(avg(CASE WHEN (s_price >= 0.5) = (y = 1) THEN 1.0 ELSE 0.0 END), 6),
         round(CAST(sum(CASE WHEN s_price >= 0.5 AND y = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / sum(CASE WHEN s_price >= 0.5 THEN 1 ELSE 0 END), 6),
         round(CAST(sum(CASE WHEN s_price >= 0.5 AND y = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / sum(y), 6),
         round(avg((s_price - y) * (s_price - y)), 6)
  FROM scored
) ORDER BY model
"""


# ---------------------------------------------------------------------------
# Joins (pipelines/join.py): broadcast dimension join and the explicit
# partitioned hash join — both with SQL oracles.
# ---------------------------------------------------------------------------

def join_orders_customer_broadcast(sf_dir: str) -> pa.Table:
    """Revenue per market segment via broadcast join (customer is the
    small side) + grouped sum."""
    import pyarrow.parquet as pq

    from tanml_ray.pipelines.join import broadcast_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    cust = cust.rename_columns(["o_custkey", "c_mktsegment"])
    joined = broadcast_join(orders, cust, "o_custkey")

    def partial(batch) -> pd.DataFrame:
        df = batch if isinstance(batch, pd.DataFrame) else batch.to_pandas()
        df["price_c"] = np.rint(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n=("price_c", "size"), price_c=("price_c", "sum"))
        return g

    from ray.data.aggregate import Sum

    agg = (joined.map_batches(partial, batch_format="pandas")
           .groupby("c_mktsegment")
           .aggregate(Sum("n", alias_name="n"), Sum("price_c", alias_name="price_c")))
    rows = [{"c_mktsegment": r["c_mktsegment"], "n": r["n"],
             "revenue": r["price_c"] / 100.0} for r in collect_pylist(agg)]
    return pa.Table.from_pylist(sorted(rows, key=lambda r: r["c_mktsegment"]))


JOIN_BROADCAST_SQL = """
SELECT c_mktsegment, count(*) AS n,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def join_lineitem_orders_partitioned(sf_dir: str) -> pa.Table:
    """Partitioned hash join with BOTH sides large (lineitem ⋈ orders
    on orderkey), then revenue per order status."""
    from ray.data.aggregate import Sum

    from tanml_ray.pipelines.join import partitioned_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])

    def rn(batch: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": batch.column("l_orderkey"),
                         "price_c": pc.cast(pc.round(pc.multiply(
                             batch.column("l_extendedprice"), 100)), pa.int64())})

    li = li.map_batches(rn, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    joined = partitioned_join(li, orders, "o_orderkey", buckets=32)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"o_orderstatus": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype="int64"),
                                 "price_c": pd.Series([], dtype="int64")})
        return df.groupby("o_orderstatus", as_index=False).agg(
            n=("price_c", "size"), price_c=("price_c", "sum"))

    agg = (joined.map_batches(partial, batch_format="pandas")
           .groupby("o_orderstatus")
           .aggregate(Sum("n", alias_name="n"), Sum("price_c", alias_name="price_c")))
    rows = [{"o_orderstatus": r["o_orderstatus"], "n": r["n"],
             "revenue": r["price_c"] / 100.0} for r in collect_pylist(agg)]
    return pa.Table.from_pylist(sorted(rows, key=lambda r: r["o_orderstatus"]))


JOIN_PARTITIONED_SQL = """
SELECT o_orderstatus, count(*) AS n,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def asof_join_events(sf_dir: str) -> pa.Table:
    """As-of join over the events stream: for each 'error' event, the
    most recent prior-or-equal 'view' by the same user; count + mean
    lag per user bucket (user_id % 10)."""
    from tanml_ray.pipelines.join import asof_join

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def side(kind):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch.column("event_type"), kind))
            return t.select(["event_id", "user_id", "ts"])
        return fn

    errors = ds.map_batches(side("error"), batch_format="pyarrow")
    views = ds.map_batches(side("view"), batch_format="pyarrow")
    joined = asof_join(errors, views, "user_id", "ts")
    rows = collect_pylist(joined)
    df = pd.DataFrame(rows)
    df["lag_us"] = (pd.to_datetime(df["ts"]).astype(np.int64) // 1000
                    - pd.to_datetime(df["r_ts"]).astype(np.int64) // 1000)
    df["ubucket"] = df["user_id"] % 10
    g = (df.groupby("ubucket", as_index=False)
         .agg(n=("lag_us", "size"), total_lag_us=("lag_us", "sum")))
    g = g.sort_values("ubucket")
    return pa.table({"ubucket": g["ubucket"].astype("int64"),
                     "n": g["n"].astype("int64"),
                     "total_lag_us": g["total_lag_us"].astype("int64")})


ASOF_SQL = """
WITH j AS (
  SELECT e.user_id, e.ts, v.ts AS view_ts
  FROM (SELECT * FROM events WHERE event_type = 'error') e
  ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON e.user_id = v.user_id AND v.ts <= e.ts
)
SELECT user_id % 10 AS ubucket, count(*) AS n,
       CAST(sum(epoch_us(ts) - epoch_us(view_ts)) AS BIGINT) AS total_lag_us
FROM j GROUP BY 1 ORDER BY 1
"""


def bloom_semi_join_lineitem(sf_dir: str) -> pa.Table:
    """Semi-join: lineitem rows whose order is 'expensive'
    (o_totalprice > 400000) via bloom prefilter + exact verify —
    returns count + exact revenue."""
    import pyarrow.parquet as pq_

    from tanml_ray.pipelines.join import bloom_semi_join

    orders = pq_.read_table(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_totalprice"])
    keys = orders.filter(pc.greater(orders.column("o_totalprice"), 400000.0)) \
                 .column("o_orderkey").to_numpy(zero_copy_only=False)
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    kept = bloom_semi_join(li, keys, "l_orderkey")

    def partial(batch: pa.Table) -> pa.Table:
        price_c = np.rint(batch.column("l_extendedprice")
                          .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"n": pa.array([batch.num_rows], type=pa.int64()),
                         "price_c": pa.array([int(price_c.sum())], type=pa.int64())})

    n = price_c = 0
    for r in collect_pylist(kept.map_batches(partial, batch_format="pyarrow")):
        n += r["n"]
        price_c += r["price_c"]
    return pa.table({"n": pa.array([n], type=pa.int64()),
                     "revenue": pa.array([price_c / 100.0], type=pa.float64())})


BLOOM_SEMI_SQL = """
SELECT count(*) AS n,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
"""


# ---------------------------------------------------------------------------
# JSON column handling: events.props is a JSON string — extract a field
# and aggregate (the reference has no JSON ops, SURVEY §2.8; a web-data
# engine needs them). Vectorized parse per batch; DuckDB JSON oracle.
# ---------------------------------------------------------------------------

def json_extract_events(sf_dir: str) -> pa.Table:
    """Parse props JSON, extract k, aggregate per event_type:
    n, sum_k, min_k, max_k (all exact ints)."""
    import json as _json

    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        ks = np.fromiter((_json.loads(p)["k"] for p in
                          batch.column("props").to_pylist()),
                         dtype=np.int64, count=batch.num_rows)
        df = pd.DataFrame({"event_type": batch.column("event_type").to_pylist(),
                           "k": ks})
        return df.groupby("event_type", as_index=False).agg(
            n=("k", "size"), sum_k=("k", "sum"),
            min_k=("k", "min"), max_k=("k", "max"))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"), Sum("sum_k", alias_name="sum_k"),
                      Min("min_k", alias_name="min_k"),
                      Max("max_k", alias_name="max_k")))
    rows = sorted(collect_pylist(agg), key=lambda r: r["event_type"])
    return pa.Table.from_pylist([{k: int(v) if k != "event_type" else v
                                  for k, v in r.items()} for r in rows])


JSON_EXTRACT_SQL = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# A7 grouped drift with a FULL SQL oracle: PSI of the props.k
# distribution per event_type, expected = first half of January vs
# actual = second half. Integer bins (k // 10) make the binning exactly
# SQL-reproducible (no float bin-edge ambiguity); the engine path is
# the same per-batch partial-count combiner the pages drift suite uses.
# ---------------------------------------------------------------------------

_DRIFT_SPLIT_TS = "2024-01-16 00:00:00"


def grouped_psi_events(sf_dir: str) -> pa.Table:
    import json as _json

    from ray.data.aggregate import Sum

    from tanml_ray.kernels.drift_math import psi_from_counts, psi_level

    ds = _read(sf_dir, "events", ["ts", "event_type", "props"])
    split_us = int(pd.Timestamp(_DRIFT_SPLIT_TS).value // 1000)

    def partial(batch: pa.Table) -> pd.DataFrame:
        ks = np.fromiter((_json.loads(p)["k"] for p in
                          batch.column("props").to_pylist()),
                         dtype=np.int64, count=batch.num_rows)
        ts_us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": batch.column("event_type").to_pylist(),
                           "side": np.where(ts_us < split_us, "e", "a"),
                           "bin": ks // 10})
        return df.groupby(["event_type", "side", "bin"], as_index=False).size() \
                 .rename(columns={"size": "n"})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["event_type", "side", "bin"])
           .aggregate(Sum("n", alias_name="n")))
    counts: dict[str, dict[str, np.ndarray]] = {}
    for r in collect_pylist(agg):
        g = counts.setdefault(r["event_type"], {"e": np.zeros(10), "a": np.zeros(10)})
        g[r["side"]][int(r["bin"])] = r["n"]
    rows = []
    for et in sorted(counts):
        psi = psi_from_counts(counts[et]["e"], counts[et]["a"])
        rows.append({"event_type": et, "psi": _round6(psi),
                     "psi_level": psi_level(psi)})
    return pa.Table.from_pylist(rows)


GROUPED_PSI_SQL = f"""
WITH b AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT_TS}' THEN 'e' ELSE 'a' END AS side,
         CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS bin
  FROM events
), c AS (
  SELECT event_type, side, bin, count(*) AS n FROM b GROUP BY 1, 2, 3
), bins AS (
  SELECT DISTINCT event_type, i AS bin FROM c, range(0, 10) t(i)
), p AS (
  SELECT bins.event_type, bins.bin,
         greatest(coalesce(e.n, 0) / CAST(se.tot AS DOUBLE), 1e-8) AS pe,
         greatest(coalesce(a.n, 0) / CAST(sa.tot AS DOUBLE), 1e-8) AS pa
  FROM bins
  LEFT JOIN c e ON e.event_type = bins.event_type AND e.bin = bins.bin AND e.side = 'e'
  LEFT JOIN c a ON a.event_type = bins.event_type AND a.bin = bins.bin AND a.side = 'a'
  JOIN (SELECT event_type, sum(n) AS tot FROM c WHERE side = 'e' GROUP BY 1) se
    ON se.event_type = bins.event_type
  JOIN (SELECT event_type, sum(n) AS tot FROM c WHERE side = 'a' GROUP BY 1) sa
    ON sa.event_type = bins.event_type
)
SELECT event_type, round(sum((pa - pe) * ln(pa / pe)), 6) AS psi,
       CASE WHEN sum((pa - pe) * ln(pa / pe)) >= 0.2 THEN 'severe'
            WHEN sum((pa - pe) * ln(pa / pe)) >= 0.1 THEN 'moderate'
            ELSE 'none' END AS psi_level
FROM p GROUP BY event_type ORDER BY event_type
"""


def anti_join_lineitem(sf_dir: str) -> pa.Table:
    """Anti-join complement of the bloom semi-join: lineitem rows whose
    order is NOT expensive — count + revenue (semi + anti must cover
    every row exactly once)."""
    import pyarrow.parquet as pq_

    from tanml_ray.pipelines.join import bloom_semi_join

    orders = pq_.read_table(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_totalprice"])
    keys = orders.filter(pc.greater(orders.column("o_totalprice"), 400000.0)) \
                 .column("o_orderkey").to_numpy(zero_copy_only=False)
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    kept = bloom_semi_join(li, keys, "l_orderkey", anti=True)

    def partial(batch: pa.Table) -> pa.Table:
        price_c = np.rint(batch.column("l_extendedprice")
                          .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"n": pa.array([batch.num_rows], type=pa.int64()),
                         "price_c": pa.array([int(price_c.sum())], type=pa.int64())})

    n = price_c = 0
    for r in collect_pylist(kept.map_batches(partial, batch_format="pyarrow")):
        n += r["n"]
        price_c += r["price_c"]
    return pa.table({"n": pa.array([n], type=pa.int64()),
                     "revenue": pa.array([price_c / 100.0], type=pa.float64())})


ANTI_JOIN_SQL = """
SELECT count(*) AS n,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM lineitem
WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
"""


# ---------------------------------------------------------------------------
# T2 stand-in: permutation importance (pipelines/explain.py) with a FULL
# SQL oracle — deterministic sample (200 smallest ids) + deterministic
# permutation (cyclic shift in id order = LEAD(...) with wraparound).
# Reference mean-|shap| ranking semantics: shap_check.py:313-324.
# ---------------------------------------------------------------------------

_PI_WEIGHTS = [1e-5, 0.01, 1e-6]   # f_price, f_days, f_cust


def permutation_importance_orders(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.explain import permutation_importance
    from tanml_ray.stages.scoring import ClosedFormModel

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                  "o_totalprice", "o_custkey"])

    def derive(batch: pa.Table) -> pa.Table:
        days = (batch.column("o_orderdate").cast(pa.int64())
                .to_numpy(zero_copy_only=False) // 86_400_000_000)
        return pa.table({
            "id": batch.column("o_orderkey"),
            "f_price": pc.cast(batch.column("o_totalprice"), pa.float64()),
            "f_days": pa.array(days.astype(np.float64), type=pa.float64()),
            "f_cust": pc.cast(batch.column("o_custkey"), pa.float64()),
        })

    model = ClosedFormModel(_PI_WEIGHTS, bias=1.0)
    return permutation_importance(ds.map_batches(derive, batch_format="pyarrow"),
                                  model, ["f_price", "f_days", "f_cust"],
                                  id_col="id", test_n=200)


PERMUTATION_IMPORTANCE_SQL = f"""
WITH s AS (
  SELECT o_orderkey AS id,
         CAST(o_totalprice AS DOUBLE) AS f_price,
         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE) AS f_days,
         CAST(o_custkey AS DOUBLE) AS f_cust
  FROM orders ORDER BY o_orderkey LIMIT 200
), sh AS (
  SELECT f_price, f_days, f_cust,
         coalesce(lead(f_price) OVER (ORDER BY id),
                  first_value(f_price) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS p_price,
         coalesce(lead(f_days) OVER (ORDER BY id),
                  first_value(f_days) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS p_days,
         coalesce(lead(f_cust) OVER (ORDER BY id),
                  first_value(f_cust) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS p_cust
  FROM s
), d AS (
  SELECT avg(abs({_PI_WEIGHTS[0]} * (p_price - f_price))) AS d_price,
         avg(abs({_PI_WEIGHTS[1]} * (p_days - f_days))) AS d_days,
         avg(abs({_PI_WEIGHTS[2]} * (p_cust - f_cust))) AS d_cust
  FROM sh
), u AS (
  SELECT 'f_price' AS feature, d_price AS mad FROM d
  UNION ALL SELECT 'f_days', d_days FROM d
  UNION ALL SELECT 'f_cust', d_cust FROM d
)
SELECT CAST(row_number() OVER (ORDER BY mad DESC, feature) AS BIGINT) AS rank,
       feature, round(mad, 6) AS mean_abs_delta
FROM u ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Logistic K-fold CV (pipelines/explain.py), FIXED-STEP configuration:
# max_iter is pinned to TWO Newton steps, which makes every per-fold
# coefficient a closed-form expression of train-fold sufficient
# statistics — step 1 is the β=0 start (W = I/4, β₁ = 4·(XᵀX)⁻¹Xᵀ(y−½),
# the Cramer solve proven by logistic_step_orders), step 2 re-weights
# per-row through μ = σ(Xβ₁) and solves H δ = Xᵀ(y−μ) once more. The
# DuckDB oracle unrolls both steps per fold and replicates the exact
# midrank Mann-Whitney AUC + accuracy@0.5 of metrics.auc_exact, so the
# full CV pipeline (fold split → 2-pass distributed fit → score →
# rank) is hash-verified end-to-end. Converged-IRLS CV keeps its
# rows-only contract under logistic_cv_repeated_orders.
# ---------------------------------------------------------------------------

def logistic_cv_orders(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.explain import logistic_cv

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus",
                                  "o_orderdate", "o_totalprice"])

    def derive(batch: pa.Table) -> pa.Table:
        days = (batch.column("o_orderdate").cast(pa.int64())
                .to_numpy(zero_copy_only=False) // 86_400_000_000)
        y = pc.cast(pc.equal(batch.column("o_orderstatus"), "F"), pa.int64())
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "x1": pa.array((9131 - days) / 365.0, type=pa.float64()),
            "x2": pc.divide(pc.cast(batch.column("o_totalprice"), pa.float64()),
                            pa.scalar(100000.0, type=pa.float64())),
            "label": y,
        })

    return logistic_cv(ds.map_batches(derive, batch_format="pyarrow"),
                       ["x1", "x2"], "label", "o_orderkey", k=3, max_iter=2)


_DEFAULT_CV_X1 = ("(9131 - datediff('day', DATE '1970-01-01',\n"
                  "                 CAST(o_orderdate AS DATE))) / 365.0")


def _logistic_cv_sql(k: int = 3, n_repeats: int = 1,
                     x1_sql: str | None = None) -> str:
    """Generate the unrolled (repeated) k-fold two-Newton-step logistic
    CV oracle.

    Per (rep, fold): Cramer 3×3 solves for both Newton steps on the
    train folds (symmetric normal matrix [[A,B,C],[B,D,E],[C,E,F]]),
    sigmoid scores on the test fold, midrank-tie AUC via
    rank() + count() OVER (PARTITION BY score), accuracy@0.5. Repeat 0
    folds are key % k; repeat r ≥ 1 mixes through the prime P=1000003
    with multiplier (48271·r + 12345) % P — ranking.repeated_fold."""
    P = 1000003
    blocks, selects = [], []
    for r in range(n_repeats):
        if r == 0:
            fold_expr = f"okey % {k}"
        else:
            m = (48271 * r + 12345) % P or 1
            fold_expr = f"((okey % {P}) * {m}) % {P} % {k}"
        for f in range(k):
            blocks.append(_cv_fold_block(f"{r}_{f}", fold_expr, f))
            selects.append(
                f"SELECT CAST({r} AS BIGINT) AS rep, "
                f"CAST({f} AS BIGINT) AS fold, "
                f"CAST(n AS BIGINT) AS n_test, "
                f"round((rpos - np*(np+1)/2.0) / (np*nn), 6) AS auc, "
                f"round(hit * 1.0 / n, 6) AS accuracy FROM ag_{r}_{f}")
    x1 = x1_sql or _DEFAULT_CV_X1
    return ("WITH feat AS (\n"
            "  SELECT o_orderkey AS okey,\n"
            f"         {x1} AS x1,\n"
            "         CAST(o_totalprice AS DOUBLE) / 100000.0 AS x2,\n"
            "         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y\n"
            "  FROM orders\n"
            ")," + ",".join(blocks)
            + "\nSELECT * FROM (\n" + "\nUNION ALL ".join(selects)
            + ") ORDER BY rep, fold")


def _cv_fold_block(tag: str, fold_expr: str, f: int) -> str:
    return f"""
tr_{tag} AS (SELECT x1, x2, y FROM feat WHERE {fold_expr} <> {f}),
te_{tag} AS (SELECT x1, x2, y FROM feat WHERE {fold_expr} = {f}),
s1_{tag} AS (
  SELECT CAST(count(*) AS DOUBLE) AS a, sum(x1) AS b, sum(x2) AS c,
         sum(x1*x1) AS d, sum(x1*x2) AS e, sum(x2*x2) AS f,
         sum(y - 0.5) AS g0, sum(x1*(y - 0.5)) AS g1,
         sum(x2*(y - 0.5)) AS g2
  FROM tr_{tag}
), b1_{tag} AS (
  SELECT 4 * (g0*(d*f - e*e) - b*(g1*f - e*g2) + c*(g1*e - d*g2))
           / (a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c)) AS c0,
         4 * (a*(g1*f - g2*e) - g0*(b*f - e*c) + c*(b*g2 - g1*c))
           / (a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c)) AS c1,
         4 * (a*(d*g2 - g1*e) - b*(b*g2 - g1*c) + g0*(b*e - d*c))
           / (a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c)) AS c2
  FROM s1_{tag}
), m_{tag} AS (
  SELECT x1, x2, y,
         1.0 / (1.0 + exp(-(c0 + c1*x1 + c2*x2))) AS mu
  FROM tr_{tag}, b1_{tag}
), s2_{tag} AS (
  SELECT sum(mu*(1-mu)) AS a, sum(mu*(1-mu)*x1) AS b,
         sum(mu*(1-mu)*x2) AS c, sum(mu*(1-mu)*x1*x1) AS d,
         sum(mu*(1-mu)*x1*x2) AS e, sum(mu*(1-mu)*x2*x2) AS f,
         sum(y - mu) AS g0, sum(x1*(y - mu)) AS g1,
         sum(x2*(y - mu)) AS g2
  FROM m_{tag}
), b2_{tag} AS (
  SELECT b1.c0 + (g0*(d*f - e*e) - b*(g1*f - e*g2) + c*(g1*e - d*g2))
           / (a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c)) AS c0,
         b1.c1 + (a*(g1*f - g2*e) - g0*(b*f - e*c) + c*(b*g2 - g1*c))
           / (a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c)) AS c1,
         b1.c2 + (a*(d*g2 - g1*e) - b*(b*g2 - g1*c) + g0*(b*e - d*c))
           / (a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c)) AS c2
  FROM s2_{tag}, b1_{tag} b1
), sc_{tag} AS (
  SELECT y, 1.0 / (1.0 + exp(-(c0 + c1*x1 + c2*x2))) AS s
  FROM te_{tag}, b2_{tag}
), rk_{tag} AS (
  SELECT y, s, rank() OVER (ORDER BY s) AS rmin,
         count(*) OVER (PARTITION BY s) AS grp
  FROM sc_{tag}
), ag_{tag} AS (
  SELECT sum(CASE WHEN y = 1 THEN rmin + (grp - 1) / 2.0 END) AS rpos,
         sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS np,
         sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS nn,
         count(*) AS n,
         sum(CASE WHEN (s >= 0.5) = (y = 1) THEN 1 ELSE 0 END) AS hit
  FROM rk_{tag}
)"""


LOGISTIC_CV_SQL = _logistic_cv_sql(3)


def model_family_benchmark_orders(sf_dir: str) -> pa.Table:
    """Five-estimator-family × k-fold CV benchmark on the shared
    logistic features: IRLS logistic vs closed-form linear vs histogram
    boosted stumps vs Gaussian Naive Bayes vs exact-integer CART stump
    (the reference benchmarking tab's linear/GLM/tree/NB spread,
    models/registry.py:34-411).
    Rows-only driver check: IRLS and boosting are iterative, not
    SQL-expressible; the families' fit/predict contracts are
    pytest-verified (tests/test_models.py, tests/test_explain.py)."""
    from tanml_ray.pipelines.explain import model_benchmark

    return model_benchmark(_orders_logistic_features(sf_dir),
                           ["x1", "x2"], "label", "o_orderkey",
                           k=3, tree_rounds=8)


def _orders_logistic_features(sf_dir: str):
    """Shared (x1, x2, label, o_orderkey) projection for the logistic
    family queries (same derivation as logistic_cv_orders)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus",
                                  "o_orderdate", "o_totalprice"])

    def derive(batch: pa.Table) -> pa.Table:
        y = pc.cast(pc.equal(batch.column("o_orderstatus"), "F"), pa.int64())
        days = (batch.column("o_orderdate").cast(pa.date32()).cast(pa.int32())
                .to_numpy(zero_copy_only=False))
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "x1": pa.array(days.astype(np.float64) / 1000.0, type=pa.float64()),
            "x2": pc.divide(pc.cast(batch.column("o_totalprice"), pa.float64()),
                            pa.scalar(100000.0, type=pa.float64())),
            "label": y,
        })

    return ds.map_batches(derive, batch_format="pyarrow")


def logistic_cv_repeated_orders(sf_dir: str) -> pa.Table:
    """Repeated K-fold logistic CV + the reference's distribution
    roll-up (cv.py:205-222): per-(rep, fold) AUC/accuracy rows from 2
    repeats × 3 folds, FIXED-STEP configuration (max_iter=2) so the
    prime-mixed repeat-1 fold map (ranking.repeated_fold) is
    hash-verified end-to-end by LOGISTIC_CV_REP_SQL — the same
    unrolled two-Newton-step oracle as logistic_cv_orders with the
    ((key % P)·m) % P % k fold predicate per repeat. Converged IRLS
    keeps its rows-only representative in logistic_inference_orders."""
    from tanml_ray.pipelines.explain import logistic_cv

    return logistic_cv(_orders_logistic_features(sf_dir),
                       ["x1", "x2"], "label", "o_orderkey",
                       k=3, max_iter=2, n_repeats=2)


LOGISTIC_CV_REP_SQL = _logistic_cv_sql(
    3, n_repeats=2,
    x1_sql=("CAST(datediff('day', DATE '1970-01-01',\n"
            "              CAST(o_orderdate AS DATE)) AS DOUBLE) / 1000.0"))


def logistic_inference_orders(sf_dir: str) -> pa.Table:
    """Per-coefficient Wald inference table (odds ratios, z, p —
    reference ui/views/evaluation/tabs/inference.py:111-115). Rows-only
    check (iterative IRLS fit); the Wald algebra is pytest-verified
    against a driver-side numpy IRLS in tests/test_logistic.py."""
    from tanml_ray.pipelines.mlops import logistic_inference

    return logistic_inference(_orders_logistic_features(sf_dir),
                              ["x1", "x2"], "label", max_iter=6)


# ---------------------------------------------------------------------------
# Scorecard stability PSI (the fourth member of the credit-validation
# trifecta+1: WOE/IV, KS, gains — and PSI of the SCORE distribution
# between populations): decile thresholds fit on the EXPECTED
# population (even order keys, the "development sample"), both
# populations binned through those same thresholds, reference PSI
# formula (full-n denominators, zero→1e-8). The score is monotone in
# order age, so everything computes exactly on the integer day grid —
# one (day, parity) value-count combiner shuffle, driver math.
# ---------------------------------------------------------------------------

def score_psi_orders(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.kernels.drift_math import psi_from_counts

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def vc(batch: pa.Table) -> pa.Table:
        days = (batch.column("o_orderdate").cast(pa.int64())
                .to_numpy(zero_copy_only=False) // 86_400_000_000)
        par = (batch.column("o_orderkey").to_numpy(zero_copy_only=False)
               % 2).astype(np.int64)
        df = pd.DataFrame({"v": days.astype(np.int64), "p": par})
        g = df.groupby(["v", "p"], as_index=False).size()
        return pa.table({"v": pa.array(g["v"].to_numpy(), type=pa.int64()),
                         "p": pa.array(g["p"].to_numpy(), type=pa.int64()),
                         "n": pa.array(g["size"].to_numpy()
                                       .astype(np.int64), type=pa.int64())})

    rows = sorted(collect_pylist(
        ds.map_batches(vc, batch_format="pyarrow")
        .groupby(["v", "p"]).aggregate(Sum("n", alias_name="n"))),
        key=lambda r: (r["v"], r["p"]))
    vals = np.unique(np.array([r["v"] for r in rows], dtype=np.int64))
    ne = np.zeros(len(vals), dtype=np.int64)
    na = np.zeros(len(vals), dtype=np.int64)
    vi = {int(v): i for i, v in enumerate(vals)}
    for r in rows:
        (ne if r["p"] == 0 else na)[vi[int(r["v"])]] += int(r["n"])
    cum = np.cumsum(ne)
    n_exp = int(cum[-1])
    thr = np.array([vals[np.searchsorted(
        cum, int(np.floor(q * (n_exp - 1))) + 1, side="left")]
        for q in (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)],
        dtype=np.int64)
    bins = 1 + (vals[:, None] > thr[None, :]).sum(axis=1)
    e = np.array([int(ne[bins == b].sum()) for b in range(1, 11)],
                 dtype=np.float64)
    a = np.array([int(na[bins == b].sum()) for b in range(1, 11)],
                 dtype=np.float64)
    psi = psi_from_counts(e, a)
    out = [{"bin": b, "n_expected": int(e[b - 1]),
            "n_actual": int(a[b - 1]),
            "psi_total": _round6(float(psi))} for b in range(1, 11)]
    return pa.Table.from_pylist(out)


SCORE_PSI_SQL = """
WITH src AS (
  SELECT CAST(datediff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS BIGINT) AS v,
         o_orderkey % 2 AS p
  FROM orders
), th AS (
  SELECT quantile_disc(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS t
  FROM src WHERE p = 0
), binned AS (
  SELECT 1 + (CASE WHEN v > t[1] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[2] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[3] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[4] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[5] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[6] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[7] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[8] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[9] THEN 1 ELSE 0 END) AS bin,
         p
  FROM src, th
), agg AS (
  SELECT bin,
         CAST(count(*) FILTER (WHERE p = 0) AS BIGINT) AS n_expected,
         CAST(count(*) FILTER (WHERE p = 1) AS BIGINT) AS n_actual
  FROM binned GROUP BY bin
), tot AS (
  SELECT CAST(sum(n_expected) AS DOUBLE) AS te,
         CAST(sum(n_actual) AS DOUBLE) AS ta FROM agg
), terms AS (
  SELECT (CASE WHEN n_actual / tot.ta = 0 THEN 1e-8
               ELSE n_actual / tot.ta END
          - CASE WHEN n_expected / tot.te = 0 THEN 1e-8
                 ELSE n_expected / tot.te END)
         * ln((CASE WHEN n_actual / tot.ta = 0 THEN 1e-8
                    ELSE n_actual / tot.ta END)
              / (CASE WHEN n_expected / tot.te = 0 THEN 1e-8
                      ELSE n_expected / tot.te END)) AS term
  FROM agg, tot
)
SELECT bin, n_expected, n_actual,
       round((SELECT sum(term) FROM terms), 6) AS psi_total
FROM agg ORDER BY bin
"""


# ---------------------------------------------------------------------------
# Cumulative gains / lift decile table (the model-validation companion
# of the KS statistic: how many bads the top-k score deciles capture).
# Score = the deterministic age sigmoid, strictly DECREASING in order
# age — so decile 1 (top scores) = smallest day values, and the bins
# come from the same exact PERCENTILE_DISC machinery as WOE
# (value-based, partition-invariant). One grid-bounded per-label
# value-count shuffle; cumulative capture and lift are driver math.
# ---------------------------------------------------------------------------

def gains_lift_orders(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_orderstatus"])

    def vc(batch: pa.Table) -> pa.Table:
        days = (batch.column("o_orderdate").cast(pa.int64())
                .to_numpy(zero_copy_only=False) // 86_400_000_000)
        bad = pc.equal(batch.column("o_orderstatus"), "F") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"v": days.astype(np.int64), "bad": bad})
        g = df.groupby("v", as_index=False).agg(n=("bad", "size"),
                                                n_bad=("bad", "sum"))
        return from_pandas_clean(g, preserve_index=False)

    rows = sorted(collect_pylist(
        ds.map_batches(vc, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("n", alias_name="n"),
                                Sum("n_bad", alias_name="n_bad"))),
        key=lambda r: r["v"])
    if not rows:
        return pa.table({"decile": pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64()),
                         "n_bad": pa.array([], type=pa.int64()),
                         "bad_rate": pa.array([], type=pa.float64()),
                         "cum_capture": pa.array([], type=pa.float64()),
                         "lift": pa.array([], type=pa.float64())})
    vals = np.array([r["v"] for r in rows], dtype=np.int64)
    cnts = np.array([r["n"] for r in rows], dtype=np.int64)
    bads = np.array([r["n_bad"] for r in rows], dtype=np.int64)
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    B = int(bads.sum())
    thr = np.array([vals[np.searchsorted(
        cum, int(np.floor(q * (n - 1))) + 1, side="left")]
        for q in (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)],
        dtype=np.int64)
    # decile 1 = SMALLEST days (highest score)
    dec = 1 + (vals[:, None] > thr[None, :]).sum(axis=1)
    out = []
    cn = cb = 0
    for d in range(1, 11):
        sel = dec == d
        dn = int(cnts[sel].sum())
        db = int(bads[sel].sum())
        cn += dn
        cb += db
        out.append({
            "decile": d, "n": dn, "n_bad": db,
            "bad_rate": _round6(db / dn) if dn else None,
            "cum_capture": _round6(cb / B) if B else None,
            "lift": _round6((cb / cn) / (B / n)) if cn and B else None})
    return pa.Table.from_pylist(out)


GAINS_LIFT_SQL = """
WITH src AS (
  SELECT CAST(datediff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS BIGINT) AS v,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
  FROM src_orders
), th AS (
  SELECT quantile_disc(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS t
  FROM src
), dec AS (
  SELECT 1 + (CASE WHEN v > t[1] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[2] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[3] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[4] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[5] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[6] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[7] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[8] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[9] THEN 1 ELSE 0 END) AS decile,
         bad
  FROM src, th
), agg AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(bad) AS BIGINT) AS n_bad
  FROM dec GROUP BY decile
), tot AS (
  SELECT CAST(sum(n) AS DOUBLE) AS nn, CAST(sum(n_bad) AS DOUBLE) AS bb
  FROM agg
)
SELECT decile, n, n_bad,
       round(CAST(n_bad AS DOUBLE) / n, 6) AS bad_rate,
       round(sum(n_bad) OVER w / tot.bb, 6) AS cum_capture,
       round((sum(n_bad) OVER w / sum(n) OVER w) / (tot.bb / tot.nn), 6)
         AS lift
FROM agg, tot
WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
ORDER BY decile
""".replace("src_orders", "orders")


# ---------------------------------------------------------------------------
# KS discrimination statistic (the credit-scoring model metric: max
# |CDF_good − CDF_bad| over the score). The deterministic age-sigmoid
# scorer is strictly monotone in order age, and KS is invariant under
# strictly monotone transforms — so the statistic computes EXACTLY on
# the integer day grid (no float-equality grouping hazards): one
# grid-bounded per-label value-count shuffle, driver cumsums.
# ---------------------------------------------------------------------------

def score_ks_orders(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_orderstatus"])

    def vc(batch: pa.Table) -> pa.Table:
        days = (batch.column("o_orderdate").cast(pa.int64())
                .to_numpy(zero_copy_only=False) // 86_400_000_000)
        bad = pc.equal(batch.column("o_orderstatus"), "F") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"v": days.astype(np.int64), "bad": bad})
        g = df.groupby("v", as_index=False).agg(n=("bad", "size"),
                                                n_bad=("bad", "sum"))
        return from_pandas_clean(g, preserve_index=False)

    rows = sorted(collect_pylist(
        ds.map_batches(vc, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("n", alias_name="n"),
                                Sum("n_bad", alias_name="n_bad"))),
        key=lambda r: r["v"])
    if not rows:
        return pa.Table.from_pylist([{"n_good": 0, "n_bad": 0,
                                      "ks": None}])
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    nb = np.array([r["n_bad"] for r in rows], dtype=np.int64)
    ng = n - nb
    B, G = int(nb.sum()), int(ng.sum())
    d = np.abs(np.cumsum(nb) / B - np.cumsum(ng) / G)
    return pa.Table.from_pylist([{
        "n_good": G, "n_bad": B, "ks": _round6(float(d.max()))}])


SCORE_KS_SQL = """
WITH src AS (
  SELECT CAST(datediff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS BIGINT) AS v,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
  FROM orders
), grid AS (
  SELECT v, CAST(sum(bad) AS BIGINT) AS nb,
         CAST(count(*) - sum(bad) AS BIGINT) AS ng
  FROM src GROUP BY v
), tot AS (
  SELECT CAST(sum(nb) AS DOUBLE) AS b, CAST(sum(ng) AS DOUBLE) AS g
  FROM grid
), walk AS (
  SELECT abs(sum(nb) OVER w / tot.b - sum(ng) OVER w / tot.g) AS d
  FROM grid, tot
  WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
)
SELECT (SELECT CAST(g AS BIGINT) FROM tot) AS n_good,
       (SELECT CAST(b AS BIGINT) FROM tot) AS n_bad,
       round(max(d), 6) AS ks
FROM walk
"""


# ---------------------------------------------------------------------------
# WOE / Information Value binning (the credit-scoring staple the
# reference's model-validation domain runs on; upgrades A21's
# pseudo-IV to the real weight-of-evidence table): decile bins by
# exact PERCENTILE_DISC thresholds on the integer cents grid
# (VALUE-based assignment — no rank-tie splitting, so any partitioning
# yields identical bins), per-bin good/bad counts from the same
# grid-bounded value-count shuffle, +0.5 numerator smoothing on both
# sides identically. One combiner shuffle; driver math on the grid.
# ---------------------------------------------------------------------------

def woe_iv_orders(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_totalprice", "o_orderstatus"])

    def vc(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        bad = pc.equal(batch.column("o_orderstatus"), "F") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"v": cents, "bad": bad})
        g = df.groupby("v", as_index=False).agg(n=("bad", "size"),
                                                n_bad=("bad", "sum"))
        return from_pandas_clean(g, preserve_index=False)

    rows = sorted(collect_pylist(
        ds.map_batches(vc, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("n", alias_name="n"),
                                Sum("n_bad", alias_name="n_bad"))),
        key=lambda r: r["v"])
    if not rows:
        return pa.table({"bin": pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64()),
                         "n_good": pa.array([], type=pa.int64()),
                         "n_bad": pa.array([], type=pa.int64()),
                         "woe": pa.array([], type=pa.float64()),
                         "iv_total": pa.array([], type=pa.float64())})
    vals = np.array([r["v"] for r in rows], dtype=np.int64)
    cnts = np.array([r["n"] for r in rows], dtype=np.int64)
    bads = np.array([r["n_bad"] for r in rows], dtype=np.int64)
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    # PERCENTILE_DISC thresholds: value at sorted index floor(q·(n−1))
    thr = np.array([vals[np.searchsorted(
        cum, int(np.floor(q * (n - 1))) + 1, side="left")]
        for q in (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)],
        dtype=np.int64)
    bins = 1 + (vals[:, None] > thr[None, :]).sum(axis=1)
    B = int(bads.sum())
    G = n - B
    out = []
    iv = 0.0
    per_bin = {}
    for b in range(1, 11):
        sel = bins == b
        nb = int(bads[sel].sum())
        ng = int(cnts[sel].sum()) - nb
        woe = float(np.log(((ng + 0.5) / G) / ((nb + 0.5) / B)))
        iv += ((ng + 0.5) / G - (nb + 0.5) / B) * woe
        per_bin[b] = (int(cnts[sel].sum()), ng, nb, woe)
    for b in range(1, 11):
        tot, ng, nb, woe = per_bin[b]
        out.append({"bin": b, "n": tot, "n_good": ng, "n_bad": nb,
                    "woe": _round6(woe), "iv_total": _round6(iv)})
    return pa.Table.from_pylist(out)


WOE_IV_SQL = """
WITH src AS (
  SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
  FROM orders
), th AS (
  SELECT quantile_disc(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS t
  FROM src
), binned AS (
  SELECT 1 + (CASE WHEN v > t[1] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[2] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[3] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[4] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[5] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[6] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[7] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[8] THEN 1 ELSE 0 END)
           + (CASE WHEN v > t[9] THEN 1 ELSE 0 END) AS bin,
         bad
  FROM src, th
), agg AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) - sum(bad) AS BIGINT) AS n_good,
         CAST(sum(bad) AS BIGINT) AS n_bad
  FROM binned GROUP BY bin
), tot AS (
  SELECT CAST(sum(n_good) AS DOUBLE) AS g,
         CAST(sum(n_bad) AS DOUBLE) AS b FROM agg
), woe AS (
  SELECT agg.bin, agg.n, agg.n_good, agg.n_bad,
         ln(((agg.n_good + 0.5) / tot.g) / ((agg.n_bad + 0.5) / tot.b))
           AS w,
         ((agg.n_good + 0.5) / tot.g - (agg.n_bad + 0.5) / tot.b)
           * ln(((agg.n_good + 0.5) / tot.g)
                / ((agg.n_bad + 0.5) / tot.b)) AS ivc
  FROM agg, tot
)
SELECT bin, n, n_good, n_bad, round(w, 6) AS woe,
       round((SELECT sum(ivc) FROM woe), 6) AS iv_total
FROM woe ORDER BY bin
"""


# ---------------------------------------------------------------------------
# One-step-Newton logistic (the first IRLS iteration from beta=0) —
# the SQL-anchorable slice of the iterative logistic family: at beta=0
# every mu is 1/2 and W is 1/4, so the update collapses to the CLOSED
# FORM beta1 = 4·(XtX)^-1·Xt(y − 1/2), Cramer-expressible exactly like
# the OLS oracle. The engine side runs the REAL streaming _irls_pass
# machinery capped at one iteration, so a match certifies the IRLS
# gradient/information accumulation end-to-end (the converged fit
# stays a rows-only check — no closed form exists).
# ---------------------------------------------------------------------------

def logistic_step_orders(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import logistic_fit

    fit = logistic_fit(_orders_logistic_features(sf_dir),
                       ["x1", "x2"], "label", max_iter=1)
    return pa.Table.from_pylist([
        {"feature": "intercept", "coef_step1": _round6(fit["intercept"])},
        {"feature": "x1", "coef_step1": _round6(fit["coef"][0])},
        {"feature": "x2", "coef_step1": _round6(fit["coef"][1])},
    ])


LOGISTIC_STEP_SQL = """
WITH p AS (
  SELECT CAST(datediff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS DOUBLE)
           / 1000.0 AS x1,
         CAST(o_totalprice AS DOUBLE) / 100000.0 AS x2,
         CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END - 0.5 AS r
  FROM orders
), s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x1) AS s1, sum(x2) AS s2,
         sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
         sum(r) AS g0, sum(x1*r) AS g1, sum(x2*r) AS g2
  FROM p
), d AS (
  SELECT *,
         n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
           + s2*(s1*s12 - s11*s2) AS det,
         g0*(s11*s22 - s12*s12) - s1*(g1*s22 - s12*g2)
           + s2*(g1*s12 - s11*g2) AS det0,
         n*(g1*s22 - g2*s12) - g0*(s1*s22 - s12*s2)
           + s2*(s1*g2 - g1*s2) AS det1,
         n*(s11*g2 - s12*g1) - s1*(s1*g2 - s2*g1)
           + g0*(s1*s12 - s11*s2) AS det2
  FROM s
)
SELECT feature, coef_step1 FROM (
  SELECT 'intercept' AS feature, round(4 * det0 / det, 6) AS coef_step1
  FROM d
  UNION ALL SELECT 'x1', round(4 * det1 / det, 6) FROM d
  UNION ALL SELECT 'x2', round(4 * det2 / det, 6) FROM d
)
"""


# ---------------------------------------------------------------------------
# A11 EXACT FULL-CORPUS Kendall tau-b (reference correlation.py:23-42
# method="kendall") — no O(n²) pair scan and no sample: both columns
# live on bounded integer grids (quantity ints × price cents), so the
# concordant/discordant counts derive from the JOINT value-count grid:
# one combiner-first groupby (rows ≤ grid product, invariant in the
# row count), then a driver sweep over quantity levels in order,
# accumulating each level's cents distribution and counting
# lower/higher predecessors per cell via searchsorted prefix sums —
# O(levels × grid) integer math. Counts are int64-exact to ~3×10⁹
# rows (nc ≤ n²/2); beyond that the per-level dot products switch to
# Python ints. The SQL oracle is the same grid with a double-
# inequality self-join (DuckDB IEJoin).
# ---------------------------------------------------------------------------

def kendall_lineitem(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def jc(batch: pa.Table) -> pa.Table:
        qv = np.rint(batch.column("l_quantity")
                     .to_numpy(zero_copy_only=False)).astype(np.int64)
        cv = np.rint(batch.column("l_extendedprice")
                     .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame({"q": qv, "c": cv})
        g = df.groupby(["q", "c"], as_index=False).size()
        return pa.table({"q": pa.array(g["q"].to_numpy(), type=pa.int64()),
                         "c": pa.array(g["c"].to_numpy(), type=pa.int64()),
                         "n": pa.array(g["size"].to_numpy().astype(np.int64),
                                       type=pa.int64())})

    rows = collect_pylist(ds.map_batches(jc, batch_format="pyarrow")
                          .groupby(["q", "c"])
                          .aggregate(Sum("n", alias_name="n")))
    if not rows:
        return pa.Table.from_pylist([{
            "n": 0, "nc": 0, "nd": 0, "ties_x": 0, "ties_y": 0,
            "tau_b": None}])
    df = pd.DataFrame(rows).sort_values(["q", "c"])
    grid = np.unique(df["c"].to_numpy())
    cnt = np.zeros(len(grid), dtype=np.int64)  # cents counts, prior levels
    prev_total = 0
    nc = nd = ties_x = 0
    n = int(df["n"].sum())
    for _, level in df.groupby("q", sort=True):
        lc = level["c"].to_numpy()
        ln = level["n"].to_numpy().astype(np.int64)
        pos = np.searchsorted(grid, lc)
        pref = np.concatenate(([0], np.cumsum(cnt)))
        less = pref[pos]                      # predecessors with cents < c
        upto = pref[pos + 1]                  # predecessors with cents <= c
        nc += int((ln * less).sum())
        nd += int((ln * (prev_total - upto)).sum())
        lt = int(ln.sum())
        ties_x += lt * (lt - 1) // 2
        np.add.at(cnt, pos, ln)
        prev_total += lt
    ties_y = 0
    cgrp = df.groupby("c")["n"].sum().to_numpy()
    for t in cgrp:
        ties_y += int(t) * (int(t) - 1) // 2
    n0 = n * (n - 1) // 2
    tau = (nc - nd) / float(np.sqrt(float(n0 - ties_x)
                                    * float(n0 - ties_y)))
    return pa.Table.from_pylist([{
        "n": n, "nc": nc, "nd": nd, "ties_x": ties_x, "ties_y": ties_y,
        "tau_b": _round6(tau)}])


KENDALL_FULL_SQL = """
WITH src AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS q,
         CAST(round(l_extendedprice*100) AS BIGINT) AS c
  FROM lineitem
), j AS (
  SELECT q, c, CAST(count(*) AS DOUBLE) AS n FROM src GROUP BY 1, 2
), conc AS (
  SELECT coalesce(sum(a.n*b.n), 0) AS v
  FROM j a JOIN j b ON b.q < a.q AND b.c < a.c
), disc AS (
  SELECT coalesce(sum(a.n*b.n), 0) AS v
  FROM j a JOIN j b ON b.q < a.q AND b.c > a.c
), tx AS (
  SELECT sum(n*(n-1))/2.0 AS v
  FROM (SELECT CAST(count(*) AS DOUBLE) AS n FROM src GROUP BY q)
), ty AS (
  SELECT sum(n*(n-1))/2.0 AS v
  FROM (SELECT CAST(count(*) AS DOUBLE) AS n FROM src GROUP BY c)
), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM src)
SELECT CAST(nn.n AS BIGINT) AS n,
       CAST(conc.v AS BIGINT) AS nc, CAST(disc.v AS BIGINT) AS nd,
       CAST(tx.v AS BIGINT) AS ties_x, CAST(ty.v AS BIGINT) AS ties_y,
       round((conc.v - disc.v) / sqrt((nn.n*(nn.n-1)/2.0 - tx.v)
                                      * (nn.n*(nn.n-1)/2.0 - ty.v)), 6)
         AS tau_b
FROM conc, disc, tx, ty, nn
"""


# ---------------------------------------------------------------------------
# A11 Kendall tau-b on a bounded deterministic sample (reference
# analysis/correlation.py:23-42 `method` param) — closes the last A11
# gap next to spearman_sample_lineitem. Vectorized O(n²) sign kernel on
# the bounded sample; full SQL oracle via the self-join pair count.
# ---------------------------------------------------------------------------

def kendall_sample_lineitem(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_extendedprice"])

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less_equal(batch.column("l_orderkey"), 500))

    df = pd.DataFrame(collect_pylist(ds.map_batches(pick, batch_format="pyarrow")))
    x = df["l_quantity"].to_numpy(dtype=np.float64)
    y = df["l_extendedprice"].to_numpy(dtype=np.float64)
    n = len(x)
    dx = np.sign(x[:, None] - x[None, :])
    dy = np.sign(y[:, None] - y[None, :])
    iu = np.triu_indices(n, 1)
    s_cd = float((dx[iu] * dy[iu]).sum())
    n0 = n * (n - 1) / 2.0
    tie = lambda v: float(sum(c * (c - 1) / 2.0
                              for c in pd.Series(v).value_counts()))
    n1, n2 = tie(x), tie(y)
    tau = s_cd / np.sqrt((n0 - n1) * (n0 - n2))
    return pa.table({"n": pa.array([n], type=pa.int64()),
                     "kendall_tau": pa.array([_round6(tau)], type=pa.float64())})


KENDALL_SQL = """
WITH s AS (
  SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rid,
         l_quantity AS x, l_extendedprice AS y
  FROM lineitem WHERE l_orderkey <= 500
), cd AS (
  SELECT CAST(sum(sign(a.x - b.x) * sign(a.y - b.y)) AS DOUBLE) AS s_cd
  FROM s a JOIN s b ON a.rid < b.rid
), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM s),
tx AS (SELECT sum(c*(c-1)/2.0) AS n1 FROM (SELECT count(*) AS c FROM s GROUP BY x)),
ty AS (SELECT sum(c*(c-1)/2.0) AS n2 FROM (SELECT count(*) AS c FROM s GROUP BY y))
SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n,
       round(s_cd / sqrt((n*(n-1)/2.0 - n1) * (n*(n-1)/2.0 - n2)), 6) AS kendall_tau
FROM cd, nn, tx, ty
"""


# ---------------------------------------------------------------------------
# M6 KNN imputation with a FULL SQL oracle: impute l_quantity for the
# deterministic synthetic-null rows (id % 997 == 0) from the mean of
# the 5 euclidean-nearest donors over (price, discount, tax). The
# (round(d²,6), donor id) ordering makes the neighbor set float-robust
# and identical in engine and SQL.
# ---------------------------------------------------------------------------

def knn_impute_quantity(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import knn_impute

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber",
                                    "l_quantity", "l_extendedprice",
                                    "l_discount", "l_tax"])

    def derive(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id": pc.add(pc.multiply(batch.column("l_orderkey"), pa.scalar(10)),
                         pc.cast(batch.column("l_linenumber"), pa.int64())),
            "v": pc.cast(batch.column("l_quantity"), pa.float64()),
            "f1": pc.cast(batch.column("l_extendedprice"), pa.float64()),
            "f2": pc.cast(batch.column("l_discount"), pa.float64()),
            "f3": pc.cast(batch.column("l_tax"), pa.float64()),
        })

    return knn_impute(ds.map_batches(derive, batch_format="pyarrow"),
                      "id", "v", ["f1", "f2", "f3"], mod=997, k=5)


KNN_IMPUTE_SQL = """
WITH base AS (
  SELECT l_orderkey*10 + l_linenumber AS id,
         CAST(l_quantity AS DOUBLE) AS v,
         CAST(l_extendedprice AS DOUBLE) AS f1,
         CAST(l_discount AS DOUBLE) AS f2,
         CAST(l_tax AS DOUBLE) AS f3
  FROM lineitem
), miss AS (SELECT * FROM base WHERE id % 997 = 0),
donor AS (SELECT * FROM base WHERE id % 997 != 0),
ranked AS (
  SELECT m.id AS id, d.v AS v,
         row_number() OVER (PARTITION BY m.id
           ORDER BY round((m.f1-d.f1)*(m.f1-d.f1) + (m.f2-d.f2)*(m.f2-d.f2)
                          + (m.f3-d.f3)*(m.f3-d.f3), 6), d.id) AS rn
  FROM miss m CROSS JOIN donor d
)
SELECT id, round(avg(v), 6) AS imputed
FROM ranked WHERE rn <= 5 GROUP BY id ORDER BY id
"""


# ---------------------------------------------------------------------------
# Text analysis: BPE-ish regex token counting (the brief's second
# tokenizer next to whitespace counting) — a GPT-2-style pretokenizer
# alternation simplified to be RE2-compatible (no lookarounds), so the
# engine (pyarrow/RE2) and the oracle (DuckDB/RE2) count identically:
# contraction suffixes | optional-space letter runs | optional-space
# digit runs | optional-space punctuation runs | whitespace runs.
# ---------------------------------------------------------------------------

_BPE_RE = "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_token_counts_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count_tokens(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"), _BPE_RE)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_bpe_tokens": pc.cast(n, pa.int64())})

    out = ds.map_batches(count_tokens, batch_format="pyarrow")
    rows = sorted(collect_pylist(out), key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows)


BPE_TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}')) AS BIGINT)
         AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# LLM curation pipeline (pipelines/curate.py) — end-to-end quality →
# langid → exact dedup → near-dup dedup → token accounting. The
# near-dup stage is LSH (not SQL-expressible) → rows-only driver
# check; the per-stage accounting invariant (input = output + Σdrops)
# is asserted inside the pipeline itself and in pytest.
# ---------------------------------------------------------------------------

def curate_documents_stats(sf_dir: str) -> pa.Table:
    """End-to-end curation accounting. FULL SQL oracle: every stage is
    SQL-restatable — token-band quality filter, exact keep-first
    dedup (GROUP BY text), brute-force shingle Jaccard ≥ 0.8 pairs on
    the survivors, and keep-min-id-per-cluster via a RECURSIVE
    min-label transitive closure over the pair graph (the SQL twin of
    dedup.connected_components). LSH recall at 0.8 is exact on the
    fixtures (verified), so the engine's verified pair set equals the
    brute-force one."""
    from tanml_ray.pipelines.curate import curate_documents

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    _, stats = curate_documents(ds, min_tokens=3, near_dup_threshold=0.8)
    row = {k: v for k, v in stats.items() if isinstance(v, int)}
    return pa.Table.from_pylist([row])


CURATE_STATS_SQL = r"""
WITH RECURSIVE keepq AS (
  SELECT doc_id, text FROM documents
  WHERE len(regexp_extract_all(text, '\S+')) BETWEEN 3 AND 100000
), exk AS (
  SELECT min(doc_id) AS doc_id FROM keepq GROUP BY text
), surv AS (
  SELECT k.doc_id, k.text FROM keepq k JOIN exk USING (doc_id)
), norm AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
  FROM surv WHERE text IS NOT NULL
), shl AS (
  SELECT doc_id, CASE WHEN length(t) < 5 THEN [t] ELSE
     list_transform(generate_series(1, length(t)-4), i -> substr(t, i, 5))
     END AS gl
  FROM norm WHERE length(t) > 0
), dd AS (
  SELECT DISTINCT doc_id, unnest(gl) AS g FROM shl
), cnt AS (
  SELECT doc_id, count(*) AS n FROM dd GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM dd a JOIN dd b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.8
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
), reach AS (
  SELECT a AS id, a AS r FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id
), roots AS (
  SELECT id, min(r) AS root FROM reach GROUP BY id
), dropped AS (
  SELECT id FROM roots WHERE root < id
), outp AS (
  SELECT s.doc_id, s.text FROM surv s
  LEFT JOIN dropped dr ON s.doc_id = dr.id WHERE dr.id IS NULL
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS input_rows,
  (SELECT CAST(count(*) AS BIGINT) FROM documents)
    - (SELECT CAST(count(*) AS BIGINT) FROM keepq)
    AS dropped_quality_or_lang,
  (SELECT CAST(count(*) AS BIGINT) FROM keepq)
    - (SELECT CAST(count(*) AS BIGINT) FROM surv) AS dropped_exact_dup,
  (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS near_dup_pairs,
  (SELECT CAST(count(DISTINCT root) AS BIGINT) FROM roots)
    AS near_dup_clusters,
  (SELECT CAST(count(*) AS BIGINT) FROM dropped) AS dropped_near_dup,
  (SELECT CAST(count(*) AS BIGINT) FROM outp) AS output_rows,
  (SELECT CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
   FROM outp) AS output_ws_tokens
"""


# ---------------------------------------------------------------------------
# Distributed multivariate OLS (mlops.linear_fit) with a FULL SQL
# oracle: the normal equations' 3×3 system solved by Cramer's rule
# over the same sufficient statistics the engine accumulates.
# ---------------------------------------------------------------------------

def linear_fit_orders(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import linear_fit

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                  "o_totalprice", "o_custkey"])

    def derive(batch: pa.Table) -> pa.Table:
        days = (batch.column("o_orderdate").cast(pa.int64())
                .to_numpy(zero_copy_only=False) // 86_400_000_000)
        return pa.table({
            "x1": pa.array(days.astype(np.float64), type=pa.float64()),
            "x2": pc.cast(batch.column("o_custkey"), pa.float64()),
            "y": pc.cast(batch.column("o_totalprice"), pa.float64()),
        })

    out = linear_fit(ds.map_batches(derive, batch_format="pyarrow"),
                     ["x1", "x2"], "y")
    return pa.Table.from_pylist([{
        "n": out["n"],
        "intercept": _round6(out["intercept"]),
        "coef_days": _round6(out["coef"][0]),
        "coef_cust": _round6(out["coef"][1]),
        "r2": _round6(out["r2"]),
    }])


LINEAR_FIT_SQL = """
WITH p AS (
  SELECT CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE) AS x1,
         CAST(o_custkey AS DOUBLE) AS x2,
         CAST(o_totalprice AS DOUBLE) AS y
  FROM orders
), s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x1) AS s1, sum(x2) AS s2,
         sum(y) AS sy, sum(x1*x1) AS s11, sum(x1*x2) AS s12,
         sum(x2*x2) AS s22, sum(x1*y) AS s1y, sum(x2*y) AS s2y,
         sum(y*y) AS syy
  FROM p
), d AS (
  SELECT *,
         n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det,
         sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y) AS det0,
         n*(s1y*s22 - s2y*s12) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2) AS det1,
         n*(s11*s2y - s12*s1y) - s1*(s1*s2y - s2*s1y) + sy*(s1*s12 - s11*s2) AS det2
  FROM s
)
SELECT CAST(n AS BIGINT) AS n,
       round(det0/det, 6) AS intercept,
       round(det1/det, 6) AS coef_days,
       round(det2/det, 6) AS coef_cust,
       round(1 - (syy - 2*(det0/det*sy + det1/det*s1y + det2/det*s2y)
                  + (det0/det)*(det0/det)*n + 2*(det0/det)*(det1/det)*s1
                  + 2*(det0/det)*(det2/det)*s2 + (det1/det)*(det1/det)*s11
                  + 2*(det1/det)*(det2/det)*s12 + (det2/det)*(det2/det)*s22)
                 / (syy - sy*sy/n), 6) AS r2
FROM d
"""


def _orders_lda_features(sf_dir: str):
    """Shared derive for the LDA / kNN classifier queries: integer
    features (floor-dollars totalprice, custkey — the integer-units
    convention that keeps the sufficient statistics / distances exact
    under any partitioning) + binary urgency label."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice",
                                  "o_custkey", "o_orderpriority"])

    def derive(batch: pa.Table) -> pa.Table:
        price = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        pri = batch.column("o_orderpriority").to_numpy(zero_copy_only=False)
        y = np.isin(pri.astype(str), ["1-URGENT", "2-HIGH"]).astype(np.int64)
        return pa.table({
            "id": pc.cast(batch.column("o_orderkey"), pa.int64()),
            "x1": pa.array(np.floor(price.astype(np.float64)).astype(np.int64),
                           type=pa.int64()),
            "x2": pc.cast(batch.column("o_custkey"), pa.int64()),
            "y": pa.array(y, type=pa.int64()),
        })

    return ds.map_batches(derive, batch_format="pyarrow")


def lda_fit_orders(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import lda_fit

    out = lda_fit(_orders_lda_features(sf_dir), ["x1", "x2"], "y")
    return pa.Table.from_pylist([{
        "n0": out["n0"], "n1": out["n1"],
        "coef_price": _round6(out["coef"][0]),
        "coef_cust": _round6(out["coef"][1]),
        "intercept": _round6(out["intercept"]),
    }])


LDA_FIT_SQL = """
WITH f AS (
  SELECT CAST(floor(o_totalprice) AS BIGINT) AS x1,
         CAST(o_custkey AS BIGINT) AS x2,
         CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
              THEN 1 ELSE 0 END AS y
  FROM orders),
s AS (
  SELECT y, count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
         sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22
  FROM f GROUP BY y),
piv AS (
  SELECT
    max(CASE WHEN y=0 THEN n END) AS n0, max(CASE WHEN y=1 THEN n END) AS n1,
    max(CASE WHEN y=0 THEN s1 END) AS a1, max(CASE WHEN y=0 THEN s2 END) AS a2,
    max(CASE WHEN y=0 THEN s11 END) AS a11,
    max(CASE WHEN y=0 THEN s12 END) AS a12,
    max(CASE WHEN y=0 THEN s22 END) AS a22,
    max(CASE WHEN y=1 THEN s1 END) AS b1, max(CASE WHEN y=1 THEN s2 END) AS b2,
    max(CASE WHEN y=1 THEN s11 END) AS b11,
    max(CASE WHEN y=1 THEN s12 END) AS b12,
    max(CASE WHEN y=1 THEN s22 END) AS b22
  FROM s),
cv AS (
  SELECT n0, n1,
    (CAST(a11 AS DOUBLE) - CAST(a1 AS DOUBLE)*CAST(a1 AS DOUBLE)/n0
     + (CAST(b11 AS DOUBLE) - CAST(b1 AS DOUBLE)*CAST(b1 AS DOUBLE)/n1))
      / (n0+n1-2) AS c11,
    (CAST(a12 AS DOUBLE) - CAST(a1 AS DOUBLE)*CAST(a2 AS DOUBLE)/n0
     + (CAST(b12 AS DOUBLE) - CAST(b1 AS DOUBLE)*CAST(b2 AS DOUBLE)/n1))
      / (n0+n1-2) AS c12,
    (CAST(a22 AS DOUBLE) - CAST(a2 AS DOUBLE)*CAST(a2 AS DOUBLE)/n0
     + (CAST(b22 AS DOUBLE) - CAST(b2 AS DOUBLE)*CAST(b2 AS DOUBLE)/n1))
      / (n0+n1-2) AS c22,
    CAST(b1 AS DOUBLE)/n1 - CAST(a1 AS DOUBLE)/n0 AS dm1,
    CAST(b2 AS DOUBLE)/n1 - CAST(a2 AS DOUBLE)/n0 AS dm2,
    CAST(a1 AS DOUBLE)/n0 AS m01, CAST(a2 AS DOUBLE)/n0 AS m02,
    CAST(b1 AS DOUBLE)/n1 AS m11, CAST(b2 AS DOUBLE)/n1 AS m12
  FROM piv),
w AS (
  SELECT n0, n1, m01, m02, m11, m12,
    (c22*dm1 - c12*dm2)/(c11*c22 - c12*c12) AS w1,
    (c11*dm2 - c12*dm1)/(c11*c22 - c12*c12) AS w2
  FROM cv)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       round(w1, 6) AS coef_price, round(w2, 6) AS coef_cust,
       round(-0.5*(w1*(m01+m11) + w2*(m02+m12))
             + ln(CAST(n1 AS DOUBLE)/n0), 6) AS intercept
FROM w
"""


def qda_fit_orders(sf_dir: str) -> pa.Table:
    """QDA on the same integer features/label as LDA; the output pins
    the whole fit — class counts, per-class covariance log-dets, and
    the quadratic discriminant score evaluated at each class mean
    (q_own ≡ 0 there, so the cross-class Mahalanobis term is isolated
    and any drift in means/covariances/inverses shows up)."""
    from tanml_ray.pipelines.mlops import qda_fit
    from tanml_ray.models import QDAModel

    out = qda_fit(_orders_lda_features(sf_dir), ["x1", "x2"], "y")
    model = QDAModel(out["n0"], out["n1"], out["means"], out["invs"],
                     out["logdets"])
    s0 = float(model.predict(np.array([out["means"][0]]))[0])
    s1 = float(model.predict(np.array([out["means"][1]]))[0])
    return pa.Table.from_pylist([{
        "n0": out["n0"], "n1": out["n1"],
        "logdet0": _round6(out["logdets"][0]),
        "logdet1": _round6(out["logdets"][1]),
        "score_mu0": _round6(s0),
        "score_mu1": _round6(s1),
    }])


QDA_FIT_SQL = """
WITH f AS (
  SELECT CAST(floor(o_totalprice) AS BIGINT) AS x1,
         CAST(o_custkey AS BIGINT) AS x2,
         CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
              THEN 1 ELSE 0 END AS y
  FROM orders),
s AS (
  SELECT y, count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
         sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22
  FROM f GROUP BY y),
piv AS (
  SELECT
    max(CASE WHEN y=0 THEN n END) AS n0, max(CASE WHEN y=1 THEN n END) AS n1,
    max(CASE WHEN y=0 THEN s1 END) AS a1, max(CASE WHEN y=0 THEN s2 END) AS a2,
    max(CASE WHEN y=0 THEN s11 END) AS a11,
    max(CASE WHEN y=0 THEN s12 END) AS a12,
    max(CASE WHEN y=0 THEN s22 END) AS a22,
    max(CASE WHEN y=1 THEN s1 END) AS b1, max(CASE WHEN y=1 THEN s2 END) AS b2,
    max(CASE WHEN y=1 THEN s11 END) AS b11,
    max(CASE WHEN y=1 THEN s12 END) AS b12,
    max(CASE WHEN y=1 THEN s22 END) AS b22
  FROM s),
cv AS (
  SELECT n0, n1,
    (CAST(a11 AS DOUBLE) - CAST(a1 AS DOUBLE)*CAST(a1 AS DOUBLE)/n0)
      / (n0-1) AS c011,
    (CAST(a12 AS DOUBLE) - CAST(a1 AS DOUBLE)*CAST(a2 AS DOUBLE)/n0)
      / (n0-1) AS c012,
    (CAST(a22 AS DOUBLE) - CAST(a2 AS DOUBLE)*CAST(a2 AS DOUBLE)/n0)
      / (n0-1) AS c022,
    (CAST(b11 AS DOUBLE) - CAST(b1 AS DOUBLE)*CAST(b1 AS DOUBLE)/n1)
      / (n1-1) AS c111,
    (CAST(b12 AS DOUBLE) - CAST(b1 AS DOUBLE)*CAST(b2 AS DOUBLE)/n1)
      / (n1-1) AS c112,
    (CAST(b22 AS DOUBLE) - CAST(b2 AS DOUBLE)*CAST(b2 AS DOUBLE)/n1)
      / (n1-1) AS c122,
    CAST(a1 AS DOUBLE)/n0 AS m01, CAST(a2 AS DOUBLE)/n0 AS m02,
    CAST(b1 AS DOUBLE)/n1 AS m11, CAST(b2 AS DOUBLE)/n1 AS m12
  FROM piv),
dt AS (
  SELECT *, c011*c022 - c012*c012 AS det0, c111*c122 - c112*c112 AS det1,
         ln(CAST(n1 AS DOUBLE)/n0) - 0.5*(ln(c111*c122 - c112*c112)
                                          - ln(c011*c022 - c012*c012)) AS cst
  FROM cv),
q AS (
  SELECT *,
    -- Mahalanobis of mu0 under class-1, matmul-nested like the engine:
    -- d·(d@inv): d1*(d1*i00 + d2*i10) + d2*(d1*i01 + d2*i11)
    (m01-m11)*((m01-m11)*(c122/det1) + (m02-m12)*(-c112/det1))
      + (m02-m12)*((m01-m11)*(-c112/det1) + (m02-m12)*(c111/det1)) AS q1m0,
    (m11-m01)*((m11-m01)*(c022/det0) + (m12-m02)*(-c012/det0))
      + (m12-m02)*((m11-m01)*(-c012/det0) + (m12-m02)*(c011/det0)) AS q0m1
  FROM dt)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       round(ln(det0), 6) AS logdet0, round(ln(det1), 6) AS logdet1,
       round(cst - 0.5*(q1m0 - 0.0), 6) AS score_mu0,
       round(cst - 0.5*(0.0 - q0m1), 6) AS score_mu1
FROM q
"""


def multinomial_nb_lineitem(sf_dir: str) -> pa.Table:
    """Multinomial NB over genuine count features (l_quantity,
    l_linenumber), label = returned line (l_returnflag='R'). The four
    Laplace-smoothed log feature probabilities pin the whole fit."""
    from tanml_ray.pipelines.mlops import multinomial_nb_fit

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_linenumber",
                                    "l_returnflag"])

    def derive(batch: pa.Table) -> pa.Table:
        rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        return pa.table({
            "x1": pc.cast(pc.round(batch.column("l_quantity")), pa.int64()),
            "x2": pc.cast(batch.column("l_linenumber"), pa.int64()),
            "y": pa.array((rf.astype(str) == "R").astype(np.int64),
                          type=pa.int64()),
        })

    out = multinomial_nb_fit(ds.map_batches(derive, batch_format="pyarrow"),
                             ["x1", "x2"], "y")
    return pa.Table.from_pylist([{
        "n0": out["n0"], "n1": out["n1"],
        "lt0_qty": _round6(out["log_theta"][0][0]),
        "lt0_line": _round6(out["log_theta"][0][1]),
        "lt1_qty": _round6(out["log_theta"][1][0]),
        "lt1_line": _round6(out["log_theta"][1][1]),
    }])


MULTINOMIAL_NB_SQL = """
WITH f AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
         CAST(l_linenumber AS BIGINT) AS x2,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem),
s AS (
  SELECT y, count(*) AS n, sum(x1) AS t1, sum(x2) AS t2 FROM f GROUP BY y),
piv AS (
  SELECT
    max(CASE WHEN y=0 THEN n END) AS n0, max(CASE WHEN y=1 THEN n END) AS n1,
    max(CASE WHEN y=0 THEN t1 END) AS a1, max(CASE WHEN y=0 THEN t2 END) AS a2,
    max(CASE WHEN y=1 THEN t1 END) AS b1, max(CASE WHEN y=1 THEN t2 END) AS b2
  FROM s)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
  round(ln(CAST(a1 AS DOUBLE) + 1.0)
        - ln(CAST(a1 + a2 AS DOUBLE) + 2.0), 6) AS lt0_qty,
  round(ln(CAST(a2 AS DOUBLE) + 1.0)
        - ln(CAST(a1 + a2 AS DOUBLE) + 2.0), 6) AS lt0_line,
  round(ln(CAST(b1 AS DOUBLE) + 1.0)
        - ln(CAST(b1 + b2 AS DOUBLE) + 2.0), 6) AS lt1_qty,
  round(ln(CAST(b2 AS DOUBLE) + 1.0)
        - ln(CAST(b1 + b2 AS DOUBLE) + 2.0), 6) AS lt1_line
FROM piv
"""


def knn_classify_orders(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import knn_classify

    return knn_classify(_orders_lda_features(sf_dir), "id", "y",
                        ["x1", "x2"], test_mod=997, k=5)


KNN_CLASSIFY_SQL = """
WITH f AS (
  SELECT CAST(o_orderkey AS BIGINT) AS id,
         CAST(floor(o_totalprice) AS BIGINT) AS x1,
         CAST(o_custkey AS BIGINT) AS x2,
         CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
              THEN 1 ELSE 0 END AS y
  FROM orders),
tst AS (SELECT * FROM f WHERE id % 997 = 0),
trn AS (SELECT * FROM f WHERE id % 997 <> 0),
d AS (
  SELECT t.id AS tid, r.id AS did,
         (t.x1-r.x1)*(t.x1-r.x1) + (t.x2-r.x2)*(t.x2-r.x2) AS d2, r.y
  FROM tst t CROSS JOIN trn r),
rk AS (SELECT *, row_number() OVER (PARTITION BY tid ORDER BY d2, did) AS rn
       FROM d)
SELECT tid AS id, CAST(sum(y) AS BIGINT) AS n_pos,
       CAST(CASE WHEN sum(y)*2 > 5 THEN 1 ELSE 0 END AS BIGINT) AS pred
FROM rk WHERE rn <= 5 GROUP BY tid ORDER BY tid
"""


# ---------------------------------------------------------------------------
# Web-text curation layer (pipelines/webtext.py): Gopher quality rules,
# within-doc duplicate-n-gram repetition, corpus hot-n-gram boilerplate
# coverage, deterministic weighted sampling. All four fully SQL-oracled.
# ---------------------------------------------------------------------------

def gopher_quality_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import gopher_signals_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(gopher_signals_batch, batch_format="pyarrow")
    rows = sorted(collect_pylist(out), key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows)


GOPHER_QUALITY_SQL = """
WITH sig AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(text, '\\S')) AS BIGINT) AS n_wordchars,
         CAST(len(regexp_extract_all(text, '\\S*[A-Za-z]\\S*')) AS BIGINT) AS n_alpha_words,
         CAST(len(regexp_extract_all(text, '\\b(the|and|of|to|in|is|that|for|was|on)\\b')) AS BIGINT) AS stop_hits
  FROM documents)
SELECT doc_id, n_words,
       round(n_wordchars / CAST(greatest(n_words, 1) AS DOUBLE), 6) AS mean_word_len,
       round(n_alpha_words / CAST(greatest(n_words, 1) AS DOUBLE), 6) AS alpha_word_frac,
       stop_hits,
       CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                  AND n_wordchars / CAST(greatest(n_words, 1) AS DOUBLE) BETWEEN 3.0 AND 10.0
                  AND n_alpha_words / CAST(greatest(n_words, 1) AS DOUBLE) > 0.80
                  AND stop_hits >= 2
            THEN 1 ELSE 0 END AS BIGINT) AS gopher_pass
FROM sig ORDER BY doc_id
"""


def repetition_ngram_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import dup_ngram_stats_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(dup_ngram_stats_batch, batch_format="pyarrow")
    rows = sorted(collect_pylist(out), key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows)


REPETITION_NGRAM_SQL = """
WITH docs AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents),
idx AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM docs),
tg AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g FROM idx),
cnt AS (
  SELECT doc_id, g, count(*) AS c FROM tg GROUP BY doc_id, g)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_grams,
       round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(sum(c) AS DOUBLE), 6) AS dup_frac
FROM cnt GROUP BY doc_id ORDER BY doc_id
"""


def hot_ngram_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import hot_ngram_coverage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return hot_ngram_coverage(ds, n=3, min_df_frac=0.05)


HOT_NGRAM_SQL = """
WITH docs AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents),
idx AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM docs),
tg AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g FROM idx),
hot AS (
  SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df FROM tg GROUP BY g)
  WHERE df >= greatest(2, CAST(ceil(0.05 * (SELECT count(*) FROM documents)) AS BIGINT)))
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN g IN (SELECT g FROM hot) THEN 1 ELSE 0 END) AS BIGINT) AS hot_grams,
       round(sum(CASE WHEN g IN (SELECT g FROM hot) THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS hot_frac
FROM tg GROUP BY doc_id ORDER BY doc_id
"""


def weighted_sample_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import weighted_sample_per_group

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return weighted_sample_per_group(ds, k=3, weight_col="n_chars",
                                     group_col="lang", id_col="doc_id")


WEIGHTED_SAMPLE_SQL = """
WITH keyed AS (
  SELECT lang, doc_id, n_chars,
         -ln(((md5_number_lower(CAST(doc_id AS VARCHAR)) >> 11) + 0.5)
             / 9007199254740992.0) / n_chars AS skey
  FROM documents)
SELECT lang,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY skey, doc_id) AS BIGINT) AS rank,
       doc_id, n_chars, round(skey, 6) AS priority
FROM keyed
QUALIFY rank <= 3
ORDER BY lang, rank
"""


def ngram_contamination_documents(sf_dir: str) -> pa.Table:
    """Benchmark decontamination: source='src0' docs play the eval set;
    every other doc reports its 5-gram overlap with it."""
    from tanml_ray.pipelines.webtext import ngram_contamination

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    corpus = ds.filter(expr="source != 'src0'")
    bench = ds.filter(expr="source == 'src0'")
    return ngram_contamination(corpus, bench, n=5)


NGRAM_CONTAMINATION_SQL = """
WITH docs AS (
  SELECT doc_id, source, regexp_extract_all(text, '\\S+') AS ws FROM documents),
idx AS (
  SELECT doc_id, source, ws, unnest(generate_series(1, len(ws) - 4)) AS i FROM docs),
tg AS (
  SELECT doc_id, source,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS g
  FROM idx),
bench AS (SELECT DISTINCT g FROM tg WHERE source = 'src0')
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN g IN (SELECT g FROM bench) THEN 1 ELSE 0 END) AS BIGINT) AS hit_grams,
       CAST(CASE WHEN sum(CASE WHEN g IN (SELECT g FROM bench) THEN 1 ELSE 0 END) > 0
            THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM tg WHERE source != 'src0'
GROUP BY doc_id ORDER BY doc_id
"""


def robust_scale_totalprice(sf_dir: str) -> pa.Table:
    """Robust scaling (x - median) / IQR of o_totalprice — the
    sklearn RobustScaler transform as a distributed two-phase op:
    phase 1 streams per-batch value-count partials on the integer
    cents grid (bounded by the price grid, NOT the row count) through
    one groupby Sum; the driver derives exact quantile_cont-parity
    percentiles from the merged counts; phase 2 rescales every row in
    a closure-broadcast map_batches. Full SQL oracle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def vc_partial(batch: pa.Table) -> pa.Table:
        u = np.rint(batch.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        vals, cnts = np.unique(u, return_counts=True)
        return pa.table({"cents": pa.array(vals, type=pa.int64()),
                         "n": pa.array(cnts, type=pa.int64())})

    vc = sorted(collect_pylist(
        ds.map_batches(vc_partial, batch_format="pyarrow")
        .groupby("cents").aggregate(Sum("n", alias_name="n"))),
        key=lambda r: r["cents"])
    from tanml_ray.stages.quantiles import quantile_cont_from_counts

    vals = np.array([r["cents"] for r in vc], dtype=np.float64)
    cum = np.cumsum([r["n"] for r in vc])

    def q_cont(q: float) -> float:
        return quantile_cont_from_counts(vals, cum, q) / 100.0

    q1, med, q3 = q_cont(0.25), q_cont(0.50), q_cont(0.75)
    iqr = q3 - q1

    def scale(batch: pa.Table) -> pa.Table:
        x = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "scaled": pa.array(np.round((x - med) / iqr, 6))})

    rows = sorted(collect_pylist(ds.map_batches(scale, batch_format="pyarrow")),
                  key=lambda r: r["o_orderkey"])
    return pa.Table.from_pylist(rows)


ROBUST_SCALE_SQL = """
WITH qs AS (
  SELECT quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.25)/100.0 AS q1,
         quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.50)/100.0 AS med,
         quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.75)/100.0 AS q3
  FROM orders)
SELECT o_orderkey, round((o_totalprice - med) / (q3 - q1), 6) AS scaled
FROM orders, qs ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# PII detection + redaction (functions/pii.py). The synthetic corpus has
# no natural PII, so the query injects a deterministic contact line into
# every third document (a pure function of doc_id, mirrored verbatim in
# the SQL oracle) and then runs the real RE2 scan/redact kernels over it
# — exercising true positives, true negatives, and the post-redaction
# byte-length invariant against DuckDB's identical RE2 engine.
# ---------------------------------------------------------------------------

def pii_scan_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.functions.pii import pii_counts_batch, redact_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def inject(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id")
        s = lambda x: pc.cast(x, pa.string())
        # build: ' contact user{id}@mail{id%7}.example.com ip
        # 10.{id%256}.0.{id%100} phone 555-{100+id%900}-{1000+id%9000}'
        contact = pc.binary_join_element_wise(
            " contact user", s(did),
            "@mail", s(pc.subtract(did, pc.multiply(pc.divide(did, 7), 7))),
            ".example.com ip 10.",
            s(pc.subtract(did, pc.multiply(pc.divide(did, 256), 256))),
            ".0.",
            s(pc.subtract(did, pc.multiply(pc.divide(did, 100), 100))),
            " phone 555-",
            s(pc.add(pc.subtract(did, pc.multiply(pc.divide(did, 900), 900)),
                     100)),
            "-",
            s(pc.add(pc.subtract(did, pc.multiply(pc.divide(did, 9000), 9000)),
                     1000)),
            "")
        third = pc.equal(pc.subtract(did, pc.multiply(pc.divide(did, 3), 3)), 0)
        text2 = pc.if_else(
            third,
            pc.binary_join_element_wise(batch.column("text"), contact, ""),
            batch.column("text"))
        return pa.table({"doc_id": did, "text": text2})

    injected = ds.map_batches(inject, batch_format="pyarrow")

    def scan(batch: pa.Table) -> pa.Table:
        counts = pii_counts_batch(batch, "text", "doc_id",
                                  kinds=("email", "phone", "ipv4"))
        red = redact_batch(batch, "text")
        out = counts.append_column("redacted_len",
                                   red.column("redacted_len"))
        return out.filter(pc.greater(out.column("pii_total"), 0))

    out = injected.map_batches(scan, batch_format="pyarrow")
    rows = sorted(collect_pylist(out), key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows)


PII_SCAN_SQL = r"""
WITH injected AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN
           text || ' contact user' || doc_id || '@mail' || (doc_id % 7)
                || '.example.com ip 10.' || (doc_id % 256) || '.0.'
                || (doc_id % 100) || ' phone 555-' || (100 + doc_id % 900)
                || '-' || (1000 + doc_id % 9000)
         ELSE text END AS text
  FROM documents
), scanned AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
    len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phone,
    len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
    length(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
          '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS redacted_len
  FROM injected
)
SELECT doc_id, n_email, n_phone, n_ipv4,
       n_email + n_phone + n_ipv4 AS pii_total, redacted_len
FROM scanned WHERE n_email + n_phone + n_ipv4 > 0 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Per-domain corpus composition (webtext.domain_stats). The documents
# table has no url column, so the query derives one deterministically
# (url = https://www.{source}.{lang}.example.org/doc/{doc_id}, mirrored
# verbatim in the SQL) — the host extraction, www-strip, partial-count
# shuffle and share/cap flagging are the real kernels under test.
# ---------------------------------------------------------------------------

def domain_stats_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import domain_stats

    ds = _read(sf_dir, "documents", ["doc_id", "source", "lang"])

    def with_url(batch: pa.Table) -> pa.Table:
        url = pc.binary_join_element_wise(
            "https://www.", batch.column("source"), ".",
            batch.column("lang"), ".example.org/doc/",
            pc.cast(batch.column("doc_id"), pa.string()), "")
        return pa.table({"url": url})

    return domain_stats(ds.map_batches(with_url, batch_format="pyarrow"),
                        share_cap=0.01)


DOMAIN_STATS_SQL = r"""
WITH pages AS (
  SELECT 'https://www.' || source || '.' || lang || '.example.org/doc/'
         || doc_id AS url
  FROM documents
), hosts AS (
  SELECT regexp_replace(regexp_extract(url, '^https?://([^/]+)', 1),
                        '^www\.', '') AS domain
  FROM pages
), agg AS (
  SELECT domain, count(*) AS n_pages FROM hosts GROUP BY domain
)
SELECT domain, n_pages,
       round(n_pages / (SELECT CAST(sum(n_pages) AS DOUBLE) FROM agg), 6)
         AS share,
       n_pages / (SELECT CAST(sum(n_pages) AS DOUBLE) FROM agg) > 0.01
         AS over_cap
FROM agg ORDER BY domain
"""


# ---------------------------------------------------------------------------
# Retention cohort analysis over the events stream: cohort = a user's
# first active day; cell (cohort, offset) = distinct users from that
# cohort active `offset` days later. The canonical product-analytics
# wide op — per-batch (user, day) dedupe is the combiner (the exchange
# moves unique pairs, never raw events), ONE coarse hash(user)%P
# shuffle resolves every user's cohort+offsets vectorized inside its
# partition (each user lives in exactly one partition, so the
# per-partition (cohort, offset) row counts are disjoint distinct-user
# partials), then a bounded (cohort, offset) Sum. Full SQL oracle.
# ---------------------------------------------------------------------------

def retention_cohorts_events(sf_dir: str) -> pa.Table:
    import pandas as pd

    from ray.data.aggregate import Sum
    from tanml_ray.stages.shuffle import with_coarse_partition

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def local(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        df = pd.DataFrame({"user_id": batch.column("user_id")
                           .to_numpy(zero_copy_only=False),
                           "day": day.to_numpy(zero_copy_only=False)})
        return from_pandas_clean(df.drop_duplicates())

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["user_id", "day"])
        cohort = g.groupby("user_id")["day"].transform("min")
        out = pd.DataFrame({
            "cohort": cohort,
            "day_offset": (g["day"] - cohort).dt.days.astype("int64")})
        return from_pandas_clean(
            out.groupby(["cohort", "day_offset"], as_index=False)
            .size().rename(columns={"size": "n"}))

    cells = (with_coarse_partition(
        ds.map_batches(local, batch_format="pyarrow"), "user_id")
        .groupby("__upart").map_groups(per_partition, batch_format="pandas")
        .groupby(["cohort", "day_offset"])
        .aggregate(Sum("n", alias_name="n_users")))
    rows = [{"cohort": pd.Timestamp(r["cohort"]),
             "day_offset": int(r["day_offset"]),
             "n_users": int(r["n_users"])}
            for r in collect_pylist(cells)]
    rows.sort(key=lambda r: (r["cohort"], r["day_offset"]))
    return pa.Table.from_pylist(rows)


RETENTION_SQL = """
WITH activity AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), firsts AS (
  SELECT user_id, min(day) AS cohort FROM activity GROUP BY user_id
)
SELECT f.cohort, datediff('day', f.cohort, a.day) AS day_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM activity a JOIN firsts f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Global window ranks without a global sort: percent_rank() and
# cume_dist() over o_totalprice. Phase 1 streams per-batch value-count
# partials on the integer cents grid through one bounded groupby (the
# same shape robust_scale uses — the shuffle is grid-bounded, not
# row-bounded); the driver turns merged counts into rank prefix sums;
# phase 2 maps every row via np.searchsorted against the broadcast
# grid. SQL window functions are the oracle (min-rank tie semantics on
# both sides).
# ---------------------------------------------------------------------------

def percent_rank_orders(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def vc_partial(batch: pa.Table) -> pa.Table:
        u = np.rint(batch.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        vals, cnts = np.unique(u, return_counts=True)
        return pa.table({"cents": pa.array(vals, type=pa.int64()),
                         "n": pa.array(cnts, type=pa.int64())})

    vc = sorted(collect_pylist(
        ds.map_batches(vc_partial, batch_format="pyarrow")
        .groupby("cents").aggregate(Sum("n", alias_name="n"))),
        key=lambda r: r["cents"])
    vals = np.array([r["cents"] for r in vc], dtype=np.int64)
    cnts = np.array([r["n"] for r in vc], dtype=np.int64)
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    below = cum - cnts          # rows strictly less than vals[i]
    pr = below / (n - 1) if n > 1 else np.zeros_like(below, dtype=np.float64)
    cd = cum / n

    def rank_rows(batch: pa.Table) -> pa.Table:
        u = np.rint(batch.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        i = np.searchsorted(vals, u)
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "pct_rank": pa.array(np.round(pr[i], 6)),
                         "cume_dist": pa.array(np.round(cd[i], 6))})

    rows = sorted(collect_pylist(ds.map_batches(rank_rows,
                                                batch_format="pyarrow")),
                  key=lambda r: r["o_orderkey"])
    return pa.Table.from_pylist(rows)


PERCENT_RANK_SQL = """
SELECT o_orderkey,
       round(percent_rank() OVER (ORDER BY CAST(round(o_totalprice*100) AS BIGINT)), 6) AS pct_rank,
       round(cume_dist() OVER (ORDER BY CAST(round(o_totalprice*100) AS BIGINT)), 6) AS cume_dist
FROM orders ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# Unpivot / melt — the reshape inverse of pivot_priority_status_orders:
# wide numeric columns → long (key, metric, value) rows. Pure per-batch
# Arrow column stacking (each batch emits k stacked slices, zero
# Python per row); no shuffle at all — the op is embarrassingly
# parallel and output-bounded at k× input rows. SQL UNPIVOT oracle.
# ---------------------------------------------------------------------------

def unpivot_orders(sf_dir: str) -> pa.Table:
    metrics = ["o_totalprice", "o_custkey"]
    ds = _read(sf_dir, "orders", ["o_orderkey"] + metrics)

    def melt(batch: pa.Table) -> pa.Table:
        keys, names, vals = [], [], []
        for m in metrics:
            keys.append(batch.column("o_orderkey"))
            names.append(pa.array([m] * batch.num_rows, type=pa.string()))
            vals.append(pc.cast(batch.column(m), pa.float64()))
        return pa.table({
            "o_orderkey": pa.concat_arrays(
                [c.combine_chunks() for c in keys]),
            "metric": pa.concat_arrays(names),
            "value": pa.concat_arrays(
                [c.combine_chunks() for c in vals]),
        })

    rows = sorted(collect_pylist(ds.map_batches(melt, batch_format="pyarrow")),
                  key=lambda r: (r["o_orderkey"], r["metric"]))
    return pa.Table.from_pylist(rows)


UNPIVOT_SQL = """
SELECT o_orderkey, metric, value FROM (
  SELECT o_orderkey, 'o_totalprice' AS metric,
         CAST(o_totalprice AS DOUBLE) AS value FROM orders
  UNION ALL
  SELECT o_orderkey, 'o_custkey' AS metric,
         CAST(o_custkey AS DOUBLE) AS value FROM orders
) ORDER BY o_orderkey, metric
"""


# ---------------------------------------------------------------------------
# CCNet-style unigram-LM perplexity quality scoring: train word counts
# on the corpus (combiner-first shuffle), broadcast the vocab-bounded
# LM, score every doc's add-one-smoothed nll/ppl. Full SQL oracle —
# identical RE2 tokenization, identical smoothing arithmetic.
# ---------------------------------------------------------------------------

def unigram_lm_ppl_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import unigram_lm_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return unigram_lm_scores(ds)


UNIGRAM_LM_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
), counts AS (
  SELECT w, count(*) AS c FROM toks GROUP BY w
), tot AS (
  SELECT CAST(sum(c) AS DOUBLE) + count(*) AS denom FROM counts
), scored AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         -sum(ln((c.c + 1) / tot.denom)) / count(*) AS raw_nll
  FROM toks t JOIN counts c ON t.w = c.w CROSS JOIN tot
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, round(raw_nll, 6) AS nll,
       round(exp(raw_nll), 6) AS ppl
FROM scored ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Quality-aware exact dedup: keep the best-quality doc per exact
# content group (max n_chars, tie min doc_id) — RefinedWeb-style
# selection instead of keep-first. Window-function SQL oracle.
# ---------------------------------------------------------------------------

def dedup_keep_best_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.dedup import exact_dedup_keep_best

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    return exact_dedup_keep_best(ds)


DEDUP_KEEP_BEST_SQL = """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         row_number() OVER (PARTITION BY text
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
) WHERE rn = 1 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# URL canonicalization (webtext.canonicalize_url_batch). The documents
# table has no url column, so a deliberately messy one is derived
# deterministically from (doc_id, source, lang) — mixed-case scheme and
# host, scheme-matched default ports, trailing slashes, utm_* tracking
# params and fragments — mirrored verbatim in the SQL. The vectorized
# RE2 rewrite chain is the kernel under test.
# ---------------------------------------------------------------------------

def canonical_urls_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import canonicalize_url_batch

    ds = _read(sf_dir, "documents", ["doc_id", "source", "lang"])

    def with_url(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        srcs = batch.column("source").to_pylist()
        langs = batch.column("lang").to_pylist()
        urls = []
        for i, s, lg in zip(ids, srcs, langs):
            i = int(i)
            scheme = "HTTP" if i % 2 == 0 else "https"
            host = f"www.{s}" + (".Example.COM" if i % 4 == 0
                                 else ".example.com")
            port = ":80" if i % 6 == 0 else (":443" if i % 6 == 3 else "")
            q = (f"?utm_source=feed&ref={lg}" if i % 3 == 0
                 else "?utm_campaign=x" if i % 3 == 1 else "")
            urls.append(scheme + "://" + host + port + f"/Doc/{i}"
                        + ("/" if i % 5 == 0 else "") + q
                        + ("#sec1" if i % 7 == 0 else ""))
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "url": pa.array(urls, type=pa.string())})

    out = (ds.map_batches(with_url, batch_format="pyarrow")
           .map_batches(canonicalize_url_batch, batch_format="pyarrow"))
    rows = sorted(collect_pylist(out), key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows)


CANONICAL_URLS_SQL = r"""
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END
         || '://www.' || source
         || CASE WHEN doc_id % 4 = 0 THEN '.Example.COM'
                 ELSE '.example.com' END
         || CASE WHEN doc_id % 6 = 0 THEN ':80'
                 WHEN doc_id % 6 = 3 THEN ':443' ELSE '' END
         || '/Doc/' || doc_id
         || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
         || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&ref=' || lang
                 WHEN doc_id % 3 = 1 THEN '?utm_campaign=x' ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN '#sec1' ELSE '' END AS url
  FROM documents
), p AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           AS scheme,
         lower(regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,
         regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')
           AS rest0
  FROM raw
), q AS (
  SELECT doc_id, url, scheme,
         CASE WHEN scheme = 'http'
              THEN regexp_replace(hostport, ':80$', '')
              WHEN scheme = 'https'
              THEN regexp_replace(hostport, ':443$', '')
              ELSE hostport END AS host,
         regexp_replace(regexp_replace(rest0, '#.*$', ''),
                        '[?&]utm_[^&]*', '', 'g') AS rest1
  FROM p
), r AS (
  SELECT doc_id, url, scheme, host,
         regexp_replace(regexp_replace(regexp_replace(
             rest1, '^([^?]*)&', '\1?'), '\?$', ''),
             '^([^?]*[^/?])/$', '\1') AS rest2
  FROM q
)
SELECT doc_id, url,
       scheme || '://' || host || regexp_replace(rest2, '^/$', '')
         AS canon_url
FROM r ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Token-budget accounting per language (webtext.token_budget_stats):
# packed context-length sequence counts and naive padding waste —
# all-integer, exact SQL oracle.
# ---------------------------------------------------------------------------

def token_budget_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import token_budget_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return token_budget_stats(ds, ctx=512)


TOKEN_BUDGET_SQL = r"""
WITH t AS (
  SELECT lang,
         coalesce(length(regexp_extract_all(text, '\S+')), 0) AS n
  FROM documents
), agg AS (
  SELECT lang, count(*) AS n_docs,
         CAST(sum(n) AS BIGINT) AS total_tokens,
         CAST(sum((n + 511) // 512) AS BIGINT) AS sum_ceil
  FROM t GROUP BY lang
)
SELECT lang, n_docs, total_tokens,
       (total_tokens + 511) // 512 AS packed_sequences,
       sum_ceil * 512 - total_tokens AS naive_pad_waste
FROM agg ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Leakage-safe grouped split (webtext.grouped_split_stats): the whole
# source lands in one split, decided by md5 of the group key —
# bit-reproducible via DuckDB's md5_number_lower.
# ---------------------------------------------------------------------------

def grouped_split_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import grouped_split_stats

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return grouped_split_stats(ds, group_col="source")


GROUPED_SPLIT_SQL = """
WITH g AS (
  SELECT source, count(*) AS n FROM documents GROUP BY source
), s AS (
  SELECT CASE WHEN md5_number_lower(source) % 10 < 8
              THEN 'train' ELSE 'test' END AS split, n
  FROM g
)
SELECT split, count(*) AS n_groups, CAST(sum(n) AS BIGINT) AS n_docs
FROM s GROUP BY split ORDER BY split
"""


# ---------------------------------------------------------------------------
# Per-label embedding centroid (similarity.group_centroids) — the
# vector aggregate; long (label, dim, centroid) output, exact SQL
# oracle via unnest + generate_subscripts.
# ---------------------------------------------------------------------------

def label_centroids_embeddings(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.similarity import group_centroids

    ds = _read(sf_dir, "embeddings", ["label", "embedding"])
    return group_centroids(ds)


LABEL_CENTROIDS_SQL = """
WITH u AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         unnest(embedding) AS v
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       round(avg(CAST(v AS DOUBLE)), 6) AS centroid
FROM u GROUP BY label, dim ORDER BY label, dim
"""


# ---------------------------------------------------------------------------
# Full outer join (join.partitioned_join how="outer") — completes the
# join family (broadcast/partitioned/bloom-semi/anti/asof/range/auto).
# Both sides are filtered so each contributes unmatched rows; the
# result is rolled up to (has_order, has_cust) presence cells with
# integer-cent sums so the oracle is exact.
# ---------------------------------------------------------------------------

def full_outer_join_orders_customer(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.join import partitioned_join

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def left_rows(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array(k % 3 == 0))
        return pa.table({
            "custkey": b.column("o_custkey"),
            "o_orderkey": b.column("o_orderkey"),
            "price_c": pc.cast(pc.round(pc.multiply(
                b.column("o_totalprice"), 100.0)), pa.int64()),
        })

    def right_rows(batch: pa.Table) -> pa.Table:
        k = batch.column("c_custkey").to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array(k % 2 == 0))
        return pa.table({
            "custkey": b.column("c_custkey"),
            "acct_c": pc.cast(pc.round(pc.multiply(
                b.column("c_acctbal"), 100.0)), pa.int64()),
        })

    joined = partitioned_join(
        orders.map_batches(left_rows, batch_format="pyarrow"),
        cust.map_batches(right_rows, batch_format="pyarrow"),
        "custkey", how="outer")

    def partial(df: "pd.DataFrame") -> pa.Table:
        import pandas as pd

        g = df.assign(
            has_order=df["o_orderkey"].notna(),
            has_cust=df["acct_c"].notna(),
            price_c=df["price_c"].fillna(0).astype(np.int64),
            acct_c=df["acct_c"].fillna(0).astype(np.int64),
        ).groupby(["has_order", "has_cust"], as_index=False).agg(
            n=("custkey", "size"), sum_price_c=("price_c", "sum"),
            sum_acct_c=("acct_c", "sum"))
        return from_pandas_clean(g, preserve_index=False)

    acc: dict[tuple, list[int]] = {}
    for r in collect_pylist(
            joined.map_batches(partial, batch_format="pandas")):
        k = (bool(r["has_order"]), bool(r["has_cust"]))
        a = acc.setdefault(k, [0, 0, 0])
        a[0] += int(r["n"])
        a[1] += int(r["sum_price_c"])
        a[2] += int(r["sum_acct_c"])
    return pa.Table.from_pylist([
        {"has_order": k[0], "has_cust": k[1], "n": v[0],
         "sum_price_c": v[1], "sum_acct_c": v[2]}
        for k, v in sorted(acc.items())])


FULL_OUTER_JOIN_SQL = """
WITH l AS (
  SELECT o_custkey AS custkey, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 3 = 0
), r AS (
  SELECT c_custkey AS custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS acct_c
  FROM customer WHERE c_custkey % 2 = 0
), j AS (
  SELECT l.o_orderkey, l.price_c, r.acct_c
  FROM l FULL OUTER JOIN r ON l.custkey = r.custkey
)
SELECT o_orderkey IS NOT NULL AS has_order,
       acct_c IS NOT NULL AS has_cust,
       count(*) AS n,
       CAST(sum(coalesce(price_c, 0)) AS BIGINT) AS sum_price_c,
       CAST(sum(coalesce(acct_c, 0)) AS BIGINT) AS sum_acct_c
FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# C4-style global span dedup (webtext.span_dedup): keep the first
# corpus-wide occurrence of every 10-word span, reconstruct documents
# from surviving spans. Full SQL oracle: unnest + generate_subscripts
# re-derive the spans, a row_number window elects the same
# (doc_id, span_idx)-ordered winner, string_agg FILTER rebuilds the text.
# ---------------------------------------------------------------------------

def span_dedup_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import span_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return span_dedup(ds, span_words=10)


SPAN_DEDUP_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '\S+')) AS w,
         generate_subscripts(regexp_extract_all(text, '\S+'), 1) AS ord
  FROM documents WHERE len(regexp_extract_all(text, '\S+')) >= 1
), spans AS (
  SELECT doc_id, (ord - 1) // 10 AS span_idx,
         string_agg(w, ' ' ORDER BY ord) AS span
  FROM toks GROUP BY doc_id, (ord - 1) // 10
), ranked AS (
  SELECT doc_id, span_idx, span,
         row_number() OVER (PARTITION BY span
                            ORDER BY doc_id, span_idx) AS rn
  FROM spans
)
SELECT doc_id, count(*) AS n_spans,
       count(*) FILTER (WHERE rn = 1) AS n_kept,
       coalesce(string_agg(span, ' ' ORDER BY span_idx)
                FILTER (WHERE rn = 1), '') AS dedup_text
FROM ranked GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# fastText-style NB quality classifier (webtext.nb_quality_scores):
# Gopher-rule pseudo-labels → one-pass distributed multinomial NB fit →
# per-doc log-odds score. Full SQL oracle: the label CASE repeats
# GOPHER_QUALITY_SQL's RE2 signals, the NB weights are re-derived from
# the same grouped token counts, round(6) swallows ulp/sum-order noise.
# ---------------------------------------------------------------------------

def nb_quality_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import nb_quality_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return nb_quality_scores(ds)


NB_QUALITY_SQL = r"""
WITH lab AS (
  SELECT doc_id, text,
         CAST(CASE WHEN len(regexp_extract_all(text, '\S+'))
                        BETWEEN 50 AND 100000
                    AND len(regexp_extract_all(text, '\S'))
                        / CAST(greatest(len(regexp_extract_all(text, '\S+')),
                                        1) AS DOUBLE) BETWEEN 3.0 AND 10.0
                    AND len(regexp_extract_all(text, '\S*[A-Za-z]\S*'))
                        / CAST(greatest(len(regexp_extract_all(text, '\S+')),
                                        1) AS DOUBLE) > 0.80
                    AND len(regexp_extract_all(text,
                        '\b(the|and|of|to|in|is|that|for|was|on)\b')) >= 2
               THEN 1 ELSE 0 END AS BIGINT) AS label
  FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
), toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
  FROM lab
), tl AS (
  SELECT t.doc_id, t.w, l.label FROM toks t JOIN lab l USING (doc_id)
), counts AS (
  SELECT w, count(*) FILTER (WHERE label = 1) AS cpos,
         count(*) FILTER (WHERE label = 0) AS cneg
  FROM tl GROUP BY w
), tot AS (
  SELECT CAST(sum(cpos) AS DOUBLE) + count(*) AS dpos,
         CAST(sum(cneg) AS DOUBLE) + count(*) AS dneg
  FROM counts
), pri AS (
  SELECT count(*) FILTER (WHERE label = 1) AS npos,
         count(*) FILTER (WHERE label = 0) AS nneg
  FROM lab
), scored AS (
  SELECT tl.doc_id, count(*) AS n_tokens,
         ln(pri.npos / CAST(pri.nneg AS DOUBLE))
           + sum(ln((c.cpos + 1) / tot.dpos)
                 - ln((c.cneg + 1) / tot.dneg)) AS raw
  FROM tl JOIN counts c USING (w) CROSS JOIN tot CROSS JOIN pri
  GROUP BY tl.doc_id, pri.npos, pri.nneg
)
SELECT s.doc_id, l.label, s.n_tokens, round(s.raw, 6) AS score,
       CAST(CASE WHEN s.raw > 0 THEN 1 ELSE 0 END AS BIGINT) AS pred
FROM scored s JOIN lab l USING (doc_id) ORDER BY s.doc_id
"""


# ---------------------------------------------------------------------------
# CCNet head/middle/tail perplexity bucketing (webtext.
# ppl_tertile_buckets): unigram-LM nll → integer milli-nat grid →
# exact tertile boundaries (quantile_cont parity) → per-doc bucket.
# The SQL re-derives the LM score (UNIGRAM_LM_SQL's CTE chain) and the
# boundaries with DuckDB's own quantile_cont over the same grid.
# ---------------------------------------------------------------------------

def ppl_buckets_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import ppl_tertile_buckets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ppl_tertile_buckets(ds)


PPL_BUCKETS_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
), counts AS (
  SELECT w, count(*) AS c FROM toks GROUP BY w
), tot AS (
  SELECT CAST(sum(c) AS DOUBLE) + count(*) AS denom FROM counts
), scored AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         -sum(ln((c.c + 1) / tot.denom)) / count(*) AS raw_nll
  FROM toks t JOIN counts c ON t.w = c.w CROSS JOIN tot
  GROUP BY t.doc_id
), m AS (
  SELECT doc_id, n_tokens,
         CAST(floor(round(raw_nll, 6) * 1000) AS BIGINT) AS mnat
  FROM scored
), b AS (
  SELECT quantile_cont(mnat, 1.0/3) AS b33,
         quantile_cont(mnat, 2.0/3) AS b66 FROM m
)
SELECT doc_id, n_tokens, mnat,
       CASE WHEN mnat <= b33 THEN 'head'
            WHEN mnat <= b66 THEN 'middle' ELSE 'tail' END AS bucket
FROM m, b ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Incremental dedup against a persisted digest index (dedup.
# build_digest_index / dedup_against_index). Even doc_ids form
# yesterday's indexed corpus, odd doc_ids the incoming shard; the
# corpus has no natural exact dups, so deterministic ones are planted
# on both sides (a pure CASE of doc_id, mirrored verbatim in the SQL):
# index docs with doc_id % 22 == 0 and incoming docs with
# doc_id % 7 == 0 share the text 'PLANTED DUP <doc_id % 3>'.
# ---------------------------------------------------------------------------

def incremental_dedup_documents(sf_dir: str) -> pa.Table:
    import ray.data as rd

    from tanml_ray.pipelines.dedup import (
        build_digest_index,
        dedup_against_index,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def side(parity: int, mod: int):
        def fn(batch: pa.Table) -> pa.Table:
            ids0 = batch.column("doc_id").to_numpy(zero_copy_only=False)
            keep = (ids0 % 2) == parity
            t = batch.filter(pa.array(keep))
            ids = ids0[keep]
            texts = t.column("text").to_pylist()
            out = [f"PLANTED DUP {int(i) % 3}" if int(i) % mod == 0 else s
                   for i, s in zip(ids, texts)]
            return pa.table({"doc_id": t.column("doc_id"),
                             "text": pa.array(out, type=pa.string())})
        return fn

    even = ds.map_batches(side(0, 22), batch_format="pyarrow")
    odd = ds.map_batches(side(1, 7), batch_format="pyarrow")

    import os
    import shutil
    import tempfile

    idx_dir = tempfile.mkdtemp(prefix="tanml_digidx_")
    try:
        build_digest_index(even, idx_dir, buckets=16)
        out = dedup_against_index(odd, idx_dir)
        rows = sorted(collect_pylist(out), key=lambda r: r["doc_id"])
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
    return pa.Table.from_pylist(rows)


INCREMENTAL_DEDUP_SQL = """
WITH idx AS (
  SELECT DISTINCT CASE WHEN doc_id % 22 = 0
              THEN 'PLANTED DUP ' || CAST(doc_id % 3 AS VARCHAR)
              ELSE text END AS text
  FROM documents WHERE doc_id % 2 = 0
), incoming AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN 'PLANTED DUP ' || CAST(doc_id % 3 AS VARCHAR)
              ELSE text END AS text
  FROM documents WHERE doc_id % 2 = 1
)
SELECT n.doc_id,
       CAST(CASE WHEN i.text IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS is_dup
FROM incoming n LEFT JOIN idx i USING (text)
ORDER BY n.doc_id
"""


# ---------------------------------------------------------------------------
# CCNet text normalization (webtext.normalize_text_batch). The corpus
# is pure ASCII, so a deterministic accented/mixed-unicode prefix is
# injected into every fourth document (pure function of doc_id,
# mirrored verbatim in the SQL) — exercising NFC, utf8proc-parity
# accent stripping, casefold and whitespace collapse for real.
# ---------------------------------------------------------------------------

def normalize_text_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import normalize_text_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        out = [(f"Café  ÑOÑO {int(i) % 5}\t—  " + t)
               if int(i) % 4 == 0 else t
               for i, t in zip(ids, texts)]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(out, type=pa.string())})

    out = (ds.map_batches(inject, batch_format="pyarrow")
           .map_batches(normalize_text_batch, batch_format="pyarrow"))
    rows = sorted(collect_pylist(out), key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows)


NORMALIZE_TEXT_SQL = r"""
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN 'Café  ÑOÑO ' || CAST(doc_id % 5 AS VARCHAR)
                   || chr(9) || '—  ' || text
              ELSE text END AS text
  FROM documents
), norm AS (
  SELECT doc_id,
         trim(regexp_replace(lower(strip_accents(nfc_normalize(text))),
                             '\s+', ' ', 'g')) AS norm_text
  FROM raw
)
SELECT doc_id, norm_text, length(norm_text) AS n_chars_norm
FROM norm ORDER BY doc_id
"""


def knn_cosine_pq_embeddings(sf_dir: str) -> pa.Table:
    """Approximate PQ/ADC top-k with a FULL SQL oracle: the codebook
    training is deterministic (md5-sampled seeds + 5 Lloyd iterations,
    no RNG, partition-order independent), so the entire pipeline —
    seed selection, every Lloyd re-assignment/re-average, encoding,
    and the asymmetric-distance top-k — unrolls into one DuckDB query
    (PQ_KNN_SQL). Recall vs the exact scan stays the pytest contract
    (tests/test_shuffle.py::test_pq_*)."""
    from tanml_ray.pipelines.similarity import (
        build_pq_codebook,
        knn_cosine_pq,
        pq_encode,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cb = build_pq_codebook(ds, m=8, ksub=16)
    codes = pq_encode(ds, cb).materialize()
    return knn_cosine_pq(codes, cb, _query_vectors(sf_dir, _KNN_QUERY_IDS),
                         k=10)


def _pq_knn_sql(m: int = 8, ksub: int = 16, dim: int = 64, iters: int = 5,
                k: int = 10, query_ids: tuple[int, ...] = _KNN_QUERY_IDS) -> str:
    """Generate the unrolled PQ/ADC oracle: normalize → md5-ordered
    seeds → `iters` Lloyd steps per sub-space (argmin re-assignment
    with (dist, j) tie order = np.argmin's first-min; empty clusters
    keep the old centroid via coalesce, matching the nz-mask update)
    → final codes → per-query ADC sim = Σ q·centroid[code], top-k by
    raw sim with vec_id tiebreak."""
    dsub = dim // m
    parts = [f"""
WITH vraw AS MATERIALIZED (
  SELECT vec_id, CAST(t.i AS BIGINT) AS dimn,
         CAST(embedding[t.i] AS DOUBLE) AS val
  FROM embeddings, range(1, {dim + 1}) t(i)
), nrm AS MATERIALIZED (
  SELECT vec_id, greatest(sqrt(sum(val*val)), 1e-30) AS nv
  FROM vraw GROUP BY 1
), vsub AS MATERIALIZED (
  SELECT v.vec_id, (v.dimn - 1) // {dsub} AS sub,
         (v.dimn - 1) % {dsub} AS sd, v.val / n.nv AS val
  FROM vraw v JOIN nrm n USING (vec_id)
), seeds AS MATERIALIZED (
  SELECT vec_id,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS j
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {ksub}
), c_0 AS MATERIALIZED (
  SELECT vs.sub, s.j, vs.sd, vs.val AS c
  FROM seeds s JOIN vsub vs ON vs.vec_id = s.vec_id
)"""]
    prev = "c_0"
    for t in range(1, iters + 1):
        parts.append(f""", a_{t} AS MATERIALIZED (
  SELECT vs.vec_id, vs.sub, ct.j, sum((vs.val - ct.c)*(vs.val - ct.c)) AS dist
  FROM vsub vs JOIN {prev} ct ON ct.sub = vs.sub AND ct.sd = vs.sd
  GROUP BY 1, 2, 3
), asn_{t} AS MATERIALIZED (
  SELECT vec_id, sub, j FROM a_{t}
  QUALIFY row_number() OVER (PARTITION BY vec_id, sub
                             ORDER BY dist, j) = 1
), c_{t} AS MATERIALIZED (
  SELECT ct.sub, ct.j, ct.sd, coalesce(u.c, ct.c) AS c
  FROM {prev} ct LEFT JOIN (
    SELECT a.sub, a.j, vs.sd, sum(vs.val) / count(*) AS c
    FROM asn_{t} a JOIN vsub vs ON vs.vec_id = a.vec_id AND vs.sub = a.sub
    GROUP BY 1, 2, 3
  ) u ON u.sub = ct.sub AND u.j = ct.j AND u.sd = ct.sd
)""")
        prev = f"c_{t}"
    qid_list = ", ".join(str(q) for q in query_ids)
    parts.append(f""", af AS MATERIALIZED (
  SELECT vs.vec_id, vs.sub, ct.j, sum((vs.val - ct.c)*(vs.val - ct.c)) AS dist
  FROM vsub vs JOIN {prev} ct ON ct.sub = vs.sub AND ct.sd = vs.sd
  GROUP BY 1, 2, 3
), codes AS MATERIALIZED (
  SELECT vec_id, sub, j FROM af
  QUALIFY row_number() OVER (PARTITION BY vec_id, sub
                             ORDER BY dist, j) = 1
), vq AS MATERIALIZED (
  SELECT vec_id AS query_id, sub, sd, val FROM vsub
  WHERE vec_id IN ({qid_list})
), sims AS MATERIALIZED (
  SELECT qv.query_id, cd.vec_id, sum(qv.val * cf.c) AS sim
  FROM codes cd
  JOIN {prev} cf ON cf.sub = cd.sub AND cf.j = cd.j
  JOIN vq qv ON qv.sub = cf.sub AND qv.sd = cf.sd
  WHERE cd.vec_id <> qv.query_id
  GROUP BY 1, 2
)
SELECT query_id, vec_id, round(sim, 6) AS sim FROM sims
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY sim DESC, vec_id) <= {k}
ORDER BY query_id, round(sim, 6) DESC, vec_id""")
    return "".join(parts)


PQ_KNN_SQL = _pq_knn_sql()


# ---------------------------------------------------------------------------
# Grouped simple OLS (per-key regression) — the segmented-model variant
# of A20/linear_fit: per l_returnflag, regress extendedprice (cents) on
# quantity. All five sufficient statistics are EXACT integer sums
# (combiner per batch → one tiny groupby), and both sides derive
# slope/intercept/r² with the same IEEE sequence from the same exact
# integers — bit parity without tolerance.
# ---------------------------------------------------------------------------

def grouped_ols_lineitem(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def exact_dot(a: np.ndarray, b: np.ndarray) -> int:
        """Σ aᵢbᵢ as an exact Python bigint (chunked so int64 can't
        overflow — the profile_lineitem suu pattern; y² terms reach
        ~4e13, so int64 wraps at ~2.5e5 rows per group)."""
        if not len(a):
            return 0
        m = max(int(np.abs(a).max()), 1) * max(int(np.abs(b).max()), 1)
        chunk = max(1, (1 << 62) // m)
        return sum(int(np.dot(a[i:i + chunk], b[i:i + chunk]))
                   for i in range(0, len(a), chunk))

    def partial(batch: pa.Table) -> pa.Table:
        x = np.rint(batch.column("l_quantity")
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        y = np.rint(batch.column("l_extendedprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        flags = np.asarray(batch.column("l_returnflag").to_pylist(),
                           dtype=object)
        rows = []
        for f in np.unique(flags):
            sel = flags == f
            xs, ys = x[sel], y[sel]
            # bigint-valued stats travel as strings (int64 columns
            # would re-introduce the overflow at merge time)
            rows.append({"l_returnflag": str(f), "n": int(sel.sum()),
                         "sx": int(xs.sum()), "sy": int(ys.sum()),
                         "sxx": str(exact_dot(xs, xs)),
                         "syy": str(exact_dot(ys, ys)),
                         "sxy": str(exact_dot(xs, ys))})
        return pa.Table.from_pylist(rows)

    # partials are tiny (groups × blocks rows) → exact bigint merge on
    # the driver, same shape as profile_lineitem
    merged: dict[str, list[int]] = {}
    for r in collect_pylist(ds.map_batches(partial,
                                           batch_format="pyarrow")):
        acc = merged.setdefault(r["l_returnflag"], [0, 0, 0, 0, 0, 0])
        acc[0] += int(r["n"])
        acc[1] += int(r["sx"])
        acc[2] += int(r["sy"])
        acc[3] += int(r["sxx"])
        acc[4] += int(r["syy"])
        acc[5] += int(r["sxy"])
    out = []
    for flag in sorted(merged):
        n, sx, sy, sxx, syy, sxy = merged[flag]
        num = n * sxy - sx * sy
        denx = n * sxx - sx * sx
        deny = n * syy - sy * sy
        slope = float(num) / float(denx)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        r2 = (float(num) * float(num)) / (float(denx) * float(deny))
        out.append({"l_returnflag": flag, "n": n,
                    "slope": _round6(slope),
                    "intercept": _round6(intercept / 100.0),
                    "r2": _round6(r2)})
    return pa.Table.from_pylist(out)


GROUPED_OLS_SQL = """
WITH s AS MATERIALIZED (
  SELECT l_returnflag,
         count(*) AS n,
         sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
         sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS sy,
         sum(CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_quantity) AS BIGINT)) AS sxx,
         sum(CAST(round(l_extendedprice*100) AS BIGINT)
             * CAST(round(l_extendedprice*100) AS BIGINT)) AS syy,
         sum(CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_extendedprice*100) AS BIGINT)) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round(CAST(n*sxy - sx*sy AS DOUBLE)
             / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope,
       round((CAST(sy AS DOUBLE)
              - (CAST(n*sxy - sx*sy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) / 100.0, 6) AS intercept,
       round(CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)
             / (CAST(n*sxx - sx*sx AS DOUBLE)
                * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS r2
FROM s ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Distributed embedding covariance (mlops.embedding_covariance): exact
# integer Gram-matrix sufficient statistics on the 2^16 quantization
# grid; upper triangle with 1-based dims matching SQL list indexing.
# ---------------------------------------------------------------------------

def embedding_covariance_embeddings(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import embedding_covariance

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cov, _ = embedding_covariance(ds)
    d = cov.shape[0]
    rows = [{"i": i + 1, "j": j + 1, "cov": _round6(cov[i, j])}
            for i in range(d) for j in range(i, d)]
    return pa.Table.from_pylist(rows)


EMBEDDING_COV_SQL = """
WITH dims AS MATERIALIZED (
  SELECT unnest(generate_series(1, 64)) AS i
), pairs AS MATERIALIZED (
  SELECT d1.i AS i, d2.i AS j FROM dims d1, dims d2 WHERE d1.i <= d2.i
), q AS MATERIALIZED (
  SELECT p.i, p.j,
         CAST(floor(CAST(embedding[p.i] AS DOUBLE) * 65536) AS BIGINT) AS xi,
         CAST(floor(CAST(embedding[p.j] AS DOUBLE) * 65536) AS BIGINT) AS xj
  FROM embeddings, pairs p
), s AS MATERIALIZED (
  SELECT i, j, count(*) AS n, sum(xi) AS si, sum(xj) AS sj,
         sum(xi*xj) AS sij
  FROM q GROUP BY i, j
)
SELECT i, j,
       round((CAST(sij AS DOUBLE) - CAST(si AS DOUBLE)*CAST(sj AS DOUBLE)/n)
             / (n-1) / 4294967296.0, 6) AS cov
FROM s ORDER BY i, j
"""


# ---------------------------------------------------------------------------
# Categorical association profile: entropy / mutual information / chi²
# / Cramér's V between two categorical columns, all derived from ONE
# joint-count pass (per-batch pandas combiner → tiny groupby — the
# joint table is category-product-bounded, never row-bounded). The
# p-value needs the incomplete gamma function (not in ANSI SQL), so
# the oracle covers the statistics; the band classification beyond
# that is pytest territory.
# ---------------------------------------------------------------------------

def mutual_info_orders(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "p": batch.column("o_orderpriority").to_pylist(),
            "s": batch.column("o_orderstatus").to_pylist(), "c": 1})
        g = df.groupby(["p", "s"], as_index=False).sum()
        return from_pandas_clean(g, preserve_index=False)

    joint = {(r["p"], r["s"]): int(r["c"])
             for r in collect_pylist(
                 ds.map_batches(partial, batch_format="pyarrow")
                 .groupby(["p", "s"]).aggregate(Sum("c", alias_name="c")))}
    n = sum(joint.values())
    cx: dict[str, int] = {}
    cy: dict[str, int] = {}
    for (p, s), c in joint.items():
        cx[p] = cx.get(p, 0) + c
        cy[s] = cy.get(s, 0) + c
    hx = -sum((c / n) * np.log(c / n) for _, c in sorted(cx.items()))
    hy = -sum((c / n) * np.log(c / n) for _, c in sorted(cy.items()))
    mi = sum((c / n) * np.log((c * n) / (cx[p] * cy[s]))
             for (p, s), c in sorted(joint.items()))
    # chi² runs over the FULL category product — zero-count cells still
    # contribute (0-e)²/e (MI's 0·log0 terms vanish, chi²'s do not)
    chi2 = sum((joint.get((p, s), 0) - cx[p] * cy[s] / n) ** 2
               / (cx[p] * cy[s] / n)
               for p in sorted(cx) for s in sorted(cy))
    dof = (len(cx) - 1) * (len(cy) - 1)
    cramers_v = float(np.sqrt(chi2 / (n * min(len(cx) - 1, len(cy) - 1))))
    return pa.Table.from_pylist([{
        "n": n, "h_priority": _round6(hx), "h_status": _round6(hy),
        "mi": _round6(mi), "chi2": _round6(chi2), "dof": dof,
        "cramers_v": _round6(cramers_v)}])


MUTUAL_INFO_SQL = """
WITH joint AS MATERIALIZED (
  SELECT o_orderpriority AS p, o_orderstatus AS s, count(*) AS c
  FROM orders GROUP BY p, s
), tot AS (SELECT sum(c) AS n FROM joint),
px AS (SELECT p, sum(c) AS cx FROM joint GROUP BY p),
py AS (SELECT s, sum(c) AS cy FROM joint GROUP BY s),
cells AS MATERIALIZED (
  SELECT px.p, px.cx, py.s, py.cy, coalesce(j.c, 0) AS c
  FROM px CROSS JOIN py
  LEFT JOIN joint j ON j.p = px.p AND j.s = py.s
)
SELECT
  CAST(tot.n AS BIGINT) AS n,
  round((SELECT -sum((cx/tot.n)*ln(cx/tot.n)) FROM px), 6) AS h_priority,
  round((SELECT -sum((cy/tot.n)*ln(cy/tot.n)) FROM py), 6) AS h_status,
  round((SELECT sum((j.c/tot.n)*ln((j.c*tot.n)/(px.cx*py.cy)))
         FROM joint j JOIN px USING (p) JOIN py USING (s)), 6) AS mi,
  round((SELECT sum(pow(c - cx*cy/tot.n, 2) / (cx*cy/tot.n))
         FROM cells), 6) AS chi2,
  CAST(((SELECT count(*) FROM px) - 1)
       * ((SELECT count(*) FROM py) - 1) AS BIGINT) AS dof,
  round(sqrt((SELECT sum(pow(c - cx*cy/tot.n, 2) / (cx*cy/tot.n))
              FROM cells)
             / (tot.n * least((SELECT count(*) FROM px) - 1,
                              (SELECT count(*) FROM py) - 1))), 6)
    AS cramers_v
FROM tot
"""


# ---------------------------------------------------------------------------
# Distinct-content set operations between two corpus halves (D-series
# completion: INTERSECT / EXCEPT beside the existing union/distinct/
# overlap). Sides are compared by 128-bit content digest; per-side
# per-batch local distinct (digest, presence-bit) partials meet in ONE
# groupby — text never shuffles, and output is the three set
# cardinalities plus per-side distinct counts.
# ---------------------------------------------------------------------------

def set_ops_documents(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Max

    from tanml_ray.pipelines.curate import _content_digest

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def side_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        seen: dict[bytes, list[int]] = {}
        for i, t in zip(ids, texts):
            # doc_id % 3 == 0 -> side A, else side B (deterministic,
            # mirrored in the SQL)
            bit = 0 if int(i) % 3 == 0 else 1
            d = _content_digest(t)
            flags = seen.setdefault(d, [0, 0])
            flags[bit] = 1
        return pa.table({
            "dig": pa.array(list(seen.keys()), type=pa.binary(16)),
            "in_a": pa.array([v[0] for v in seen.values()],
                             type=pa.int64()),
            "in_b": pa.array([v[1] for v in seen.values()],
                             type=pa.int64())})

    agg = (ds.map_batches(side_partial, batch_format="pyarrow")
           .groupby("dig")
           .aggregate(Max("in_a", alias_name="in_a"),
                      Max("in_b", alias_name="in_b")))

    def reduce_counts(batch: pa.Table) -> pa.Table:
        a = batch.column("in_a").to_numpy(zero_copy_only=False)
        b = batch.column("in_b").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_a": pa.array([int(a.sum())], type=pa.int64()),
            "n_b": pa.array([int(b.sum())], type=pa.int64()),
            "n_intersect": pa.array([int((a & b).sum())], type=pa.int64()),
            "n_a_only": pa.array([int((a & (1 - b)).sum())],
                                 type=pa.int64()),
            "n_b_only": pa.array([int(((1 - a) & b).sum())],
                                 type=pa.int64())})

    tot = [0, 0, 0, 0, 0]
    keys = ["n_a", "n_b", "n_intersect", "n_a_only", "n_b_only"]
    for r in collect_pylist(agg.map_batches(reduce_counts,
                                            batch_format="pyarrow")):
        for k, key in enumerate(keys):
            tot[k] += int(r[key])
    return pa.Table.from_pylist([dict(zip(keys, tot))])


SET_OPS_SQL = """
WITH a AS (SELECT DISTINCT text FROM documents WHERE doc_id % 3 = 0),
b AS (SELECT DISTINCT text FROM documents WHERE doc_id % 3 <> 0)
SELECT
  (SELECT count(*) FROM a) AS n_a,
  (SELECT count(*) FROM b) AS n_b,
  (SELECT count(*) FROM (SELECT text FROM a INTERSECT SELECT text FROM b))
    AS n_intersect,
  (SELECT count(*) FROM (SELECT text FROM a EXCEPT SELECT text FROM b))
    AS n_a_only,
  (SELECT count(*) FROM (SELECT text FROM b EXCEPT SELECT text FROM a))
    AS n_b_only
"""


# ---------------------------------------------------------------------------
# Winsorization (percentile outlier capping) of o_totalprice at
# p01/p99 — the robust-scaler's sibling transform: phase 1 derives
# exact quantile_cont-parity percentiles from integer-cents value
# counts (grid-bounded, not row-bounded), phase 2 caps every row in a
# closure-broadcast shuffle-free pass.
# ---------------------------------------------------------------------------

def winsorize_totalprice(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def vc_partial(batch: pa.Table) -> pa.Table:
        u = np.rint(batch.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        vals, cnts = np.unique(u, return_counts=True)
        return pa.table({"cents": pa.array(vals, type=pa.int64()),
                         "n": pa.array(cnts, type=pa.int64())})

    vc = sorted(collect_pylist(
        ds.map_batches(vc_partial, batch_format="pyarrow")
        .groupby("cents").aggregate(Sum("n", alias_name="n"))),
        key=lambda r: r["cents"])
    from tanml_ray.stages.quantiles import quantile_cont_from_counts

    vals = np.array([r["cents"] for r in vc], dtype=np.float64)
    cum = np.cumsum([r["n"] for r in vc])
    lo_cap = quantile_cont_from_counts(vals, cum, 0.01) / 100.0
    hi_cap = quantile_cont_from_counts(vals, cum, 0.99) / 100.0

    def cap(batch: pa.Table) -> pa.Table:
        x = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        w = np.minimum(np.maximum(x, lo_cap), hi_cap)
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "winsorized": pa.array(np.round(w, 6)),
            "was_capped": pa.array(((x < lo_cap) | (x > hi_cap))
                                   .astype(np.int64))})

    rows = sorted(collect_pylist(ds.map_batches(cap,
                                                batch_format="pyarrow")),
                  key=lambda r: r["o_orderkey"])
    return pa.Table.from_pylist(rows)


WINSORIZE_SQL = """
WITH qs AS MATERIALIZED (
  SELECT quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.01)/100.0
           AS lo,
         quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.99)/100.0
           AS hi
  FROM orders)
SELECT o_orderkey,
       round(least(greatest(o_totalprice, lo), hi), 6) AS winsorized,
       CAST(CASE WHEN o_totalprice < lo OR o_totalprice > hi
                 THEN 1 ELSE 0 END AS BIGINT) AS was_capped
FROM orders, qs ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# Corpus mixture planning (the LLaMA-style data-mixing table): given
# per-source whitespace token counts and fixed target mixture weights,
# compute each source's sampling rate (epochs over that source) for a
# fixed total token budget. Pure grouped-aggregate math — one
# combiner-first shuffle — with every derived number IEEE-shared with
# the SQL.
# ---------------------------------------------------------------------------

_MIX_WEIGHTS = [("src0", 0.6), ("src1", 0.25), ("src2", 0.15)]
_MIX_BUDGET_TOKENS = 1_000_000


def corpus_mixture_documents(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "source": batch.column("source"),
            "n_docs": np.ones(batch.num_rows, dtype=np.int64),
            "tokens": pc.fill_null(pc.cast(
                pc.count_substring_regex(batch.column("text"), r"\S+"),
                pa.int64()), 0)})
        g = pa.TableGroupBy(t, "source").aggregate(
            [("n_docs", "sum"), ("tokens", "sum")])
        return g.rename_columns(["source", "n_docs", "tokens"])

    agg = {r["source"]: r for r in collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source").aggregate(Sum("n_docs", alias_name="n_docs"),
                                     Sum("tokens", alias_name="tokens")))}
    out = []
    for src, w in _MIX_WEIGHTS:
        have = int(agg[src]["tokens"]) if src in agg else 0
        want = w * _MIX_BUDGET_TOKENS
        epochs = want / have if have else None
        out.append({
            "source": src,
            "n_docs": int(agg[src]["n_docs"]) if src in agg else 0,
            "tokens": have,
            "target_weight": w,
            "target_tokens": _round6(want),
            "epochs": _round6(epochs) if epochs is not None else None})
    return pa.Table.from_pylist(out)


# ---------------------------------------------------------------------------
# Temperature-based sampling weights per source (the XLM-R / mT5
# multilingual recipe: q_i ∝ p_i^α with α<1 upsamples the tail,
# Conneau et al. 2020 §3.1). Same bounded per-source token combiner as
# corpus_mixture; the driver computes natural share p, temperature
# weight q and the upsample factor q/p on the source-bounded table.
# ---------------------------------------------------------------------------

_MIX_TEMPERATURE_ALPHA = 0.3


def temperature_mix_documents(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "source": batch.column("source"),
            "tokens": pc.fill_null(pc.cast(
                pc.count_substring_regex(batch.column("text"), r"\S+"),
                pa.int64()), 0)})
        g = pa.TableGroupBy(t, "source").aggregate([("tokens", "sum")])
        return g.rename_columns(["source", "tokens"])

    rows = sorted(collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source").aggregate(Sum("tokens", alias_name="tokens"))),
        key=lambda r: r["source"])
    toks = np.array([int(r["tokens"]) for r in rows], dtype=np.float64)
    p = toks / toks.sum()
    q = p ** _MIX_TEMPERATURE_ALPHA
    q = q / q.sum()
    return pa.Table.from_pylist([
        {"source": r["source"], "tokens": int(r["tokens"]),
         "p_natural": _round6(float(p[i])),
         "q_temperature": _round6(float(q[i])),
         "upsample": _round6(float(q[i] / p[i]))}
        for i, r in enumerate(rows)])


TEMPERATURE_MIX_SQL = """
WITH have AS MATERIALIZED (
  SELECT source, CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT)
         AS tokens
  FROM documents GROUP BY source
), tot AS MATERIALIZED (
  SELECT sum(CAST(tokens AS DOUBLE)) AS t,
         sum(pow(tokens / (SELECT sum(CAST(tokens AS DOUBLE)) FROM have),
                 0.3)) AS z
  FROM have
)
SELECT source, tokens,
       round(tokens / tot.t, 6) AS p_natural,
       round(pow(tokens / tot.t, 0.3) / tot.z, 6) AS q_temperature,
       round((pow(tokens / tot.t, 0.3) / tot.z) / (tokens / tot.t), 6)
         AS upsample
FROM have, tot ORDER BY source
"""


def _mixture_sql() -> str:
    cases_w = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in _MIX_WEIGHTS)
    srcs = ", ".join(f"('{s}')" for s, _ in _MIX_WEIGHTS)
    return f"""
WITH targets(source) AS (VALUES {srcs}),
have AS MATERIALIZED (
  SELECT source, count(*) AS n_docs,
         sum(len(regexp_extract_all(text, '\\S+'))) AS tokens
  FROM documents GROUP BY source
)
SELECT t.source,
       CAST(coalesce(h.n_docs, 0) AS BIGINT) AS n_docs,
       CAST(coalesce(h.tokens, 0) AS BIGINT) AS tokens,
       CASE t.source {cases_w} END AS target_weight,
       round(CASE t.source {cases_w} END * {_MIX_BUDGET_TOKENS}, 6)
         AS target_tokens,
       round(CASE t.source {cases_w} END * {_MIX_BUDGET_TOKENS}
             / CAST(h.tokens AS DOUBLE), 6) AS epochs
FROM targets t LEFT JOIN have h USING (source)
ORDER BY t.source
"""


# ---------------------------------------------------------------------------
# Drift statistics beyond PSI/KS (A7+): Jensen-Shannon divergence and
# Wasserstein-1 (earth-mover) distance between the even- and
# odd-orderkey halves of o_totalprice, both computed EXACTLY on the
# integer cents grid from one two-sided value-count pass (the same
# grid-bounded combiner the drift suite uses — the support is
# price-grid-sized, never row-sized).
# ---------------------------------------------------------------------------

def js_wasserstein_orders(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def vc_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        k = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        u = np.rint(batch.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame({"cents": u, "side": (k % 2 == 0)})
        g = (df.groupby(["cents", "side"], as_index=False)
             .size().rename(columns={"size": "n"}))
        return pa.table({
            "cents": pa.array(g["cents"].to_numpy(), type=pa.int64()),
            "ca": pa.array(np.where(g["side"], g["n"], 0)
                           .astype(np.int64)),
            "cb": pa.array(np.where(g["side"], 0, g["n"])
                           .astype(np.int64))})

    vc = sorted(collect_pylist(
        ds.map_batches(vc_partial, batch_format="pyarrow")
        .groupby("cents").aggregate(Sum("ca", alias_name="ca"),
                                    Sum("cb", alias_name="cb"))),
        key=lambda r: r["cents"])
    v = np.array([r["cents"] for r in vc], dtype=np.int64)
    ca = np.array([r["ca"] for r in vc], dtype=np.int64)
    cb = np.array([r["cb"] for r in vc], dtype=np.int64)
    na, nb = int(ca.sum()), int(cb.sum())

    fa = np.cumsum(ca) / na
    fb = np.cumsum(cb) / nb
    w1 = float(np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(v)) / 100.0)

    pa_ = ca / na
    pb_ = cb / nb
    m = (pa_ + pb_) / 2
    js = float(0.5 * np.sum(np.where(pa_ > 0,
                                     pa_ * np.log(np.where(pa_ > 0, pa_, 1)
                                                  / m), 0.0))
               + 0.5 * np.sum(np.where(pb_ > 0,
                                       pb_ * np.log(np.where(pb_ > 0, pb_, 1)
                                                    / m), 0.0)))
    return pa.Table.from_pylist([{
        "n_a": na, "n_b": nb, "w1": _round6(w1), "js": _round6(js)}])


JS_WASSERSTEIN_SQL = """
WITH ca AS MATERIALIZED (
  SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v, count(*) AS c
  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY v
), cb AS MATERIALIZED (
  SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v, count(*) AS c
  FROM orders WHERE o_orderkey % 2 <> 0 GROUP BY v
), grid AS MATERIALIZED (
  SELECT v FROM ca UNION SELECT v FROM cb
), j AS MATERIALIZED (
  SELECT g.v, coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
  FROM grid g LEFT JOIN ca USING (v) LEFT JOIN cb USING (v)
), tot AS MATERIALIZED (
  SELECT CAST(sum(ca) AS DOUBLE) AS na, CAST(sum(cb) AS DOUBLE) AS nb
  FROM j
), w AS MATERIALIZED (
  SELECT v, sum(ca) OVER (ORDER BY v) / tot.na AS fa,
         sum(cb) OVER (ORDER BY v) / tot.nb AS fb,
         lead(v) OVER (ORDER BY v) AS nv,
         ca / tot.na AS pa, cb / tot.nb AS pb
  FROM j, tot
)
SELECT
  CAST((SELECT sum(c) FROM ca) AS BIGINT) AS n_a,
  CAST((SELECT sum(c) FROM cb) AS BIGINT) AS n_b,
  round((SELECT sum(abs(fa - fb) * (nv - v)) FROM w WHERE nv IS NOT NULL)
        / 100.0, 6) AS w1,
  round((SELECT sum(CASE WHEN pa > 0
                         THEN 0.5 * pa * ln(pa / ((pa + pb)/2)) ELSE 0 END
                  + CASE WHEN pb > 0
                         THEN 0.5 * pb * ln(pb / ((pa + pb)/2)) ELSE 0 END)
         FROM w), 6) AS js
"""


# ---------------------------------------------------------------------------
# Ridge regularization path (mlops.ridge_path): one sufficient-stats
# pass, per-λ driver solves. The SQL oracle re-derives each λ's
# coefficients with the all-diagonal-penalized Cramer determinants
# (the engine's G + λI convention) and measures R² against the
# UNpenalized stats, exactly as the engine does.
# ---------------------------------------------------------------------------

def ridge_path_orders(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import ridge_path

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                  "o_totalprice", "o_custkey"])

    def derive(batch: pa.Table) -> pa.Table:
        days = (batch.column("o_orderdate").cast(pa.int64())
                .to_numpy(zero_copy_only=False) // 86_400_000_000)
        return pa.table({
            "x1": pa.array(days.astype(np.float64), type=pa.float64()),
            "x2": pc.cast(batch.column("o_custkey"), pa.float64()),
            "y": pc.cast(batch.column("o_totalprice"), pa.float64()),
        })

    rows = ridge_path(ds.map_batches(derive, batch_format="pyarrow"),
                      ["x1", "x2"], "y", lambdas=[0.0, 1e9, 1e12])
    return pa.Table.from_pylist([{
        "lam": r["lam"], "n": r["n"],
        "intercept": _round6(r["intercept"]),
        "coef_days": _round6(r["coef"][0]),
        "coef_cust": _round6(r["coef"][1]),
        "r2": _round6(r["r2"]),
    } for r in rows])


RIDGE_PATH_SQL = """
WITH p AS MATERIALIZED (
  SELECT CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE) AS x1,
         CAST(o_custkey AS DOUBLE) AS x2,
         CAST(o_totalprice AS DOUBLE) AS y
  FROM orders
), s AS MATERIALIZED (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x1) AS s1, sum(x2) AS s2,
         sum(y) AS sy, sum(x1*x1) AS s11, sum(x1*x2) AS s12,
         sum(x2*x2) AS s22, sum(x1*y) AS s1y, sum(x2*y) AS s2y,
         sum(y*y) AS syy
  FROM p
), lam(l) AS (VALUES (0.0), (1e9), (1e12)),
d AS MATERIALIZED (
  SELECT s.*, lam.l,
         (n+l)*((s11+l)*(s22+l) - s12*s12) - s1*(s1*(s22+l) - s12*s2)
           + s2*(s1*s12 - (s11+l)*s2) AS det,
         sy*((s11+l)*(s22+l) - s12*s12) - s1*(s1y*(s22+l) - s12*s2y)
           + s2*(s1y*s12 - (s11+l)*s2y) AS det0,
         (n+l)*(s1y*(s22+l) - s2y*s12) - sy*(s1*(s22+l) - s12*s2)
           + s2*(s1*s2y - s1y*s2) AS det1,
         (n+l)*((s11+l)*s2y - s12*s1y) - s1*(s1*s2y - s2*s1y)
           + sy*(s1*s12 - (s11+l)*s2) AS det2
  FROM s, lam
)
SELECT l AS lam, CAST(n AS BIGINT) AS n,
       round(det0/det, 6) AS intercept,
       round(det1/det, 6) AS coef_days,
       round(det2/det, 6) AS coef_cust,
       round(1 - (syy - 2*(det0/det*sy + det1/det*s1y + det2/det*s2y)
                  + (det0/det)*(det0/det)*n + 2*(det0/det)*(det1/det)*s1
                  + 2*(det0/det)*(det2/det)*s2 + (det1/det)*(det1/det)*s11
                  + 2*(det1/det)*(det2/det)*s12 + (det2/det)*(det2/det)*s22)
                 / (syy - sy*sy/n), 6) AS r2
FROM d ORDER BY lam
"""


# ---------------------------------------------------------------------------
# Source-overlap matrix (webtext.source_overlap): pairwise distinct-
# trigram Jaccard between sources.
# ---------------------------------------------------------------------------

def source_overlap_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import source_overlap

    ds = _read(sf_dir, "documents", ["text", "source"])
    return source_overlap(ds, n=3)


SOURCE_OVERLAP_SQL = r"""
WITH docs AS MATERIALIZED (
  SELECT source, regexp_extract_all(text, '\S+') AS ws FROM documents
), idx AS MATERIALIZED (
  SELECT source, ws, unnest(generate_series(1, len(ws) - 2)) AS i
  FROM docs WHERE len(ws) >= 3
), tg AS MATERIALIZED (
  SELECT DISTINCT source, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
  FROM idx
), pr AS MATERIALIZED (
  SELECT a.source AS sa, b.source AS sb, count(*) AS inter
  FROM tg a JOIN tg b ON a.g = b.g AND a.source < b.source
  GROUP BY sa, sb
), per AS MATERIALIZED (
  SELECT source, count(*) AS n FROM tg GROUP BY source
)
SELECT p.sa, p.sb,
       CAST(pa.n AS BIGINT) AS n_a, CAST(pb.n AS BIGINT) AS n_b,
       CAST(p.inter AS BIGINT) AS inter,
       round(CAST(p.inter AS DOUBLE) / (pa.n + pb.n - p.inter), 6)
         AS jaccard
FROM pr p JOIN per pa ON pa.source = p.sa JOIN per pb ON pb.source = p.sb
ORDER BY p.sa, p.sb
"""


# ---------------------------------------------------------------------------
# Funnel analysis (view → click → purchase): per user, the first
# 'view', the first 'click' STRICTLY AFTER it, and the first
# 'purchase' strictly after that — the standard ordered-step
# conversion funnel. Scale shape: events are pruned to the three step
# types at the read, then ONE coarse hash(user)%P shuffle
# (stages/shuffle.py with_coarse_partition — never one map_groups
# call per user); each partition resolves every user's funnel with
# three vectorized groupby-min/merge rounds and emits ONE row of step
# counts, so the driver sums P rows regardless of user count.
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ["view", "click", "purchase"]


def funnel_events(sf_dir: str) -> pa.Table:
    from tanml_ray.stages.shuffle import with_coarse_partition

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def prune(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("event_type"),
                                     value_set=pa.array(_FUNNEL_STEPS)))

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        et = g["event_type"]
        v = (g[et == "view"].groupby("user_id", as_index=False)
             .agg(t1=("ts", "min")))
        c = g[et == "click"].merge(v, on="user_id")
        c = (c[c["ts"] > c["t1"]].groupby("user_id", as_index=False)
             .agg(t2=("ts", "min")))
        p = g[et == "purchase"].merge(c, on="user_id")
        n3 = p.loc[p["ts"] > p["t2"], "user_id"].nunique()
        return pd.DataFrame({"n1": [len(v)], "n2": [len(c)],
                             "n3": [int(n3)]})

    parts = (with_coarse_partition(
        ds.map_batches(prune, batch_format="pyarrow"), "user_id")
        .groupby("__upart").map_groups(per_partition, batch_format="pandas"))
    tot = [0, 0, 0]
    for r in collect_pylist(parts):
        tot[0] += int(r["n1"])
        tot[1] += int(r["n2"])
        tot[2] += int(r["n3"])
    return pa.Table.from_pylist([
        {"step": f"{i+1}_{s}", "users": tot[i]}
        for i, s in enumerate(_FUNNEL_STEPS)])


FUNNEL_SQL = """
WITH v AS MATERIALIZED (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
), p AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
)
SELECT '1_view' AS step, count(*) AS users FROM v
UNION ALL SELECT '2_click', count(*) FROM c
UNION ALL SELECT '3_purchase', count(*) FROM p
ORDER BY step
"""


# ---------------------------------------------------------------------------
# CUSUM change-point detection over the daily mean of events.value —
# the drift-monitoring complement to PSI/KS: where in TIME the metric
# shifted. Daily integer-cents partials (day-bounded, never
# row-bounded) meet in one tiny groupby; the driver walks the ~150-day
# series computing CUSUM_k = Σ_{d<=k} (daily_mean_d − μ) and reports
# the |CUSUM| peak (the classic change-point estimate).
# ---------------------------------------------------------------------------

def cusum_changepoint_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        day = pc.cast(batch.column("ts"), pa.date32())
        u = np.rint(batch.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame({"day": day.to_pylist(), "s": u, "c": 1})
        g = df.groupby("day", as_index=False).sum()
        return from_pandas_clean(g, preserve_index=False)

    rows = sorted(collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day").aggregate(Sum("s", alias_name="s"),
                                  Sum("c", alias_name="c"))),
        key=lambda r: r["day"])
    tot_s = sum(int(r["s"]) for r in rows)
    tot_c = sum(int(r["c"]) for r in rows)
    mu = float(tot_s) / tot_c
    best = None
    cusum = 0.0
    for r in rows:
        cusum += float(r["s"]) / r["c"] - mu
        key = (abs(cusum), r["day"])
        if best is None or key[0] > best[0][0]:
            best = (key, cusum)
    (absc, day), _ = best
    return pa.Table.from_pylist([{
        "changepoint_day": pd.Timestamp(day),
        "max_abs_cusum": _round6(absc / 100.0),
        "n_days": len(rows)}])


CUSUM_SQL = """
WITH d AS MATERIALIZED (
  SELECT date_trunc('day', ts) AS day,
         sum(CAST(round(value*100) AS BIGINT)) AS s, count(*) AS c
  FROM events GROUP BY day
), t AS MATERIALIZED (
  SELECT CAST(sum(s) AS DOUBLE) / sum(c) AS mu FROM d
), cs AS MATERIALIZED (
  SELECT day,
         sum(CAST(s AS DOUBLE)/c - t.mu) OVER (ORDER BY day) AS cusum
  FROM d, t
)
SELECT day AS changepoint_day,
       round(abs(cusum) / 100.0, 6) AS max_abs_cusum,
       (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days
FROM cs ORDER BY abs(cusum) DESC, day LIMIT 1
"""


# ---------------------------------------------------------------------------
# Benford first-digit profile of o_totalprice (integer cents) — the
# classic generated-data / fraud anomaly check: observed first-digit
# frequency vs the Benford expectation log10(1 + 1/d). Digit counts
# are a 9-cell combiner; everything else is driver math.
# ---------------------------------------------------------------------------

def benford_totalprice(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        u = np.rint(batch.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        first = np.array([int(str(v)[0]) for v in u], dtype=np.int64)
        vals, cnts = np.unique(first, return_counts=True)
        return pa.table({"digit": pa.array(vals, type=pa.int64()),
                         "n": pa.array(cnts, type=pa.int64())})

    agg = {int(r["digit"]): int(r["n"]) for r in collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("digit").aggregate(Sum("n", alias_name="n")))}
    total = sum(agg.values())
    return pa.Table.from_pylist([{
        "digit": d, "n": agg.get(d, 0),
        "obs_freq": _round6(agg.get(d, 0) / total),
        "exp_freq": _round6(np.log10(1 + 1 / d))}
        for d in range(1, 10)])


BENFORD_SQL = """
WITH digits AS MATERIALIZED (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice*100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
), obs AS MATERIALIZED (
  SELECT digit, count(*) AS n FROM digits GROUP BY digit
), tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM obs),
d9(digit) AS (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9))
SELECT d9.digit, CAST(coalesce(o.n, 0) AS BIGINT) AS n,
       round(coalesce(o.n, 0) / tot.t, 6) AS obs_freq,
       round(log10(1 + 1.0/d9.digit), 6) AS exp_freq
FROM d9 LEFT JOIN obs o ON o.digit = d9.digit, tot
ORDER BY d9.digit
"""


# ---------------------------------------------------------------------------
# Bigram PMI collocations: pointwise mutual information of adjacent
# word pairs, ln((c12/N) / ((c1/T)(c2/T))) with T = token count and
# N = bigram count, min_count 5, top 20 by (rounded PMI desc, pair) —
# the standard collocation extractor. Two combiner-first count
# shuffles (unigram + bigram); selection math on the driver.
# ---------------------------------------------------------------------------

def pmi_bigrams_documents(sf_dir: str) -> pa.Table:
    from collections import Counter

    from ray.data.aggregate import Sum

    from tanml_ray.pipelines.webtext import _WS_TOKEN_RE

    ds = _read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        uni: Counter = Counter()
        bi: Counter = Counter()
        for t in batch.column("text").to_pylist():
            ws = _WS_TOKEN_RE.findall(t) if t else []
            uni.update(ws)
            bi.update(zip(ws, ws[1:]))
        rows = [{"w1": w, "w2": "", "c": c, "kind": 0}
                for w, c in uni.items()]
        rows += [{"w1": a, "w2": b, "c": c, "kind": 1}
                 for (a, b), c in bi.items()]
        return pa.Table.from_pylist(rows)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["w1", "w2", "kind"])
           .aggregate(Sum("c", alias_name="c")))
    uni: dict[str, int] = {}
    bi: dict[tuple, int] = {}
    for r in collect_pylist(agg):
        if r["kind"] == 0:
            uni[r["w1"]] = int(r["c"])
        else:
            bi[(r["w1"], r["w2"])] = int(r["c"])
    T = sum(uni.values())
    N = sum(bi.values())
    cand = []
    for (a, b), c12 in bi.items():
        if c12 < 5:
            continue
        pmi = float(np.log((c12 / N) / ((uni[a] / T) * (uni[b] / T))))
        cand.append({"w1": a, "w2": b, "c12": c12,
                     "pmi": _round6(pmi)})
    cand.sort(key=lambda r: (-r["pmi"], r["w1"], r["w2"]))
    return pa.Table.from_pylist(cand[:20])


PMI_BIGRAMS_SQL = r"""
WITH toks AS MATERIALIZED (
  SELECT regexp_extract_all(text, '\S+') AS ws FROM documents
), uni AS MATERIALIZED (
  SELECT unnest(ws) AS w FROM toks
), cu AS MATERIALIZED (
  SELECT w, count(*) AS c FROM uni GROUP BY w
), bi AS MATERIALIZED (
  SELECT ws[i] AS w1, ws[i+1] AS w2
  FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
        FROM toks WHERE len(ws) >= 2)
), cb AS MATERIALIZED (
  SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2
), tot AS MATERIALIZED (
  SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM cu) AS t,
         (SELECT CAST(sum(c12) AS DOUBLE) FROM cb) AS n
)
SELECT cb.w1, cb.w2, CAST(cb.c12 AS BIGINT) AS c12,
       round(ln((cb.c12 / tot.n)
                / ((u1.c / tot.t) * (u2.c / tot.t))), 6) AS pmi
FROM cb JOIN cu u1 ON u1.w = cb.w1 JOIN cu u2 ON u2.w = cb.w2, tot
WHERE cb.c12 >= 5
ORDER BY pmi DESC, cb.w1, cb.w2 LIMIT 20
"""


# ---------------------------------------------------------------------------
# ROLLUP aggregate: GROUP BY ROLLUP(status, priority) — leaf groups,
# per-status subtotals, grand total. ONE combiner-first distributed
# pass computes the leaf aggregate (the only level whose cardinality
# scales with data); the subtotal levels are pure driver arithmetic
# over the bounded leaf table (|statuses| × |priorities| rows), the
# same containment argument OLAP engines use for rollup pushdown.
# ---------------------------------------------------------------------------

def rollup_orders(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority",
                                  "o_totalprice"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame({"s": batch.column("o_orderstatus").to_pylist(),
                           "p": batch.column("o_orderpriority").to_pylist(),
                           "cents": cents})
        g = df.groupby(["s", "p"], as_index=False).agg(
            n=("cents", "size"), cents=("cents", "sum"))
        return g

    leaves = collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["s", "p"])
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents")))

    def row(s, p, n, cents):
        return {"o_orderstatus": s, "o_orderpriority": p, "n": int(n),
                "sum_totalprice": round(int(cents) / 100.0, 2)}

    out = [row(r["s"], r["p"], r["n"], r["cents"]) for r in leaves]
    by_s: dict = {}
    for r in leaves:
        a = by_s.setdefault(r["s"], [0, 0])
        a[0] += int(r["n"])
        a[1] += int(r["cents"])
    out += [row(s, None, n, c) for s, (n, c) in by_s.items()]
    out.append(row(None, None, sum(a[0] for a in by_s.values()),
                   sum(a[1] for a in by_s.values())))
    out.sort(key=lambda r: (r["o_orderstatus"] is None, r["o_orderstatus"] or "",
                            r["o_orderpriority"] is None,
                            r["o_orderpriority"] or ""))
    return pa.Table.from_pylist(out)


ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       round(sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0, 2)
         AS sum_totalprice
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
"""


# ---------------------------------------------------------------------------
# Day-over-day delta: daily event counts + LAG + percent change — the
# standard dashboard time series. The distributed pass ships only
# per-(block, day) count partials; the LAG walk runs on the driver
# over the day-bounded series (150 rows at any corpus size: bounded
# by calendar days, not row count).
# ---------------------------------------------------------------------------

def dod_change_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        df = pd.DataFrame({"day": day.to_numpy(zero_copy_only=False)})
        g = df.groupby("day", as_index=False).agg(n=("day", "size"))
        return g

    rows = sorted(collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day").aggregate(Sum("n", alias_name="n"))),
        key=lambda r: r["day"])
    out = []
    prev = None
    for r in rows:
        n = int(r["n"])
        out.append({"day": pd.Timestamp(r["day"]), "n": n,
                    "prev_n": prev,
                    "pct_change": _round6((n - prev) / prev)
                    if prev is not None else None})
        prev = n
    return pa.Table.from_pylist(out)


DOD_CHANGE_SQL = """
WITH d AS MATERIALIZED (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1)
SELECT day, n, lag(n) OVER (ORDER BY day) AS prev_n,
       round((n - lag(n) OVER (ORDER BY day))
             / CAST(lag(n) OVER (ORDER BY day) AS DOUBLE), 6) AS pct_change
FROM d ORDER BY day
"""


# ---------------------------------------------------------------------------
# Top-k per group: top-3 customers by total spend per market segment —
# the canonical ROW_NUMBER() <= k window query, distributed as
# (1) combiner-first spend aggregation keyed by customer (the only
# data-scaled shuffle, ships (custkey, cents) ints), (2) broadcast
# custkey→segment lookup (ray.put once, read per task — the J3
# small-side pattern; a partitioned join replaces it when the
# customer table itself is web-scale), (3) per-block top-3 partials
# per segment, merged on the driver (3 × blocks bounded rows).
# Deterministic tie order: (spend DESC, custkey ASC), both sides.
# ---------------------------------------------------------------------------

def top3_customers_per_segment(sf_dir: str) -> pa.Table:
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame({"custkey": batch.column("o_custkey")
                           .to_numpy(zero_copy_only=False), "cents": cents})
        return df.groupby("custkey", as_index=False).agg(
            cents=("cents", "sum"))

    spend = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("custkey").aggregate(Sum("cents", alias_name="cents")))

    cust = collect_pylist(_read(sf_dir, "customer",
                                ["c_custkey", "c_mktsegment"]))
    seg_ref = ray.put({r["c_custkey"]: r["c_mktsegment"] for r in cust})

    def top3_partial(batch: pa.Table) -> pa.Table:
        seg_map = ray.get(seg_ref)
        df = batch.to_pandas()
        df["seg"] = df["custkey"].map(seg_map)
        df = df.sort_values(["seg", "cents", "custkey"],
                            ascending=[True, False, True])
        return from_pandas_clean(df.groupby("seg", as_index=False).head(3),
                                    preserve_index=False)

    cand = collect_pylist(spend.map_batches(top3_partial,
                                            batch_format="pyarrow"))
    cand.sort(key=lambda r: (r["seg"], -int(r["cents"]), int(r["custkey"])))
    out = []
    per_seg: dict = {}
    for r in cand:
        k = per_seg.get(r["seg"], 0)
        if k < 3:
            per_seg[r["seg"]] = k + 1
            out.append({"c_mktsegment": r["seg"], "custkey": int(r["custkey"]),
                        "rk": k + 1,
                        "spend": round(int(r["cents"]) / 100.0, 2)})
    out.sort(key=lambda r: (r["c_mktsegment"], r["rk"]))
    return pa.Table.from_pylist(out)


TOP3_PER_SEGMENT_SQL = """
WITH spend AS MATERIALIZED (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice*100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey),
ranked AS MATERIALIZED (
  SELECT c.c_mktsegment, s.o_custkey AS custkey, s.cents,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY s.cents DESC, s.o_custkey) AS rk
  FROM spend s JOIN customer c ON c.c_custkey = s.o_custkey)
SELECT c_mktsegment, CAST(custkey AS BIGINT) AS custkey,
       CAST(rk AS BIGINT) AS rk, round(cents / 100.0, 2) AS spend
FROM ranked WHERE rk <= 3 ORDER BY c_mktsegment, rk
"""


# ---------------------------------------------------------------------------
# Duplicate-cluster size histogram: distribution of exact-duplicate
# cluster sizes across the corpus (how much of the dup mass sits in
# pairs vs mega-clusters — the first diagnostic run before choosing a
# dedup strategy). Two bounded shuffles: (digest, n) partials →
# per-digest count, then (size, 1) → histogram. Text never leaves
# stage 1; the shuffle ships 16-byte digests, the histogram is
# bounded by max cluster size. The synthetic corpus has no natural
# exact dups, so docs with doc_id%5 ∈ {3,4} are OVERWRITTEN with a
# boilerplate string that is a pure function of doc_id//20 (mirrored
# verbatim in the SQL oracle — the PII-query injection pattern),
# planting clusters of up to 8 members so the histogram is exercised.
# ---------------------------------------------------------------------------

def dup_cluster_sizes_documents(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.pipelines.curate import _content_digest

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def dig_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        digs = [_content_digest(f"dup-{i // 20}" if i % 5 >= 3 else (t or ""))
                for i, t in zip(ids, texts)]
        vals, cnts = np.unique(np.array(digs, dtype=object),
                               return_counts=True)
        return pa.table({"dig": pa.array(list(vals), type=pa.binary(16)),
                         "n": pa.array(cnts, type=pa.int64())})

    per_digest = (ds.map_batches(dig_partial, batch_format="pyarrow")
                  .groupby("dig").aggregate(Sum("n", alias_name="n")))

    def size_partial(batch: pa.Table) -> pa.Table:
        sizes, cnts = np.unique(batch.column("n").to_numpy(
            zero_copy_only=False), return_counts=True)
        return pa.table({"cluster_size": pa.array(sizes, type=pa.int64()),
                         "n_clusters": pa.array(cnts, type=pa.int64())})

    hist = collect_pylist(
        per_digest.map_batches(size_partial, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(Sum("n_clusters", alias_name="n_clusters")))
    hist.sort(key=lambda r: r["cluster_size"])
    return pa.Table.from_pylist(
        [{"cluster_size": int(r["cluster_size"]),
          "n_clusters": int(r["n_clusters"])} for r in hist])


DUP_CLUSTER_SIZES_SQL = """
WITH eff AS MATERIALIZED (
  SELECT CASE WHEN doc_id % 5 >= 3
              THEN 'dup-' || CAST(doc_id // 20 AS VARCHAR)
              ELSE text END AS text
  FROM documents),
clusters AS MATERIALIZED (
  SELECT text, CAST(count(*) AS BIGINT) AS sz FROM eff GROUP BY text)
SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM clusters GROUP BY sz ORDER BY sz
"""


# ---------------------------------------------------------------------------
# Higher-moment profile (A4 extension): population skewness (Fisher-
# Pearson g1) and excess kurtosis (g2) per column from EXACT integer
# power sums Σu..Σu⁴ on the fixed-point grid — merged as Python
# bigints on the driver (overflow-free; the SQL twin uses HUGEINT),
# then one shared IEEE derivation both sides. Both statistics are
# scale-invariant, so the grid stats equal the dollar stats with no
# rescaling. One combiner pass; partials are cols × blocks rows.
# ---------------------------------------------------------------------------

def moments_lineitem(sf_dir: str) -> pa.Table:
    cols = [("l_quantity", 1), ("l_extendedprice", 100)]
    ds = _read(sf_dir, "lineitem", [c for c, _ in cols])

    def partial(batch: pa.Table) -> pa.Table:
        rows = []
        for c, scale in cols:
            x = batch.column(c).to_numpy(zero_copy_only=False)
            u = np.rint(x[~np.isnan(x)] * scale).astype(np.int64)
            up = u.astype(object)  # bigint powers, overflow-free
            rows.append({"col": c, "n": len(u), "s1": str(int(up.sum())),
                         "s2": str(int((up * up).sum())),
                         "s3": str(int((up * up * up).sum())),
                         "s4": str(int((up * up * up * up).sum()))})
        return pa.Table.from_pylist(rows)

    acc: dict[str, list] = {c: [0, 0, 0, 0, 0] for c, _ in cols}
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        a = acc[r["col"]]
        a[0] += int(r["n"])
        for i, k in enumerate(("s1", "s2", "s3", "s4")):
            a[i + 1] += int(r[k])
    out = []
    for c, _ in cols:
        n, s1, s2, s3, s4 = acc[c]
        mean = s1 / n
        m2 = s2 / n - mean * mean
        m3 = s3 / n - 3 * mean * (s2 / n) + 2 * mean ** 3
        m4 = (s4 / n - 4 * mean * (s3 / n)
              + 6 * mean * mean * (s2 / n) - 3 * mean ** 4)
        out.append({"col": c, "n": n,
                    "skewness": _round6(m3 / m2 ** 1.5),
                    "ex_kurtosis": _round6(m4 / (m2 * m2) - 3.0)})
    return pa.Table.from_pylist(out)


MOMENTS_SQL = """
WITH s AS MATERIALIZED (
  SELECT 'l_quantity' AS col, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(u AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(sum(CAST(u AS HUGEINT)*u) AS DOUBLE) AS s2,
         CAST(sum(CAST(u AS HUGEINT)*u*u) AS DOUBLE) AS s3,
         CAST(sum(CAST(u AS HUGEINT)*u*u*u) AS DOUBLE) AS s4
  FROM (SELECT CAST(round(l_quantity) AS BIGINT) AS u FROM lineitem)
  UNION ALL
  SELECT 'l_extendedprice', CAST(count(*) AS BIGINT),
         CAST(sum(CAST(u AS HUGEINT)) AS DOUBLE),
         CAST(sum(CAST(u AS HUGEINT)*u) AS DOUBLE),
         CAST(sum(CAST(u AS HUGEINT)*u*u) AS DOUBLE),
         CAST(sum(CAST(u AS HUGEINT)*u*u*u) AS DOUBLE)
  FROM (SELECT CAST(round(l_extendedprice*100) AS BIGINT) AS u FROM lineitem)
), m AS MATERIALIZED (
  SELECT col, n, s1/n AS mean, s2/n - (s1/n)*(s1/n) AS m2,
         s3/n - 3*(s1/n)*(s2/n) + 2*pow(s1/n, 3) AS m3,
         s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
              - 3*pow(s1/n, 4) AS m4
  FROM s)
SELECT col, n, round(m3 / pow(m2, 1.5), 6) AS skewness,
       round(m4 / (m2*m2) - 3.0, 6) AS ex_kurtosis
FROM m ORDER BY col
"""


# ---------------------------------------------------------------------------
# One-way ANOVA: F statistic and eta² of o_totalprice across
# o_orderpriority groups, from one combiner pass of per-group
# (n, Σu, Σu²) integer partials (group count is bounded by the
# category cardinality; the data-scaled work never leaves the
# map_batches). SSB/SSW are derived on the driver with the identical
# IEEE expression the SQL oracle uses; F and eta² are O(1) statistics
# so round6 absorbs summation-order ulp.
# ---------------------------------------------------------------------------

def anova_totalprice_priority(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame({"g": batch.column("o_orderpriority").to_pylist(),
                           "cents": cents})
        out = df.groupby("g", as_index=False).agg(n=("cents", "size"),
                                                  su=("cents", "sum"))
        out["suu"] = df.groupby("g")["cents"].apply(
            lambda v: str(sum(int(x) * int(x) for x in v))).values
        return out

    groups: dict[str, list] = {}
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        a = groups.setdefault(r["g"], [0, 0, 0])
        a[0] += int(r["n"])
        a[1] += int(r["su"])
        a[2] += int(r["suu"])
    k = len(groups)
    n_tot = sum(a[0] for a in groups.values())
    su_tot = sum(a[1] for a in groups.values())
    grand = su_tot / n_tot
    ssb = ssw = 0.0
    for g in sorted(groups):  # fixed order: ulp-deterministic driver sum
        n, su, suu = groups[g]
        mean_g = su / n
        ssb += n * (mean_g - grand) * (mean_g - grand)
        ssw += suu - su * (su / n)
    f = (ssb / (k - 1)) / (ssw / (n_tot - k))
    return pa.Table.from_pylist([{
        "k": k, "n": n_tot, "f_stat": _round6(f),
        "eta_sq": _round6(ssb / (ssb + ssw))}])


ANOVA_SQL = """
WITH g AS MATERIALIZED (
  SELECT o_orderpriority AS grp, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(round(o_totalprice*100) AS BIGINT)) AS su,
         sum(CAST(CAST(round(o_totalprice*100) AS BIGINT) AS HUGEINT)
             * CAST(round(o_totalprice*100) AS BIGINT)) AS suu
  FROM orders GROUP BY 1),
tot AS MATERIALIZED (
  SELECT CAST(sum(n) AS BIGINT) AS n_tot,
         CAST(sum(su) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS grand,
         CAST(count(*) AS BIGINT) AS k FROM g),
parts AS MATERIALIZED (
  SELECT sum(n * (CAST(su AS DOUBLE)/n - grand)
               * (CAST(su AS DOUBLE)/n - grand)
             ORDER BY grp) AS ssb,
         sum(CAST(suu AS DOUBLE) - CAST(su AS DOUBLE)
               * (CAST(su AS DOUBLE)/n) ORDER BY grp) AS ssw
  FROM g, tot GROUP BY ALL)
SELECT tot.k, tot.n_tot AS n,
       round((parts.ssb/(tot.k-1)) / (parts.ssw/(tot.n_tot-tot.k)), 6)
         AS f_stat,
       round(parts.ssb / (parts.ssb + parts.ssw), 6) AS eta_sq
FROM parts, tot
"""


# ---------------------------------------------------------------------------
# Median absolute deviation of l_extendedprice — the robust spread
# statistic, exact quantile_cont parity in TWO value-count passes on
# integer grids: pass 1 the cents grid for the median, pass 2 the
# HALF-cent grid |2u − 2·median| (quantile_cont medians land on
# half-integers, so doubling keeps every deviation integral — no
# float grid, no epsilon). Both shuffles are grid-bounded, not
# row-bounded. mad_normalized applies the 1.4826 Gaussian
# consistency factor.
# ---------------------------------------------------------------------------

def mad_extendedprice(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.stages.quantiles import quantile_cont_from_counts

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def vc(expr):
        def f(batch: pa.Table) -> pa.Table:
            u = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100
                        ).astype(np.int64)
            vals, cnts = np.unique(expr(u), return_counts=True)
            return pa.table({"v": pa.array(vals, type=pa.int64()),
                             "n": pa.array(cnts, type=pa.int64())})
        return f

    def median_of(ds_vc):
        rows = sorted(collect_pylist(
            ds_vc.groupby("v").aggregate(Sum("n", alias_name="n"))),
            key=lambda r: r["v"])
        vals = np.array([r["v"] for r in rows], dtype=np.float64)
        cum = np.cumsum([r["n"] for r in rows])
        return quantile_cont_from_counts(vals, cum, 0.5)

    med_cents = median_of(ds.map_batches(vc(lambda u: u),
                                         batch_format="pyarrow"))
    m2 = int(round(2 * med_cents))  # exact: median is k or k+.5 cents
    dev_half = median_of(ds.map_batches(
        vc(lambda u: np.abs(2 * u - m2)), batch_format="pyarrow"))
    mad = dev_half / 2.0 / 100.0
    return pa.Table.from_pylist([{
        "median": _round6(med_cents / 100.0), "mad": _round6(mad),
        "mad_normalized": _round6(mad * 1.4826)}])


MAD_SQL = """
WITH u AS MATERIALIZED (
  SELECT CAST(round(l_extendedprice*100) AS BIGINT) AS u FROM lineitem),
med AS MATERIALIZED (
  SELECT CAST(round(2 * quantile_cont(u, 0.5)) AS BIGINT) AS m2 FROM u),
dev AS MATERIALIZED (
  SELECT quantile_cont(abs(2*u.u - med.m2), 0.5) / 2.0 / 100.0 AS mad
  FROM u, med)
SELECT round((SELECT quantile_cont(u, 0.5) FROM u) / 100.0, 6) AS median,
       round(dev.mad, 6) AS mad,
       round(dev.mad * 1.4826, 6) AS mad_normalized
FROM dev
"""


# ---------------------------------------------------------------------------
# Vocabulary coverage curve: fraction of all corpus tokens covered by
# the top-k most frequent types, k ∈ {10, 100, 1000} — the standard
# tokenizer/vocab-sizing diagnostic. Combiner-first unigram counts,
# then a DISTRIBUTED sort + limit pulls only the top-1000 rows to the
# driver (the vocab table itself never materializes centrally); the
# total token count comes from a scalar Sum aggregate. Tie order at
# the k boundary is (count DESC, token ASC) on both sides.
# ---------------------------------------------------------------------------

def vocab_coverage_documents(sf_dir: str) -> pa.Table:
    from collections import Counter

    from ray.data.aggregate import Sum

    from tanml_ray.pipelines.webtext import _WS_TOKEN_RE

    ds = _read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            if t:
                c.update(_WS_TOKEN_RE.findall(t))
        return pa.table({"w": pa.array(list(c.keys()), type=pa.string()),
                         "c": pa.array(list(c.values()), type=pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("w").aggregate(Sum("c", alias_name="c")))
    total = counts.aggregate(Sum("c", alias_name="t"))["t"]
    top = collect_pylist(counts.sort(["c", "w"], descending=[True, False])
                         .limit(1000))
    out = []
    for k in (10, 100, 1000):
        covered = sum(int(r["c"]) for r in top[:k])
        out.append({"k": k, "covered_tokens": covered,
                    "coverage": _round6(covered / total)})
    return pa.Table.from_pylist(out)


VOCAB_COVERAGE_SQL = r"""
WITH cu AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS w FROM documents)
  GROUP BY w),
r AS MATERIALIZED (
  SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk FROM cu),
t AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM cu)
SELECT k, (SELECT CAST(sum(c) AS BIGINT) FROM r WHERE rk <= k)
         AS covered_tokens,
       round((SELECT sum(c) FROM r WHERE rk <= k) / t.t, 6) AS coverage
FROM (VALUES (10), (100), (1000)) v(k), t ORDER BY k
"""


# ---------------------------------------------------------------------------
# Zipf slope: OLS fit of ln(count) on ln(rank) over the top-100 token
# types — the classic corpus-law diagnostic (natural text ≈ −1; a
# flatter slope flags template/boilerplate corpora). Rides the same
# distributed count + sort-limit path as vocab coverage; the
# regression over the fixed 100 points is driver math using the
# regr_slope/regr_intercept population formula.
# ---------------------------------------------------------------------------

def zipf_slope_documents(sf_dir: str) -> pa.Table:
    from collections import Counter

    from ray.data.aggregate import Sum

    from tanml_ray.pipelines.webtext import _WS_TOKEN_RE

    ds = _read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            if t:
                c.update(_WS_TOKEN_RE.findall(t))
        return pa.table({"w": pa.array(list(c.keys()), type=pa.string()),
                         "c": pa.array(list(c.values()), type=pa.int64())})

    top = collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("w").aggregate(Sum("c", alias_name="c"))
        .sort(["c", "w"], descending=[True, False]).limit(100))
    y = np.log(np.array([int(r["c"]) for r in top], dtype=np.float64))
    x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    mx, my = x.mean(), y.mean()
    slope = ((x * y).mean() - mx * my) / ((x * x).mean() - mx * mx)
    return pa.Table.from_pylist([{
        "n_terms": len(top), "slope": _round6(slope),
        "intercept": _round6(my - slope * mx)}])


ZIPF_SQL = r"""
WITH cu AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS w FROM documents)
  GROUP BY w),
top AS MATERIALIZED (
  SELECT ln(c) AS y,
         ln(CAST(row_number() OVER (ORDER BY c DESC, w) AS DOUBLE)) AS x
  FROM cu ORDER BY c DESC, w LIMIT 100)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       round((avg(x*y) - avg(x)*avg(y))
             / (avg(x*x) - avg(x)*avg(x)), 6) AS slope,
       round(avg(y) - (avg(x*y) - avg(x)*avg(y))
             / (avg(x*x) - avg(x)*avg(x)) * avg(x), 6) AS intercept
FROM top
"""


# ---------------------------------------------------------------------------
# NTILE(10) equi-depth deciles of o_totalprice with per-decile count
# and mean — computed WITHOUT a global sort: the cents-grid value
# counts determine every row's rank interval analytically (rows of
# one price occupy a contiguous rank run, so their split across
# decile boundaries — and hence each decile's count and price sum —
# is fully determined by the counts alone; the ORDER BY tie-break
# key never changes the aggregate). One grid-bounded shuffle, then a
# driver walk over the merged grid.
# ---------------------------------------------------------------------------

def ntile_deciles_orders(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def vc(batch: pa.Table) -> pa.Table:
        u = np.rint(batch.column("o_totalprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        vals, cnts = np.unique(u, return_counts=True)
        return pa.table({"v": pa.array(vals, type=pa.int64()),
                         "n": pa.array(cnts, type=pa.int64())})

    rows = sorted(collect_pylist(
        ds.map_batches(vc, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("n", alias_name="n"))),
        key=lambda r: r["v"])
    n_tot = sum(int(r["n"]) for r in rows)
    q, rem = divmod(n_tot, 10)
    # 1-based rank bounds per tile: first `rem` tiles hold q+1 rows
    bounds = []
    lo = 0
    for t in range(10):
        size = q + 1 if t < rem else q
        bounds.append((lo + 1, lo + size))
        lo += size
    agg = [[0, 0] for _ in range(10)]  # n, cents
    pos = 0
    for r in rows:
        v, c = int(r["v"]), int(r["n"])
        r_lo, r_hi = pos + 1, pos + c
        for t, (b_lo, b_hi) in enumerate(bounds):
            take = min(r_hi, b_hi) - max(r_lo, b_lo) + 1
            if take > 0:
                agg[t][0] += take
                agg[t][1] += take * v
        pos += c
    return pa.Table.from_pylist([
        {"tile": t + 1, "n": agg[t][0],
         "mean_price": _round6(float(agg[t][1]) / agg[t][0] / 100.0)}
        for t in range(10)])


NTILE_SQL = """
WITH u AS MATERIALIZED (
  SELECT CAST(round(o_totalprice*100) AS BIGINT) AS u, o_orderkey
  FROM orders),
t AS (SELECT u, ntile(10) OVER (ORDER BY u, o_orderkey) AS tile FROM u)
SELECT CAST(tile AS BIGINT) AS tile, CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(u) AS DOUBLE) / count(*) / 100.0, 6) AS mean_price
FROM t GROUP BY tile ORDER BY tile
"""


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences: counts and
# row-normalized probabilities of consecutive (event_type →
# next_event_type) steps, ordering each user's stream by (ts,
# event_id). ONE coarse hash(user)%P shuffle (the sessionize pattern —
# not one map_groups call per user) with a vectorized in-partition
# (user, ts, event_id) sort + user-boundary mask, then a
# category²-bounded count aggregate; probabilities are driver math
# over that bounded table.
# ---------------------------------------------------------------------------

def event_transitions_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum
    from tanml_ray.stages.shuffle import with_coarse_partition

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def pairs_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"],
                              kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        frm, to = et[:-1][same], et[1:][same]
        if frm.size == 0:
            # explicit dtypes: an untyped empty frame would promote the
            # downstream concat/aggregate schema to float64
            return pd.DataFrame({"from_type": pd.Series(dtype=object),
                                 "to_type": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        out = (pd.DataFrame({"from_type": frm, "to_type": to})
               .groupby(["from_type", "to_type"], as_index=False)
               .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        return out

    counts = collect_pylist(
        with_coarse_partition(ds, "user_id")
        .groupby("__upart").map_groups(pairs_part, batch_format="pandas")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n")))
    tot_from: dict[str, int] = {}
    for r in counts:
        tot_from[r["from_type"]] = tot_from.get(r["from_type"], 0) + int(r["n"])
    counts.sort(key=lambda r: (r["from_type"], r["to_type"]))
    return pa.Table.from_pylist([
        {"from_type": r["from_type"], "to_type": r["to_type"],
         "n": int(r["n"]),
         "prob": _round6(int(r["n"]) / float(tot_from[r["from_type"]]))}
        for r in counts])


EVENT_TRANSITIONS_SQL = """
WITH s AS MATERIALIZED (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT event_type AS from_type, nxt AS to_type,
       CAST(count(*) AS BIGINT) AS n,
       round(count(*) / CAST(sum(count(*))
             OVER (PARTITION BY event_type) AS DOUBLE), 6) AS prob
FROM s WHERE nxt IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Per-document type-token ratio (lexical diversity): token count,
# distinct-type count and TTR per doc — a purely shuffle-free
# map_batches (each doc's types are counted inside its own batch;
# nothing leaves the task but the three numbers per row). Zero-token
# docs are excluded to mirror SQL's empty-unnest semantics.
# ---------------------------------------------------------------------------

def ttr_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import _WS_TOKEN_RE

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def per_doc(batch: pa.Table) -> pa.Table:
        rows = []
        for i, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            ws = _WS_TOKEN_RE.findall(t) if t else []
            if not ws:
                continue
            rows.append({"doc_id": i, "n_tokens": len(ws),
                         "n_types": len(set(ws)),
                         "ttr": _round6(len(set(ws)) / float(len(ws)))})
        return pa.Table.from_pylist(rows)

    rows = sorted(collect_pylist(
        ds.map_batches(per_doc, batch_format="pyarrow")),
        key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows)


TTR_SQL = r"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
  FROM documents)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT w) AS BIGINT) AS n_types,
       round(count(DISTINCT w) / CAST(count(*) AS DOUBLE), 6) AS ttr
FROM toks GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Cohen's kappa agreement between two document-quality labelers —
# the Gopher rule-based pass flag vs a simple length heuristic
# (n_chars ≥ 500). The statistic comes from the 2×2 confusion counts,
# which a single combiner pass accumulates (4 cells per block); po,
# pe and kappa are one shared IEEE expression. The standard
# inter-rater metric for comparing quality classifiers before
# swapping one into a curation chain.
# ---------------------------------------------------------------------------

def kappa_quality_documents(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.pipelines.webtext import gopher_signals_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def cells(batch: pa.Table) -> pa.Table:
        sig = gopher_signals_batch(batch)
        a = sig.column("gopher_pass").to_numpy(zero_copy_only=False)
        b = (batch.column("n_chars").to_numpy(zero_copy_only=False)
             >= 500).astype(np.int64)
        cell = a * 2 + b
        vals, cnts = np.unique(cell, return_counts=True)
        return pa.table({"cell": pa.array(vals, type=pa.int64()),
                         "n": pa.array(cnts, type=pa.int64())})

    agg = {int(r["cell"]): int(r["n"]) for r in collect_pylist(
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("cell").aggregate(Sum("n", alias_name="n")))}
    n00, n01, n10, n11 = (agg.get(i, 0) for i in range(4))
    n = n00 + n01 + n10 + n11
    po = (n00 + n11) / n
    pe = (((n10 + n11) / n) * ((n01 + n11) / n)
          + ((n00 + n01) / n) * ((n00 + n10) / n))
    return pa.Table.from_pylist([{
        "n00": n00, "n01": n01, "n10": n10, "n11": n11,
        "po": _round6(po), "pe": _round6(pe),
        "kappa": _round6((po - pe) / (1 - pe))}])


KAPPA_SQL = """
WITH sig AS MATERIALIZED (
  SELECT CASE WHEN len(regexp_extract_all(text, '\\S+'))
                   BETWEEN 50 AND 100000
              AND len(regexp_extract_all(text, '\\S'))
                  / CAST(greatest(len(regexp_extract_all(text, '\\S+')), 1)
                         AS DOUBLE) BETWEEN 3.0 AND 10.0
              AND len(regexp_extract_all(text, '\\S*[A-Za-z]\\S*'))
                  / CAST(greatest(len(regexp_extract_all(text, '\\S+')), 1)
                         AS DOUBLE) > 0.80
              AND len(regexp_extract_all(
                    text, '\\b(the|and|of|to|in|is|that|for|was|on)\\b')) >= 2
            THEN 1 ELSE 0 END AS a,
         CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS b
  FROM documents),
c AS MATERIALIZED (
  SELECT CAST(sum(CASE WHEN a=0 AND b=0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
         CAST(sum(CASE WHEN a=0 AND b=1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         CAST(sum(CASE WHEN a=1 AND b=0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         CAST(sum(CASE WHEN a=1 AND b=1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         CAST(count(*) AS DOUBLE) AS n
  FROM sig),
p AS MATERIALIZED (
  SELECT n00, n01, n10, n11,
         (n00 + n11) / n AS po,
         ((n10 + n11) / n) * ((n01 + n11) / n)
           + ((n00 + n01) / n) * ((n00 + n10) / n) AS pe
  FROM c)
SELECT n00, n01, n10, n11, round(po, 6) AS po, round(pe, 6) AS pe,
       round((po - pe) / (1 - pe), 6) AS kappa
FROM p
"""


# ---------------------------------------------------------------------------
# CCNet-style corpus-wide line dedup (webtext.line_dedup). The
# synthetic corpus has no newlines, so the query first re-wraps each
# document into 12-word lines — a pure deterministic function of the
# text, mirrored verbatim by the oracle's string_agg construction —
# then removes every non-first occurrence of each distinct line
# corpus-wide and rebuilds the documents. Same winner-election
# machinery as span_dedup; different unit (lines), different joiner.
# ---------------------------------------------------------------------------

def line_dedup_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import _doc_spans, line_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def rewrap(batch: pa.Table) -> pa.Table:
        texts = ["\n".join(_doc_spans(t, 12)) if t else ""
                 for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(texts, type=pa.string())})

    return line_dedup(ds.map_batches(rewrap, batch_format="pyarrow"))


LINE_DEDUP_SQL = r"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '\S+')) AS w,
         generate_subscripts(regexp_extract_all(text, '\S+'), 1) AS ord
  FROM documents WHERE len(regexp_extract_all(text, '\S+')) >= 1
), lines0 AS MATERIALIZED (
  SELECT doc_id, (ord - 1) // 12 AS lidx,
         string_agg(w, ' ' ORDER BY ord) AS line
  FROM toks GROUP BY doc_id, (ord - 1) // 12
), ranked AS MATERIALIZED (
  SELECT doc_id, lidx, line,
         row_number() OVER (PARTITION BY line
                            ORDER BY doc_id, lidx) AS rn
  FROM lines0
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
       coalesce(string_agg(line, chr(10) ORDER BY lidx)
                FILTER (WHERE rn = 1), '') AS dedup_text
FROM ranked GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Modified z-score outliers (Iglewicz-Hoaglin): |0.6745·(x − median)|
# / MAD > 3.5 — the robust outlier rule that, unlike IQR fences,
# stays calibrated under heavy tails. Reuses the two grid-bounded
# value-count passes of mad_extendedprice for the exact median/MAD,
# then one shuffle-free counting pass. Returns the bounds and the
# outlier count/extremes (output-bounded driver result).
# ---------------------------------------------------------------------------

def modified_zscore_outliers_lineitem(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.stages.quantiles import quantile_cont_from_counts

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def vc(expr):
        def f(batch: pa.Table) -> pa.Table:
            u = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100
                        ).astype(np.int64)
            vals, cnts = np.unique(expr(u), return_counts=True)
            return pa.table({"v": pa.array(vals, type=pa.int64()),
                             "n": pa.array(cnts, type=pa.int64())})
        return f

    def median_of(ds_vc):
        rows = sorted(collect_pylist(
            ds_vc.groupby("v").aggregate(Sum("n", alias_name="n"))),
            key=lambda r: r["v"])
        vals = np.array([r["v"] for r in rows], dtype=np.float64)
        cum = np.cumsum([r["n"] for r in rows])
        return quantile_cont_from_counts(vals, cum, 0.5)

    med_cents = median_of(ds.map_batches(vc(lambda u: u),
                                         batch_format="pyarrow"))
    m2 = int(round(2 * med_cents))
    mad_cents = median_of(ds.map_batches(
        vc(lambda u: np.abs(2 * u - m2)), batch_format="pyarrow")) / 2.0
    med = med_cents / 100.0
    mad = mad_cents / 100.0
    # |x - med| > 3.5 * mad / 0.6745  (shared IEEE expression with SQL)
    cut = 3.5 * mad / 0.6745

    def flag(batch: pa.Table) -> pa.Table:
        x = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        out = x[np.abs(x - med) > cut]
        return pa.Table.from_pylist([{
            "n_out": len(out),
            "lo": float(out.min()) if len(out) else None,
            "hi": float(out.max()) if len(out) else None}])

    agg = collect_pylist(ds.map_batches(flag, batch_format="pyarrow"))
    n_out = sum(int(r["n_out"]) for r in agg)
    los = [r["lo"] for r in agg if r["lo"] is not None]
    his = [r["hi"] for r in agg if r["hi"] is not None]
    # explicit types: with zero outliers from_pylist would infer a NULL
    # column (pandas object dtype) where the SQL oracle yields float64
    return pa.table({
        "median": pa.array([_round6(med)], type=pa.float64()),
        "mad": pa.array([_round6(mad)], type=pa.float64()),
        "cutoff": pa.array([_round6(cut)], type=pa.float64()),
        "n_outliers": pa.array([n_out], type=pa.int64()),
        "min_outlier": pa.array([_round6(min(los)) if los else None],
                                type=pa.float64()),
        "max_outlier": pa.array([_round6(max(his)) if his else None],
                                type=pa.float64())})


MODIFIED_ZSCORE_SQL = """
WITH u AS MATERIALIZED (
  SELECT l_extendedprice AS x,
         CAST(round(l_extendedprice*100) AS BIGINT) AS u FROM lineitem),
med AS MATERIALIZED (
  SELECT quantile_cont(u, 0.5) / 100.0 AS med,
         CAST(round(2 * quantile_cont(u, 0.5)) AS BIGINT) AS m2 FROM u),
madv AS MATERIALIZED (
  SELECT med.med,
         quantile_cont(abs(2*u.u - med.m2), 0.5) / 2.0 / 100.0 AS mad
  FROM u, med GROUP BY med.med, med.m2),
c AS (SELECT med, mad, 3.5 * mad / 0.6745 AS cut FROM madv)
SELECT round(c.med, 6) AS median, round(c.mad, 6) AS mad,
       round(c.cut, 6) AS cutoff,
       CAST(count(*) FILTER (WHERE abs(u.x - c.med) > c.cut) AS BIGINT)
         AS n_outliers,
       round(min(u.x) FILTER (WHERE abs(u.x - c.med) > c.cut), 6)
         AS min_outlier,
       round(max(u.x) FILTER (WHERE abs(u.x - c.med) > c.cut), 6)
         AS max_outlier
FROM u, c GROUP BY c.med, c.mad, c.cut
"""


# ---------------------------------------------------------------------------
# Cumulative daily revenue: running total + running share of the
# final total over the day series — the classic cumulative window
# (SUM OVER ORDER BY). Distributed per-(block, day) integer partials;
# the running walk is driver math over the day-bounded series.
# ---------------------------------------------------------------------------

def cumulative_revenue_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        v = np.rint(batch.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame({"day": day.to_numpy(zero_copy_only=False),
                           "cents": v})
        return df.groupby("day", as_index=False).agg(cents=("cents", "sum"))

    rows = sorted(collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day").aggregate(Sum("cents", alias_name="cents"))),
        key=lambda r: r["day"])
    total = sum(int(r["cents"]) for r in rows)
    out, run = [], 0
    for r in rows:
        run += int(r["cents"])
        out.append({"day": pd.Timestamp(r["day"]),
                    "revenue": round(int(r["cents"]) / 100.0, 2),
                    "cum_revenue": round(run / 100.0, 2),
                    "cum_share": _round6(run / total)})
    return pa.Table.from_pylist(out)


CUMULATIVE_REVENUE_SQL = """
WITH d AS MATERIALIZED (
  SELECT date_trunc('day', ts) AS day,
         sum(CAST(round(value*100) AS BIGINT)) AS cents
  FROM events GROUP BY 1),
t AS (SELECT CAST(sum(cents) AS DOUBLE) AS total FROM d)
SELECT day, round(cents / 100.0, 2) AS revenue,
       round(sum(cents) OVER (ORDER BY day) / 100.0, 2) AS cum_revenue,
       round(sum(cents) OVER (ORDER BY day) / t.total, 6) AS cum_share
FROM d, t ORDER BY day
"""


# ---------------------------------------------------------------------------
# Per-column Shannon entropy profile over the categorical columns of
# several tables — the profiling statistic that flags constant /
# near-constant and high-cardinality columns in one number. One
# combiner pass per column (category-bounded count shuffles), one
# shared -Σ p·log2(p) derivation.
# ---------------------------------------------------------------------------

def entropy_profile(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    specs = [("orders", "o_orderstatus"), ("orders", "o_orderpriority"),
             ("documents", "lang"), ("documents", "source"),
             ("events", "event_type")]
    out = []
    for table, col in specs:
        ds = _read(sf_dir, table, [col])

        def partial(batch: pa.Table, col=col) -> pa.Table:
            vals, cnts = np.unique(
                np.array(batch.column(col).to_pylist(), dtype=object),
                return_counts=True)
            return pa.table({"v": pa.array(list(vals), type=pa.string()),
                             "n": pa.array(cnts, type=pa.int64())})

        counts = collect_pylist(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("v").aggregate(Sum("n", alias_name="n")))
        n = sum(int(r["n"]) for r in counts)
        ent = 0.0
        for r in sorted(counts, key=lambda r: r["v"]):
            p = int(r["n"]) / n
            ent += -p * np.log2(p)
        out.append({"tbl": table, "col": col, "n_distinct": len(counts),
                    "entropy": _round6(ent),
                    "norm_entropy": _round6(
                        ent / np.log2(len(counts)))
                    if len(counts) > 1 else 0.0})
    return pa.Table.from_pylist(out)


ENTROPY_PROFILE_SQL = """
WITH cells AS MATERIALIZED (
  SELECT 'orders' AS tbl, 'o_orderstatus' AS col,
         o_orderstatus AS v, count(*) AS n FROM orders GROUP BY 3
  UNION ALL
  SELECT 'orders', 'o_orderpriority', o_orderpriority, count(*)
  FROM orders GROUP BY 3
  UNION ALL
  SELECT 'documents', 'lang', lang, count(*) FROM documents GROUP BY 3
  UNION ALL
  SELECT 'documents', 'source', source, count(*) FROM documents GROUP BY 3
  UNION ALL
  SELECT 'events', 'event_type', event_type, count(*)
  FROM events GROUP BY 3),
tot AS MATERIALIZED (
  SELECT tbl, col, CAST(sum(n) AS DOUBLE) AS t,
         CAST(count(*) AS BIGINT) AS k
  FROM cells GROUP BY tbl, col),
e AS MATERIALIZED (
  SELECT c.tbl, c.col, tot.k,
         sum(-(c.n / tot.t) * log2(c.n / tot.t) ORDER BY c.v) AS ent
  FROM cells c JOIN tot ON c.tbl = tot.tbl AND c.col = tot.col
  GROUP BY c.tbl, c.col, tot.k)
SELECT tbl, col, k AS n_distinct, round(ent, 6) AS entropy,
       CASE WHEN k > 1 THEN round(ent / log2(k), 6) ELSE 0.0 END
         AS norm_entropy
FROM e ORDER BY tbl, col
"""


# ---------------------------------------------------------------------------
# IVF-PQ ANN (similarity.build_ivfpq_index/knn_cosine_ivfpq): coarse
# centroid partitioning + product-quantized residuals — the
# FAISS-style composition of the two existing scale paths. Rows-only
# check (recall/determinism/pruning are the pytest contract,
# tests/test_dedup_text.py TestIvfPqKnn).
# ---------------------------------------------------------------------------

def knn_cosine_ivfpq_embeddings(sf_dir: str) -> pa.Table:
    """IVF-PQ ADC top-k with a FULL SQL oracle (IVFPQ_KNN_SQL): the
    coarse √n-centroid k-means, residual PQ codebook, n_probe cell
    pruning and coarse+fine ADC scoring all unroll into one DuckDB
    query — both Lloyd chains are deterministic (diagonal init /
    md5-ordered seeds, no RNG)."""
    import os

    from tanml_ray.pipelines.similarity import (
        build_ivfpq_index,
        knn_cosine_ivfpq,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    st = os.stat(f"{sf_dir}/embeddings.parquet")
    tag = sf_dir.rstrip("/").split("/")[-1]
    idx = f"/tmp/tanml_ivfpq_{tag}_{st.st_size}_{st.st_mtime_ns}"
    if not os.path.exists(os.path.join(idx, "_ivfpq_meta.json")):
        build_ivfpq_index(ds, idx, m=8, ksub=16)
    return knn_cosine_ivfpq(idx, _query_vectors(sf_dir, _KNN_QUERY_IDS),
                            k=10, n_probe=8)


def _ivfpq_knn_sql(m: int = 8, ksub: int = 16, dim: int = 64,
                   iters: int = 5, k: int = 10, n_probe: int = 8,
                   query_ids: tuple[int, ...] = _KNN_QUERY_IDS) -> str:
    """Generate the unrolled IVF-PQ oracle: the coarse k-means
    (diagonal min/max init over √n centroids, `iters` Lloyd steps —
    similarity._kmeans_unit_vectors), residuals r = v − centroid[cell],
    the residual PQ codebook (md5 seeds + `iters` Lloyd steps,
    normalize=False), encoding, per-query n_probe cell pruning, and
    ADC sim = q·centroid[cell] + Σ q_sub·code_centroid — all as one
    DuckDB query. √n centroids come from a bounded range(4096) filtered
    by the in-SQL k = max(2, ⌊√max(n,4)⌋), so the same string is exact
    at every sf."""
    dsub = dim // m
    parts = [f"""
WITH vraw AS MATERIALIZED (
  SELECT vec_id, CAST(t.i AS BIGINT) AS dimn,
         CAST(embedding[t.i] AS DOUBLE) AS val
  FROM embeddings, range(1, {dim + 1}) t(i)
), nrm AS MATERIALIZED (
  SELECT vec_id, greatest(sqrt(sum(val*val)), 1e-30) AS nv
  FROM vraw GROUP BY 1
), vfull AS MATERIALIZED (
  SELECT v.vec_id, v.dimn, v.val / n.nv AS val
  FROM vraw v JOIN nrm n USING (vec_id)
), kk AS MATERIALIZED (
  SELECT greatest(2, CAST(floor(sqrt(greatest(count(*), 4))) AS BIGINT)) AS k
  FROM embeddings
), mmx AS MATERIALIZED (
  SELECT dimn, min(val) AS lo, max(val) AS hi FROM vfull GROUP BY 1
), g_0 AS MATERIALIZED (
  SELECT CAST(t.j AS BIGINT) AS j, x.dimn,
         x.lo + (t.j + 0.5) / kk.k * (x.hi - x.lo) AS c
  FROM range(0, 4096) t(j), kk, mmx x WHERE t.j < kk.k
)"""]
    prev = "g_0"
    for t in range(1, iters + 1):
        parts.append(f""", ga_{t} AS MATERIALIZED (
  SELECT v.vec_id, g.j, sum((v.val - g.c)*(v.val - g.c)) AS dist
  FROM vfull v JOIN {prev} g ON g.dimn = v.dimn
  GROUP BY 1, 2
), gasn_{t} AS MATERIALIZED (
  SELECT vec_id, j FROM ga_{t}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, j) = 1
), g_{t} AS MATERIALIZED (
  SELECT g.j, g.dimn, coalesce(u.c, g.c) AS c
  FROM {prev} g LEFT JOIN (
    SELECT a.j, v.dimn, sum(v.val) / count(*) AS c
    FROM gasn_{t} a JOIN vfull v ON v.vec_id = a.vec_id
    GROUP BY 1, 2
  ) u ON u.j = g.j AND u.dimn = g.dimn
)""")
        prev = f"g_{t}"
    gfin = prev
    parts.append(f""", cga AS MATERIALIZED (
  SELECT v.vec_id, g.j, sum((v.val - g.c)*(v.val - g.c)) AS dist
  FROM vfull v JOIN {gfin} g ON g.dimn = v.dimn
  GROUP BY 1, 2
), cell AS MATERIALIZED (
  SELECT vec_id, j AS cell FROM cga
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, j) = 1
), rsub AS MATERIALIZED (
  SELECT v.vec_id, (v.dimn - 1) // {dsub} AS sub,
         (v.dimn - 1) % {dsub} AS sd, v.val - g.c AS val
  FROM vfull v
  JOIN cell ce ON ce.vec_id = v.vec_id
  JOIN {gfin} g ON g.j = ce.cell AND g.dimn = v.dimn
), seeds AS MATERIALIZED (
  SELECT vec_id,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS j
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {ksub}
), r_0 AS MATERIALIZED (
  SELECT rs.sub, s.j, rs.sd, rs.val AS c
  FROM seeds s JOIN rsub rs ON rs.vec_id = s.vec_id
)""")
    prev = "r_0"
    for t in range(1, iters + 1):
        parts.append(f""", ra_{t} AS MATERIALIZED (
  SELECT rs.vec_id, rs.sub, ct.j, sum((rs.val - ct.c)*(rs.val - ct.c)) AS dist
  FROM rsub rs JOIN {prev} ct ON ct.sub = rs.sub AND ct.sd = rs.sd
  GROUP BY 1, 2, 3
), rasn_{t} AS MATERIALIZED (
  SELECT vec_id, sub, j FROM ra_{t}
  QUALIFY row_number() OVER (PARTITION BY vec_id, sub
                             ORDER BY dist, j) = 1
), r_{t} AS MATERIALIZED (
  SELECT ct.sub, ct.j, ct.sd, coalesce(u.c, ct.c) AS c
  FROM {prev} ct LEFT JOIN (
    SELECT a.sub, a.j, rs.sd, sum(rs.val) / count(*) AS c
    FROM rasn_{t} a JOIN rsub rs ON rs.vec_id = a.vec_id AND rs.sub = a.sub
    GROUP BY 1, 2, 3
  ) u ON u.sub = ct.sub AND u.j = ct.j AND u.sd = ct.sd
)""")
        prev = f"r_{t}"
    rfin = prev
    qid_list = ", ".join(str(q) for q in query_ids)
    parts.append(f""", rf AS MATERIALIZED (
  SELECT rs.vec_id, rs.sub, ct.j, sum((rs.val - ct.c)*(rs.val - ct.c)) AS dist
  FROM rsub rs JOIN {rfin} ct ON ct.sub = rs.sub AND ct.sd = rs.sd
  GROUP BY 1, 2, 3
), codes AS MATERIALIZED (
  SELECT vec_id, sub, j FROM rf
  QUALIFY row_number() OVER (PARTITION BY vec_id, sub
                             ORDER BY dist, j) = 1
), vq AS MATERIALIZED (
  SELECT vec_id AS query_id, dimn, val FROM vfull
  WHERE vec_id IN ({qid_list})
), vqsub AS MATERIALIZED (
  SELECT query_id, (dimn - 1) // {dsub} AS sub,
         (dimn - 1) % {dsub} AS sd, val
  FROM vq
), qd AS MATERIALIZED (
  SELECT q.query_id, g.j, sum((q.val - g.c)*(q.val - g.c)) AS dist
  FROM vq q JOIN {gfin} g ON g.dimn = q.dimn
  GROUP BY 1, 2
), probed AS MATERIALIZED (
  SELECT DISTINCT j FROM (
    SELECT query_id, j FROM qd
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY dist, j) <= {n_probe})
), cand AS MATERIALIZED (
  SELECT ce.vec_id, ce.cell FROM cell ce JOIN probed p ON p.j = ce.cell
), qcoarse AS MATERIALIZED (
  SELECT q.query_id, g.j AS cell, sum(q.val * g.c) AS coarse
  FROM vq q JOIN {gfin} g ON g.dimn = q.dimn
  GROUP BY 1, 2
), fine AS MATERIALIZED (
  SELECT qv.query_id, cd.vec_id, sum(qv.val * cf.c) AS fine
  FROM codes cd
  JOIN cand ca ON ca.vec_id = cd.vec_id
  JOIN {rfin} cf ON cf.sub = cd.sub AND cf.j = cd.j
  JOIN vqsub qv ON qv.sub = cf.sub AND qv.sd = cf.sd
  WHERE cd.vec_id <> qv.query_id
  GROUP BY 1, 2
), sims AS MATERIALIZED (
  SELECT f.query_id, f.vec_id, qc.coarse + f.fine AS sim
  FROM fine f
  JOIN cand ca ON ca.vec_id = f.vec_id
  JOIN qcoarse qc ON qc.query_id = f.query_id AND qc.cell = ca.cell
)
SELECT query_id, vec_id, round(sim, 6) AS sim FROM sims
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY sim DESC, vec_id) <= {k}
ORDER BY query_id, round(sim, 6) DESC, vec_id""")
    return "".join(parts)


IVFPQ_KNN_SQL = _ivfpq_knn_sql()


# ---------------------------------------------------------------------------
# Per-day exact value quantiles (p50/p95 trend over the event stream)
# — grouped quantile_cont parity WITHOUT a distributed sort: one
# combiner pass of (day, cents, n) value-count partials (bounded by
# days × value grid, not rows), exact interpolation per day on the
# driver. The time-series twin of price_quantiles_by_priority.
# ---------------------------------------------------------------------------

def daily_value_quantiles_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.stages.quantiles import quantile_cont_from_counts

    ds = _read(sf_dir, "events", ["ts", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        v = np.rint(batch.column("value")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame({"day": day.to_numpy(zero_copy_only=False),
                           "cents": v})
        return (df.groupby(["day", "cents"], as_index=False)
                .agg(n=("cents", "size")))

    rows = collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "cents"]).aggregate(Sum("n", alias_name="n")))
    by_day: dict = {}
    for r in rows:
        by_day.setdefault(r["day"], []).append((int(r["cents"]), int(r["n"])))
    out = []
    for day in sorted(by_day):
        vc = sorted(by_day[day])
        vals = np.array([v for v, _ in vc], dtype=np.float64)
        cum = np.cumsum([n for _, n in vc])
        out.append({"day": pd.Timestamp(day), "n": int(cum[-1]),
                    "p50": _round6(quantile_cont_from_counts(
                        vals, cum, 0.5) / 100.0),
                    "p95": _round6(quantile_cont_from_counts(
                        vals, cum, 0.95) / 100.0)})
    return pa.Table.from_pylist(out)


DAILY_QUANTILES_SQL = """
SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(CAST(round(value*100) AS BIGINT), 0.5)
             / 100.0, 6) AS p50,
       round(quantile_cont(CAST(round(value*100) AS BIGINT), 0.95)
             / 100.0, 6) AS p95
FROM events GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Mann-Whitney U (Wilcoxon rank-sum) between two groups — the
# nonparametric two-sample test beside KS (A8), computed EXACTLY from
# the shared integer value grid: midranks come from the merged value
# counts (ties handled by construction), the normal z uses the
# standard tie-corrected variance. One grid-bounded combiner pass;
# rank arithmetic on the driver over the bounded grid.
# ---------------------------------------------------------------------------

def mannwhitney_quantity_returnflag(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        flag = np.asarray(batch.column("l_returnflag").to_pylist(),
                          dtype=object)
        q = np.rint(batch.column("l_quantity")
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        keep = (flag == "A") | (flag == "R")
        df = pd.DataFrame({"g": flag[keep], "v": q[keep]})
        return df.groupby(["g", "v"], as_index=False).agg(n=("v", "size"))

    grid: dict[int, list] = {}
    for r in collect_pylist(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["g", "v"]).aggregate(Sum("n", alias_name="n"))):
        a = grid.setdefault(int(r["v"]), [0, 0])
        a[0 if r["g"] == "A" else 1] += int(r["n"])
    n1 = sum(a[0] for a in grid.values())
    n2 = sum(a[1] for a in grid.values())
    r1 = 0.0       # rank sum of group A with midranks
    tie_term = 0.0  # Σ (t³ - t) over tied groups
    below = 0
    for v in sorted(grid):
        c1, c2 = grid[v]
        t = c1 + c2
        midrank = below + (t + 1) / 2.0
        r1 += c1 * midrank
        tie_term += t ** 3 - t
        below += t
    n = n1 + n2
    u1 = r1 - n1 * (n1 + 1) / 2.0
    u2 = n1 * n2 - u1
    mu = n1 * n2 / 2.0
    var = (n1 * n2 / 12.0) * ((n + 1) - tie_term / (n * (n - 1.0)))
    z = (u1 - mu) / np.sqrt(var)
    return pa.Table.from_pylist([{
        "n1": n1, "n2": n2, "u1": _round6(u1), "u2": _round6(u2),
        "z": _round6(float(z))}])


MANNWHITNEY_SQL = """
WITH src AS (
  SELECT l_returnflag AS g, CAST(round(l_quantity) AS BIGINT) AS v
  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
grid AS (
  SELECT v,
         CAST(count(*) FILTER (WHERE g = 'A') AS BIGINT) AS c1,
         CAST(count(*) FILTER (WHERE g = 'R') AS BIGINT) AS c2
  FROM src GROUP BY v),
walk AS (
  SELECT v, c1, c2, c1 + c2 AS t,
         coalesce(sum(c1 + c2) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS below
  FROM grid),
s AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
         sum(c1 * (below + (t + 1) / 2.0)) AS r1,
         sum(t*t*t - t) AS tie_term
  FROM walk)
SELECT n1, n2,
       round(r1 - n1 * (n1 + 1) / 2.0, 6) AS u1,
       round(n1 * CAST(n2 AS DOUBLE) - (r1 - n1 * (n1 + 1) / 2.0), 6) AS u2,
       round(((r1 - n1 * (n1 + 1) / 2.0) - n1 * n2 / 2.0)
             / sqrt((n1 * CAST(n2 AS DOUBLE) / 12.0)
                    * ((n1 + n2 + 1)
                       - tie_term / ((n1 + n2) * (n1 + n2 - 1.0)))), 6)
         AS z
FROM s
"""


# ---------------------------------------------------------------------------
# Market-basket association rules over per-user event types:
# support / confidence / lift for every ordered type pair (a → b)
# co-occurring in a user's history. Scale shape: per-batch distinct
# (user, type) dedupe is the combiner, ONE coarse hash(user)%P shuffle
# with a vectorized in-partition self-merge pair expansion; singles,
# pairs AND the distinct-user count all ride the same category²-bounded
# (a, b) Sum aggregate (the user count as a sentinel row — no
# driver-side set of user ids, no second pass over the input); the
# rule math is driver arithmetic over that bounded table.
# ---------------------------------------------------------------------------

_BASKET_NUSERS_KEY = "\x00n_users"


def basket_lift_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum
    from tanml_ray.stages.shuffle import with_coarse_partition

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def local(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch.column("user_id").to_numpy(zero_copy_only=False),
            "event_type": batch.column("event_type")
            .to_numpy(zero_copy_only=False)})
        return from_pandas_clean(df.drop_duplicates())

    def per_partition(g: pd.DataFrame) -> pa.Table:
        ut = g.drop_duplicates(["user_id", "event_type"])
        singles = (ut.groupby("event_type", as_index=False).size()
                   .rename(columns={"event_type": "a", "size": "n"}))
        singles["b"] = ""
        pr = ut.merge(ut, on="user_id")
        pr = pr[pr["event_type_x"] != pr["event_type_y"]]
        pairs = (pr.groupby(["event_type_x", "event_type_y"], as_index=False)
                 .size().rename(columns={"event_type_x": "a",
                                         "event_type_y": "b", "size": "n"}))
        nu = pd.DataFrame({"a": [_BASKET_NUSERS_KEY], "b": [""],
                           "n": [int(ut["user_id"].nunique())]})
        out = pd.concat([singles[["a", "b", "n"]], pairs[["a", "b", "n"]],
                         nu], ignore_index=True)
        out["n"] = out["n"].astype("int64")
        return from_pandas_clean(out)

    counts = collect_pylist(
        with_coarse_partition(
            ds.map_batches(local, batch_format="pyarrow"), "user_id")
        .groupby("__upart").map_groups(per_partition, batch_format="pandas")
        .groupby(["a", "b"]).aggregate(Sum("n", alias_name="n")))
    n_users = sum(int(r["n"]) for r in counts
                  if r["a"] == _BASKET_NUSERS_KEY)
    singles = {r["a"]: int(r["n"]) for r in counts
               if r["b"] == "" and r["a"] != _BASKET_NUSERS_KEY}
    out = []
    for r in sorted((r for r in counts if r["b"] != ""),
                    key=lambda r: (r["a"], r["b"])):
        n_ab = int(r["n"])
        n_a, n_b = singles[r["a"]], singles[r["b"]]
        out.append({"a": r["a"], "b": r["b"], "n_a": n_a, "n_b": n_b,
                    "n_ab": n_ab,
                    "support": _round6(n_ab / n_users),
                    "confidence": _round6(n_ab / n_a),
                    "lift": _round6((n_ab / n_a) / (n_b / n_users))})
    return pa.Table.from_pylist(out)


BASKET_LIFT_SQL = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events),
nu AS (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users
       FROM events),
singles AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1),
pairs AS (
  SELECT x.event_type AS a, y.event_type AS b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM ut x JOIN ut y ON x.user_id = y.user_id
                      AND x.event_type <> y.event_type
  GROUP BY 1, 2)
SELECT p.a, p.b, sa.n AS n_a, sb.n AS n_b, p.n_ab,
       round(p.n_ab / nu.n_users, 6) AS support,
       round(p.n_ab / CAST(sa.n AS DOUBLE), 6) AS confidence,
       round((p.n_ab / CAST(sa.n AS DOUBLE))
             / (sb.n / nu.n_users), 6) AS lift
FROM pairs p JOIN singles sa ON sa.event_type = p.a
             JOIN singles sb ON sb.event_type = p.b, nu
ORDER BY p.a, p.b
"""


# ---------------------------------------------------------------------------
# DSIR importance weights (webtext.dsir_weights): log w(d) =
# log p_target(d) − log p_raw(d) under two unigram LMs, target = the
# Gopher-rule-pass subset. The oracle re-derives both LM score chains
# (UNIGRAM_LM_SQL's CTEs; the target side LEFT-JOINs so OOV words get
# the 1/denom smoothing mass exactly like the engine) and mirrors the
# engine's round(6) nll intermediates before the weight product.
# ---------------------------------------------------------------------------

def dsir_weights_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import dsir_weights

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dsir_weights(ds)
    rows = sorted(collect_pylist(out), key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows)


DSIR_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
), counts_raw AS (
  SELECT w, count(*) AS c FROM toks GROUP BY w
), tot_raw AS (
  SELECT CAST(sum(c) AS DOUBLE) + count(*) AS denom FROM counts_raw
), target_docs AS (
  SELECT doc_id FROM documents
  WHERE CASE WHEN len(regexp_extract_all(text, '\S+'))
                  BETWEEN 50 AND 100000
             AND len(regexp_extract_all(text, '\S'))
                 / CAST(greatest(len(regexp_extract_all(text, '\S+')), 1)
                        AS DOUBLE) BETWEEN 3.0 AND 10.0
             AND len(regexp_extract_all(text, '\S*[A-Za-z]\S*'))
                 / CAST(greatest(len(regexp_extract_all(text, '\S+')), 1)
                        AS DOUBLE) > 0.80
             AND len(regexp_extract_all(
                   text, '\b(the|and|of|to|in|is|that|for|was|on)\b')) >= 2
           THEN 1 ELSE 0 END = 1
), toks_t AS (
  SELECT t.w FROM toks t JOIN target_docs d ON t.doc_id = d.doc_id
), counts_t AS (
  SELECT w, count(*) AS c FROM toks_t GROUP BY w
), tot_t AS (
  SELECT CAST(sum(c) AS DOUBLE) + count(*) AS denom FROM counts_t
), raw_scored AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         round(-sum(ln((c.c + 1) / tr.denom)) / count(*), 6) AS nll_raw
  FROM toks t JOIN counts_raw c ON t.w = c.w CROSS JOIN tot_raw tr
  GROUP BY t.doc_id
), t_scored AS (
  SELECT t.doc_id,
         round(-sum(ln(coalesce(c.c + 1.0, 1.0) / tt.denom)) / count(*), 6)
           AS nll_target
  FROM toks t LEFT JOIN counts_t c ON t.w = c.w CROSS JOIN tot_t tt
  GROUP BY t.doc_id
)
SELECT r.doc_id, r.n_tokens, r.nll_raw, s.nll_target,
       round(r.n_tokens * (r.nll_raw - s.nll_target), 6) AS log_weight
FROM raw_scored r JOIN t_scored s ON r.doc_id = s.doc_id
ORDER BY r.doc_id
"""


# ---------------------------------------------------------------------------
# LEFT OUTER partitioned join: every customer keeps a row, order
# count fills 0 when no orders match — exercising partitioned_join's
# null-preserving left path (the right side is pre-aggregated to
# (custkey, n) ints by a combiner, so the join ships counts, never
# order rows).
# ---------------------------------------------------------------------------

def left_join_customer_orders(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.pipelines.join import partitioned_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def cnt_partial(batch: pa.Table) -> pa.Table:
        vals, cnts = np.unique(batch.column("o_custkey")
                               .to_numpy(zero_copy_only=False),
                               return_counts=True)
        return pa.table({"c_custkey": pa.array(vals, type=pa.int64()),
                         "n": pa.array(cnts, type=pa.int64())})

    per_cust = (orders.map_batches(cnt_partial, batch_format="pyarrow")
                .groupby("c_custkey").aggregate(Sum("n", alias_name="n")))
    joined = partitioned_join(cust, per_cust, key="c_custkey", how="left")

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_pandas().fillna(0).astype(np.int64)
        return pa.table({"c_custkey": batch.column("c_custkey"),
                         "c_mktsegment": batch.column("c_mktsegment"),
                         "n_orders": pa.array(n.to_numpy(),
                                              type=pa.int64())})

    rows = sorted(collect_pylist(
        joined.map_batches(finish, batch_format="pyarrow")),
        key=lambda r: r["c_custkey"])
    return pa.Table.from_pylist(rows)


LEFT_JOIN_SQL = """
SELECT c.c_custkey, c.c_mktsegment,
       CAST(count(o.o_custkey) AS BIGINT) AS n_orders
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_mktsegment ORDER BY c.c_custkey
"""


# ---------------------------------------------------------------------------
# Information-gain feature ranking: IG(Y | X) = H(Y) − H(Y|X) of the
# order status against each categorical feature — the decision-tree
# split criterion as a profiling statistic (A19's entropy-based
# sibling). One (x, y) joint-count combiner pass per feature
# (category²-bounded shuffles); entropy arithmetic on the driver in a
# fixed order, mirrored by the SQL's ORDER BY'd aggregates.
# ---------------------------------------------------------------------------

def info_gain_orders(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderpriority", "o_orderdate"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        month = pc.strftime(batch.column("o_orderdate"), format="%m")
        df = pd.DataFrame({
            "y": batch.column("o_orderstatus").to_pylist()})
        out = []
        for feat, xs in (("o_orderpriority",
                          batch.column("o_orderpriority").to_pylist()),
                         ("order_month", month.to_pylist())):
            d = pd.DataFrame({"feat": feat, "x": xs, "y": df["y"]})
            out.append(d.groupby(["feat", "x", "y"], as_index=False)
                       .size().rename(columns={"size": "n"}))
        return pd.concat(out, ignore_index=True)

    cells = collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["feat", "x", "y"]).aggregate(Sum("n", alias_name="n")))

    def entropy(counts: list[int]) -> float:
        tot = sum(counts)
        return float(sum(-(c / tot) * np.log2(c / tot)
                         for c in counts if c))

    out = []
    for feat in sorted({r["feat"] for r in cells}):
        sub = [r for r in cells if r["feat"] == feat]
        y_tot: dict = {}
        x_tot: dict = {}
        for r in sub:
            y_tot[r["y"]] = y_tot.get(r["y"], 0) + int(r["n"])
            x_tot[r["x"]] = x_tot.get(r["x"], 0) + int(r["n"])
        n = sum(y_tot.values())
        h_y = entropy([y_tot[k] for k in sorted(y_tot)])
        h_y_x = 0.0
        for x in sorted(x_tot):
            grp = [int(r["n"]) for r in sorted(
                (r for r in sub if r["x"] == x), key=lambda r: r["y"])]
            h_y_x += (x_tot[x] / n) * entropy(grp)
        out.append({"feature": feat, "h_y": _round6(h_y),
                    "h_y_given_x": _round6(h_y_x),
                    "info_gain": _round6(h_y - h_y_x)})
    return pa.Table.from_pylist(out)


INFO_GAIN_SQL = """
WITH src AS (
  SELECT o_orderstatus AS y, o_orderpriority AS x1,
         strftime(o_orderdate, '%m') AS x2
  FROM orders),
cells AS (
  SELECT 'o_orderpriority' AS feat, x1 AS x, y, count(*) AS n
  FROM src GROUP BY 2, 3
  UNION ALL
  SELECT 'order_month', x2, y, count(*) FROM src GROUP BY 2, 3),
tot AS (
  SELECT feat, CAST(sum(n) AS DOUBLE) AS n FROM cells GROUP BY feat),
hy AS (
  SELECT c.feat,
         sum(-(yc.n / t.n) * log2(yc.n / t.n) ORDER BY yc.y) AS h_y
  FROM (SELECT feat, y, CAST(sum(n) AS DOUBLE) AS n
        FROM cells GROUP BY feat, y) yc
  JOIN tot t ON t.feat = yc.feat
  JOIN (SELECT DISTINCT feat FROM cells) c ON c.feat = yc.feat
  GROUP BY c.feat),
xc0 AS (
  SELECT feat, x, CAST(sum(n) AS DOUBLE) AS xn FROM cells GROUP BY feat, x),
hx AS (
  SELECT c.feat, c.x,
         sum(-(c.n / x0.xn) * log2(c.n / x0.xn) ORDER BY c.y) AS h_x
  FROM cells c JOIN xc0 x0 ON x0.feat = c.feat AND x0.x = c.x
  GROUP BY c.feat, c.x),
hyx AS (
  SELECT hx.feat, sum((x0.xn / t.n) * hx.h_x ORDER BY hx.x) AS h_y_given_x
  FROM hx JOIN xc0 x0 ON x0.feat = hx.feat AND x0.x = hx.x
  JOIN tot t ON t.feat = hx.feat
  GROUP BY hx.feat)
SELECT hy.feat AS feature, round(hy.h_y, 6) AS h_y,
       round(hyx.h_y_given_x, 6) AS h_y_given_x,
       round(hy.h_y - hyx.h_y_given_x, 6) AS info_gain
FROM hy JOIN hyx ON hy.feat = hyx.feat ORDER BY feature
"""


# ---------------------------------------------------------------------------
# Calibration curve (reliability diagram) for the NB quality
# classifier against its Gopher pseudo-labels: sigmoid the log-odds
# into p, bucket into 10 equal-width bins, report per-bin count, mean
# predicted p and empirical positive rate. Per-batch partials
# integerize p (micro-units) so the bin sums are EXACT under any
# partitioning; the oracle extends NB_QUALITY_SQL's chain with the
# same sigmoid/binning arithmetic.
# ---------------------------------------------------------------------------

def calibration_nb_documents(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.pipelines.webtext import nb_quality_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    scored = nb_quality_scores(ds)

    def partial(batch: pa.Table) -> pd.DataFrame:
        s = batch.column("score").to_numpy(zero_copy_only=False)
        y = batch.column("label").to_numpy(zero_copy_only=False)
        p = 1.0 / (1.0 + np.exp(-s))
        b = np.minimum((p * 10).astype(np.int64), 9)
        df = pd.DataFrame({
            "bin": b, "pos": y.astype(np.int64),
            "p_micro": np.rint(p * 1e6).astype(np.int64)})
        return df.groupby("bin", as_index=False).agg(
            n=("pos", "size"), pos=("pos", "sum"),
            p_micro=("p_micro", "sum"))

    rows = sorted(collect_pylist(
        scored.map_batches(partial, batch_format="pyarrow")
        .groupby("bin").aggregate(Sum("n", alias_name="n"),
                                  Sum("pos", alias_name="pos"),
                                  Sum("p_micro", alias_name="p_micro"))),
        key=lambda r: r["bin"])
    return pa.Table.from_pylist([
        {"bin": int(r["bin"]), "n": int(r["n"]),
         "mean_p": _round6(int(r["p_micro"]) / 1e6 / int(r["n"])),
         "frac_pos": _round6(int(r["pos"]) / int(r["n"]))}
        for r in rows])


CALIBRATION_NB_SQL = r"""
WITH lab AS (
  SELECT doc_id, text,
         CAST(CASE WHEN len(regexp_extract_all(text, '\S+'))
                        BETWEEN 50 AND 100000
                    AND len(regexp_extract_all(text, '\S'))
                        / CAST(greatest(len(regexp_extract_all(text, '\S+')),
                                        1) AS DOUBLE) BETWEEN 3.0 AND 10.0
                    AND len(regexp_extract_all(text, '\S*[A-Za-z]\S*'))
                        / CAST(greatest(len(regexp_extract_all(text, '\S+')),
                                        1) AS DOUBLE) > 0.80
                    AND len(regexp_extract_all(text,
                        '\b(the|and|of|to|in|is|that|for|was|on)\b')) >= 2
               THEN 1 ELSE 0 END AS BIGINT) AS label
  FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
), toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
  FROM lab
), tl AS (
  SELECT t.doc_id, t.w, l.label FROM toks t JOIN lab l USING (doc_id)
), counts AS (
  SELECT w, count(*) FILTER (WHERE label = 1) AS cpos,
         count(*) FILTER (WHERE label = 0) AS cneg
  FROM tl GROUP BY w
), tot AS (
  SELECT CAST(sum(cpos) AS DOUBLE) + count(*) AS dpos,
         CAST(sum(cneg) AS DOUBLE) + count(*) AS dneg
  FROM counts
), pri AS (
  SELECT count(*) FILTER (WHERE label = 1) AS npos,
         count(*) FILTER (WHERE label = 0) AS nneg
  FROM lab
), scored AS (
  SELECT tl.doc_id,
         round(ln(pri.npos / CAST(pri.nneg AS DOUBLE))
           + sum(ln((c.cpos + 1) / tot.dpos)
                 - ln((c.cneg + 1) / tot.dneg)), 6) AS score
  FROM tl JOIN counts c USING (w) CROSS JOIN tot CROSS JOIN pri
  GROUP BY tl.doc_id, pri.npos, pri.nneg
), binned AS (
  SELECT l.label,
         least(CAST(floor((1.0 / (1.0 + exp(-s.score))) * 10) AS BIGINT),
               9) AS bin,
         CAST(round((1.0 / (1.0 + exp(-s.score))) * 1000000) AS BIGINT)
           AS p_micro
  FROM scored s JOIN lab l USING (doc_id)
)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       round(sum(p_micro) / 1000000.0 / count(*), 6) AS mean_p,
       round(CAST(sum(label) AS DOUBLE) / count(*), 6) AS frac_pos
FROM binned GROUP BY bin ORDER BY bin
"""


# ---------------------------------------------------------------------------
# Exact linear SHAP summary (T2, exact path): for an OLS fit the
# Shapley value of feature i at row x is closed-form
# beta_i*(x_i - mean x_i) (Lundberg & Lee 2017), so the reference's
# mean-|shap| summary ranking (shap_check.py:313-324) is computed
# EXACTLY with two streaming passes — no shap library and no sampling.
# Oracle: the Cramer 3x3 chain from LINEAR_FIT_SQL for the betas plus
# avg / avg-abs-deviation scans.
# ---------------------------------------------------------------------------

def linear_shap_orders(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.explain import linear_shap_summary

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice",
                                  "o_custkey"])

    def derive(batch: pa.Table) -> pa.Table:
        days = (batch.column("o_orderdate").cast(pa.int64())
                .to_numpy(zero_copy_only=False) // 86_400_000_000)
        return pa.table({
            "days": pa.array(days.astype(np.float64), type=pa.float64()),
            "custkey": pc.cast(batch.column("o_custkey"), pa.float64()),
            "y": pc.cast(batch.column("o_totalprice"), pa.float64()),
        })

    return linear_shap_summary(ds.map_batches(derive, batch_format="pyarrow"),
                               ["days", "custkey"], "y")


LINEAR_SHAP_SQL = """
WITH p AS (
  SELECT CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE) AS x1,
         CAST(o_custkey AS DOUBLE) AS x2,
         CAST(o_totalprice AS DOUBLE) AS y
  FROM orders
), s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x1) AS s1, sum(x2) AS s2,
         sum(y) AS sy, sum(x1*x1) AS s11, sum(x1*x2) AS s12,
         sum(x2*x2) AS s22, sum(x1*y) AS s1y, sum(x2*y) AS s2y
  FROM p
), d AS (
  SELECT *,
         n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det,
         n*(s1y*s22 - s2y*s12) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2) AS det1,
         n*(s11*s2y - s12*s1y) - s1*(s1*s2y - s2*s1y) + sy*(s1*s12 - s11*s2) AS det2
  FROM s
), c AS (
  SELECT det1/det AS b1, det2/det AS b2, s1/n AS a1, s2/n AS a2, sy/n AS ay
  FROM d
), mad AS (
  SELECT avg(abs(p.x1 - c.a1)) AS mad1, avg(abs(p.x2 - c.a2)) AS mad2
  FROM p, c GROUP BY c.a1, c.a2
)
SELECT feature, coef, mean_x, mean_abs_shap, base_value FROM (
  SELECT 'days' AS feature, round(c.b1, 6) AS coef, round(c.a1, 6) AS mean_x,
         round(abs(c.b1) * mad.mad1, 6) AS mean_abs_shap,
         round(c.ay, 6) AS base_value
  FROM c, mad
  UNION ALL
  SELECT 'custkey', round(c.b2, 6), round(c.a2, 6),
         round(abs(c.b2) * mad.mad2, 6), round(c.ay, 6)
  FROM c, mad
) ORDER BY mean_abs_shap DESC, feature
"""


# ---------------------------------------------------------------------------
# Deterministic seeded corpus shuffle into training shards
# (curate.shuffle_shards): the epoch-0 data-order export step of a
# GPT-3/LLaMA-style training pipeline. The shuffle key is
# md5-lower-64 of f"{doc_id}:{seed}" — the same bytes DuckDB's
# md5_number_lower computes — so shard assignment AND within-shard
# rank have a full SQL oracle.
# ---------------------------------------------------------------------------

def shuffle_shards_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.curate import shuffle_shards

    ds = _read(sf_dir, "documents", ["doc_id"])
    out = shuffle_shards(ds, "doc_id", n_shards=8, seed=42)
    rows = sorted(collect_pylist(out), key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows)


SHUFFLE_SHARDS_SQL = """
WITH k AS (
  SELECT doc_id,
         md5_number_lower(CAST(doc_id AS VARCHAR) || ':42') AS h
  FROM documents
)
SELECT doc_id, CAST(h % 8 AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
            - 1 AS BIGINT) AS pos
FROM k ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Model-agnostic KernelSHAP (explain.kernel_shap_summary) on the
# linear family, where the enumerated Shapley values provably collapse
# to the closed form beta_i*(x_i - mean_bg(x_i)) — giving the
# black-box explainer a FULL value oracle: the SQL refits the OLS from
# sufficient statistics (the linear_shap machinery), takes the same
# deterministic 100/50 smallest-id background/explain prefixes, and
# recomputes mean_abs_shap and the background base value. The engine
# side computes the values by 2^M coalition ENUMERATION through the
# actor-pool stage — so a match certifies the whole KernelSHAP path,
# not just the linear formula.
# ---------------------------------------------------------------------------

def kernel_shap_orders(sf_dir: str) -> pa.Table:
    from tanml_ray.models import ESTIMATORS
    from tanml_ray.pipelines.explain import kernel_shap_summary

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                  "o_totalprice", "o_custkey"])

    def derive(batch: pa.Table) -> pa.Table:
        days = (batch.column("o_orderdate").cast(pa.int64())
                .to_numpy(zero_copy_only=False) // 86_400_000_000)
        return pa.table({
            "id": pc.cast(batch.column("o_orderkey"), pa.int64()),
            "days": pa.array(days.astype(np.float64), type=pa.float64()),
            "custkey": pc.cast(batch.column("o_custkey"), pa.float64()),
            "y": pc.cast(batch.column("o_totalprice"), pa.float64()),
        })

    dds = ds.map_batches(derive, batch_format="pyarrow")
    model = ESTIMATORS.fit("linear_closed_form", dds, ["days", "custkey"], "y")
    return kernel_shap_summary(dds, model, ["days", "custkey"], "id",
                               bg_n=100, test_n=50)


KERNEL_SHAP_SQL = """
WITH p AS (
  SELECT o_orderkey AS id,
         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE) AS x1,
         CAST(o_custkey AS DOUBLE) AS x2,
         CAST(o_totalprice AS DOUBLE) AS y
  FROM orders
), s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x1) AS s1, sum(x2) AS s2,
         sum(y) AS sy, sum(x1*x1) AS s11, sum(x1*x2) AS s12,
         sum(x2*x2) AS s22, sum(x1*y) AS s1y, sum(x2*y) AS s2y
  FROM p
), d AS (
  SELECT *,
         n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det,
         n*(s1y*s22 - s2y*s12) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2) AS det1,
         n*(s11*s2y - s12*s1y) - s1*(s1*s2y - s2*s1y) + sy*(s1*s12 - s11*s2) AS det2
  FROM s
), c AS (
  SELECT det1/det AS b1, det2/det AS b2,
         sy/n - (det1/det)*(s1/n) - (det2/det)*(s2/n) AS b0
  FROM d
), bg AS (
  SELECT x1, x2 FROM p ORDER BY id LIMIT 100
), bgm AS (
  SELECT avg(x1) AS m1, avg(x2) AS m2 FROM bg
), ex AS (
  SELECT x1, x2 FROM p ORDER BY id LIMIT 50
), mad AS (
  SELECT avg(abs(ex.x1 - bgm.m1)) AS mad1,
         avg(abs(ex.x2 - bgm.m2)) AS mad2
  FROM ex, bgm GROUP BY bgm.m1, bgm.m2
)
SELECT feature, mean_abs_shap, base_value FROM (
  SELECT 'days' AS feature, round(abs(c.b1) * mad.mad1, 6) AS mean_abs_shap,
         round(c.b0 + c.b1*bgm.m1 + c.b2*bgm.m2, 6) AS base_value
  FROM c, mad, bgm
  UNION ALL
  SELECT 'custkey', round(abs(c.b2) * mad.mad2, 6),
         round(c.b0 + c.b1*bgm.m1 + c.b2*bgm.m2, 6)
  FROM c, mad, bgm
) ORDER BY mean_abs_shap DESC, feature
"""


# ---------------------------------------------------------------------------
# WARC ingestion end-to-end (sources/warc.py): documents → deterministic
# .warc.gz shards (fixture side, driver, outside the engine) → distributed
# read_warc (one parse task per file) → byte-exact extract_text. The frozen
# extractor invariant extract_text(render_html(t, b)) == t + "\n" + b makes
# the whole parse→HTTP-strip→extract chain SQL-checkable per row. The
# reference has no WARC path (its loaders are tabular,
# /root/reference/tanml/utils/data_loader.py:59-159); this source exists
# because the flagship 10^12-row input is crawl data.
def _warc_fixture_dir(sf_dir: str, shards: int = 8) -> str:
    """Synthesize .warc.gz shards from the documents table once per
    sf_dir. The cache key carries the source file's identity
    (size + mtime_ns, like the IVF-PQ index cache), so a regenerated
    documents table — or another dir sharing a basename — can never
    serve stale shards."""
    import datetime as dt
    import os

    import pyarrow.parquet as pq

    from tanml_ray.functions.html_text import render_html
    from tanml_ray.sources.warc import write_warc

    st = os.stat(f"{sf_dir}/documents.parquet")
    out = (f"/tmp/tanml_warc_{os.path.basename(os.path.normpath(sf_dir))}"
           f"_{st.st_size}_{st.st_mtime_ns}")
    marker = os.path.join(out, "_done")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    base = dt.datetime(2024, 1, 1)
    for s in range(shards):
        rows = [(i, x) for i, x in zip(ids, texts) if i % shards == s]
        pages = pa.table({
            "url": pa.array([f"https://crawl.example.org/{i}"
                             for i, _ in rows]),
            "warc_ts": pa.array([base + dt.timedelta(hours=i % 1000)
                                 for i, _ in rows], type=pa.timestamp("us")),
            "html": pa.array([render_html(f"doc {i}", x) for i, x in rows],
                             type=pa.binary()),
        })
        write_warc(os.path.join(out, f"seg{s}.warc.gz"), pages,
                   gzip_members=True)
    open(marker, "w").close()
    return out


def warc_extract_documents(sf_dir: str):
    """Distributed WARC → pages → extracted text: (url, warc_ts,
    extracted). One gzip-member parse task per shard file; html bytes
    never reach the driver — extraction runs inside map_batches and
    only (url, ts, text) columns flow out."""
    import ray.data as rd

    from tanml_ray.functions.html_text import extract_text_array
    from tanml_ray.sources.warc import read_warc

    d = _warc_fixture_dir(sf_dir)
    ds = read_warc([f"{d}/seg{s}.warc.gz" for s in range(8)])

    def extract(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "extracted": extract_text_array(batch.column("html")),
        })

    return ds.map_batches(extract, batch_format="pyarrow")


WARC_EXTRACT_SQL = r"""
SELECT 'https://crawl.example.org/' || doc_id AS url,
       TIMESTAMP '2024-01-01 00:00:00'
         + to_hours(doc_id % 1000) AS warc_ts,
       'doc ' || doc_id || chr(10) || text AS extracted
FROM documents
"""


# ---------------------------------------------------------------------------
# C4 cleaning heuristics end-to-end (webtext.c4_line_filter). The
# word-soup fixture has no newlines/punctuation, so the rewrap stage
# deterministically builds 12-word lines and injects every rule
# trigger (mirrored verbatim in the SQL): terminal punctuation on 2/3
# of lines, a "javascript " prefix on ~1/11, a "lorem ipsum" line on
# doc_id%97 docs, a "{" line on doc_id%89 docs; the trailing partial
# span exercises the <3-word rule.
def c4_clean_documents(sf_dir: str):
    from tanml_ray.pipelines.webtext import _doc_spans, c4_line_filter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def rewrap(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out = []
        for i, t in zip(ids, batch.column("text").to_pylist()):
            lines = []
            for lidx, ln in enumerate(_doc_spans(t or "", 12)):
                if (i * 7 + lidx) % 11 == 0:
                    ln = "javascript " + ln
                r = (i + lidx) % 3
                if r == 0:
                    ln += "."
                elif r == 1:
                    ln += "!"
                lines.append(ln)
            if i % 97 == 0:
                lines.append("and then lorem ipsum dolor sit amet.")
            if i % 89 == 0:
                lines.append("object config { display none }.")
            out.append("\n".join(lines))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(out, type=pa.string())})

    return c4_line_filter(ds.map_batches(rewrap, batch_format="pyarrow"))


C4_CLEAN_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w,
         generate_subscripts(regexp_extract_all(text, '\S+'), 1) AS ord
  FROM documents WHERE len(regexp_extract_all(text, '\S+')) >= 1
), lines0 AS (
  SELECT doc_id, (ord - 1) // 12 AS lidx,
         string_agg(w, ' ' ORDER BY ord) AS line
  FROM toks GROUP BY doc_id, (ord - 1) // 12
), injected AS (
  SELECT doc_id, lidx,
         CASE WHEN (doc_id * 7 + lidx) % 11 = 0
              THEN 'javascript ' ELSE '' END
         || line
         || CASE ((doc_id + lidx) % 3)
              WHEN 0 THEN '.' WHEN 1 THEN '!' ELSE '' END AS line
  FROM lines0
  UNION ALL
  SELECT doc_id, 1000000 AS lidx,
         'and then lorem ipsum dolor sit amet.' AS line
  FROM documents WHERE doc_id % 97 = 0
  UNION ALL
  SELECT doc_id, 1000001 AS lidx,
         'object config { display none }.' AS line
  FROM documents WHERE doc_id % 89 = 0
), docflag AS (
  SELECT doc_id,
         bool_or(contains(line, '{')
                 OR contains(lower(line), 'lorem ipsum')) AS poisoned,
         count(*) AS n_lines
  FROM injected GROUP BY doc_id
), kept AS (
  SELECT doc_id, lidx, rtrim(line) AS line FROM injected
  WHERE regexp_matches(rtrim(line), '[.!?"]$')
    AND len(regexp_extract_all(line, '\S+')) >= 3
    AND NOT contains(lower(line), 'javascript')
)
SELECT d.doc_id,
       CAST(d.n_lines AS BIGINT) AS n_lines,
       CAST(count(*) AS BIGINT) AS n_kept,
       string_agg(k.line, chr(10) ORDER BY k.lidx) AS clean_text
FROM docflag d JOIN kept k USING (doc_id)
WHERE NOT d.poisoned
GROUP BY d.doc_id, d.n_lines
HAVING count(*) >= 3
"""


# ---------------------------------------------------------------------------
# BPE tokenizer training over the documents corpus (webtext.bpe_train;
# Sennrich 2016). Iterative merge election is not SQL-expressible →
# rows-only driver check; the merge loop is verified against an
# independent naive implementation in tests/test_webtext.py.
def bpe_merges_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.webtext import bpe_train

    return bpe_train(_read(sf_dir, "documents", ["doc_id", "text"]),
                     num_merges=64)


def _bpe_merges_sql(num_merges: int = 64) -> str:
    """Unrolled BPE-train oracle (webtext._bpe_merge_loop): the greedy
    merge loop is deterministic — per round, the (left, right) pair
    maximizing summed occurrence count wins, ties break lexicographically
    (Python tuple order == DuckDB binary collation on UTF-8), and merges
    stop below pair_count 2 — so `num_merges` rounds unroll into chained
    MATERIALIZED CTEs exactly like the PQ/IVF-PQ Lloyd chains (DuckDB
    inlines non-materialized CTEs exponentially). Greedy left-to-right
    non-overlapping application inside a word (the only overlap hazard
    is a run of consecutive match positions, e.g. 'aaaa' under (a,a))
    is expressed per run of consecutive positions: keep alternating
    members starting at the first (pos − run_min even). Words untouched
    by the round's winner pass through via ANTI JOIN instead of being
    rebuilt. Verified token-for-token against bpe_train at sf0.001 /
    0.01 / 0.1 and against _bpe_merge_loop on adversarial toy corpora
    (same-char runs, alternations, multibyte, sub-2 early stop)."""
    parts = [r"""
WITH wc AS MATERIALIZED (
  SELECT t.w AS word, CAST(count(*) AS BIGINT) AS n
  FROM documents, unnest(regexp_extract_all(text, '\S+')) AS t(w)
  WHERE text IS NOT NULL
  GROUP BY 1
), state_0 AS MATERIALIZED (
  SELECT word, list_append(regexp_extract_all(word, '.'), '</w>') AS toks, n
  FROM wc
)"""]
    for k in range(num_merges):
        parts.append(f""", pc_{k} AS MATERIALIZED (
  SELECT u.p[1] AS l, u.p[2] AS r, CAST(sum(n) AS BIGINT) AS cnt
  FROM state_{k}, unnest(list_zip(toks, toks[2:])) AS u(p)
  WHERE u.p[2] IS NOT NULL
  GROUP BY 1, 2
), best_{k} AS MATERIALIZED (
  SELECT l, r, cnt FROM pc_{k} WHERE cnt >= 2
  ORDER BY cnt DESC, l, r LIMIT 1
), pos_{k} AS MATERIALIZED (
  SELECT word, n, generate_subscripts(toks, 1) AS pos, unnest(toks) AS tok
  FROM state_{k}
), m_{k} AS MATERIALIZED (
  SELECT a.word, a.pos
  FROM pos_{k} a
  JOIN pos_{k} b ON b.word = a.word AND b.pos = a.pos + 1
  CROSS JOIN best_{k} s
  WHERE a.tok = s.l AND b.tok = s.r
), sel_{k} AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos,
           pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
    FROM m_{k}) t
  QUALIFY (pos - min(pos) OVER (PARTITION BY word, grp)) % 2 = 0
), chg_{k} AS MATERIALIZED (
  SELECT DISTINCT word FROM sel_{k}
), state_{k + 1} AS MATERIALIZED (
  SELECT p.word,
         list(CASE WHEN s1.pos IS NOT NULL THEN p.tok || nxt.tok
                   ELSE p.tok END ORDER BY p.pos) AS toks,
         min(p.n) AS n
  FROM pos_{k} p
  JOIN chg_{k} c ON c.word = p.word
  LEFT JOIN sel_{k} s1 ON s1.word = p.word AND s1.pos = p.pos
  LEFT JOIN sel_{k} s2 ON s2.word = p.word AND s2.pos = p.pos - 1
  LEFT JOIN pos_{k} nxt ON nxt.word = p.word AND nxt.pos = p.pos + 1
  WHERE s2.pos IS NULL
  GROUP BY p.word
  UNION ALL
  SELECT s.word, s.toks, s.n FROM state_{k} s
  ANTI JOIN chg_{k} c ON s.word = c.word
)""")
    sels = "\nUNION ALL\n".join(
        f'SELECT CAST({k} AS BIGINT) AS rank, l AS "left", r AS "right", '
        f"cnt AS pair_count FROM best_{k}" for k in range(num_merges))
    parts.append(f"\nSELECT * FROM (\n{sels}\n) ORDER BY rank")
    return "".join(parts)


BPE_MERGES_SQL = _bpe_merges_sql()


# ---------------------------------------------------------------------------
# URL blocklist filtering end-to-end (webtext.url_filter; RefinedWeb
# §3.1 methodology). The fixture synthesizes urls from (source, lang,
# doc_id) — same recipe as domain_stats — plus a deterministic
# '/casino' path segment on doc_id%17 docs and an oversized tracking
# tail on doc_id%23 docs, so every rule (domain, keyword, length) and
# the fixed precedence fire. Blocklist + keywords are static literals
# mirrored verbatim in the SQL.
_URL_BLOCKED = frozenset({"src3.de.example.org", "src3.en.example.org",
                          "src3.es.example.org", "src3.fr.example.org",
                          "src3.zh.example.org", "src7.en.example.org"})
_URL_BANNED = ("casino", "tracker=")


def url_filter_documents(sf_dir: str):
    from tanml_ray.pipelines.webtext import url_filter

    ds = _read(sf_dir, "documents", ["doc_id", "source", "lang"])

    def with_url(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        srcs = batch.column("source").to_pylist()
        langs = batch.column("lang").to_pylist()
        urls = []
        for i, s, lg in zip(ids, srcs, langs):
            i = int(i)
            u = f"https://www.{s}.{lg}.example.org/doc/{i}"
            if i % 17 == 0:
                u += "/casino"
            if i % 23 == 0:
                u += "?tracker=" + "x" * 120
            elif i % 29 == 0:
                u += "/" + "p" * 80
            urls.append(u)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "url": pa.array(urls, type=pa.string())})

    return url_filter(ds.map_batches(with_url, batch_format="pyarrow"),
                      blocked_domains=_URL_BLOCKED,
                      banned_substrings=_URL_BANNED, max_len=64)


URL_FILTER_SQL = r"""
WITH pages AS (
  SELECT doc_id,
         'https://www.' || source || '.' || lang || '.example.org/doc/'
         || doc_id
         || CASE WHEN doc_id % 17 = 0 THEN '/casino' ELSE '' END
         || CASE WHEN doc_id % 23 = 0
                 THEN '?tracker=' || repeat('x', 120)
                 WHEN doc_id % 29 = 0 THEN '/' || repeat('p', 80)
                 ELSE '' END AS url,
         source || '.' || lang || '.example.org' AS domain
  FROM documents
)
SELECT doc_id, domain,
       CASE
         WHEN domain IN ('src3.de.example.org', 'src3.en.example.org',
                         'src3.es.example.org', 'src3.fr.example.org',
                         'src3.zh.example.org', 'src7.en.example.org')
           THEN 'domain'
         WHEN contains(url, 'casino') THEN 'keyword'
         WHEN contains(url, 'tracker=') THEN 'keyword'
         WHEN len(url) > 64 THEN 'length'
         ELSE NULL
       END AS reason
FROM pages
"""


# ---------------------------------------------------------------------------
# Overlapping-window chunking (webtext.chunk_documents): window 24,
# stride 16 over the documents table. The SQL oracle reproduces the
# window algebra with a generate_series lateral join on 1-based word
# ordinals: chunk c holds ords in (c*16, c*16 + 24].
def chunk_documents_query(sf_dir: str):
    from tanml_ray.pipelines.webtext import chunk_documents

    return chunk_documents(_read(sf_dir, "documents", ["doc_id", "text"]),
                           window=24, stride=16)


CHUNK_DOCS_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w,
         generate_subscripts(regexp_extract_all(text, '\S+'), 1) AS ord
  FROM documents WHERE len(regexp_extract_all(text, '\S+')) >= 1
), nw AS (
  SELECT doc_id, max(ord) AS n FROM toks GROUP BY doc_id
), cids AS (
  SELECT doc_id, unnest(generate_series(0, (n - 1) // 16)) AS chunk_id
  FROM nw
)
SELECT t.doc_id, c.chunk_id,
       CAST(count(*) AS BIGINT) AS n_words,
       string_agg(t.w, ' ' ORDER BY t.ord) AS chunk_text
FROM cids c JOIN toks t
  ON t.doc_id = c.doc_id
 AND t.ord > c.chunk_id * 16
 AND t.ord <= c.chunk_id * 16 + 24
GROUP BY t.doc_id, c.chunk_id
"""


# Full SQL oracle for the langid heuristic (stages/text.py langid_of):
# the CJK branch, punctuation-stripped lowercase tokens, per-language
# stopword ratios, argmax with lexicographically-largest tie-break, and
# both 'und' branches are mirrored verbatim. Upgrades langid_documents
# from a rows-only driver check to an exact one.
LANGID_SQL = r"""
WITH base AS (
  SELECT doc_id, text, length(text) AS n_chars,
         len(regexp_extract_all(text, '[一-鿿]')) AS n_cjk
  FROM documents
), toks AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           trim(unnest(regexp_extract_all(lower(text), '\S+')),
                '.,;:!?"''()') AS w
    FROM documents
  ) WHERE w <> ''
), counts AS (
  SELECT doc_id, count(*) AS n,
    sum(CASE WHEN w IN ('the','and','of','a','to','in','is','it','that',
                        'for','was','on') THEN 1 ELSE 0 END) AS s_en,
    sum(CASE WHEN w IN ('der','die','das','und','ist','nicht','ein',
                        'eine','zu','den','mit') THEN 1 ELSE 0 END) AS s_de,
    sum(CASE WHEN w IN ('el','la','los','las','de','que','y','en','un',
                        'una','es','por') THEN 1 ELSE 0 END) AS s_es,
    sum(CASE WHEN w IN ('le','la','les','de','et','un','une','est','que',
                        'dans','pour') THEN 1 ELSE 0 END) AS s_fr
  FROM toks GROUP BY doc_id
), scored AS (
  SELECT doc_id, lang, score, row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
  FROM (
    SELECT doc_id, 'en' AS lang, s_en * 1.0 / n AS score FROM counts
    UNION ALL SELECT doc_id, 'de', s_de * 1.0 / n FROM counts
    UNION ALL SELECT doc_id, 'es', s_es * 1.0 / n FROM counts
    UNION ALL SELECT doc_id, 'fr', s_fr * 1.0 / n FROM counts
  )
)
SELECT b.doc_id,
       CASE WHEN b.n_chars = 0 THEN 'und'
            WHEN b.n_cjk > 0 THEN 'zh'
            WHEN s.score IS NULL OR s.score = 0 THEN 'und'
            ELSE s.lang END AS pred_lang,
       CASE WHEN b.n_chars = 0 THEN 0.0
            WHEN b.n_cjk > 0
              THEN least(1.0, b.n_cjk * 1.0 / greatest(b.n_chars, 1) * 2)
            WHEN s.score IS NULL OR s.score = 0 THEN 0.0
            ELSE round(least(1.0, s.score * 3), 6) END AS confidence
FROM base b LEFT JOIN (SELECT * FROM scored WHERE rn = 1) s USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Corpus data card — the one-table corpus composition summary an LLM
# data pipeline publishes per release: per-language doc/token/char
# counts, distinct-content count, and exact-dup rate. One combiner
# pass builds (lang, digest) partials (per-batch pre-dedupe), one
# groupby(lang, dig) collapses duplicates, one bounded groupby(lang)
# finishes — text never shuffles, the digest is a 16-byte blake2b (the
# curate contract), and the dup-rate math is shared IEEE with the SQL.
def corpus_datacard_documents(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.pipelines.curate import _content_digest
    from tanml_ray.pipelines.webtext import _WS_TOKEN_RE

    ds = _read(sf_dir, "documents", ["text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        texts = batch.column("text").to_pylist()
        agg: dict[tuple[str, bytes], list[int]] = {}
        for lg, t in zip(langs, texts):
            t = t or ""
            k = (lg, _content_digest(t))
            e = agg.setdefault(k, [0, 0, 0])
            e[0] += 1
            e[1] += len(_WS_TOKEN_RE.findall(t))
            e[2] += len(t)
        ks = list(agg.keys())
        return pa.table({
            "lang": pa.array([k[0] for k in ks], type=pa.string()),
            "dig": pa.array([k[1] for k in ks], type=pa.binary(16)),
            "n": pa.array([agg[k][0] for k in ks], type=pa.int64()),
            "toks": pa.array([agg[k][1] for k in ks], type=pa.int64()),
            "chars": pa.array([agg[k][2] for k in ks], type=pa.int64())})

    per_dig = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["lang", "dig"])
               .aggregate(Sum("n", alias_name="n"),
                          Sum("toks", alias_name="toks"),
                          Sum("chars", alias_name="chars")))

    def lang_partial(batch: pa.Table) -> pa.Table:
        df = batch.group_by("lang").aggregate(
            [("n", "sum"), ("toks", "sum"), ("chars", "sum"),
             ("dig", "count")])
        return pa.table({
            "lang": df.column("lang"),
            "n_docs": df.column("n_sum"),
            "n_tokens": df.column("toks_sum"),
            "n_chars": df.column("chars_sum"),
            "n_distinct": df.column("dig_count")})

    rows = collect_pylist(
        per_dig.map_batches(lang_partial, batch_format="pyarrow")
        .groupby("lang").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_chars", alias_name="n_chars"),
            Sum("n_distinct", alias_name="n_distinct")))
    rows.sort(key=lambda r: r["lang"])
    return pa.table({
        "lang": pa.array([r["lang"] for r in rows], type=pa.string()),
        "n_docs": pa.array([r["n_docs"] for r in rows], type=pa.int64()),
        "n_tokens": pa.array([r["n_tokens"] for r in rows],
                             type=pa.int64()),
        "n_chars": pa.array([r["n_chars"] for r in rows], type=pa.int64()),
        "n_distinct": pa.array([r["n_distinct"] for r in rows],
                               type=pa.int64()),
        "dup_rate": pa.array(
            [round(1.0 - r["n_distinct"] / r["n_docs"], 6) for r in rows],
            type=pa.float64())})


CORPUS_DATACARD_SQL = r"""
-- coalesce(text,'') mirrors the engine's (t or "") digesting: null-text
-- docs count toward n_docs/n_chars/n_tokens and share the empty-string
-- digest, on BOTH sides (a bare count(DISTINCT md5(text)) would drop
-- nulls and diverge on any corpus with null text)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(regexp_extract_all(coalesce(text, ''), '\S+'))) AS BIGINT)
         AS n_tokens,
       CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS n_chars,
       CAST(count(DISTINCT md5(coalesce(text, ''))) AS BIGINT) AS n_distinct,
       round(1.0 - count(DISTINCT md5(coalesce(text, ''))) * 1.0 / count(*), 6)
         AS dup_rate
FROM documents
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Unicode-script profile per language — the multilingual-curation
# companion to langid: for each lang, the fraction of codepoints in
# Latin / digit / Cyrillic / CJK / whitespace classes. Catches
# mislabeled corpora (a "ru" shard that is 90% Latin) and
# transliteration artifacts before they poison language-balanced
# training mixes. Vectorized: each batch concatenates its texts once
# per lang, decodes to a uint32 codepoint array via UTF-32, and counts
# the classes with boolean range masks — no per-character Python. The
# shuffle ships six int64 counters per (block, lang); fractions are a
# driver-side divide over the ≤|langs| totals. Reference analog: the
# per-column categorical profile (profiling.py:85-102) applied to
# character classes. Full SQL oracle (RE2 class counts in DuckDB).
# ---------------------------------------------------------------------------

_WS_CODES = np.array([9, 10, 11, 12, 13, 32], dtype=np.uint32)


def script_profile_documents(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        texts = batch.column("text").to_pylist()
        by: dict[str, list[str]] = {}
        for lg, t in zip(langs, texts):
            by.setdefault(lg, []).append(t or "")
        rows = []
        for lg, ts in by.items():
            cp = np.frombuffer("".join(ts).encode("utf-32-le"),
                               dtype=np.uint32)
            rows.append({
                "lang": lg, "n_docs": len(ts), "chars": int(cp.size),
                "latin": int((((cp >= 65) & (cp <= 90))
                              | ((cp >= 97) & (cp <= 122))).sum()),
                "digit": int(((cp >= 48) & (cp <= 57)).sum()),
                "cyrillic": int(((cp >= 0x0400) & (cp <= 0x04FF)).sum()),
                "cjk": int(((cp >= 0x4E00) & (cp <= 0x9FFF)).sum()),
                "ws": int(np.isin(cp, _WS_CODES).sum())})
        schema = pa.schema([("lang", pa.string())]
                           + [(c, pa.int64()) for c in
                              ("n_docs", "chars", "latin", "digit",
                               "cyrillic", "cjk", "ws")])
        return pa.Table.from_pylist(rows, schema=schema)

    rows = collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("chars", alias_name="chars"),
            Sum("latin", alias_name="latin"),
            Sum("digit", alias_name="digit"),
            Sum("cyrillic", alias_name="cyrillic"),
            Sum("cjk", alias_name="cjk"),
            Sum("ws", alias_name="ws")))
    rows.sort(key=lambda r: r["lang"])
    return pa.table({
        "lang": pa.array([r["lang"] for r in rows], type=pa.string()),
        "n_docs": pa.array([r["n_docs"] for r in rows], type=pa.int64()),
        "chars": pa.array([r["chars"] for r in rows], type=pa.int64()),
        "latin_frac": pa.array(
            [_round6(r["latin"] / r["chars"]) for r in rows]),
        "digit_frac": pa.array(
            [_round6(r["digit"] / r["chars"]) for r in rows]),
        "cyrillic_frac": pa.array(
            [_round6(r["cyrillic"] / r["chars"]) for r in rows]),
        "cjk_frac": pa.array(
            [_round6(r["cjk"] / r["chars"]) for r in rows]),
        "ws_frac": pa.array(
            [_round6(r["ws"] / r["chars"]) for r in rows])})


SCRIPT_PROFILE_SQL = r"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS chars,
       round(sum(length(text) - length(regexp_replace(
           text, '[A-Za-z]', '', 'g')))
         / CAST(sum(length(text)) AS DOUBLE), 6) AS latin_frac,
       round(sum(length(text) - length(regexp_replace(
           text, '[0-9]', '', 'g')))
         / CAST(sum(length(text)) AS DOUBLE), 6) AS digit_frac,
       round(sum(length(text) - length(regexp_replace(
           text, '[\x{0400}-\x{04FF}]', '', 'g')))
         / CAST(sum(length(text)) AS DOUBLE), 6) AS cyrillic_frac,
       round(sum(length(text) - length(regexp_replace(
           text, '[\x{4E00}-\x{9FFF}]', '', 'g')))
         / CAST(sum(length(text)) AS DOUBLE), 6) AS cjk_frac,
       round(sum(length(text) - length(regexp_replace(
           text, '[ \t\n\r\f\v]', '', 'g')))
         / CAST(sum(length(text)) AS DOUBLE), 6) AS ws_frac
FROM documents
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Concat-and-chunk sequence-packing accounting — the GPT-style
# pretraining prep step: all documents form one global token stream in
# doc_id order, sliced into fixed context windows of C tokens; each doc
# reports its stream offset, its first window, and how many windows it
# spans (boundary-crossing docs are the ones a packer truncates or
# masks across). Distinct from chunk_documents (per-doc overlapping
# windows): the offset here is a GLOBAL running sum. Two bounded
# passes: (1) per-doc token counts combine into ≤`parts` doc_id-range
# bucket totals (combiner-first groupby; the driver walk is over the
# bucket series, never rows), (2) groupby(bucket).map_groups computes
# the in-bucket prefix with the bucket's broadcast base offset. Scale
# assumption (documented): one bucket's docs fit a worker — `parts`
# tunes it, and a two-level bucket prefix is the 10^12-doc extension.
# Full window-SQL oracle (SUM OVER ORDER BY).
# ---------------------------------------------------------------------------

def pack_windows_documents(sf_dir: str, context: int = 512,
                           parts: int = 64) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.pipelines.webtext import _WS_TOKEN_RE

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    width = int(ds.max("doc_id")) // parts + 1

    def tok(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        n = np.fromiter((len(_WS_TOKEN_RE.findall(t)) if t else 0
                         for t in texts), np.int64, len(texts))
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "n": pa.array(n),
                         "g": pa.array(ids // width, type=pa.int64())})

    toks = ds.map_batches(tok, batch_format="pyarrow")
    btot = {int(r["g"]): int(r["n"]) for r in collect_pylist(
        toks.groupby("g").aggregate(Sum("n", alias_name="n")))}
    base, run = {}, 0
    for g in sorted(btot):          # ≤ parts entries: driver-bounded
        base[g] = run
        run += btot[g]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id")
        n = df["n"].to_numpy(dtype=np.int64)
        start = (np.concatenate(([0], np.cumsum(n)[:-1]))
                 + base[int(df["g"].iloc[0])])
        first = start // context
        last = np.where(n > 0, (start + np.maximum(n, 1) - 1) // context,
                        first)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
            "n_tokens": n, "start_tok": start, "first_window": first,
            "n_windows": np.where(n > 0, last - first + 1, 0)})

    rows = sorted(collect_pylist(toks.groupby("g").map_groups(
        per_bucket, batch_format="pandas")), key=lambda r: r["doc_id"])
    return pa.table({
        c: pa.array([r[c] for r in rows], type=pa.int64())
        for c in ("doc_id", "n_tokens", "start_tok", "first_window",
                  "n_windows")})


PACK_WINDOWS_SQL = r"""
WITH toks AS (
  SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n
  FROM documents),
cum AS (
  SELECT doc_id, n,
         coalesce(sum(n) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
  FROM toks)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       CAST(st AS BIGINT) AS start_tok,
       CAST(st // 512 AS BIGINT) AS first_window,
       CAST(CASE WHEN n = 0 THEN 0
                 ELSE (st + n - 1) // 512 - st // 512 + 1 END AS BIGINT)
         AS n_windows
FROM cum ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Multimodal near-dup suite over REAL interchange formats (stdlib
# codec tier, stages/codecs.py): deterministic doc_id-seeded binary
# columns — cross-format planted duplicate pairs (same pixels as BMP
# for even ids, PGM for odd; PCM WAV audio; uncompressed-DIB AVI
# video) — run through the actor-pool decode→fingerprint→coarse-bucket
# pipelines (stages/multimodal.py). Decode + pHash/fingerprint are not
# SQL-expressible → rows-only driver checks; the expected pair sets
# ((4k, 4k+1) exactly) and codec round-trips are pytest contracts
# (tests/test_codecs.py, tests/test_multimodal_sources.py). Fixture
# sizes are bounded (first N doc_ids) so the gate stays fast; the
# pipelines themselves are the 100-TB path (per-actor decode state,
# small batches, bucketed fingerprint shuffle — no driver decode).
# ---------------------------------------------------------------------------

def _mm_pattern(key: int, h: int = 32, w: int = 32) -> np.ndarray:
    """Deterministic 8-bit gradient pattern for pattern id `key`."""
    a, b, c = 3 + key % 11, 5 + key % 7, (17 * key) % 251
    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    return ((a * i + b * j + c) % 256).astype(np.uint8)


def _mm_pair_key(doc_id: int) -> int:
    """Plant pairs (4k, 4k+1): both share pattern 4k+1; 4k+2 and 4k+3
    stay unique."""
    return doc_id + 1 if doc_id % 4 == 0 else doc_id


def image_near_dup_multimodal(sf_dir: str) -> pa.Table:
    from tanml_ray.stages.codecs import encode_bmp_gray, encode_pgm
    from tanml_ray.stages.multimodal import image_near_dups

    ds = _read(sf_dir, "documents", ["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = [int(x) for x in
               batch.column("doc_id").to_numpy(zero_copy_only=False)
               if x <= 120]
        blobs = []
        for d in ids:
            px = _mm_pattern(_mm_pair_key(d))
            blobs.append(encode_bmp_gray(px) if d % 2 == 0
                         else encode_pgm(px))
        return pa.table({"id": pa.array(ids, type=pa.int64()),
                         "image": pa.array(blobs, type=pa.binary())})

    return image_near_dups(ds.map_batches(synth, batch_format="pyarrow"),
                           max_hamming=0)


def audio_near_dup_multimodal(sf_dir: str) -> pa.Table:
    from tanml_ray.stages.codecs import encode_wav_pcm16
    from tanml_ray.stages.multimodal import audio_near_dups

    ds = _read(sf_dir, "documents", ["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = [int(x) for x in
               batch.column("doc_id").to_numpy(zero_copy_only=False)
               if x <= 60]
        blobs = []
        n = 65536
        t = np.arange(n) / 16000.0
        frame_idx = np.arange(n) // 1024         # 64 fingerprint frames
        for d in ids:
            k = _mm_pair_key(d)
            # key-dependent per-frame energy ENVELOPE — the
            # fingerprint is the sign pattern of frame-energy deltas,
            # so the envelope (not the carrier) must carry the key
            env = 0.55 + 0.45 * np.sin(1.7 * (k + 1) * frame_idx + k)
            wave = np.sin(2 * np.pi * (220 + 13 * (k % 40)) * t) * env
            blobs.append(encode_wav_pcm16(
                np.rint(wave * 28000).astype(np.int16)))
        return pa.table({"id": pa.array(ids, type=pa.int64()),
                         "audio": pa.array(blobs, type=pa.binary())})

    return audio_near_dups(ds.map_batches(synth, batch_format="pyarrow"),
                           max_hamming=0)


def video_near_dup_multimodal(sf_dir: str) -> pa.Table:
    from tanml_ray.stages.codecs import encode_avi_gray
    from tanml_ray.stages.multimodal import video_near_dups

    ds = _read(sf_dir, "documents", ["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = [int(x) for x in
               batch.column("doc_id").to_numpy(zero_copy_only=False)
               if x <= 40]
        blobs = []
        for d in ids:
            k = _mm_pair_key(d)
            frames = np.stack([np.roll(_mm_pattern(k), f, axis=1)
                               for f in range(12)])
            blobs.append(encode_avi_gray(frames))
        return pa.table({"id": pa.array(ids, type=pa.int64()),
                         "video": pa.array(blobs, type=pa.binary())})

    return video_near_dups(ds.map_batches(synth, batch_format="pyarrow"),
                           max_hamming=0, every_k=3)


# ---------------------------------------------------------------------------
# Distributed PCA projection (mlops.pca_project) with a FULL closed-form
# SQL oracle on a 2-component slice: the covariance pass accumulates
# EXACT integer sufficient statistics of the 2^16-grid-quantized
# components (bit-identical between engine and SQL — float32→double is
# exact, ×65536 is a power-of-two multiply, floor matches on both
# sides), and a 2×2 symmetric eigenproblem has the closed form
# λ = (tr ± sqrt((a−c)² + 4b²))/2 with eigenvector (b, λ−a), so the
# whole fit — covariance → eigenvectors → sign-fix → projection — is
# SQL-expressible. numpy eigh and the closed form agree to ~1 ulp;
# round-6 output absorbs it. The 64-dim path (driver eigh of the d×d
# matrix) is the same operator with the same suffstats pass and stays
# pytest-covered (test_pca_project_orders_variance).
# Reference analog: dimensionality reduction ahead of model fits /
# embedding near-dup; the reference has no PCA (builder's-brief
# addition for training-data pipelines).
# ---------------------------------------------------------------------------

def pca_project_embeddings(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import pca_project

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def slice2(batch: pa.Table) -> pa.Table:
        v = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "v2": pa.array([row.tolist() for row in v[:, :2]],
                           type=pa.list_(pa.float64()))})

    out = pca_project(ds.map_batches(slice2, batch_format="pyarrow"),
                      n_components=2, vec_col="v2", id_col="vec_id")

    def unpack(batch: pa.Table) -> pa.Table:
        p = np.stack(batch.column("pc").to_pylist())
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "pc1": pa.array(np.round(p[:, 0], 6), type=pa.float64()),
            "pc2": pa.array(np.round(p[:, 1], 6), type=pa.float64())})

    from tanml_ray.functions.collect import collect_table

    return collect_table(out.map_batches(unpack, batch_format="pyarrow"))


PCA_PROJECT_SQL = """
WITH p AS MATERIALIZED (
  SELECT vec_id,
         CAST(embedding[1] AS DOUBLE) AS v0,
         CAST(embedding[2] AS DOUBLE) AS v1
  FROM embeddings
), q AS MATERIALIZED (
  SELECT vec_id, v0, v1,
         CAST(floor(v0 * 65536.0) AS BIGINT) AS x0,
         CAST(floor(v1 * 65536.0) AS BIGINT) AS x1
  FROM p
), s AS MATERIALIZED (
  SELECT count(*) AS n,
         sum(CAST(x0 AS HUGEINT)) AS s0, sum(CAST(x1 AS HUGEINT)) AS s1,
         sum(CAST(x0 AS HUGEINT) * x0) AS g00,
         sum(CAST(x0 AS HUGEINT) * x1) AS g01,
         sum(CAST(x1 AS HUGEINT) * x1) AS g11
  FROM q
), cov AS MATERIALIZED (
  -- mirrors embedding_covariance: (float(g) - float(s_i)*float(s_j)/n)
  -- / (n-1) / (grid*grid), evaluated in doubles in the same order
  SELECT ((CAST(g00 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / n)
            / (n - 1)) / (65536.0 * 65536.0) AS a,
         ((CAST(g01 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
            / (n - 1)) / (65536.0 * 65536.0) AS b,
         ((CAST(g11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
            / (n - 1)) / (65536.0 * 65536.0) AS c
  FROM s
), eig AS MATERIALIZED (
  SELECT a, b, c,
         (a + c + sqrt((a - c) * (a - c) + 4.0 * b * b)) / 2.0 AS l1,
         (a + c - sqrt((a - c) * (a - c) + 4.0 * b * b)) / 2.0 AS l2
  FROM cov
), vecs AS MATERIALIZED (
  -- eigenvector (b, λ−a) (b ≠ 0 on these fixtures), normalized, then
  -- sign-fixed: the largest-|loading| coordinate made positive
  -- (ties → the FIRST coordinate, matching np.argmax)
  SELECT
    CASE WHEN (CASE WHEN abs(b / n1) >= abs((l1 - a) / n1)
                    THEN b / n1 ELSE (l1 - a) / n1 END) < 0
         THEN -b / n1 ELSE b / n1 END AS c10,
    CASE WHEN (CASE WHEN abs(b / n1) >= abs((l1 - a) / n1)
                    THEN b / n1 ELSE (l1 - a) / n1 END) < 0
         THEN -(l1 - a) / n1 ELSE (l1 - a) / n1 END AS c11,
    CASE WHEN (CASE WHEN abs(b / n2) >= abs((l2 - a) / n2)
                    THEN b / n2 ELSE (l2 - a) / n2 END) < 0
         THEN -b / n2 ELSE b / n2 END AS c20,
    CASE WHEN (CASE WHEN abs(b / n2) >= abs((l2 - a) / n2)
                    THEN b / n2 ELSE (l2 - a) / n2 END) < 0
         THEN -(l2 - a) / n2 ELSE (l2 - a) / n2 END AS c21
  FROM (SELECT a, b, l1, l2,
               sqrt(b * b + (l1 - a) * (l1 - a)) AS n1,
               sqrt(b * b + (l2 - a) * (l2 - a)) AS n2
        FROM eig)
)
SELECT q.vec_id,
       round(q.v0 * v.c10 + q.v1 * v.c11, 6) AS pc1,
       round(q.v0 * v.c20 + q.v1 * v.c21, 6) AS pc2
FROM q, vecs v
ORDER BY q.vec_id
"""


# ---------------------------------------------------------------------------
# Two-step-Newton Poisson GLM (mlops.poisson_fit capped at 2
# iterations) — the SQL-anchorable slice of the count-response GLM
# family: at beta=0 every mu is exp(0)=1 and W=I, so step 1 has the
# closed form (XtX)^-1 Xt(y-1) (Cramer 3x3, the OLS oracle shape), and
# step 2 unrolls with per-row exp(eta) exactly like the fixed-step
# logistic CV oracle. The engine runs the REAL streaming _poisson_pass
# machinery, so a match certifies the Poisson gradient/information
# accumulation end-to-end; the converged fit (poisson_newton estimator
# family, models.py) has no closed form and stays pytest-covered.
# ---------------------------------------------------------------------------

def poisson_step_lineitem(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import poisson_fit

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_discount", "l_tax"])

    def derive(batch: pa.Table) -> pa.Table:
        return pa.table({
            "x1": pc.multiply(pc.cast(batch.column("l_discount"),
                                      pa.float64()), 10.0),
            "x2": pc.multiply(pc.cast(batch.column("l_tax"),
                                      pa.float64()), 10.0),
            "y": pc.cast(batch.column("l_quantity"), pa.float64()),
        })

    fit = poisson_fit(ds.map_batches(derive, batch_format="pyarrow"),
                      ["x1", "x2"], "y", max_iter=2)
    return pa.Table.from_pylist([
        {"feature": "intercept", "coef_step2": _round6(fit["intercept"])},
        {"feature": "x1", "coef_step2": _round6(fit["coef"][0])},
        {"feature": "x2", "coef_step2": _round6(fit["coef"][1])},
    ])


POISSON_STEP_SQL = """
WITH p AS MATERIALIZED (
  SELECT CAST(l_quantity AS DOUBLE) AS y,
         CAST(l_discount AS DOUBLE) * 10.0 AS x1,
         CAST(l_tax AS DOUBLE) * 10.0 AS x2
  FROM lineitem
), s AS MATERIALIZED (
  -- step 1 at beta=0: mu=1, W=I -> delta = (XtX)^-1 Xt(y-1)
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x1) AS s1, sum(x2) AS s2,
         sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
         sum(y - 1) AS g0, sum(x1*(y - 1)) AS g1, sum(x2*(y - 1)) AS g2
  FROM p
), b1 AS MATERIALIZED (
  SELECT (g0*(s11*s22 - s12*s12) - s1*(g1*s22 - s12*g2)
            + s2*(g1*s12 - s11*g2)) / det AS b0,
         (n*(g1*s22 - g2*s12) - g0*(s1*s22 - s12*s2)
            + s2*(s1*g2 - g1*s2)) / det AS bx1,
         (n*(s11*g2 - s12*g1) - s1*(s1*g2 - s2*g1)
            + g0*(s1*s12 - s11*s2)) / det AS bx2
  FROM (SELECT s.*,
               n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
                 + s2*(s1*s12 - s11*s2) AS det
        FROM s)
), m AS MATERIALIZED (
  -- step 2: mu = exp(X beta1), W = diag(mu)
  SELECT p.y, p.x1, p.x2,
         exp(b1.b0 + b1.bx1 * p.x1 + b1.bx2 * p.x2) AS mu
  FROM p, b1
), h AS MATERIALIZED (
  SELECT sum(mu) AS h00, sum(mu*x1) AS h01, sum(mu*x2) AS h02,
         sum(mu*x1*x1) AS h11, sum(mu*x1*x2) AS h12,
         sum(mu*x2*x2) AS h22,
         sum(y - mu) AS g0, sum(x1*(y - mu)) AS g1,
         sum(x2*(y - mu)) AS g2
  FROM m
), d2 AS MATERIALIZED (
  SELECT h.*,
         h00*(h11*h22 - h12*h12) - h01*(h01*h22 - h12*h02)
           + h02*(h01*h12 - h11*h02) AS det,
         g0*(h11*h22 - h12*h12) - h01*(g1*h22 - h12*g2)
           + h02*(g1*h12 - h11*g2) AS det0,
         h00*(g1*h22 - g2*h12) - g0*(h01*h22 - h12*h02)
           + h02*(h01*g2 - g1*h02) AS det1,
         h00*(h11*g2 - h12*g1) - h01*(h01*g2 - h02*g1)
           + g0*(h01*h12 - h11*h02) AS det2
  FROM h
)
SELECT feature, coef_step2 FROM (
  SELECT 'intercept' AS feature,
         round(b1.b0 + d2.det0 / d2.det, 6) AS coef_step2
  FROM b1, d2
  UNION ALL SELECT 'x1', round(b1.bx1 + d2.det1 / d2.det, 6)
  FROM b1, d2
  UNION ALL SELECT 'x2', round(b1.bx2 + d2.det2 / d2.det, 6)
  FROM b1, d2
)
"""


# ---------------------------------------------------------------------------
# Fixed-step Wald inference (2 Newton iterations + the Fisher
# information at the resulting beta) — the SQL-anchorable slice of
# logistic_inference (mlops.py:601): the engine runs the REAL
# logistic_fit(with_information=True) machinery capped at 2 steps, so
# a match certifies the whole inference chain end-to-end — IRLS
# gradient/information accumulation, the extra information pass at the
# final beta, and the Wald algebra se_i = sqrt((H^-1)_ii), z = beta/se,
# OR = exp(beta). The 3x3 inverse diagonal is Cramer-expressible
# (cofactor/det of the symmetric normal matrix); p-values are omitted
# here (DuckDB has no erf/erfc) and stay on the converged rows-only
# representative logistic_inference_orders.
# ---------------------------------------------------------------------------

def logistic_wald_step_orders(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.mlops import logistic_fit

    fit = logistic_fit(_orders_logistic_features(sf_dir),
                       ["x1", "x2"], "label", max_iter=2,
                       with_information=True)
    beta = np.concatenate([[fit["intercept"]], np.asarray(fit["coef"])])
    cov = np.linalg.inv(fit["information"])
    se = np.sqrt(np.maximum(np.diag(cov), 0.0))
    z = beta / se
    return pa.table({
        "feature": pa.array(["(intercept)", "x1", "x2"], type=pa.string()),
        "coef_step2": pa.array(np.round(beta, 6), type=pa.float64()),
        "std_err": pa.array(np.round(se, 6), type=pa.float64()),
        "z": pa.array(np.round(z, 6), type=pa.float64()),
        "odds_ratio": pa.array(np.round(np.exp(beta), 6),
                               type=pa.float64()),
    })


LOGISTIC_WALD_STEP_SQL = """
WITH feat AS MATERIALIZED (
  SELECT CAST(datediff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS DOUBLE) / 1000.0 AS x1,
         CAST(o_totalprice AS DOUBLE) / 100000.0 AS x2,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), s1 AS MATERIALIZED (
  SELECT CAST(count(*) AS DOUBLE) AS a, sum(x1) AS b, sum(x2) AS c,
         sum(x1*x1) AS d, sum(x1*x2) AS e, sum(x2*x2) AS f,
         sum(y - 0.5) AS g0, sum(x1*(y - 0.5)) AS g1,
         sum(x2*(y - 0.5)) AS g2
  FROM feat
), b1 AS MATERIALIZED (
  SELECT 4 * (g0*(d*f - e*e) - b*(g1*f - e*g2) + c*(g1*e - d*g2))
           / (a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c)) AS c0,
         4 * (a*(g1*f - g2*e) - g0*(b*f - e*c) + c*(b*g2 - g1*c))
           / (a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c)) AS c1,
         4 * (a*(d*g2 - g1*e) - b*(b*g2 - g1*c) + g0*(b*e - d*c))
           / (a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c)) AS c2
  FROM s1
), m AS MATERIALIZED (
  SELECT x1, x2, y,
         1.0 / (1.0 + exp(-(c0 + c1*x1 + c2*x2))) AS mu
  FROM feat, b1
), s2 AS MATERIALIZED (
  SELECT sum(mu*(1-mu)) AS a, sum(mu*(1-mu)*x1) AS b,
         sum(mu*(1-mu)*x2) AS c, sum(mu*(1-mu)*x1*x1) AS d,
         sum(mu*(1-mu)*x1*x2) AS e, sum(mu*(1-mu)*x2*x2) AS f,
         sum(y - mu) AS g0, sum(x1*(y - mu)) AS g1,
         sum(x2*(y - mu)) AS g2
  FROM m
), b2 AS MATERIALIZED (
  SELECT b1.c0 + (g0*(d*f - e*e) - b*(g1*f - e*g2) + c*(g1*e - d*g2))
           / (a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c)) AS c0,
         b1.c1 + (a*(g1*f - g2*e) - g0*(b*f - e*c) + c*(b*g2 - g1*c))
           / (a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c)) AS c1,
         b1.c2 + (a*(d*g2 - g1*e) - b*(b*g2 - g1*c) + g0*(b*e - d*c))
           / (a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c)) AS c2
  FROM s2, b1
), mi AS MATERIALIZED (
  -- the extra information pass at the FINAL beta (logistic_fit
  -- with_information=True): W = mu2(1-mu2)
  SELECT 1.0 / (1.0 + exp(-(c0 + c1*x1 + c2*x2))) AS mu, x1, x2
  FROM feat, b2
), h AS MATERIALIZED (
  SELECT sum(mu*(1-mu)) AS a, sum(mu*(1-mu)*x1) AS b,
         sum(mu*(1-mu)*x2) AS c, sum(mu*(1-mu)*x1*x1) AS d,
         sum(mu*(1-mu)*x1*x2) AS e, sum(mu*(1-mu)*x2*x2) AS f
  FROM mi
), w AS MATERIALIZED (
  -- Wald SEs: sqrt of the symmetric-cofactor diagonal of H^-1
  SELECT sqrt((d*f - e*e) / det) AS se0,
         sqrt((a*f - c*c) / det) AS se1,
         sqrt((a*d - b*b) / det) AS se2
  FROM (SELECT h.*,
               a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c) AS det
        FROM h)
)
SELECT feature, coef_step2, std_err, z, odds_ratio FROM (
  SELECT '(intercept)' AS feature, round(b2.c0, 6) AS coef_step2,
         round(w.se0, 6) AS std_err, round(b2.c0 / w.se0, 6) AS z,
         round(exp(b2.c0), 6) AS odds_ratio
  FROM b2, w
  UNION ALL
  SELECT 'x1', round(b2.c1, 6), round(w.se1, 6),
         round(b2.c1 / w.se1, 6), round(exp(b2.c1), 6) FROM b2, w
  UNION ALL
  SELECT 'x2', round(b2.c2, 6), round(w.se2, 6),
         round(b2.c2 / w.se2, 6), round(exp(b2.c2), 6) FROM b2, w
)
"""


# ---------------------------------------------------------------------------
# Interval-lookup join (§2.4 addition): count/revenue of events falling
# inside 20 derived half-open time windows. The window table is SMALL
# (20 rows, derived from one global min/max aggregate) so the join is a
# broadcast interval lookup — np.searchsorted against the window edges
# inside every map_batches task — never an all-to-all non-equi shuffle.
# All arithmetic is integer (epoch-us, cents) so the SQL oracle is
# bit-identical. Partitioning assumption: none — any block layout works;
# the single shuffle moves 20-row (window, partial) tables.
# ---------------------------------------------------------------------------

_N_WINDOWS = 20


def interval_window_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", ["ts", "value"])

    def to_us(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64())
        return pa.table({"us": us, "value": batch.column("value")})

    us_ds = ds.map_batches(to_us, batch_format="pyarrow")
    # One tiny global aggregate derives the window table (20 rows).
    b = us_ds.aggregate(Min("us"), Max("us"))
    mn, mx = int(b["min(us)"]), int(b["max(us)"])
    span = mx - mn + 1
    starts = np.array([mn + (k * span) // _N_WINDOWS
                       for k in range(_N_WINDOWS)], dtype=np.int64)
    width = span // (2 * _N_WINDOWS)

    def partial(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        # window k contains ts iff starts[k] <= us < starts[k] + width
        k = np.searchsorted(starts, us, side="right") - 1
        inside = (k >= 0) & (us < starts[np.clip(k, 0, None)] + width)
        df = pd.DataFrame({"window_id": k[inside], "n": 1,
                           "cents": cents[inside]})
        return (df.groupby("window_id", as_index=False)
                .agg(n=("n", "sum"), cents=("cents", "sum")))

    agg = (_read(sf_dir, "events", ["ts", "value"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("window_id")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("cents", alias_name="cents")))
    got = {int(r["window_id"]): (int(r["n"]), int(r["cents"]))
           for r in collect_pylist(agg)}
    return pa.Table.from_pylist([
        {"window_id": k,
         "window_start": pd.Timestamp(int(starts[k]), unit="us"),
         "n": got.get(k, (0, 0))[0],
         "revenue": _round6(got.get(k, (0, 0))[1] / 100.0)}
        for k in range(_N_WINDOWS)])


INTERVAL_WINDOW_SQL = """
WITH b AS (
  SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) - min(epoch_us(ts)) + 1 AS span
  FROM events
), w AS (
  SELECT CAST(i AS BIGINT) AS window_id,
         mn + (i * span) // 20 AS ws, span // 40 AS width
  FROM b CROSS JOIN range(0, 20) t(i)
), e AS (
  SELECT epoch_us(ts) AS us, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT w.window_id, make_timestamp(w.ws) AS window_start,
       CAST(count(e.us) AS BIGINT) AS n,
       round(COALESCE(sum(e.cents), 0) / 100.0, 6) AS revenue
FROM w LEFT JOIN e ON e.us >= w.ws AND e.us < w.ws + w.width
GROUP BY w.window_id, w.ws ORDER BY w.window_id
"""


# ---------------------------------------------------------------------------
# Band (range) self-join (§2.4 addition): pairs of events by the SAME
# user within a 60-second band (0 < Δts ≤ 60s), counted per
# (earlier_type, later_type). The non-equi join never materializes
# pairs across tasks: rows shuffle ONCE by coarse hash(user)%P, each
# partition sorts by (user, ts) and enumerates band windows with a
# monotonic composite key + searchsorted (the key offset exceeds the
# global ts span, so a window can never leak into the next user's
# segment), and only (type_a, type_b, count) partials leave the task.
# Skew note: per-task work is Σ window occupancy, bounded by band
# width × per-user event rate — salt the user key if one user carries
# a pathological event density.
# ---------------------------------------------------------------------------

_BAND_US = 60 * 1_000_000


def band_join_pairs_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Max, Min, Sum

    from tanml_ray.stages.shuffle import with_coarse_partition

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def to_cols(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "us": batch.column("ts").cast(pa.int64()),
            "event_type": batch.column("event_type")})

    cols = ds.map_batches(to_cols, batch_format="pyarrow")
    b = cols.aggregate(Min("us"), Max("us"))
    offset = np.int64(int(b["max(us)"]) - int(b["min(us)"]) + _BAND_US + 1)

    empty = pa.table({"type_a": pa.array([], type=pa.string()),
                      "type_b": pa.array([], type=pa.string()),
                      "n": pa.array([], type=pa.int64())})

    def pairs_of_partition(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return empty
        g = g.sort_values(["user_id", "us"], kind="mergesort")
        us = g["us"].to_numpy(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        # dense per-partition user rank -> strictly monotonic composite key
        urank = pd.factorize(uid, sort=True)[0].astype(np.int64)
        if (int(urank[-1]) + 1) * int(offset) + int(us.max()) >= 2 ** 63:
            # composite key would overflow int64: raise P (auto_partitions
            # already scales with input) so fewer users share a partition
            raise ValueError(
                "band join composite key overflows int64; "
                "increase the coarse partition count")
        key = urank * offset + us
        lo = np.searchsorted(key, key, side="right")       # strictly later
        hi = np.searchsorted(key, key + _BAND_US, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if not total:
            return empty
        rep_i = np.repeat(np.arange(len(us)), cnt)
        offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        idx_j = np.repeat(lo, cnt) + offs
        df = pd.DataFrame({"type_a": et[rep_i], "type_b": et[idx_j], "n": 1})
        out = df.groupby(["type_a", "type_b"], as_index=False).agg(
            n=("n", "sum"))
        return from_pandas_clean(out)

    parts = (with_coarse_partition(cols, "user_id")
             .groupby("__upart")
             .map_groups(lambda g: pairs_of_partition(
                 g.drop(columns=["__upart"])), batch_format="pandas"))
    agg = parts.groupby(["type_a", "type_b"]).aggregate(
        Sum("n", alias_name="n"))
    rows = sorted(collect_pylist(agg), key=lambda r: (r["type_a"], r["type_b"]))
    return pa.Table.from_pylist([
        {"type_a": r["type_a"], "type_b": r["type_b"], "n": int(r["n"])}
        for r in rows])


BAND_JOIN_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n
FROM e a JOIN e b
  ON a.user_id = b.user_id AND b.us > a.us AND b.us - a.us <= 60000000
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Fixed-iteration PageRank over the event-type transition graph — the
# iterative-graph-algorithm representative. The DISTRIBUTED work is the
# edge build (same single coarse hash(user)%P shuffle as
# event_transitions: per-partition sort + vectorized lead, only
# (from, to, count) partials leave the tasks) plus a tiny distinct-node
# aggregate; the power iteration itself runs on the driver over the
# node×node matrix, which is |event_type|² — O(10²) floats at ANY
# corpus size, so the driver step does not grow with the data. Damping
# 0.85, 5 iterations, dangling mass redistributed uniformly; the SQL
# oracle unrolls the same 5 steps as MATERIALIZED CTEs (DuckDB would
# otherwise inline the recursion exponentially).
# ---------------------------------------------------------------------------

_PR_D = 0.85
_PR_ITERS = 5


def pagerank_event_types(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum
    from tanml_ray.stages.shuffle import with_coarse_partition

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def pairs_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        frm, to = et[:-1][same], et[1:][same]
        if frm.size == 0:
            return pd.DataFrame({"from_type": pd.Series(dtype=object),
                                 "to_type": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        out = (pd.DataFrame({"from_type": frm, "to_type": to})
               .groupby(["from_type", "to_type"], as_index=False)
               .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        return out

    edges = collect_pylist(
        with_coarse_partition(ds, "user_id")
        .groupby("__upart").map_groups(pairs_part, batch_format="pandas")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n")))
    nodes = sorted(r["unique"] if "unique" in r else r["event_type"]
                   for r in collect_pylist(
                       _read(sf_dir, "events", ["event_type"])
                       .groupby("event_type").count()))
    idx = {v: i for i, v in enumerate(nodes)}
    nn = len(nodes)
    out_n = np.zeros(nn, dtype=np.int64)
    for e in edges:
        out_n[idx[e["from_type"]]] += int(e["n"])
    edges.sort(key=lambda e: (e["from_type"], e["to_type"]))

    rank = np.full(nn, 1.0 / nn)
    for _ in range(_PR_ITERS):
        inflow = np.zeros(nn)
        for e in edges:  # |event_type|² edges max — driver-tiny
            i, j = idx[e["from_type"]], idx[e["to_type"]]
            inflow[j] += rank[i] * int(e["n"]) / out_n[i]
        dang = float(rank[out_n == 0].sum())
        rank = (1.0 - _PR_D) / nn + _PR_D * (inflow + dang / nn)
    return pa.Table.from_pylist([
        {"node": v, "rank": _round6(rank[idx[v]])} for v in nodes])


def _pagerank_sql() -> str:
    head = """
WITH t AS MATERIALIZED (
  SELECT event_type AS from_type, nxt AS to_type,
         CAST(count(*) AS DOUBLE) AS n
  FROM (SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events)
  WHERE nxt IS NOT NULL GROUP BY 1, 2
), nodes AS MATERIALIZED (
  SELECT DISTINCT event_type AS node FROM events
), outd AS MATERIALIZED (
  SELECT from_type AS node, sum(n) AS outn FROM t GROUP BY 1
), nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nnodes FROM nodes
), r0 AS MATERIALIZED (SELECT node, 1.0 / nn.nnodes AS rank FROM nodes, nn)"""
    step = """
, r{k} AS MATERIALIZED (
  SELECT nd.node,
         0.15 / nn.nnodes + 0.85 * (COALESCE(fl.s, 0) + dg.d / nn.nnodes)
           AS rank
  FROM nodes nd
  CROSS JOIN nn
  CROSS JOIN (SELECT COALESCE(sum(r.rank), 0) AS d
              FROM r{p} r ANTI JOIN outd o ON r.node = o.node) dg
  LEFT JOIN (SELECT t.to_type AS node, sum(r.rank * t.n / o.outn) AS s
             FROM r{p} r
             JOIN t ON t.from_type = r.node
             JOIN outd o ON o.node = r.node
             GROUP BY 1) fl ON fl.node = nd.node
)"""
    body = "".join(step.format(k=k, p=k - 1) for k in range(1, _PR_ITERS + 1))
    return (head + body +
            f"\nSELECT node, round(rank, 6) AS rank FROM r{_PR_ITERS} "
            "ORDER BY node")


PAGERANK_SQL = _pagerank_sql()


# ---------------------------------------------------------------------------
# HBOS anomaly scores (histogram-based outlier score, Goldstein & Dengel
# 2012) over three lineitem features — the density-based anomaly
# representative. Two streaming passes: (1) per-feature fixed-bin
# counts (per-batch combiner → one small groupby; price edges come from
# one global min/max aggregate), (2) a scoring pass with the ~40-bin
# count table BROADCAST into every task and a per-block local top-k, so
# only 20-row partials reach the driver merge. Top-k selection ranks by
# the exact INTEGER product of the three bin counts (order-isomorphic
# to the float score Σ log(N/c)) with a key tie-break — no float
# knife-edge can flip the selected set between engine and oracle.
# ---------------------------------------------------------------------------

_HBOS_K = 20
_HBOS_PRICE_BINS = 20


def hbos_outliers_lineitem(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Max, Min, Sum

    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "l_discount"]
    ds = _read(sf_dir, "lineitem", cols)

    def to_units(batch: pa.Table) -> pa.Table:
        p = np.rint(batch.column("l_extendedprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"pc": p})

    b = (ds.map_batches(to_units, batch_format="pyarrow")
         .aggregate(Min("pc"), Max("pc")))
    pmin, pmax = int(b["min(pc)"]), int(b["max(pc)"])
    pspan = pmax - pmin + 1

    def bins_of(batch: pa.Table):
        q = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        p = np.rint(batch.column("l_extendedprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        d = np.rint(batch.column("l_discount")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        qb = np.floor((q - 1) / 5).astype(np.int64)
        pb = ((p - pmin) * _HBOS_PRICE_BINS) // pspan
        return qb, pb, d

    def count_partial(batch: pa.Table) -> pa.Table:
        qb, pb, db = bins_of(batch)
        frames = []
        for feat, arr in (("q", qb), ("p", pb), ("d", db)):
            u, c = np.unique(arr, return_counts=True)
            frames.append(pd.DataFrame({"feat": feat, "bin": u,
                                        "n": c.astype(np.int64)}))
        return from_pandas_clean(pd.concat(frames, ignore_index=True))

    counts = collect_pylist(
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["feat", "bin"]).aggregate(Sum("n", alias_name="n")))
    lut = {(r["feat"], int(r["bin"])): int(r["n"]) for r in counts}
    n_total = sum(v for (f, _), v in lut.items() if f == "q")

    def local_topk(batch: pa.Table) -> pa.Table:
        qb, pb, db = bins_of(batch)
        cq = np.array([lut[("q", int(x))] for x in qb], dtype=np.int64)
        cp = np.array([lut[("p", int(x))] for x in pb], dtype=np.int64)
        cd = np.array([lut[("d", int(x))] for x in db], dtype=np.int64)
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        ln = batch.column("l_linenumber").to_numpy(zero_copy_only=False)
        # exact int rank key; N³ must stay under 2⁶³, i.e. N < 2×10⁶ —
        # beyond that, Python-bigint products (same top-k merge shape)
        if n_total >= 2_000_000:
            prod = [int(a) * int(b) * int(c) for a, b, c in zip(cq, cp, cd)]
            order = np.array(sorted(
                range(len(prod)),
                key=lambda i: (prod[i], ok[i], ln[i]))[:_HBOS_K],
                dtype=np.int64)
        else:
            prod = cq * cp * cd
            order = np.lexsort((ln, ok, prod))[:_HBOS_K]
        score = (np.log(n_total / cq[order]) + np.log(n_total / cp[order])
                 + np.log(n_total / cd[order]))
        return pa.table({
            "l_orderkey": ok[order].astype(np.int64),
            "l_linenumber": ln[order].astype(np.int64),
            # string: the bigint branch's products don't fit int64
            "prod": pa.array([str(prod[i]) for i in order],
                             type=pa.string()),
            "score": score})

    parts = collect_pylist(ds.map_batches(local_topk, batch_format="pyarrow"))
    parts.sort(key=lambda r: (int(r["prod"]), int(r["l_orderkey"]),
                              int(r["l_linenumber"])))
    return pa.Table.from_pylist([
        {"l_orderkey": int(r["l_orderkey"]),
         "l_linenumber": int(r["l_linenumber"]),
         "hbos": _round6(r["score"])} for r in parts[:_HBOS_K]])


HBOS_SQL = f"""
WITH u AS MATERIALIZED (
  SELECT l_orderkey, l_linenumber,
         CAST(floor((l_quantity - 1) / 5) AS BIGINT) AS qb,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(round(l_discount * 100) AS BIGINT) AS db
  FROM lineitem
), e AS MATERIALIZED (
  SELECT min(pc) AS pmin, max(pc) - min(pc) + 1 AS pspan,
         CAST(count(*) AS DOUBLE) AS n FROM u
), ub AS MATERIALIZED (
  SELECT l_orderkey, l_linenumber, qb,
         ((pc - e.pmin) * {_HBOS_PRICE_BINS}) // e.pspan AS pb, db
  FROM u, e
), cq AS MATERIALIZED (SELECT qb, count(*) AS c FROM ub GROUP BY 1),
cp AS MATERIALIZED (SELECT pb, count(*) AS c FROM ub GROUP BY 1),
cd AS MATERIALIZED (SELECT db, count(*) AS c FROM ub GROUP BY 1)
SELECT ub.l_orderkey, ub.l_linenumber,
       round(ln(e.n / cq.c) + ln(e.n / cp.c) + ln(e.n / cd.c), 6) AS hbos
FROM ub
JOIN cq ON cq.qb = ub.qb
JOIN cp ON cp.pb = ub.pb
JOIN cd ON cd.db = ub.db
CROSS JOIN e
ORDER BY cq.c * cp.c * cd.c, ub.l_orderkey, ub.l_linenumber
LIMIT {_HBOS_K}
"""


# ---------------------------------------------------------------------------
# Leakage-safe out-of-fold target encoding (M10 family extension): the
# encoding for a row in fold f of group g is the mean label of g's rows
# in the OTHER folds — the standard K-fold target-encoding scheme that
# prevents a row's own label from leaking into its feature. One
# combiner-first shuffle produces the (group, fold) integer sufficient
# statistics (≤ |groups|×K rows at any corpus size); the subtraction is
# exact-integer driver math. Returned as the 25-row (group, fold)
# encoding table — the broadcast side a scoring pass would consume.
# ---------------------------------------------------------------------------

_TE_FOLDS = 5


def target_encode_orders(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_orderstatus"])

    def partial(batch: pa.Table) -> pa.Table:
        grp = np.asarray(batch.column("o_orderpriority").to_pylist(),
                         dtype=object)
        fold = (batch.column("o_orderkey").to_numpy(zero_copy_only=False)
                % _TE_FOLDS).astype(np.int64)
        y = (np.asarray(batch.column("o_orderstatus").to_pylist())
             == "F").astype(np.int64)
        df = pd.DataFrame({"grp": grp, "fold": fold, "n": 1, "sy": y})
        return from_pandas_clean(
            df.groupby(["grp", "fold"], as_index=False)
            .agg(n=("n", "sum"), sy=("sy", "sum")))

    stats = collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["grp", "fold"]).aggregate(Sum("n", alias_name="n"),
                                            Sum("sy", alias_name="sy")))
    tot: dict[str, list[int]] = {}
    for r in stats:
        t = tot.setdefault(r["grp"], [0, 0])
        t[0] += int(r["n"])
        t[1] += int(r["sy"])
    rows = []
    for r in sorted(stats, key=lambda r: (r["grp"], int(r["fold"]))):
        g, f = r["grp"], int(r["fold"])
        oof_n = tot[g][0] - int(r["n"])
        oof_y = tot[g][1] - int(r["sy"])
        rows.append({"grp": g, "fold": f, "n": int(r["n"]),
                     "enc": _round6(oof_y / oof_n) if oof_n else None})
    return pa.Table.from_pylist(rows)


TARGET_ENCODE_SQL = f"""
WITH s AS MATERIALIZED (
  SELECT o_orderpriority AS grp,
         CAST(o_orderkey % {_TE_FOLDS} AS BIGINT) AS fold,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(o_orderstatus = 'F' AS BIGINT)) AS BIGINT) AS sy
  FROM orders GROUP BY 1, 2
)
SELECT grp, fold, n,
       CASE WHEN sum(n) OVER w - n = 0 THEN NULL
            ELSE round((sum(sy) OVER w - sy)
                       / CAST(sum(n) OVER w - n AS DOUBLE), 6)
       END AS enc
FROM s WINDOW w AS (PARTITION BY grp) ORDER BY grp, fold
"""


# ---------------------------------------------------------------------------
# Split-conformal prediction interval (Vovk/Papadopoulos split-conformal
# scheme) over the closed-form OLS fit — the uncertainty-quantification
# representative. Fold 0 (o_orderkey%3) trains, fold 1 calibrates,
# fold 2 measures coverage. Every cross-task number is an exact
# integer: the OLS normal equations are Python-bigint sufficient
# statistics (the SQL oracle mirrors them in HUGEINT — exact to ~sf0.3;
# the engine side is unbounded), so both sides derive bit-identical
# double betas and bit-identical residuals. The calibration order
# statistic is selected scale-safely in two streaming passes: a
# 65536-wide bucket histogram locates the k-th bucket, then exact value
# counts INSIDE that one bucket (≤65536 distinct values to the driver
# at any corpus size) pin the k-th smallest |residual|.
# ---------------------------------------------------------------------------

_CONF_ALPHA = 0.1
_CONF_BUCKET = 65536


def conformal_interval_orders(sf_dir: str) -> pa.Table:
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_custkey", "o_totalprice"])

    def derive(batch: pa.Table) -> pa.Table:
        key = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        days = (batch.column("o_orderdate").cast(pa.int64())
                .to_numpy(zero_copy_only=False) // 86_400_000_000)
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"fold": (key % 3).astype(np.int64),
                         "x1": days.astype(np.int64),
                         "x2": batch.column("o_custkey").cast(pa.int64()),
                         "y": cents // 100})

    feat = ds.map_batches(derive, batch_format="pyarrow")

    def train_partial(batch: pa.Table) -> pa.Table:
        m = batch.column("fold").to_numpy(zero_copy_only=False) == 0
        x1 = batch.column("x1").to_numpy(zero_copy_only=False)[m]
        x2 = batch.column("x2").to_numpy(zero_copy_only=False)[m]
        y = batch.column("y").to_numpy(zero_copy_only=False)[m]
        return pa.Table.from_pylist([{
            "n": int(m.sum()), "s1": int(x1.sum()), "s2": int(x2.sum()),
            "sy": int(y.sum()), "s11": int(np.dot(x1, x1)),
            "s12": int(np.dot(x1, x2)), "s22": int(np.dot(x2, x2)),
            "s1y": int(np.dot(x1, y)), "s2y": int(np.dot(x2, y))}])

    t = {"n": 0, "s1": 0, "s2": 0, "sy": 0, "s11": 0, "s12": 0, "s22": 0,
         "s1y": 0, "s2y": 0}
    for r in collect_pylist(feat.map_batches(train_partial,
                                             batch_format="pyarrow")):
        for k in t:
            t[k] += int(r[k])  # Python bigints: overflow-free merge
    n, s1, s2, sy = t["n"], t["s1"], t["s2"], t["sy"]
    s11, s12, s22, s1y, s2y = t["s11"], t["s12"], t["s22"], t["s1y"], t["s2y"]
    det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) \
        + s2 * (s1 * s12 - s11 * s2)
    det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) \
        + s2 * (s1y * s12 - s11 * s2y)
    det1 = n * (s1y * s22 - s2y * s12) - sy * (s1 * s22 - s12 * s2) \
        + s2 * (s1 * s2y - s1y * s2)
    det2 = n * (s11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s2 * s1y) \
        + sy * (s1 * s12 - s11 * s2)
    b0 = float(det0) / float(det)
    b1 = float(det1) / float(det)
    b2 = float(det2) / float(det)

    def resid_u(batch: pa.Table, fold: int) -> np.ndarray:
        m = batch.column("fold").to_numpy(zero_copy_only=False) == fold
        x1 = batch.column("x1").to_numpy(zero_copy_only=False)[m]
        x2 = batch.column("x2").to_numpy(zero_copy_only=False)[m]
        y = batch.column("y").to_numpy(zero_copy_only=False)[m]
        resid = y - (b0 + b1 * x1 + b2 * x2)
        return np.floor(np.abs(resid) * 100).astype(np.int64)

    def cal_hist(batch: pa.Table) -> pa.Table:
        ru = resid_u(batch, 1)
        u, c = np.unique(ru // _CONF_BUCKET, return_counts=True)
        return pa.table({"bucket": u, "n": c.astype(np.int64)})

    hist = sorted((int(r["bucket"]), int(r["n"])) for r in collect_pylist(
        feat.map_batches(cal_hist, batch_format="pyarrow")
        .groupby("bucket").aggregate(Sum("n", alias_name="n"))))
    n_cal = sum(c for _, c in hist)
    k = math.ceil((1.0 - _CONF_ALPHA) * (n_cal + 1))
    k = min(k, n_cal)
    seen, kth_bucket, k_in_bucket = 0, None, None
    for bkt, c in hist:
        if seen + c >= k:
            kth_bucket, k_in_bucket = bkt, k - seen
            break
        seen += c

    def in_bucket_counts(batch: pa.Table) -> pa.Table:
        ru = resid_u(batch, 1)
        ru = ru[ru // _CONF_BUCKET == kth_bucket]
        u, c = np.unique(ru, return_counts=True)
        return pa.table({"ru": u, "n": c.astype(np.int64)})

    vals = sorted((int(r["ru"]), int(r["n"])) for r in collect_pylist(
        feat.map_batches(in_bucket_counts, batch_format="pyarrow")
        .groupby("ru").aggregate(Sum("n", alias_name="n"))))
    seen, q_cents = 0, None
    for v, c in vals:
        seen += c
        if seen >= k_in_bucket:
            q_cents = v
            break

    def cover_partial(batch: pa.Table) -> pa.Table:
        ru = resid_u(batch, 2)
        return pa.table({"n": pa.array([len(ru)], type=pa.int64()),
                         "inside": pa.array([int((ru <= q_cents).sum())],
                                            type=pa.int64())})

    n_test, inside = 0, 0
    for r in collect_pylist(feat.map_batches(cover_partial,
                                             batch_format="pyarrow")):
        n_test += int(r["n"])
        inside += int(r["inside"])
    return pa.Table.from_pylist([{
        "n_train": n, "n_cal": n_cal, "n_test": n_test,
        "q_cents": int(q_cents),
        "coverage": _round6(inside / n_test)}])


CONFORMAL_SQL = """
WITH f AS MATERIALIZED (
  SELECT o_orderkey % 3 AS fold,
         CAST(datediff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS x1,
         CAST(o_custkey AS BIGINT) AS x2,
         CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS y
  FROM orders
), s AS MATERIALIZED (
  -- HUGEINT sufficient statistics (DuckDB sums BIGINT into int128);
  -- exact to ~sf0.3 — the engine's Python-bigint path is unbounded
  SELECT count(*) AS n, sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
         sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
         sum(x1*y) AS s1y, sum(x2*y) AS s2y
  FROM f WHERE fold = 0
), d AS MATERIALIZED (
  SELECT n,
   n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det,
   sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y) AS det0,
   n*(s1y*s22 - s2y*s12) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2) AS det1,
   n*(s11*s2y - s12*s1y) - s1*(s1*s2y - s2*s1y) + sy*(s1*s12 - s11*s2) AS det2
  FROM s
), b AS MATERIALIZED (
  SELECT n AS n_train,
         CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) AS b0,
         CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) AS b1,
         CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) AS b2
  FROM d
), cal AS MATERIALIZED (
  SELECT CAST(floor(abs(y - (b0 + b1*x1 + b2*x2)) * 100) AS BIGINT) AS ru
  FROM f, b WHERE fold = 1
), kk AS MATERIALIZED (
  SELECT count(*) AS n_cal,
         least(CAST(ceil(0.9 * (count(*) + 1)) AS BIGINT),
               count(*)) AS k
  FROM cal
), q AS MATERIALIZED (
  SELECT min(ru) AS q_cents FROM (
    SELECT ru, row_number() OVER (ORDER BY ru) AS rn FROM cal
  ), kk WHERE rn = kk.k
), tst AS MATERIALIZED (
  SELECT CAST(floor(abs(y - (b0 + b1*x1 + b2*x2)) * 100) AS BIGINT) AS ru
  FROM f, b WHERE fold = 2
)
SELECT b.n_train AS n_train, kk.n_cal AS n_cal,
       CAST(count(*) AS BIGINT) AS n_test, q.q_cents AS q_cents,
       round(sum(CAST(ru <= q.q_cents AS BIGINT))
             / CAST(count(*) AS DOUBLE), 6) AS coverage
FROM tst, b, kk, q GROUP BY 1, 2, 4
"""


# ---------------------------------------------------------------------------
# Key-skew profile (scale-engineering diagnostic, north_rule "skew
# handled explicitly"): exact Gini coefficient, hottest-key share and
# count percentiles of the per-user event distribution. The scale trick
# is the COUNT-OF-COUNTS reduction: per-key counts shuffle once
# (combiner-first), then collapse to {count value -> #keys} — a table
# bounded by the number of DISTINCT per-key counts, which stays tiny
# (head-heavy distributions have few distinct tail values) even at 10⁹
# keys — and Gini/percentiles are exact integer math over that table:
# a run of m keys with equal count v occupying ranks s..s+m-1
# contributes v·(m·s + m·(m−1)/2) to Σ rank·count.
# ---------------------------------------------------------------------------

def key_skew_profile_events(sf_dir: str) -> pa.Table:
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch.column("user_id")
                         .to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"user_id": u, "n": c.astype(np.int64)})

    per_key = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("user_id").aggregate(Sum("n", alias_name="n")))

    def coc_partial(batch: pa.Table) -> pa.Table:
        v, m = np.unique(batch.column("n").to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"v": v, "m": m.astype(np.int64)})

    coc = sorted((int(r["v"]), int(r["m"])) for r in collect_pylist(
        per_key.map_batches(coc_partial, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("m", alias_name="m"))))
    n_keys = sum(m for _, m in coc)
    total = sum(v * m for v, m in coc)
    # Σ rank·count with 1-based ranks ascending, exact bigints
    s, weighted = 1, 0
    for v, m in coc:
        weighted += v * (m * s + m * (m - 1) // 2)
        s += m
    gini = (2.0 * weighted / (n_keys * total)) - (n_keys + 1) / n_keys
    vmax = coc[-1][0]

    def pct(p: float) -> int:
        # inverse-CDF (type-1) percentile of the per-key counts
        need = int(math.ceil(p * n_keys))
        acc = 0
        for v, m in coc:
            acc += m
            if acc >= need:
                return v
        return vmax

    return pa.Table.from_pylist([{
        "n_keys": n_keys, "total": total,
        "gini": _round6(gini),
        "hottest_share": _round6(vmax / total),
        "p50": pct(0.50), "p99": pct(0.99), "max_count": vmax}])


KEY_SKEW_SQL = """
WITH pk AS MATERIALIZED (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
), coc AS MATERIALIZED (
  SELECT n AS v, CAST(count(*) AS BIGINT) AS m FROM pk GROUP BY 1
), r AS MATERIALIZED (
  SELECT v, m,
         1 + COALESCE(sum(m) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
         sum(m) OVER (ORDER BY v) AS cum
  FROM coc
), agg AS MATERIALIZED (
  SELECT sum(m) AS n_keys, sum(v * m) AS total,
         sum(v * (m * s + m * (m - 1) // 2)) AS weighted,
         max(v) AS vmax
  FROM r
)
SELECT CAST(n_keys AS BIGINT) AS n_keys, CAST(total AS BIGINT) AS total,
       round(2.0 * weighted / (n_keys * total)
             - (n_keys + 1) / CAST(n_keys AS DOUBLE), 6) AS gini,
       round(vmax / CAST(total AS DOUBLE), 6) AS hottest_share,
       (SELECT min(v) FROM r WHERE cum >= ceil(0.50 * agg.n_keys)) AS p50,
       (SELECT min(v) FROM r WHERE cum >= ceil(0.99 * agg.n_keys)) AS p99,
       CAST(vmax AS BIGINT) AS max_count
FROM agg
"""


# ---------------------------------------------------------------------------
# Functional-dependency violation check (schema-validation family,
# north_rule "schema + constraint validation"; generalizes the
# reference's referential/uniqueness checks in tanml/validation to the
# FD "does column K determine column D"). Distributed shape: per-batch
# distinct (K, D) pair counts (combiner-first — the shuffle moves
# distinct pairs only, bounded by |keys|·card(D), never raw rows), one
# groupby on the pair, a second groupby on K reducing to (n_distinct_d,
# n_rows) per key, then a scalar partial-sum reduction — the driver
# sees one row.
# ---------------------------------------------------------------------------

def fd_violations_orders(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"k": batch.column("o_custkey").to_numpy(
            zero_copy_only=False),
            "d": batch.column("o_orderpriority").to_pandas()})
        g = df.groupby(["k", "d"], sort=False).size().reset_index(name="c")
        return pa.table({"k": g["k"].to_numpy(np.int64),
                         "d": pa.array(g["d"]),
                         "c": g["c"].to_numpy(np.int64)})

    pairs = (ds.map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["k", "d"]).aggregate(Sum("c", alias_name="c")))
    per_key = (pairs.groupby("k")
               .aggregate(Count(alias_name="nd"), Sum("c", alias_name="nrows")))

    def summarize(batch: pa.Table) -> pa.Table:
        nd = batch.column("nd").to_numpy(zero_copy_only=False)
        nr = batch.column("nrows").to_numpy(zero_copy_only=False)
        bad = nd > 1
        return pa.table({
            "n_keys": pa.array([len(nd)], type=pa.int64()),
            "n_violating_keys": pa.array([int(bad.sum())], type=pa.int64()),
            "violating_rows": pa.array([int(nr[bad].sum())], type=pa.int64())})

    parts = collect_pylist(per_key.map_batches(summarize,
                                               batch_format="pyarrow"))
    n_keys = sum(p["n_keys"] for p in parts)
    n_bad = sum(p["n_violating_keys"] for p in parts)
    bad_rows = sum(p["violating_rows"] for p in parts)
    return pa.Table.from_pylist([{
        "n_keys": n_keys,
        "n_violating_keys": n_bad,
        "violation_rate": _round6(n_bad / n_keys),
        "violating_rows": bad_rows,
        "fd_holds": n_bad == 0}])


FD_VIOLATIONS_SQL = """
WITH pk AS MATERIALIZED (
  SELECT o_custkey AS k,
         CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nd,
         CAST(count(*) AS BIGINT) AS nrows
  FROM orders GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CAST(nd > 1 AS BIGINT)) AS BIGINT) AS n_violating_keys,
       round(sum(CAST(nd > 1 AS BIGINT)) / CAST(count(*) AS DOUBLE), 6)
         AS violation_rate,
       CAST(sum(CASE WHEN nd > 1 THEN nrows ELSE 0 END) AS BIGINT)
         AS violating_rows,
       (sum(CAST(nd > 1 AS BIGINT)) = 0) AS fd_holds
FROM pk
"""


# ---------------------------------------------------------------------------
# Hellinger + total-variation distance between the even-day and odd-day
# halves of events.value — two more distribution-drift statistics next
# to PSI/KS/JSD/W1 (reference analysis/drift.py:34-113 computes only
# PSI and KS; these are the bounded-metric complements on the same
# binned shape). Support is bucketed with floor(value/10) — exact in
# both numpy and DuckDB — so one two-sided value-count combiner pass
# bounds the shuffle by the ~50-bucket grid, never by row count.
# ---------------------------------------------------------------------------

def hellinger_tv_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "value"])

    def vc_partial(batch: pa.Table) -> pa.Table:
        day = (pc.cast(pc.cast(batch.column("ts"), pa.date32()), pa.int32())
               .to_numpy(zero_copy_only=False))
        b = np.floor(batch.column("value")
                     .to_numpy(zero_copy_only=False) / 10.0).astype(np.int64)
        g = (pd.DataFrame({"b": b, "side": day % 2 == 0})
             .groupby(["b", "side"], as_index=False).size())
        return pa.table({
            "b": pa.array(g["b"].to_numpy(), type=pa.int64()),
            "ca": pa.array(np.where(g["side"], g["size"], 0)
                           .astype(np.int64)),
            "cb": pa.array(np.where(g["side"], 0, g["size"])
                           .astype(np.int64))})

    vc = sorted(collect_pylist(
        ds.map_batches(vc_partial, batch_format="pyarrow")
        .groupby("b").aggregate(Sum("ca", alias_name="ca"),
                                Sum("cb", alias_name="cb"))),
        key=lambda r: r["b"])
    ca = np.array([r["ca"] for r in vc], dtype=np.float64)
    cb = np.array([r["cb"] for r in vc], dtype=np.float64)
    na, nb = int(ca.sum()), int(cb.sum())
    p = ca / na
    q = cb / nb
    hel = float(np.sqrt(0.5 * np.sum((np.sqrt(p) - np.sqrt(q)) ** 2)))
    tv = float(0.5 * np.sum(np.abs(p - q)))
    return pa.Table.from_pylist([{
        "n_a": na, "n_b": nb,
        "hellinger": _round6(hel), "tv": _round6(tv)}])


HELLINGER_TV_SQL = """
WITH e AS MATERIALIZED (
  SELECT CAST(floor(value / 10.0) AS BIGINT) AS b,
         (datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 2 = 0)
           AS side
  FROM events
), j AS MATERIALIZED (
  SELECT b,
         CAST(sum(CASE WHEN side THEN 1 ELSE 0 END) AS DOUBLE) AS ca,
         CAST(sum(CASE WHEN side THEN 0 ELSE 1 END) AS DOUBLE) AS cb
  FROM e GROUP BY b
), tot AS MATERIALIZED (
  SELECT sum(ca) AS na, sum(cb) AS nb FROM j
)
SELECT
  CAST((SELECT na FROM tot) AS BIGINT) AS n_a,
  CAST((SELECT nb FROM tot) AS BIGINT) AS n_b,
  round(sqrt(0.5 * (SELECT sum(pow(sqrt(j.ca / tot.na)
                                   - sqrt(j.cb / tot.nb), 2))
                    FROM j, tot)), 6) AS hellinger,
  round(0.5 * (SELECT sum(abs(j.ca / tot.na - j.cb / tot.nb))
               FROM j, tot), 6) AS tv
"""


# ---------------------------------------------------------------------------
# Volume control chart: rows-per-day with 3-sigma alert bands — the
# classic data-quality "did a whole feed go missing / double-deliver"
# check (reference profiling.py:22-28 reports only the global row
# count; this is its per-time-bucket monitoring form). One
# day-bounded count combiner pass; the driver fits the ~30-point
# center line and flags |z| > 3.
# ---------------------------------------------------------------------------

def volume_control_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(batch.column("ts"), pa.date32())
        g = (pd.DataFrame({"day": day.to_pylist()})
             .groupby("day", as_index=False).size()
             .rename(columns={"size": "n"}))
        return from_pandas_clean(g, preserve_index=False)

    rows = sorted(collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day").aggregate(Sum("n", alias_name="n"))),
        key=lambda r: r["day"])
    n = np.array([r["n"] for r in rows], dtype=np.float64)
    mu = float(n.sum() / len(n))
    sd = float(np.sqrt(np.sum((n - mu) ** 2) / len(n)))
    z = (n - mu) / sd
    return pa.Table.from_pylist([{
        "day": rows[i]["day"].strftime("%Y-%m-%d"),
        "n": int(rows[i]["n"]),
        "z": _round6(z[i]),
        "alert": bool(abs(z[i]) > 3.0)}
        for i in range(len(rows))])


VOLUME_CONTROL_SQL = """
WITH d AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), s AS MATERIALIZED (
  SELECT avg(n) AS mu, stddev_pop(n) AS sd FROM d
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.n,
       round((d.n - s.mu) / s.sd, 6) AS z,
       (abs((d.n - s.mu) / s.sd) > 3.0) AS alert
FROM d, s
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Out-of-order sequence check: per user ordered by event_id, an event
# whose ts precedes the running max of its predecessors is an ingest
# inversion (the sequence-integrity constraint the north_rule's
# warc_ts range rule implies for event streams; no reference analog —
# TanML never sees ordered data). Coarse hash(user)%P partitioning
# (stages/shuffle.py) keeps every user's rows in ONE partition, so the
# vectorized within-partition cummax never crosses users and the
# per-partition summary rows are exactly mergeable by summation.
# ---------------------------------------------------------------------------

def out_of_order_events(sf_dir: str) -> pa.Table:
    from tanml_ray.stages.shuffle import with_coarse_partition

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_id"], kind="mergesort")
        ts = g["ts"].astype("datetime64[us]").astype(np.int64)
        prior_max = (ts.groupby(g["user_id"]).shift(1)
                     .groupby(g["user_id"]).cummax())
        ooo = ts < prior_max  # NaN (first event per user) compares False
        return pd.DataFrame({
            "n_users": [int(g["user_id"].nunique())],
            "n_events": [len(g)],
            "out_of_order": [int(ooo.sum())],
            "affected_users": [int(g["user_id"][ooo].nunique())]})

    parts = (with_coarse_partition(ds, "user_id")
             .groupby("__upart").map_groups(per_partition,
                                            batch_format="pandas"))
    tot = {"n_users": 0, "n_events": 0, "out_of_order": 0,
           "affected_users": 0}
    for r in collect_pylist(parts):
        for k in tot:
            tot[k] += int(r[k])
    return pa.Table.from_pylist([{
        **tot,
        "ooo_rate": _round6(tot["out_of_order"] / tot["n_events"]),
        "is_ordered": tot["out_of_order"] == 0}])


OUT_OF_ORDER_SQL = """
WITH w AS MATERIALIZED (
  SELECT user_id,
         CASE WHEN ts < max(ts) OVER (PARTITION BY user_id
              ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS ooo
  FROM events
)
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(ooo) AS BIGINT) AS out_of_order,
       CAST(count(DISTINCT CASE WHEN ooo = 1 THEN user_id END) AS BIGINT)
         AS affected_users,
       round(sum(ooo) / CAST(count(*) AS DOUBLE), 6) AS ooo_rate,
       (sum(ooo) = 0) AS is_ordered
FROM w
"""


# ---------------------------------------------------------------------------
# Freshness lag: per event_type, hours between its newest record and
# the newest record in the whole table — the "is any feed stale"
# monitoring check (north_rule's warc_ts range family; reference has
# only static min/max in profiling.py:222-224). One per-type max/count
# combiner pass; the global max is the max of the ~5 group maxes.
# ---------------------------------------------------------------------------

def freshness_lag_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Max, Sum

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        t = (batch.column("ts").cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        g = (pd.DataFrame({"event_type": batch.column("event_type")
                           .to_pylist(), "mx": t})
             .groupby("event_type", as_index=False)
             .agg(mx=("mx", "max"), n=("mx", "size")))
        return from_pandas_clean(g, preserve_index=False)

    rows = sorted(collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type").aggregate(Max("mx", alias_name="mx"),
                                         Sum("n", alias_name="n"))),
        key=lambda r: r["event_type"])
    gmax = max(r["mx"] for r in rows)
    out = []
    for r in rows:
        lag_h = (gmax - r["mx"]) / 3600000000.0
        out.append({"event_type": r["event_type"], "n": int(r["n"]),
                    "max_ts_us": int(r["mx"]),
                    "lag_hours": _round6(lag_h),
                    "stale": bool(lag_h > 24.0)})
    return pa.Table.from_pylist(out)


FRESHNESS_LAG_SQL = """
WITH g AS MATERIALIZED (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(epoch_us(max(ts)) AS BIGINT) AS max_ts_us
  FROM events GROUP BY 1
), t AS MATERIALIZED (SELECT max(max_ts_us) AS gmax FROM g)
SELECT g.event_type, g.n, g.max_ts_us,
       round((t.gmax - g.max_ts_us) / 3600000000.0, 6) AS lag_hours,
       ((t.gmax - g.max_ts_us) / 3600000000.0 > 24.0) AS stale
FROM g, t
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Cross-table reconciliation: does orders.o_totalprice equal the sum of
# its lineitem extendedprices? The classic two-feed consistency check
# (reference J-family has only the row-hash overlap, services/data.py:
# 75-96; this is its ledger-style counterpart). Lineitem reduces to ONE
# integer-cents row per order via the combiner + groupby-Sum, then a
# partitioned hash join (pipelines/join.py) meets orders — both sides
# large, nothing order-count-sized on the driver; the final summary is
# a per-batch partial sum of match flags.
# ---------------------------------------------------------------------------

def order_reconciliation_orders(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.pipelines.join import partitioned_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])

    def li_partial(batch: pa.Table) -> pa.Table:
        k = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        c = np.rint(batch.column("l_extendedprice")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        g = (pd.DataFrame({"o_orderkey": k, "line_c": c})
             .groupby("o_orderkey", as_index=False).sum())
        return from_pandas_clean(g, preserve_index=False)

    per_order = (li.map_batches(li_partial, batch_format="pyarrow")
                 .groupby("o_orderkey")
                 .aggregate(Sum("line_c", alias_name="line_c")))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def o_cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "total_c": pc.cast(pc.round(pc.multiply(
                batch.column("o_totalprice"), 100)), pa.int64())})

    joined = partitioned_join(per_order,
                              orders.map_batches(o_cents,
                                                 batch_format="pyarrow"),
                              "o_orderkey", buckets=32)

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"n": pd.Series([], dtype="int64"),
                                 "n_exact": pd.Series([], dtype="int64"),
                                 "abs_diff_c": pd.Series([], dtype="int64"),
                                 "max_diff_c": pd.Series([], dtype="int64")})
        d = (df["total_c"] - df["line_c"]).abs()
        return pd.DataFrame({"n": [len(df)], "n_exact": [int((d == 0).sum())],
                             "abs_diff_c": [int(d.sum())],
                             "max_diff_c": [int(d.max())]})

    parts = collect_pylist(joined.map_batches(summarize,
                                              batch_format="pandas"))
    n_orders = orders.count()
    n = sum(p["n"] for p in parts)
    n_exact = sum(p["n_exact"] for p in parts)
    sum_diff = sum(p["abs_diff_c"] for p in parts)
    max_diff = max((p["max_diff_c"] for p in parts), default=0)
    return pa.Table.from_pylist([{
        "n_orders": int(n_orders),
        "n_with_lines": n,
        "n_exact": n_exact,
        "mismatch_rate": _round6((n - n_exact) / n),
        "mean_abs_diff": _round6(sum_diff / n / 100.0),
        "max_abs_diff": _round6(max_diff / 100.0)}])


ORDER_RECON_SQL = """
WITH l AS MATERIALIZED (
  SELECT l_orderkey AS o_orderkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS line_c
  FROM lineitem GROUP BY 1
), j AS MATERIALIZED (
  SELECT abs(CAST(round(o_totalprice * 100) AS BIGINT) - l.line_c) AS d
  FROM orders JOIN l USING (o_orderkey)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_with_lines,
       CAST(sum(CAST(d = 0 AS BIGINT)) AS BIGINT) AS n_exact,
       round(sum(CAST(d <> 0 AS BIGINT)) / CAST(count(*) AS DOUBLE), 6)
         AS mismatch_rate,
       round(sum(d) / CAST(count(*) AS DOUBLE) / 100.0, 6) AS mean_abs_diff,
       round(max(d) / 100.0, 6) AS max_abs_diff
FROM j
"""


# ---------------------------------------------------------------------------
# Inactive customers per market segment: the orphan-rate rollup of the
# referential family (J3 checks values AGAINST a dim; this counts dim
# rows never referenced). Reuses the fully-distributed
# partitioned_anti_join (join.py:355) — the custkey set scales with the
# corpus, so no driver set, no broadcast — then a segment-bounded
# count merge.
# ---------------------------------------------------------------------------

def inactive_customers_by_segment(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.pipelines.join import partitioned_anti_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    okeys = (_read(sf_dir, "orders", ["o_custkey"])
             .map_batches(lambda b: pa.table(
                 {"c_custkey": b.column("o_custkey")}),
                 batch_format="pyarrow"))
    inactive = partitioned_anti_join(cust, okeys, "c_custkey")

    def seg_count(batch: pa.Table) -> pa.Table:
        g = (pd.DataFrame({"c_mktsegment": batch.column("c_mktsegment")
                           .to_pylist()})
             .groupby("c_mktsegment", as_index=False).size()
             .rename(columns={"size": "n"}))
        return from_pandas_clean(g, preserve_index=False)

    def agg(ds):
        return (ds.map_batches(seg_count, batch_format="pyarrow")
                .groupby("c_mktsegment").aggregate(Sum("n", alias_name="n")))

    total = {r["c_mktsegment"]: r["n"] for r in collect_pylist(agg(cust))}
    idle = {r["c_mktsegment"]: r["n"] for r in collect_pylist(agg(inactive))}
    return pa.Table.from_pylist([{
        "c_mktsegment": s,
        "n_customers": int(total[s]),
        "n_inactive": int(idle.get(s, 0)),
        "inactive_rate": _round6(idle.get(s, 0) / total[s])}
        for s in sorted(total)])


INACTIVE_SEG_SQL = """
WITH i AS MATERIALIZED (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_inactive
  FROM customer
  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
  GROUP BY 1
)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       coalesce(any_value(i.n_inactive), 0) AS n_inactive,
       round(coalesce(any_value(i.n_inactive), 0)
             / CAST(count(*) AS DOUBLE), 6) AS inactive_rate
FROM customer c LEFT JOIN i USING (c_mktsegment)
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Chronological-split contamination: split the event stream at the
# integer midpoint day and count users appearing on BOTH sides — the
# time-split analog of the row-hash leakage check (J1,
# services/data.py:75-96): a user straddling the boundary leaks
# behavior from "test time" into "train time". Pass 1 is day-bounded
# (split from a ~30-row day grid); pass 2 reduces users to one
# (min_day, max_day) row via groupby, then per-batch partial counts —
# the user list itself never reaches the driver.
# ---------------------------------------------------------------------------

def split_contamination_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def day_partial(batch: pa.Table) -> pa.Table:
        day = (pc.cast(pc.cast(batch.column("ts"), pa.date32()), pa.int32())
               .to_numpy(zero_copy_only=False).astype(np.int64))
        g = (pd.DataFrame({"day": day}).groupby("day", as_index=False)
             .size().rename(columns={"size": "n"}))
        return from_pandas_clean(g, preserve_index=False)

    days = collect_pylist(ds.map_batches(day_partial, batch_format="pyarrow")
                          .groupby("day").aggregate(Sum("n", alias_name="n")))
    lo = min(r["day"] for r in days)
    hi = max(r["day"] for r in days)
    split = (lo + hi + 1) // 2  # first day of the "test" side

    def user_partial(batch: pa.Table) -> pa.Table:
        day = (pc.cast(pc.cast(batch.column("ts"), pa.date32()), pa.int32())
               .to_numpy(zero_copy_only=False).astype(np.int64))
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({"user_id": u, "mn": day, "mx": day})
             .groupby("user_id", as_index=False)
             .agg(mn=("mn", "min"), mx=("mx", "max")))
        return from_pandas_clean(g, preserve_index=False)

    spans = (ds.map_batches(user_partial, batch_format="pyarrow")
             .groupby("user_id").aggregate(Min("mn", alias_name="mn"),
                                           Max("mx", alias_name="mx")))

    def flag_partial(batch: pa.Table) -> pa.Table:
        mn = batch.column("mn").to_numpy(zero_copy_only=False)
        mx = batch.column("mx").to_numpy(zero_copy_only=False)
        both = (mn < split) & (mx >= split)
        return pa.table({
            "n_users": pa.array([len(mn)], type=pa.int64()),
            "contaminated": pa.array([int(both.sum())], type=pa.int64())})

    parts = collect_pylist(spans.map_batches(flag_partial,
                                             batch_format="pyarrow"))
    n_users = sum(p["n_users"] for p in parts)
    contam = sum(p["contaminated"] for p in parts)
    return pa.Table.from_pylist([{
        "split_day": int(split),
        "n_users": n_users,
        "contaminated_users": contam,
        "contamination_rate": _round6(contam / n_users)}])


SPLIT_CONTAMINATION_SQL = """
WITH d AS MATERIALIZED (
  SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         user_id
  FROM events
), s AS MATERIALIZED (
  SELECT (min(day) + max(day) + 1) // 2 AS split FROM d
), u AS MATERIALIZED (
  SELECT user_id, min(day) AS mn, max(day) AS mx FROM d GROUP BY 1
)
SELECT CAST(s.split AS BIGINT) AS split_day,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CAST(u.mn < s.split AND u.mx >= s.split AS BIGINT))
            AS BIGINT) AS contaminated_users,
       round(sum(CAST(u.mn < s.split AND u.mx >= s.split AS BIGINT))
             / CAST(count(*) AS DOUBLE), 6) AS contamination_rate
FROM u, s GROUP BY s.split
"""


# ---------------------------------------------------------------------------
# Near-zero-variance feature audit (caret nearZeroVar semantics:
# freq_ratio = top1/top2 frequency, nzv when ratio > 19 AND
# percent-unique < 10) over the bounded-cardinality orders columns —
# the degenerate-feature risk flag generalizing the reference's
# constant-column check (profiling.py:38-43). One value-count combiner
# pass per column; the category grids (3 statuses, 5 priorities) bound
# the shuffle and the driver math.
# ---------------------------------------------------------------------------

_NZV_COLS = ["o_orderstatus", "o_orderpriority"]


def near_zero_variance_orders(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", _NZV_COLS)

    def vc_partial(batch: pa.Table) -> pa.Table:
        frames = []
        for col in _NZV_COLS:
            g = (pd.DataFrame({"value": batch.column(col).to_pylist()})
                 .groupby("value", as_index=False).size()
                 .rename(columns={"size": "n"}))
            g.insert(0, "column", col)
            frames.append(g)
        return from_pandas_clean(pd.concat(frames, ignore_index=True),
                                 preserve_index=False)

    rows = collect_pylist(
        ds.map_batches(vc_partial, batch_format="pyarrow")
        .groupby(["column", "value"]).aggregate(Sum("n", alias_name="n")))
    out = []
    for col in _NZV_COLS:
        freqs = sorted((r["n"] for r in rows if r["column"] == col),
                       reverse=True)
        n = sum(freqs)
        top1 = freqs[0]
        top2 = freqs[1] if len(freqs) > 1 else 0
        ratio = top1 / top2 if top2 else float(top1)
        pct_unique = 100.0 * len(freqs) / n
        out.append({
            "column": col, "n": int(n), "n_distinct": len(freqs),
            "freq_ratio": _round6(ratio),
            "pct_unique": _round6(pct_unique),
            "nzv": bool(ratio > 19.0 and pct_unique < 10.0)})
    return pa.Table.from_pylist(out)


NZV_SQL = """
WITH vc AS MATERIALIZED (
  SELECT 'o_orderstatus' AS col, o_orderstatus AS v,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 2
  UNION ALL
  SELECT 'o_orderpriority', o_orderpriority, CAST(count(*) AS BIGINT)
  FROM orders GROUP BY 2
), r AS MATERIALIZED (
  SELECT col, n, row_number() OVER (PARTITION BY col ORDER BY n DESC) AS rk
  FROM vc
), s AS MATERIALIZED (
  SELECT col, sum(n) AS total, count(*) AS nd,
         max(CASE WHEN rk = 1 THEN n END) AS top1,
         coalesce(max(CASE WHEN rk = 2 THEN n END), 0) AS top2
  FROM r GROUP BY col
)
SELECT col AS "column", CAST(total AS BIGINT) AS n,
       CAST(nd AS BIGINT) AS n_distinct,
       round(CASE WHEN top2 = 0 THEN CAST(top1 AS DOUBLE)
                  ELSE top1 / CAST(top2 AS DOUBLE) END, 6) AS freq_ratio,
       round(100.0 * nd / total, 6) AS pct_unique,
       ((CASE WHEN top2 = 0 THEN CAST(top1 AS DOUBLE)
              ELSE top1 / CAST(top2 AS DOUBLE) END) > 19.0
        AND 100.0 * nd / total < 10.0) AS nzv
FROM s ORDER BY "column"
"""


# ---------------------------------------------------------------------------
# Embedding-column integrity audit: zero-norm and non-finite vectors
# plus the norm's spread — the vector-payload analog of the numeric
# range checks (north_rule's html/text non-null family applied to the
# list<float> column every similarity operator depends on). Vectorized
# per-batch norms (float32 storage upcast to f64 on BOTH sides), one
# 5-number partial per batch merged on the driver.
# ---------------------------------------------------------------------------

def embedding_norm_audit(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        flat = (emb.combine_chunks().flatten()
                .to_numpy(zero_copy_only=False).astype(np.float64))
        mat = flat.reshape(batch.num_rows, -1)
        finite = np.isfinite(mat).all(axis=1)
        norm = np.sqrt(np.sum(mat * mat, axis=1))
        return pa.table({
            "n": pa.array([batch.num_rows], type=pa.int64()),
            "n_nonfinite": pa.array([int((~finite).sum())], type=pa.int64()),
            "n_zero_norm": pa.array([int((norm == 0.0).sum())],
                                    type=pa.int64()),
            "sum_norm": pa.array([float(norm[finite].sum())],
                                 type=pa.float64()),
            "min_norm": pa.array([float(norm[finite].min())
                                  if finite.any() else np.inf],
                                 type=pa.float64()),
            "max_norm": pa.array([float(norm[finite].max())
                                  if finite.any() else -np.inf],
                                 type=pa.float64())})

    parts = collect_pylist(ds.map_batches(partial, batch_format="pyarrow"))
    n = sum(p["n"] for p in parts)
    n_bad = sum(p["n_nonfinite"] for p in parts)
    return pa.Table.from_pylist([{
        "n": n,
        "n_nonfinite": n_bad,
        "n_zero_norm": sum(p["n_zero_norm"] for p in parts),
        "mean_norm": _round6(sum(p["sum_norm"] for p in parts) / (n - n_bad)),
        "min_norm": _round6(min(p["min_norm"] for p in parts)),
        "max_norm": _round6(max(p["max_norm"] for p in parts))}])


EMB_NORM_SQL = """
WITH x AS MATERIALIZED (
  SELECT vec_id, unnest(embedding) AS e FROM embeddings
), v AS MATERIALIZED (
  SELECT vec_id,
         sqrt(sum(CAST(e AS DOUBLE) * CAST(e AS DOUBLE))) AS nrm,
         max(CASE WHEN NOT isfinite(CAST(e AS DOUBLE)) THEN 1 ELSE 0 END)
           AS bad
  FROM x GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(bad) AS BIGINT) AS n_nonfinite,
       CAST(sum(CASE WHEN bad = 0 AND nrm = 0.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_zero_norm,
       round(sum(CASE WHEN bad = 0 THEN nrm END)
             / CAST(sum(CASE WHEN bad = 0 THEN 1 ELSE 0 END) AS DOUBLE), 6)
         AS mean_norm,
       round(min(CASE WHEN bad = 0 THEN nrm END), 6) AS min_norm,
       round(max(CASE WHEN bad = 0 THEN nrm END), 6) AS max_norm
FROM v
"""


# ---------------------------------------------------------------------------
# Duplicate rate per source feed: docs vs distinct texts per
# documents.source — the per-feed breakdown of the corpus dup rate
# (datacard reports it corpus-wide; a poisoned or echoing feed shows
# up HERE first). Per-batch (source, md5(text)) partials collapse
# repeats before the shuffle; the per-source distinct count is a
# second source-bounded groupby.
# ---------------------------------------------------------------------------

def dup_rate_by_source_documents(sf_dir: str) -> pa.Table:
    import hashlib

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["text", "source"])

    def hash_partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        hs = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
        g = (pd.DataFrame({"source": batch.column("source").to_pylist(),
                           "h": hs})
             .groupby(["source", "h"], as_index=False).size()
             .rename(columns={"size": "n"}))
        return from_pandas_clean(g, preserve_index=False)

    per_hash = (ds.map_batches(hash_partial, batch_format="pyarrow")
                .groupby(["source", "h"]).aggregate(Sum("n", alias_name="n")))

    def src_partial(batch: pa.Table) -> pa.Table:
        g = (pd.DataFrame({"source": batch.column("source").to_pylist(),
                           "n": batch.column("n").to_numpy(
                               zero_copy_only=False)})
             .groupby("source", as_index=False)
             .agg(n_docs=("n", "sum"), n_distinct=("n", "size")))
        return from_pandas_clean(g, preserve_index=False)

    agg = (per_hash.map_batches(src_partial, batch_format="pyarrow")
           .groupby("source").aggregate(Sum("n_docs", alias_name="n_docs"),
                                        Sum("n_distinct",
                                            alias_name="n_distinct")))
    rows = sorted(collect_pylist(agg), key=lambda r: r["source"])
    return pa.Table.from_pylist([{
        "source": r["source"], "n_docs": int(r["n_docs"]),
        "n_distinct": int(r["n_distinct"]),
        "dup_rate": _round6((r["n_docs"] - r["n_distinct"]) / r["n_docs"])}
        for r in rows])


DUP_RATE_BY_SOURCE_SQL = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT coalesce(text, '')) AS BIGINT) AS n_distinct,
       round((count(*) - count(DISTINCT coalesce(text, '')))
             / CAST(count(*) AS DOUBLE), 6) AS dup_rate
FROM documents GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# props JSON conformance: does every events.props payload parse as a
# JSON object carrying the required integer key "k"? The
# semi-structured-column schema check (M3's dtype-coercion contract
# extended to nested payloads; json_extract_events ASSUMES this holds
# — this check is what tells you when it stops holding). Per-row parse
# is the operator's nature (like json_extract); counts merge as sums.
# ---------------------------------------------------------------------------

def props_conformance_events(sf_dir: str) -> pa.Table:
    import json as _json

    ds = _read(sf_dir, "events", ["props"])

    def partial(batch: pa.Table) -> pa.Table:
        n_valid = n_obj = n_k = 0
        vals = batch.column("props").to_pylist()
        for p in vals:
            try:
                o = _json.loads(p) if p is not None else None
            except (ValueError, TypeError):
                continue
            if o is None:
                continue
            n_valid += 1
            if isinstance(o, dict):
                n_obj += 1
                if isinstance(o.get("k"), int):
                    n_k += 1
        return pa.table({
            "n": pa.array([len(vals)], type=pa.int64()),
            "n_valid_json": pa.array([n_valid], type=pa.int64()),
            "n_object": pa.array([n_obj], type=pa.int64()),
            "n_with_k": pa.array([n_k], type=pa.int64())})

    parts = collect_pylist(ds.map_batches(partial, batch_format="pyarrow"))
    n = sum(p["n"] for p in parts)
    n_k = sum(p["n_with_k"] for p in parts)
    return pa.Table.from_pylist([{
        "n": n,
        "n_valid_json": sum(p["n_valid_json"] for p in parts),
        "n_object": sum(p["n_object"] for p in parts),
        "n_with_k": n_k,
        "conformance_rate": _round6(n_k / n),
        "conformant": n_k == n}])


PROPS_CONFORMANCE_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_valid(props) AS BIGINT)) AS BIGINT)
         AS n_valid_json,
       CAST(sum(CASE WHEN json_valid(props)
                     AND json_type(props::JSON) = 'OBJECT'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_object,
       CAST(sum(CASE WHEN json_valid(props)
                     AND json_type(props::JSON) = 'OBJECT'
                     AND json_type(props::JSON, '$.k') IN
                         ('BIGINT', 'UBIGINT')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
       round(sum(CASE WHEN json_valid(props)
                      AND json_type(props::JSON) = 'OBJECT'
                      AND json_type(props::JSON, '$.k') IN
                          ('BIGINT', 'UBIGINT')
                      THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS conformance_rate,
       (sum(CASE WHEN json_valid(props)
                 AND json_type(props::JSON) = 'OBJECT'
                 AND json_type(props::JSON, '$.k') IN
                     ('BIGINT', 'UBIGINT')
                 THEN 1 ELSE 0 END) = count(*)) AS conformant
FROM events
"""


# ---------------------------------------------------------------------------
# Temporal referential consistency: lineitems shipped BEFORE their
# order was placed — the cross-table ordering constraint (J3's
# referential family over time instead of keys; north_rule's warc_ts
# range check generalized to a parent-child invariant). Both sides
# large → partitioned hash join, then per-batch violation partials.
# ---------------------------------------------------------------------------

def ship_before_order_lineitem(sf_dir: str) -> pa.Table:
    from tanml_ray.pipelines.join import partitioned_join

    li = (_read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
          .map_batches(lambda b: pa.table({
              "o_orderkey": b.column("l_orderkey"),
              "ship_us": b.column("l_shipdate").cast(pa.int64())}),
              batch_format="pyarrow"))
    orders = (_read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
              .map_batches(lambda b: pa.table({
                  "o_orderkey": b.column("o_orderkey"),
                  "order_us": b.column("o_orderdate").cast(pa.int64())}),
                  batch_format="pyarrow"))
    joined = partitioned_join(li, orders, "o_orderkey", buckets=32)

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"n": pd.Series([], dtype="int64"),
                                 "bad": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "n": [len(df)],
            "bad": [int((df["ship_us"] < df["order_us"]).sum())]})

    parts = collect_pylist(joined.map_batches(summarize,
                                              batch_format="pandas"))
    n = sum(p["n"] for p in parts)
    bad = sum(p["bad"] for p in parts)
    return pa.Table.from_pylist([{
        "n_lineitems": n, "n_violations": bad,
        "violation_rate": _round6(bad / n),
        "consistent": bad == 0}])


SHIP_BEFORE_ORDER_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum(CAST(l_shipdate < o_orderdate AS BIGINT)) AS BIGINT)
         AS n_violations,
       round(sum(CAST(l_shipdate < o_orderdate AS BIGINT))
             / CAST(count(*) AS DOUBLE), 6) AS violation_rate,
       (sum(CAST(l_shipdate < o_orderdate AS BIGINT)) = 0) AS consistent
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


# ---------------------------------------------------------------------------
# Derived-metadata consistency: does documents.n_chars equal the
# actual codepoint length of text? The stored-vs-recomputed audit
# (M13's row-hash idea applied to a single derived column; a stale
# n_chars silently corrupts every length-based quality filter
# downstream). One vectorized pc.utf8_length pass; null text rows are
# excluded from the check on both sides.
# ---------------------------------------------------------------------------

def metadata_consistency_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["text", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        ln = pc.utf8_length(batch.column("text"))
        valid = pc.is_valid(ln)
        mism = pc.and_(valid, pc.not_equal(
            pc.cast(ln, pa.int64()), batch.column("n_chars")))
        return pa.table({
            "n": pa.array([batch.num_rows], type=pa.int64()),
            "n_checked": pa.array([pc.sum(pc.cast(valid, pa.int64())).as_py()],
                                  type=pa.int64()),
            "n_mismatched": pa.array(
                [pc.sum(pc.cast(mism, pa.int64())).as_py() or 0],
                type=pa.int64())})

    parts = collect_pylist(ds.map_batches(partial, batch_format="pyarrow"))
    n = sum(p["n"] for p in parts)
    checked = sum(p["n_checked"] for p in parts)
    bad = sum(p["n_mismatched"] for p in parts)
    return pa.Table.from_pylist([{
        "n": n, "n_checked": checked, "n_mismatched": bad,
        "mismatch_rate": _round6(bad / checked),
        "consistent": bad == 0}])


METADATA_CONSISTENCY_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(count(text) AS BIGINT) AS n_checked,
       CAST(coalesce(sum(CAST(n_chars <> length(text) AS BIGINT)), 0)
            AS BIGINT) AS n_mismatched,
       round(coalesce(sum(CAST(n_chars <> length(text) AS BIGINT)), 0)
             / CAST(count(text) AS DOUBLE), 6) AS mismatch_rate,
       (coalesce(sum(CAST(n_chars <> length(text) AS BIGINT)), 0) = 0)
         AS consistent
FROM documents
"""


# ---------------------------------------------------------------------------
# Declared value-range conformance over the lineitem measure columns
# (quantity ∈ [1,50], discount ∈ [0,0.10], tax ∈ [0,0.08] — the TPC-H
# generation contract): the engine-side generalization of the pages
# pipeline's range constraint (north_rule warc_ts range rule;
# reference IQR bounds profiling.py:176-187 DERIVES bounds, this
# check ENFORCES declared ones). One vectorized pass, per-column
# violation partials merged by summation.
# ---------------------------------------------------------------------------

_RANGE_SPECS = [("l_quantity", 1.0, 50.0), ("l_discount", 0.0, 0.10),
                ("l_tax", 0.0, 0.08)]


def range_conformance_lineitem(sf_dir: str) -> pa.Table:
    cols = [c for c, _, _ in _RANGE_SPECS]
    ds = _read(sf_dir, "lineitem", cols)

    def partial(batch: pa.Table) -> pa.Table:
        names, lows, highs, bads = [], [], [], []
        for col, lo, hi in _RANGE_SPECS:
            v = batch.column(col).to_numpy(zero_copy_only=False)
            names.append(col)
            lows.append(lo)
            highs.append(hi)
            bads.append(int(((v < lo) | (v > hi)).sum()))
        return pa.table({
            "column": pa.array(names),
            "lo": pa.array(lows, type=pa.float64()),
            "hi": pa.array(highs, type=pa.float64()),
            "n": pa.array([batch.num_rows] * len(names), type=pa.int64()),
            "violations": pa.array(bads, type=pa.int64())})

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("column").aggregate(Sum("n", alias_name="n"),
                                        Sum("violations",
                                            alias_name="violations")))
    spec = {c: (lo, hi) for c, lo, hi in _RANGE_SPECS}
    rows = sorted(collect_pylist(agg), key=lambda r: r["column"])
    return pa.Table.from_pylist([{
        "column": r["column"],
        "lo": spec[r["column"]][0], "hi": spec[r["column"]][1],
        "n": int(r["n"]), "violations": int(r["violations"]),
        "violation_rate": _round6(r["violations"] / r["n"]),
        "conformant": r["violations"] == 0} for r in rows])


RANGE_CONFORMANCE_SQL = """
WITH s(col, lo, hi) AS (VALUES
  ('l_quantity', 1.0, 50.0), ('l_discount', 0.0, 0.10),
  ('l_tax', 0.0, 0.08)
), v AS MATERIALIZED (
  SELECT s.col,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST((CASE s.col
                        WHEN 'l_quantity' THEN l.l_quantity
                        WHEN 'l_discount' THEN l.l_discount
                        ELSE l.l_tax END) < s.lo
                   OR (CASE s.col
                       WHEN 'l_quantity' THEN l.l_quantity
                       WHEN 'l_discount' THEN l.l_discount
                       ELSE l.l_tax END) > s.hi AS BIGINT)) AS BIGINT)
           AS violations
  FROM lineitem l CROSS JOIN s GROUP BY s.col
)
SELECT v.col AS "column", s.lo, s.hi, v.n, v.violations,
       round(v.violations / CAST(v.n AS DOUBLE), 6) AS violation_rate,
       (v.violations = 0) AS conformant
FROM v JOIN s ON v.col = s.col ORDER BY v.col
"""


# ---------------------------------------------------------------------------
# Categorical whitelist audit: every flag/status column checked
# against its declared vocabulary in one pass (J3's broadcast
# referential check rolled up per column instead of per row —
# violation COUNTS per column, the report shape the reference's risk
# flags use, profiling.py:37-43). Vocabularies are broadcast inside
# the closure; the per-batch partial is a pc.is_in mask sum.
# ---------------------------------------------------------------------------

_WHITELISTS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]}


def whitelist_audit_lineitem(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", list(_WHITELISTS))

    def partial(batch: pa.Table) -> pa.Table:
        names, bads = [], []
        for col, vocab in _WHITELISTS.items():
            ok = pc.is_in(batch.column(col), value_set=pa.array(vocab))
            bad = batch.num_rows - pc.sum(pc.cast(ok, pa.int64())).as_py()
            names.append(col)
            bads.append(int(bad))
        return pa.table({
            "column": pa.array(names),
            "n": pa.array([batch.num_rows] * len(names), type=pa.int64()),
            "violations": pa.array(bads, type=pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("column").aggregate(Sum("n", alias_name="n"),
                                        Sum("violations",
                                            alias_name="violations")))
    rows = sorted(collect_pylist(agg), key=lambda r: r["column"])
    return pa.Table.from_pylist([{
        "column": r["column"],
        "vocabulary": ",".join(_WHITELISTS[r["column"]]),
        "n": int(r["n"]), "violations": int(r["violations"]),
        "conformant": r["violations"] == 0} for r in rows])


WHITELIST_AUDIT_SQL = """
SELECT 'l_linestatus' AS "column", 'F,O' AS vocabulary,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(l_linestatus NOT IN ('F', 'O')
                     OR l_linestatus IS NULL AS BIGINT)) AS BIGINT)
         AS violations,
       (sum(CAST(l_linestatus NOT IN ('F', 'O')
                 OR l_linestatus IS NULL AS BIGINT)) = 0) AS conformant
FROM lineitem
UNION ALL
SELECT 'l_returnflag', 'A,N,R', CAST(count(*) AS BIGINT),
       CAST(sum(CAST(l_returnflag NOT IN ('A', 'N', 'R')
                     OR l_returnflag IS NULL AS BIGINT)) AS BIGINT),
       (sum(CAST(l_returnflag NOT IN ('A', 'N', 'R')
                 OR l_returnflag IS NULL AS BIGINT)) = 0)
FROM lineitem
ORDER BY "column"
"""


# ---------------------------------------------------------------------------
# Measure sanity per event type: null / non-positive / non-finite
# `value` counts — the per-group positivity contract for additive
# metrics (revenue-style measures must be > 0; A2's null-rate check
# extended with the sign and finiteness dimensions).
# ---------------------------------------------------------------------------

def measure_sanity_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        et = batch.column("event_type").to_pylist()
        isnan = np.isnan(v)
        g = (pd.DataFrame({
            "event_type": et,
            "n": 1,
            "n_null": isnan.astype(np.int64),
            "n_nonpositive": ((~isnan) & (v <= 0)).astype(np.int64),
            "n_nonfinite": (~np.isfinite(v) & ~isnan).astype(np.int64)})
            .groupby("event_type", as_index=False).sum())
        return from_pandas_clean(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("n_null", alias_name="n_null"),
                      Sum("n_nonpositive", alias_name="n_nonpositive"),
                      Sum("n_nonfinite", alias_name="n_nonfinite")))
    rows = sorted(collect_pylist(agg), key=lambda r: r["event_type"])
    return pa.Table.from_pylist([{
        "event_type": r["event_type"], "n": int(r["n"]),
        "n_null": int(r["n_null"]),
        "n_nonpositive": int(r["n_nonpositive"]),
        "n_nonfinite": int(r["n_nonfinite"]),
        "sane": (r["n_null"] + r["n_nonpositive"] + r["n_nonfinite"]) == 0}
        for r in rows])


MEASURE_SANITY_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value IS NULL OR isnan(value) AS BIGINT)) AS BIGINT)
         AS n_null,
       CAST(sum(CAST(value IS NOT NULL AND NOT isnan(value)
                     AND value <= 0 AS BIGINT)) AS BIGINT) AS n_nonpositive,
       CAST(sum(CAST(value IS NOT NULL AND NOT isnan(value)
                     AND NOT isfinite(value) AS BIGINT)) AS BIGINT)
         AS n_nonfinite,
       (sum(CAST(value IS NULL OR isnan(value) AS BIGINT))
        + sum(CAST(value IS NOT NULL AND NOT isnan(value)
                   AND value <= 0 AS BIGINT))
        + sum(CAST(value IS NOT NULL AND NOT isnan(value)
                   AND NOT isfinite(value) AS BIGINT)) = 0) AS sane
FROM events GROUP BY event_type ORDER BY event_type
"""

# ---------------------------------------------------------------------------
# Kruskal-Wallis H test: the K-group generalization of the Mann-Whitney
# rank test above — does l_quantity's distribution differ across the
# three returnflag groups? Same scale shape: ONE grid-bounded (g, v)
# combiner shuffle, midrank walk + rank-sum arithmetic on the driver
# over the bounded grid; tie-corrected H per the standard formula.
# ---------------------------------------------------------------------------

_KRUSKAL_GROUPS = ("A", "N", "R")


def kruskal_quantity_returnflag(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "g": batch.column("l_returnflag").to_numpy(zero_copy_only=False),
            "v": np.rint(batch.column("l_quantity")
                         .to_numpy(zero_copy_only=False)).astype(np.int64)})
        return df.groupby(["g", "v"], as_index=False).agg(n=("v", "size"))

    grid: dict[int, dict[str, int]] = {}
    for r in collect_pylist(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["g", "v"]).aggregate(Sum("n", alias_name="n"))):
        grid.setdefault(int(r["v"]), {})[r["g"]] = int(r["n"])
    ng = {g: 0 for g in _KRUSKAL_GROUPS}
    rg = {g: 0.0 for g in _KRUSKAL_GROUPS}
    tie_term = 0.0
    below = 0
    for v in sorted(grid):
        t = sum(grid[v].values())
        midrank = below + (t + 1) / 2.0
        for g, c in grid[v].items():
            ng[g] += c
            rg[g] += c * midrank
        tie_term += t ** 3 - t
        below += t
    n = sum(ng.values())
    h = (12.0 / (n * (n + 1.0))
         * (rg["A"] * rg["A"] / ng["A"] + rg["N"] * rg["N"] / ng["N"]
            + rg["R"] * rg["R"] / ng["R"])
         - 3.0 * (n + 1.0))
    corr = 1.0 - tie_term / (float(n) ** 3 - n)
    return pa.Table.from_pylist([{
        "n": n, "dof": len(_KRUSKAL_GROUPS) - 1,
        "h": _round6(h), "h_tie_corrected": _round6(h / corr)}])


KRUSKAL_SQL = """
WITH src AS (
  SELECT l_returnflag AS g, CAST(round(l_quantity) AS BIGINT) AS v
  FROM lineitem),
grid AS (
  SELECT v,
         CAST(count(*) FILTER (WHERE g = 'A') AS BIGINT) AS ca,
         CAST(count(*) FILTER (WHERE g = 'N') AS BIGINT) AS cn,
         CAST(count(*) FILTER (WHERE g = 'R') AS BIGINT) AS cr
  FROM src GROUP BY v),
walk AS (
  SELECT v, ca, cn, cr, ca + cn + cr AS t,
         coalesce(sum(ca + cn + cr) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS below
  FROM grid),
s AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cn) AS BIGINT) AS nn,
         CAST(sum(cr) AS BIGINT) AS nr,
         sum(ca * (below + (t + 1) / 2.0)) AS ra,
         sum(cn * (below + (t + 1) / 2.0)) AS rn,
         sum(cr * (below + (t + 1) / 2.0)) AS rr,
         sum(t * t * t - t) AS tie
  FROM walk),
f AS (
  SELECT na + nn + nr AS n, na, nn, nr, ra, rn, rr, tie FROM s)
SELECT n, 2 AS dof,
       round(12.0 / (n * (n + 1.0))
             * (ra * ra / na + rn * rn / nn + rr * rr / nr)
             - 3.0 * (n + 1.0), 6) AS h,
       round((12.0 / (n * (n + 1.0))
              * (ra * ra / na + rn * rn / nn + rr * rr / nr)
              - 3.0 * (n + 1.0))
             / (1.0 - tie / (CAST(n AS DOUBLE) ** 3 - n)), 6)
         AS h_tie_corrected
FROM f
"""


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve over order→ship delay with administrative
# censoring at 60 days — duration analysis as a data-quality lens (how
# long until a placed order ships; rows that take > 60 days are
# censored at the cutoff, exactly the right-censoring a live feed
# shows). Both sides large → partitioned hash join; ONE bounded
# (t, event) value-count combiner (≤ 61 distinct delay days); the KM
# product-limit walk is driver arithmetic over that bounded grid,
# computed as exp(Σ ln(1 - d/n_risk)) to mirror the SQL oracle's float
# op sequence term for term.
# ---------------------------------------------------------------------------

_KM_CUTOFF_DAYS = 60


def km_ship_delay_orders(sf_dir: str) -> pa.Table:
    import math

    from ray.data.aggregate import Sum
    from tanml_ray.pipelines.join import partitioned_join

    li = (_read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
          .map_batches(lambda b: pa.table({
              "o_orderkey": b.column("l_orderkey"),
              "ship_day": pc.floor_temporal(b.column("l_shipdate"),
                                            unit="day").cast(pa.int64())}),
              batch_format="pyarrow"))
    orders = (_read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
              .map_batches(lambda b: pa.table({
                  "o_orderkey": b.column("o_orderkey"),
                  "order_day": pc.floor_temporal(b.column("o_orderdate"),
                                                 unit="day")
                  .cast(pa.int64())}),
                  batch_format="pyarrow"))
    joined = partitioned_join(li, orders, "o_orderkey", buckets=32)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"t": pd.Series([], dtype="int64"),
                                 "ev": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        us_per_day = 86_400_000_000
        delay = np.maximum(
            (df["ship_day"].to_numpy() - df["order_day"].to_numpy())
            // us_per_day, 0)
        t = np.minimum(delay, _KM_CUTOFF_DAYS)
        ev = (delay <= _KM_CUTOFF_DAYS).astype(np.int64)
        out = pd.DataFrame({"t": t, "ev": ev})
        return out.groupby(["t", "ev"], as_index=False).agg(n=("t", "size"))

    grid: dict[int, list] = {}
    for r in collect_pylist(
            joined.map_batches(partial, batch_format="pandas")
            .groupby(["t", "ev"]).aggregate(Sum("n", alias_name="n"))):
        a = grid.setdefault(int(r["t"]), [0, 0])   # [events, censored]
        a[0 if r["ev"] == 1 else 1] += int(r["n"])
    total = sum(d + c for d, c in grid.values())
    out = []
    removed = 0
    log_acc = 0.0
    for t in sorted(grid):
        d, c = grid[t]
        n_risk = total - removed
        if d > 0:
            frac = 1.0 - d / float(n_risk)
            log_acc += math.log(frac) if frac > 0.0 else float("-inf")
            out.append({"delay_days": t, "n_at_risk": n_risk,
                        "n_events": d, "n_censored": c,
                        "survival": _round6(math.exp(log_acc))})
        removed += d + c
    return pa.Table.from_pylist(out)


KM_SHIP_DELAY_SQL = """
WITH src AS (
  SELECT greatest(date_diff('day', date_trunc('day', o_orderdate),
                            date_trunc('day', l_shipdate)), 0) AS delay
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
obs AS (
  SELECT least(delay, 60) AS t, CAST(delay <= 60 AS BIGINT) AS ev
  FROM src),
grid AS (
  SELECT t, CAST(sum(ev) AS BIGINT) AS d,
         CAST(sum(1 - ev) AS BIGINT) AS c,
         CAST(count(*) AS BIGINT) AS n
  FROM obs GROUP BY t),
walk AS (
  SELECT t, d, c,
         (SELECT sum(n) FROM grid)
         - coalesce(sum(n) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM grid),
surv AS (
  SELECT t, d, c, n_risk,
         exp(sum(CASE WHEN d > 0
                      THEN ln(1.0 - d / CAST(n_risk AS DOUBLE))
                      ELSE 0.0 END)
             OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
  FROM walk)
SELECT t AS delay_days, CAST(n_risk AS BIGINT) AS n_at_risk,
       d AS n_events, c AS n_censored, round(s, 6) AS survival
FROM surv WHERE d > 0 ORDER BY t
"""


# ---------------------------------------------------------------------------
# Lag-k autocorrelation (k = 1..7) of the daily event volume — the
# seasonality/monitoring companion to volume_control_events: a strong
# lag-7 ACF means weekly periodicity, a near-1 lag-1 ACF means the
# volume series drifts rather than oscillates. ONE daily-count
# combiner shuffle (grid bounded by the calendar); the ACF is EXACT
# integer arithmetic on the driver — numerator and denominator are
# computed on the N·x - S residual scale as Python bigints, so there
# is no float summation order to disagree with the SQL oracle; the
# single final division happens in doubles on both sides. Pairs are
# formed over OBSERVED days (day and day+k both present), matching the
# SQL self-join.
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7


def acf_daily_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        df = pd.DataFrame({"day": day.to_numpy(zero_copy_only=False)})
        return df.groupby("day", as_index=False).agg(n=("day", "size"))

    rows = collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day").aggregate(Sum("n", alias_name="n")))
    x = {pd.Timestamp(r["day"]): int(r["n"]) for r in rows}
    n_days = len(x)
    sx = sum(x.values())
    den = sum((n_days * v - sx) ** 2 for v in x.values())
    out = []
    for lag in range(1, _ACF_MAX_LAG + 1):
        off = pd.Timedelta(days=lag)
        num = sum((n_days * v - sx) * (n_days * x[day + off] - sx)
                  for day, v in x.items() if day + off in x)
        out.append({"lag": lag, "acf": _round6(float(num) / float(den))})
    return pa.Table.from_pylist(out)


ACF_DAILY_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS sx
  FROM daily),
num AS (
  SELECT l.lag AS lag,
         CAST(sum((s.n * a.x - s.sx) * (s.n * b.x - s.sx)) AS HUGEINT)
           AS num
  FROM daily a
  CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6), (7)) AS l(lag)
  CROSS JOIN s
  JOIN daily b ON b.day = a.day + l.lag * INTERVAL '1 day'
  GROUP BY 1),
den AS (
  SELECT CAST(sum((s.n * x - s.sx) * (s.n * x - s.sx)) AS HUGEINT) AS den
  FROM daily CROSS JOIN s)
SELECT lag, round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf
FROM num CROSS JOIN den ORDER BY lag
"""


# ---------------------------------------------------------------------------
# Blocked fuzzy record linkage: Levenshtein near-match pairs over the
# documents table — the classic two-stage linkage shape (cheap blocking
# key → exact edit distance inside each block). Blocking key is
# (lang, first-2-chars); candidates compare the 40-char text prefix
# with the vectorized byte-level Levenshtein kernel
# (kernels/editdist.py, bit-identical to DuckDB's `levenshtein`), keep
# distance <= 4. Scale shape: ONE coarse hash(block)%P shuffle (every
# block lands whole in one partition), in-partition pair expansion is
# numpy triu over each block with an exact |byte-len diff| > threshold
# prefilter (length difference lower-bounds edit distance); a raising
# budget guard names the fix (a stronger blocking key, e.g. a MinHash
# band) if any single block exceeds the pair budget — at web scale the
# (lang, prefix) key MUST be replaced by a sharper one; the machinery
# is key-agnostic.
# ---------------------------------------------------------------------------

_FUZZY_PREFIX = 40
_FUZZY_THRESHOLD = 4
_FUZZY_MAX_BLOCK = 4096


def fuzzy_match_documents(sf_dir: str) -> pa.Table:
    from tanml_ray.kernels.editdist import levenshtein_pairs
    from tanml_ray.stages.shuffle import with_coarse_partition

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def project(batch: pa.Table) -> pa.Table:
        tbl = batch.filter(pc.is_valid(batch.column("text")))
        text = tbl.column("text")
        block = pc.binary_join_element_wise(
            tbl.column("lang"), pc.utf8_slice_codeunits(text, 0, 2), "\x1f")
        return pa.table({"doc_id": tbl.column("doc_id"), "block": block,
                         "pre": pc.utf8_slice_codeunits(text, 0,
                                                        _FUZZY_PREFIX)})

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id_a": pd.Series([], dtype="int64"),
                              "doc_id_b": pd.Series([], dtype="int64"),
                              "dist": pd.Series([], dtype="int64")})
        ia, ib, sa, sb = [], [], [], []
        for _, blk in g.groupby("block", sort=False):
            m = len(blk)
            if m < 2:
                continue
            if m > _FUZZY_MAX_BLOCK:
                raise ValueError(
                    f"fuzzy_match block of {m} rows exceeds the "
                    f"{_FUZZY_MAX_BLOCK}-row pair budget; use a sharper "
                    "blocking key (e.g. a MinHash band) for this corpus")
            blk = blk.sort_values("doc_id")
            ids = blk["doc_id"].to_numpy()
            pres = blk["pre"].to_numpy()
            iu, ju = np.triu_indices(m, k=1)
            ia.append(ids[iu])
            ib.append(ids[ju])
            sa.append(pres[iu])
            sb.append(pres[ju])
        if not ia:
            return empty
        a_id = np.concatenate(ia).astype(np.int64)
        b_id = np.concatenate(ib).astype(np.int64)
        a_s = np.concatenate(sa)
        b_s = np.concatenate(sb)
        # vectorized UTF-8 byte lengths (|len diff| lower-bounds the
        # edit distance): Arrow binary_length counts BYTES on strings
        la = pc.binary_length(pa.array(a_s, type=pa.string())) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        lb = pc.binary_length(pa.array(b_s, type=pa.string())) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cand = np.abs(la - lb) <= _FUZZY_THRESHOLD
        if not cand.any():
            return empty
        a_id, b_id, a_s, b_s = a_id[cand], b_id[cand], a_s[cand], b_s[cand]
        d = levenshtein_pairs(list(a_s), list(b_s))
        keep = d <= _FUZZY_THRESHOLD
        return pd.DataFrame({"doc_id_a": a_id[keep], "doc_id_b": b_id[keep],
                             "dist": d[keep]})

    rows = collect_pylist(
        with_coarse_partition(
            ds.map_batches(project, batch_format="pyarrow"), "block")
        .groupby("__upart").map_groups(per_partition, batch_format="pandas"))
    rows.sort(key=lambda r: (r["doc_id_a"], r["doc_id_b"]))
    return pa.table({
        "doc_id_a": pa.array([r["doc_id_a"] for r in rows], type=pa.int64()),
        "doc_id_b": pa.array([r["doc_id_b"] for r in rows], type=pa.int64()),
        "dist": pa.array([r["dist"] for r in rows], type=pa.int64())})


FUZZY_MATCH_SQL = """
WITH d AS (
  SELECT doc_id, lang || chr(31) || substr(text, 1, 2) AS block,
         substr(text, 1, 40) AS pre
  FROM documents WHERE text IS NOT NULL)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(levenshtein(a.pre, b.pre) AS BIGINT) AS dist
FROM d a JOIN d b ON a.block = b.block AND a.doc_id < b.doc_id
WHERE levenshtein(a.pre, b.pre) <= 4
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Benford first-significant-digit audit over o_totalprice — the classic
# fabricated-data / unit-mix detector for money columns (no reference
# analog; TanML's validate suite has range checks only). Digit is taken
# from the CENTS integer (leading digit is invariant under the *100
# scaling), so extraction is exact string math, never float log10
# binning. ONE 9-row combiner shuffle; expected shares and chi-square
# contributions are driver arithmetic over the bounded digit grid.
# ---------------------------------------------------------------------------


def benford_totalprice_orders(sf_dir: str) -> pa.Table:
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        digit = pd.Series(cents).astype(str).str[0].astype(np.int64)
        return (pd.DataFrame({"digit": digit})
                .groupby("digit", as_index=False).agg(n=("digit", "size")))

    counts = {int(r["digit"]): int(r["n"]) for r in collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("digit").aggregate(Sum("n", alias_name="n")))}
    total = sum(counts.values())
    out = []
    for d in range(1, 10):
        n = counts.get(d, 0)
        expected = math.log10(1.0 + 1.0 / d)
        e_cnt = total * expected
        out.append({"digit": d, "n": n,
                    "share": _round6(n / total),
                    "expected": _round6(expected),
                    "chi2_term": _round6((n - e_cnt) ** 2 / e_cnt)})
    return pa.Table.from_pylist(out)


BENFORD_CHI2_SQL = """
WITH obs AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM obs),
grid AS (
  SELECT d.digit, coalesce(obs.n, 0) AS n,
         log10(1.0 + CAST(1 AS DOUBLE) / d.digit) AS expected, tot.total
  FROM (SELECT unnest(generate_series(1, 9)) AS digit) d
  LEFT JOIN obs USING (digit) CROSS JOIN tot)
SELECT digit, n,
       round(CAST(n AS DOUBLE) / total, 6) AS share,
       round(expected, 6) AS expected,
       round((n - total * expected) * (n - total * expected)
             / (total * expected), 6) AS chi2_term
FROM grid ORDER BY digit
"""


# ---------------------------------------------------------------------------
# Tabular-CUSUM changepoint detector over daily event volume — the SPC
# companion to volume_control_events (Shewhart) that catches SMALL
# persistent level shifts a 3-sigma chart misses. Standardized daily
# counts feed the two one-sided recursions s± = max(0, s± ± z - k)
# with reference value k = 0.5 sigma and decision interval h = 5 sigma.
# ONE calendar-bounded daily-count combiner shuffle; the recursion is
# driver float arithmetic in chronological order, mirrored op-for-op by
# the SQL oracle's recursive CTE (same IEEE sequence → exact at 6 dp).
# ---------------------------------------------------------------------------

_CUSUM_K = 0.5
_CUSUM_H = 5.0


def _daily_event_counts(sf_dir: str) -> list[dict]:
    """(day, n) rows for the events table, chronologically sorted."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(batch.column("ts"), pa.date32())
        g = (pd.DataFrame({"day": day.to_pylist()})
             .groupby("day", as_index=False).size()
             .rename(columns={"size": "n"}))
        return from_pandas_clean(g, preserve_index=False)

    return sorted(collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day").aggregate(Sum("n", alias_name="n"))),
        key=lambda r: r["day"])


def cusum_chart_events(sf_dir: str) -> pa.Table:
    rows = _daily_event_counts(sf_dir)
    n = np.array([r["n"] for r in rows], dtype=np.float64)
    mu = float(n.sum() / len(n))
    sd = float(np.sqrt(np.sum((n - mu) ** 2) / len(n)))
    sp = sn = 0.0
    out = []
    for i, r in enumerate(rows):
        z = (float(n[i]) - mu) / sd
        sp = max(0.0, sp + z - _CUSUM_K)
        sn = max(0.0, sn - z - _CUSUM_K)
        out.append({"day": r["day"].strftime("%Y-%m-%d"), "n": int(r["n"]),
                    "z": _round6(z), "cusum_pos": _round6(sp),
                    "cusum_neg": _round6(sn),
                    "alert": bool(sp > _CUSUM_H or sn > _CUSUM_H)})
    return pa.Table.from_pylist(out)


CUSUM_CHART_SQL = """
WITH RECURSIVE d AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
s AS (SELECT avg(n) AS mu, stddev_pop(n) AS sd FROM d),
z AS (
  SELECT row_number() OVER (ORDER BY day) AS rn, day, n,
         (n - s.mu) / s.sd AS z
  FROM d, s),
walk AS (
  SELECT rn, day, n, z,
         greatest(0.0, z - 0.5) AS sp, greatest(0.0, -z - 0.5) AS sn
  FROM z WHERE rn = 1
  UNION ALL
  SELECT z.rn, z.day, z.n, z.z,
         greatest(0.0, w.sp + z.z - 0.5),
         greatest(0.0, w.sn - z.z - 0.5)
  FROM z JOIN walk w ON z.rn = w.rn + 1)
SELECT strftime(day, '%Y-%m-%d') AS day, n, round(z, 6) AS z,
       round(sp, 6) AS cusum_pos, round(sn, 6) AS cusum_neg,
       (sp > 5.0 OR sn > 5.0) AS alert
FROM walk ORDER BY day
"""


# ---------------------------------------------------------------------------
# EWMA control chart over daily event volume — the textbook
# Lucas-Saccucci chart that completes the SPC trio (Shewhart / CUSUM /
# EWMA): the smoothed statistic e_t = λx_t + (1−λ)e_{t−1} (e_0 = μ) is
# compared against the IN-CONTROL center ± 3σ·sqrt(λ/(2−λ)), with μ/σ
# estimated from the first 7 baseline days (a full-series μ would
# normalize the very shift the chart exists to catch). Same scale
# shape as cusum_chart_events: one bounded daily combiner shuffle,
# driver recursion mirrored op-for-op by a recursive-CTE oracle; every
# SQL literal is forced to DOUBLE for identical IEEE sequences.
# ---------------------------------------------------------------------------

_EWMA_LAMBDA = 0.2
_EWMA_BASELINE_DAYS = 7


def ewma_volume_events(sf_dir: str) -> pa.Table:
    import math

    rows = _daily_event_counts(sf_dir)
    base = np.array([r["n"] for r in rows[:_EWMA_BASELINE_DAYS]],
                    dtype=np.float64)
    mu = float(base.sum() / len(base))
    sd = float(np.sqrt(np.sum((base - mu) ** 2) / len(base)))
    limit = 3.0 * sd * math.sqrt(_EWMA_LAMBDA / (2.0 - _EWMA_LAMBDA))
    out = []
    ewma = mu
    for r in rows:
        ewma = _EWMA_LAMBDA * float(r["n"]) + (1.0 - _EWMA_LAMBDA) * ewma
        out.append({"day": r["day"].strftime("%Y-%m-%d"), "n": int(r["n"]),
                    "ewma": _round6(ewma),
                    "alert": bool(abs(ewma - mu) > limit)})
    return pa.Table.from_pylist(out)


EWMA_SQL = """
WITH RECURSIVE d AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
z AS (SELECT row_number() OVER (ORDER BY day) AS rn, day, n FROM d),
s AS (
  SELECT avg(n) AS mu,
         3.0 * stddev_pop(n)
         * sqrt(CAST(0.2 AS DOUBLE) / CAST(1.8 AS DOUBLE)) AS lim
  FROM z WHERE rn <= 7),
walk AS (
  SELECT rn, day, n,
         CAST(0.2 AS DOUBLE) * n + CAST(0.8 AS DOUBLE) * s.mu AS ewma
  FROM z CROSS JOIN s WHERE rn = 1
  UNION ALL
  SELECT z.rn, z.day, z.n,
         CAST(0.2 AS DOUBLE) * z.n + CAST(0.8 AS DOUBLE) * w.ewma
  FROM z JOIN walk w ON z.rn = w.rn + 1)
SELECT strftime(day, '%Y-%m-%d') AS day, n, round(ewma, 6) AS ewma,
       abs(ewma - s.mu) > s.lim AS alert
FROM walk CROSS JOIN s ORDER BY day
"""


# ---------------------------------------------------------------------------
# Theil-Sen robust trend over daily event volume: median of all
# pairwise slopes (y_j - y_i)/(x_j - x_i), intercept = median residual
# at that slope — the outlier-proof alternative to OLS for "is traffic
# growing?". The daily grid is calendar-bounded, so the O(D^2) pair
# expansion is DRIVER numpy over the tiny reduced table (D days →
# D(D-1)/2 slopes), never a distributed cross join; the engine mirrors
# DuckDB's quantile_cont interpolation (lo + frac*(hi-lo)) bit for bit.
# ---------------------------------------------------------------------------


def _median_duckdb(v: np.ndarray) -> float:
    """Median with DuckDB quantile_cont op order: lo + frac*(hi-lo)."""
    v = np.sort(v)
    pos = 0.5 * (len(v) - 1)
    lo = int(pos)
    frac = pos - lo
    if frac == 0.0:
        return float(v[lo])
    return float(v[lo] + frac * (v[lo + 1] - v[lo]))


def theilsen_daily_trend_events(sf_dir: str) -> pa.Table:
    rows = _daily_event_counts(sf_dir)
    epoch = pd.Timestamp("1970-01-01").date()
    x = np.array([(r["day"] - epoch).days for r in rows], dtype=np.int64)
    y = np.array([r["n"] for r in rows], dtype=np.int64)
    iu, ju = np.triu_indices(len(x), k=1)
    slopes = (y[ju] - y[iu]) / (x[ju] - x[iu]).astype(np.float64)
    slope = _median_duckdb(slopes)
    intercept = _median_duckdb(y - slope * x)
    return pa.Table.from_pylist([{
        "n_days": len(x), "n_pairs": len(slopes),
        "slope_per_day": _round6(slope), "intercept": _round6(intercept)}])


THEILSEN_SQL = """
WITH d AS (
  SELECT CAST(ts AS DATE) - DATE '1970-01-01' AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1),
pairs AS (
  SELECT (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS slope
  FROM d a JOIN d b ON b.x > a.x),
m AS (SELECT quantile_cont(slope, 0.5) AS slope,
             CAST(count(*) AS BIGINT) AS n_pairs FROM pairs),
i AS (
  SELECT quantile_cont(d.y - m.slope * d.x, 0.5) AS intercept,
         CAST(count(*) AS BIGINT) AS n_days
  FROM d CROSS JOIN m)
SELECT i.n_days, m.n_pairs, round(m.slope, 6) AS slope_per_day,
       round(i.intercept, 6) AS intercept
FROM m CROSS JOIN i
"""


# ---------------------------------------------------------------------------
# Day-of-week seasonality index over event volume: mean daily count per
# ISO weekday / grand mean daily count — the load-shape profile that
# complements acf_daily_events (which detects weekly periodicity but
# not its shape). ONE bounded daily combiner shuffle; index arithmetic
# on the 7-row driver grid.
# ---------------------------------------------------------------------------


def dow_seasonality_events(sf_dir: str) -> pa.Table:
    rows = _daily_event_counts(sf_dir)
    agg: dict[int, list] = {}
    for r in rows:
        a = agg.setdefault(r["day"].isoweekday(), [0, 0])
        a[0] += 1
        a[1] += int(r["n"])
    grand = sum(v[1] for v in agg.values()) / sum(v[0] for v in agg.values())
    return pa.Table.from_pylist([{
        "isodow": d, "days": agg[d][0], "total_events": agg[d][1],
        "mean_daily": _round6(agg[d][1] / agg[d][0]),
        "seasonal_index": _round6(agg[d][1] / agg[d][0] / grand)}
        for d in sorted(agg)])


DOW_SEASONALITY_SQL = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
g AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS grand FROM d),
w AS (
  SELECT isodow(day) AS isodow, CAST(count(*) AS BIGINT) AS days,
         CAST(sum(n) AS BIGINT) AS total_events
  FROM d GROUP BY 1)
SELECT isodow, days, total_events,
       round(CAST(total_events AS DOUBLE) / days, 6) AS mean_daily,
       round(CAST(total_events AS DOUBLE) / days / g.grand, 6)
         AS seasonal_index
FROM w CROSS JOIN g ORDER BY isodow
"""


# ---------------------------------------------------------------------------
# Multivariate Mahalanobis outlier audit over (l_quantity,
# l_extendedprice, l_discount) — the joint-distribution companion to
# the univariate z-score / modified-z checks: a row can be ordinary in
# every marginal yet impossible jointly (high quantity AND high
# discount). Two streaming passes, both combiner-first: pass 1 reduces
# to EXACT integer sufficient statistics on the cents grid (Σu_j and
# Σu_j·u_k as Python bigints / HUGEINT — overflow-free), pass 2 maps
# each batch against the broadcast (mean, Σ⁻¹) closure. Every derived
# double (covariances, 3×3 adjugate inverse, per-row quadratic form)
# is written with ONE fixed expression order mirrored verbatim by the
# SQL oracle, so engine and DuckDB run identical IEEE sequences and the
# d² > χ²₀.₉₉₉(3) outlier comparison can never straddle the threshold.
# ---------------------------------------------------------------------------

_MAHAL_THRESHOLD = 16.266  # chi-square 0.999 quantile, 3 dof


def mahalanobis_outliers_lineitem(sf_dir: str) -> pa.Table:
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    scales = [1, 100, 100]
    ds = _read(sf_dir, "lineitem", cols)

    def units(batch: pa.Table) -> list[np.ndarray]:
        return [np.rint(batch.column(c).to_numpy(zero_copy_only=False) * s)
                .astype(np.int64) for c, s in zip(cols, scales)]

    def exact_dot(a: np.ndarray, b: np.ndarray) -> int:
        m = max(int(np.abs(a).max()), 1) * max(int(np.abs(b).max()), 1)
        chunk = max(1, (1 << 62) // m)
        return sum(int(np.dot(a[i:i + chunk], b[i:i + chunk]))
                   for i in range(0, len(a), chunk))

    def partial_sums(batch: pa.Table) -> pa.Table:
        u = units(batch)
        row = {"n": batch.num_rows}
        for j in range(3):
            row[f"s{j}"] = str(int(u[j].sum()))
            for k in range(j, 3):
                row[f"s{j}{k}"] = str(exact_dot(u[j], u[k]))
        return pa.Table.from_pylist([row])

    tot: dict[str, int] = {}
    for r in collect_pylist(ds.map_batches(
            partial_sums, batch_format="pyarrow")):
        for key, v in r.items():
            tot[key] = tot.get(key, 0) + int(v)

    n = tot["n"]
    nf = float(n)
    mean = [float(tot[f"s{j}"]) / nf for j in range(3)]
    # cov_jk = (n·Σu_ju_k − Σu_j·Σu_k) / n² with an exact bigint numerator
    cov = [[0.0] * 3 for _ in range(3)]
    for j in range(3):
        for k in range(j, 3):
            num = n * tot[f"s{j}{k}"] - tot[f"s{j}"] * tot[f"s{k}"]
            cov[j][k] = cov[k][j] = float(num) / (nf * nf)
    c = cov
    det = (c[0][0] * (c[1][1] * c[2][2] - c[1][2] * c[1][2])
           - c[0][1] * (c[0][1] * c[2][2] - c[1][2] * c[0][2])
           + c[0][2] * (c[0][1] * c[1][2] - c[1][1] * c[0][2]))
    a00 = (c[1][1] * c[2][2] - c[1][2] * c[1][2]) / det
    a11 = (c[0][0] * c[2][2] - c[0][2] * c[0][2]) / det
    a22 = (c[0][0] * c[1][1] - c[0][1] * c[0][1]) / det
    a01 = (c[0][2] * c[1][2] - c[0][1] * c[2][2]) / det
    a02 = (c[0][1] * c[1][2] - c[0][2] * c[1][1]) / det
    a12 = (c[0][1] * c[0][2] - c[0][0] * c[1][2]) / det

    def partial_outliers(batch: pa.Table) -> pa.Table:
        u = units(batch)
        d0 = u[0] - mean[0]
        d1 = u[1] - mean[1]
        d2c = u[2] - mean[2]
        q = (a00 * d0 * d0 + a11 * d1 * d1 + a22 * d2c * d2c
             + 2.0 * (a01 * d0 * d1 + a02 * d0 * d2c + a12 * d1 * d2c))
        return pa.Table.from_pylist([{
            "outliers": int((q > _MAHAL_THRESHOLD).sum()),
            "max_d2": float(q.max())}])

    out = collect_pylist(ds.map_batches(
        partial_outliers, batch_format="pyarrow"))
    return pa.Table.from_pylist([{
        "n": n, "n_outliers": sum(r["outliers"] for r in out),
        "outlier_rate": _round6(sum(r["outliers"] for r in out) / nf),
        "max_d2": _round6(max(r["max_d2"] for r in out))}])


MAHALANOBIS_SQL = """
WITH u AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS u0,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS u1,
         CAST(round(l_discount * 100) AS BIGINT) AS u2
  FROM lineitem),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(u0) AS HUGEINT) AS s0, CAST(sum(u1) AS HUGEINT) AS s1,
         CAST(sum(u2) AS HUGEINT) AS s2,
         CAST(sum(CAST(u0 AS HUGEINT) * u0) AS HUGEINT) AS s00,
         CAST(sum(CAST(u0 AS HUGEINT) * u1) AS HUGEINT) AS s01,
         CAST(sum(CAST(u0 AS HUGEINT) * u2) AS HUGEINT) AS s02,
         CAST(sum(CAST(u1 AS HUGEINT) * u1) AS HUGEINT) AS s11,
         CAST(sum(CAST(u1 AS HUGEINT) * u2) AS HUGEINT) AS s12,
         CAST(sum(CAST(u2 AS HUGEINT) * u2) AS HUGEINT) AS s22
  FROM u),
m AS (
  SELECT n, CAST(n AS DOUBLE) AS nf,
         CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE) AS m0,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m2,
         CAST(n * s00 - s0 * s0 AS DOUBLE) / (CAST(n AS DOUBLE)
                                              * CAST(n AS DOUBLE)) AS c00,
         CAST(n * s01 - s0 * s1 AS DOUBLE) / (CAST(n AS DOUBLE)
                                              * CAST(n AS DOUBLE)) AS c01,
         CAST(n * s02 - s0 * s2 AS DOUBLE) / (CAST(n AS DOUBLE)
                                              * CAST(n AS DOUBLE)) AS c02,
         CAST(n * s11 - s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE)
                                              * CAST(n AS DOUBLE)) AS c11,
         CAST(n * s12 - s1 * s2 AS DOUBLE) / (CAST(n AS DOUBLE)
                                              * CAST(n AS DOUBLE)) AS c12,
         CAST(n * s22 - s2 * s2 AS DOUBLE) / (CAST(n AS DOUBLE)
                                              * CAST(n AS DOUBLE)) AS c22
  FROM s),
inv AS (
  SELECT n, nf, m0, m1, m2,
         c00 * (c11 * c22 - c12 * c12)
         - c01 * (c01 * c22 - c12 * c02)
         + c02 * (c01 * c12 - c11 * c02) AS det,
         c00, c01, c02, c11, c12, c22
  FROM m),
a AS (
  SELECT n, nf, m0, m1, m2,
         (c11 * c22 - c12 * c12) / det AS a00,
         (c00 * c22 - c02 * c02) / det AS a11,
         (c00 * c11 - c01 * c01) / det AS a22,
         (c02 * c12 - c01 * c22) / det AS a01,
         (c01 * c12 - c02 * c11) / det AS a02,
         (c01 * c02 - c00 * c12) / det AS a12
  FROM inv),
d AS (
  SELECT a.n, a.nf,
         a.a00 * (u.u0 - a.m0) * (u.u0 - a.m0)
         + a.a11 * (u.u1 - a.m1) * (u.u1 - a.m1)
         + a.a22 * (u.u2 - a.m2) * (u.u2 - a.m2)
         + 2.0 * (a.a01 * (u.u0 - a.m0) * (u.u1 - a.m1)
                  + a.a02 * (u.u0 - a.m0) * (u.u2 - a.m2)
                  + a.a12 * (u.u1 - a.m1) * (u.u2 - a.m2)) AS d2
  FROM u CROSS JOIN a)
SELECT n, CAST(count(*) FILTER (WHERE d2 > 16.266) AS BIGINT) AS n_outliers,
       round(CAST(count(*) FILTER (WHERE d2 > 16.266) AS DOUBLE) / nf, 6)
         AS outlier_rate,
       round(max(d2), 6) AS max_d2
FROM d GROUP BY n, nf
"""


# ---------------------------------------------------------------------------
# Hourly coverage-gap audit over the events feed: how many hours inside
# the observed [first, last] span have ZERO events — the "did ingestion
# silently stop?" check that freshness_lag (staleness at the tail) and
# volume_control (low-but-nonzero days) both miss. ONE hour-bounded
# combiner shuffle; span arithmetic on the driver.
# ---------------------------------------------------------------------------


def coverage_gaps_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        df = pd.DataFrame({"hour": hour.to_numpy(zero_copy_only=False)})
        return df.groupby("hour", as_index=False).agg(n=("hour", "size"))

    hours = sorted(pd.Timestamp(r["hour"]) for r in collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour").aggregate(Sum("n", alias_name="n"))))
    expected = int((hours[-1] - hours[0]) / pd.Timedelta(hours=1)) + 1
    return pa.Table.from_pylist([{
        "hours_expected": expected, "hours_observed": len(hours),
        "gaps": expected - len(hours),
        "coverage": _round6(len(hours) / float(expected))}])


COVERAGE_GAPS_SQL = """
WITH h AS (SELECT DISTINCT date_trunc('hour', ts) AS hour FROM events),
b AS (
  SELECT CAST(count(*) AS BIGINT) AS observed,
         date_diff('hour', min(hour), max(hour)) + 1 AS expected
  FROM h)
SELECT expected AS hours_expected, observed AS hours_observed,
       expected - observed AS gaps,
       round(CAST(observed AS DOUBLE) / CAST(expected AS DOUBLE), 6)
         AS coverage
FROM b
"""


# ---------------------------------------------------------------------------
# Automated Readability Index per language — the arithmetic-only
# readability score (no syllable heuristics, so it is exactly
# SQL-mirrorable): ARI = 4.71·(chars/words) + 0.5·(words/sentences)
# − 21.43, computed from per-language EXACT integer sums of non-space
# chars, whitespace-delimited words and [.!?]-run sentences (each doc
# contributes max(1, runs) sentences so fragment-only docs don't zero
# the denominator). Combiner-first: per-batch (lang, C, W, S) partials,
# one bounded lang shuffle, ratio-of-sums arithmetic on the driver.
# ---------------------------------------------------------------------------


def readability_ari_documents(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        tbl = batch.filter(pc.is_valid(batch.column("text")))
        text = pd.Series(tbl.column("text").to_pylist())
        df = pd.DataFrame({
            "lang": tbl.column("lang").to_pylist(),
            "chars": text.str.count(r"\S"),
            "words": text.str.count(r"\S+"),
            "sentences": text.str.count(r"[.!?]+").clip(lower=1)})
        return df.groupby("lang", as_index=False).agg(
            docs=("lang", "size"), chars=("chars", "sum"),
            words=("words", "sum"), sentences=("sentences", "sum"))

    rows = sorted(collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow").groupby("lang")
        .aggregate(Sum("docs", alias_name="docs"),
                   Sum("chars", alias_name="chars"),
                   Sum("words", alias_name="words"),
                   Sum("sentences", alias_name="sentences"))),
        key=lambda r: r["lang"])
    return pa.Table.from_pylist([{
        "lang": r["lang"], "docs": int(r["docs"]),
        "chars": int(r["chars"]), "words": int(r["words"]),
        "sentences": int(r["sentences"]),
        "ari": _round6(4.71 * (float(r["chars"]) / float(r["words"]))
                       + 0.5 * (float(r["words"]) / float(r["sentences"]))
                       - 21.43)}
        for r in rows])


READABILITY_ARI_SQL = r"""
WITH per_doc AS (
  SELECT lang,
         CAST(len(regexp_extract_all(text, '\S')) AS BIGINT) AS chars,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS words,
         greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
                          AS BIGINT)) AS sentences
  FROM documents WHERE text IS NOT NULL),
agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS docs,
         CAST(sum(chars) AS BIGINT) AS chars,
         CAST(sum(words) AS BIGINT) AS words,
         CAST(sum(sentences) AS BIGINT) AS sentences
  FROM per_doc GROUP BY lang)
SELECT lang, docs, chars, words, sentences,
       round(4.71 * (CAST(chars AS DOUBLE) / CAST(words AS DOUBLE))
             + 0.5 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
             - 21.43, 6) AS ari
FROM agg ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test over daily event volume: is the sequence of
# above/below-median days random, or does it cluster (regime shifts,
# ramps)? Days equal to the median are dropped (standard treatment).
# ONE bounded daily combiner shuffle; runs/expectation/variance are
# exact arithmetic over the bounded chronological grid, with the median
# mirroring DuckDB's quantile_cont interpolation.
# ---------------------------------------------------------------------------


def runs_test_events(sf_dir: str) -> pa.Table:
    import math

    rows = _daily_event_counts(sf_dir)
    counts = np.array([r["n"] for r in rows], dtype=np.float64)
    med = _median_duckdb(counts)
    signs = [1 if c > med else 0 for c in counts if c != med]
    n1 = sum(signs)
    n2 = len(signs) - n1
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    nf1, nf2 = float(n1), float(n2)
    expected = 1.0 + 2.0 * nf1 * nf2 / (nf1 + nf2)
    var = (2.0 * nf1 * nf2 * (2.0 * nf1 * nf2 - nf1 - nf2)
           / ((nf1 + nf2) * (nf1 + nf2) * (nf1 + nf2 - 1.0)))
    return pa.Table.from_pylist([{
        "n_above": n1, "n_below": n2, "runs": runs,
        "expected_runs": _round6(expected),
        "z": _round6((runs - expected) / math.sqrt(var))}])


RUNS_TEST_SQL = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
m AS (SELECT quantile_cont(n, 0.5) AS med FROM d),
s AS (
  SELECT day, CAST(n > m.med AS BIGINT) AS sign
  FROM d, m WHERE n <> m.med),
r AS (
  SELECT sign,
         CASE WHEN sign <> lag(sign) OVER (ORDER BY day) THEN 1
              ELSE 0 END AS chg
  FROM s),
agg AS (
  SELECT CAST(sum(sign) AS BIGINT) AS n1,
         CAST(count(*) - sum(sign) AS BIGINT) AS n2,
         CAST(1 + sum(chg) AS BIGINT) AS runs
  FROM r),
f AS (
  SELECT n1, n2, runs, CAST(n1 AS DOUBLE) AS f1, CAST(n2 AS DOUBLE) AS f2
  FROM agg)
SELECT n1 AS n_above, n2 AS n_below, runs,
       round(1.0 + 2.0 * f1 * f2 / (f1 + f2), 6) AS expected_runs,
       round((runs - (1.0 + 2.0 * f1 * f2 / (f1 + f2)))
             / sqrt(2.0 * f1 * f2 * (2.0 * f1 * f2 - f1 - f2)
                    / ((f1 + f2) * (f1 + f2) * (f1 + f2 - 1.0))), 6) AS z
FROM f
"""


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau statistic over the first 7 daily-volume
# autocorrelations: Q = n(n+2)·Σ r_k²/(n−k) — the single-number "is
# there ANY serial structure?" summary of acf_daily_events. The r_k are
# the same exact-integer-scale autocorrelations, ROUNDED TO 6 DP before
# squaring on BOTH sides (the documented determinism contract), so Q is
# a short fixed-order float expression over a 7-row grid.
# ---------------------------------------------------------------------------


def ljung_box_events(sf_dir: str) -> pa.Table:
    rows = _daily_event_counts(sf_dir)
    x = {pd.Timestamp(r["day"]): int(r["n"]) for r in rows}
    n_days = len(x)
    sx = sum(x.values())
    den = sum((n_days * v - sx) ** 2 for v in x.values())
    q = 0.0
    for lag in range(1, _ACF_MAX_LAG + 1):
        off = pd.Timedelta(days=lag)
        num = sum((n_days * v - sx) * (n_days * x[day + off] - sx)
                  for day, v in x.items() if day + off in x)
        r = float(np.round(float(num) / float(den), 6))
        q += r * r / (n_days - lag)
    q *= n_days * (n_days + 2.0)
    return pa.Table.from_pylist([{
        "n_days": n_days, "max_lag": _ACF_MAX_LAG, "q_stat": _round6(q)}])


LJUNG_BOX_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS sx
  FROM daily),
num AS (
  SELECT l.lag AS lag,
         CAST(sum((s.n * a.x - s.sx) * (s.n * b.x - s.sx)) AS HUGEINT)
           AS num
  FROM daily a
  CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6), (7)) AS l(lag)
  CROSS JOIN s
  JOIN daily b ON b.day = a.day + l.lag * INTERVAL '1 day'
  GROUP BY 1),
den AS (
  SELECT CAST(sum((s.n * x - s.sx) * (s.n * x - s.sx)) AS HUGEINT) AS den
  FROM daily CROSS JOIN s),
r AS (
  SELECT lag, round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf
  FROM num CROSS JOIN den),
q AS (
  SELECT sum(acf * acf / (CAST(s.n AS DOUBLE) - lag)) AS partial_q,
         CAST(s.n AS BIGINT) AS n_days
  FROM r CROSS JOIN s GROUP BY s.n)
SELECT n_days, 7 AS max_lag,
       round(partial_q * n_days * (n_days + 2.0), 6) AS q_stat
FROM q
"""


# ---------------------------------------------------------------------------
# Brown-Forsythe homogeneity-of-variance test across the returnflag
# groups (the robust Levene variant: deviations from the group MEDIAN,
# not mean) — the dispersion companion to kruskal's location test.
# l_quantity is integral, so |x − med| lives on a HALF-integer grid;
# doubling it makes every deviation an EXACT integer, and the whole W
# statistic reduces to {n_g, Σt_g, Σt_g²} integer sums per group — ONE
# bounded (g, v) value-count shuffle, medians and W on the driver with
# a fixed float expression order mirrored by the SQL oracle.
# ---------------------------------------------------------------------------


def brown_forsythe_quantity_returnflag(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "g": batch.column("l_returnflag").to_numpy(zero_copy_only=False),
            "v": np.rint(batch.column("l_quantity")
                         .to_numpy(zero_copy_only=False)).astype(np.int64)})
        return df.groupby(["g", "v"], as_index=False).agg(n=("v", "size"))

    grid: dict[str, dict[int, int]] = {}
    for r in collect_pylist(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["g", "v"]).aggregate(Sum("n", alias_name="n"))):
        grid.setdefault(r["g"], {})[int(r["v"])] = int(r["n"])

    stats = {}
    for g, cnts in grid.items():
        n_g = sum(cnts.values())
        # group median with quantile_cont interpolation over the grid
        pos = 0.5 * (n_g - 1)
        lo_idx, frac = int(pos), pos - int(pos)
        vals = sorted(cnts)

        # exact order statistics from the count grid
        def value_at(rank: int) -> int:
            c = 0
            for v in vals:
                c += cnts[v]
                if rank < c:
                    return v
            return vals[-1]
        lo_v = value_at(lo_idx)
        med2 = 2 * lo_v if frac == 0.0 else lo_v + value_at(lo_idx + 1)
        st = sq = 0
        for v, c in cnts.items():
            t = abs(2 * v - med2)
            st += c * t
            sq += c * t * t
        stats[g] = (n_g, st, sq)

    ks = sorted(stats)
    n_tot = sum(stats[g][0] for g in ks)
    k = len(ks)
    zbar_g = {g: float(stats[g][1]) / (2.0 * stats[g][0]) for g in ks}
    zbar = float(sum(stats[g][1] for g in ks)) / (2.0 * n_tot)
    num = sum(stats[g][0] * (zbar_g[g] - zbar) * (zbar_g[g] - zbar)
              for g in ks)
    den = sum(float(stats[g][2]) / 4.0
              - stats[g][0] * zbar_g[g] * zbar_g[g] for g in ks)
    w = (n_tot - k) / float(k - 1) * num / den
    return pa.Table.from_pylist([{
        "n": n_tot, "k_groups": k, "dof1": k - 1, "dof2": n_tot - k,
        "w_stat": _round6(w)}])


BROWN_FORSYTHE_SQL = """
WITH src AS (
  SELECT l_returnflag AS g, CAST(round(l_quantity) AS BIGINT) AS v
  FROM lineitem),
med AS (
  SELECT g, quantile_cont(v, 0.5) AS med FROM src GROUP BY g),
t AS (
  SELECT src.g, CAST(round(abs(2 * src.v - 2 * med.med)) AS BIGINT) AS t
  FROM src JOIN med ON src.g = med.g),
pg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(t) AS HUGEINT) AS st,
         CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS sq
  FROM t GROUP BY g),
tot AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(st) AS DOUBLE) / (2.0 * sum(n_g)) AS zbar
  FROM pg),
parts AS (
  SELECT tot.n, tot.k,
         sum(pg.n_g * (CAST(pg.st AS DOUBLE) / (2.0 * pg.n_g) - tot.zbar)
                    * (CAST(pg.st AS DOUBLE) / (2.0 * pg.n_g) - tot.zbar))
           AS num,
         sum(CAST(pg.sq AS DOUBLE) / 4.0
             - pg.n_g * (CAST(pg.st AS DOUBLE) / (2.0 * pg.n_g))
                      * (CAST(pg.st AS DOUBLE) / (2.0 * pg.n_g))) AS den
  FROM pg CROSS JOIN tot GROUP BY tot.n, tot.k)
SELECT n, k AS k_groups, k - 1 AS dof1, n - k AS dof2,
       round((n - k) / CAST(k - 1 AS DOUBLE) * num / den, 6) AS w_stat
FROM parts
"""


# ---------------------------------------------------------------------------
# Pairwise effect sizes (Cohen's d + Hedges' g) for l_quantity between
# the returnflag groups — the "is the difference MEANINGFUL, not just
# significant at web scale" companion to kruskal/mannwhitney (at 10⁹
# rows everything is significant; d says whether anyone should care).
# ONE bounded per-group integer-moment shuffle; pooled-SD arithmetic on
# the driver in a fixed expression order.
# ---------------------------------------------------------------------------


def effect_size_quantity_returnflag(sf_dir: str) -> pa.Table:
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        g = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        u = np.rint(batch.column("l_quantity")
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        df = pd.DataFrame({"g": g, "u": u, "uu": u * u})
        return df.groupby("g", as_index=False).agg(
            n=("u", "size"), su=("u", "sum"), suu=("uu", "sum"))

    stats = {r["g"]: (int(r["n"]), int(r["su"]), int(r["suu"]))
             for r in collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow").groupby("g")
        .aggregate(Sum("n", alias_name="n"), Sum("su", alias_name="su"),
                   Sum("suu", alias_name="suu")))}
    out = []
    ks = sorted(stats)
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            (na, sa, qa), (nb, sb, qb) = stats[ks[i]], stats[ks[j]]
            ma = float(sa) / na
            mb = float(sb) / nb
            va = float(na * qa - sa * sa) / (float(na) * (na - 1.0))
            vb = float(nb * qb - sb * sb) / (float(nb) * (nb - 1.0))
            sp = math.sqrt(((na - 1.0) * va + (nb - 1.0) * vb)
                           / (na + nb - 2.0))
            d = (ma - mb) / sp
            gg = d * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0))
            out.append({"group_a": ks[i], "group_b": ks[j],
                        "n_a": na, "n_b": nb,
                        "mean_a": _round6(ma), "mean_b": _round6(mb),
                        "cohens_d": _round6(d), "hedges_g": _round6(gg)})
    return pa.Table.from_pylist(out)


EFFECT_SIZE_SQL = """
WITH src AS (
  SELECT l_returnflag AS g, CAST(round(l_quantity) AS BIGINT) AS u
  FROM lineitem),
pg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(u) AS HUGEINT) AS su,
         CAST(sum(CAST(u AS HUGEINT) * u) AS HUGEINT) AS suu
  FROM src GROUP BY g),
pairs AS (
  SELECT a.g AS group_a, b.g AS group_b, a.n AS n_a, b.n AS n_b,
         CAST(a.su AS DOUBLE) / a.n AS ma,
         CAST(b.su AS DOUBLE) / b.n AS mb,
         CAST(a.n * a.suu - a.su * a.su AS DOUBLE)
           / (CAST(a.n AS DOUBLE) * (a.n - 1.0)) AS va,
         CAST(b.n * b.suu - b.su * b.su AS DOUBLE)
           / (CAST(b.n AS DOUBLE) * (b.n - 1.0)) AS vb
  FROM pg a JOIN pg b ON a.g < b.g),
d AS (
  SELECT group_a, group_b, n_a, n_b, ma, mb,
         (ma - mb) / sqrt(((n_a - 1.0) * va + (n_b - 1.0) * vb)
                          / (n_a + n_b - 2.0)) AS d
  FROM pairs)
SELECT group_a, group_b, n_a, n_b,
       round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
       round(d, 6) AS cohens_d,
       round(d * (1.0 - 3.0 / (4.0 * (n_a + n_b) - 9.0)), 6) AS hedges_g
FROM d ORDER BY group_a, group_b
"""


# ---------------------------------------------------------------------------
# Distributed Poisson bootstrap of mean(l_quantity): the standard error
# machinery that makes every point estimate in this suite reportable
# with an error bar AT SCALE — classic resampling needs the whole
# dataset per replica, the Poisson bootstrap (Chamandy et al., "Estimating
# Uncertainty for Massive Data Streams", Google 2012) needs ONE
# streaming pass: each row contributes Poisson(1) copies to each of B
# replicas, so replica sums are just weighted combiner sums. Weights
# are DETERMINISTIC — md5_number_lower(rowkey:replica) → uniform →
# inverse-CDF Poisson(1), the same construction DuckDB can replay — so
# the whole estimator (all B replica means AND the SE) is exactly
# SQL-oracled. Replica sums are exact integers on the quantity grid;
# the B-term SE reduction is driver float math at 6 dp.
# ---------------------------------------------------------------------------

_BOOT_B = 16
# Poisson(1) CDF thresholds: weight w = #{c_k <= u}, capped at 8
_POISSON1_CDF = (0.36787944117144233, 0.7357588823428847,
                 0.9196986029286058, 0.9810118431238463,
                 0.9963401531726563, 0.9994058151824183,
                 0.999916758850712, 0.9999897508033253)


def bootstrap_mean_quantity(sf_dir: str) -> pa.Table:
    import hashlib
    import math

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity"])
    cdf = np.array(_POISSON1_CDF)

    def partial(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        ln = batch.column("l_linenumber").to_numpy(zero_copy_only=False)
        q = np.rint(batch.column("l_quantity")
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        m = len(q)
        u = np.empty((m, _BOOT_B), dtype=np.float64)
        md5 = hashlib.md5
        for i in range(m):
            stem = b"%d:%d:" % (ok[i], ln[i])
            for b in range(_BOOT_B):
                h = int.from_bytes(
                    md5(stem + b"%d" % b).digest()[8:], "little")
                u[i, b] = ((h >> 11) + 0.5) / 9007199254740992.0
        w = (u[:, :, None] >= cdf[None, None, :]).sum(axis=2)  # (m, B)
        row = {"n": m, "sq": int(q.sum())}
        for b in range(_BOOT_B):
            row[f"w{b}"] = int(w[:, b].sum())
            row[f"s{b}"] = int((w[:, b] * q).sum())
        return pa.Table.from_pylist([row])

    tot: dict[str, int] = {}
    for r in collect_pylist(ds.map_batches(partial, batch_format="pyarrow")):
        for k, v in r.items():
            tot[k] = tot.get(k, 0) + int(v)
    means = [float(tot[f"s{b}"]) / float(tot[f"w{b}"])
             for b in range(_BOOT_B)]
    mbar = sum(means) / float(_BOOT_B)
    se = math.sqrt(sum((m - mbar) * (m - mbar) for m in means)
                   / (_BOOT_B - 1.0))
    return pa.Table.from_pylist([{
        "n": tot["n"], "b_replicas": _BOOT_B,
        "mean": _round6(float(tot["sq"]) / float(tot["n"])),
        "boot_se": _round6(se)}])


BOOTSTRAP_MEAN_SQL = f"""
WITH rows AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS q,
         CAST(l_orderkey AS VARCHAR) || ':'
           || CAST(l_linenumber AS VARCHAR) || ':' AS stem
  FROM lineitem),
reps AS (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b),
draws AS (
  SELECT rows.q, reps.b,
         ((md5_number_lower(rows.stem || CAST(reps.b AS VARCHAR)) >> 11)
          + 0.5) / 9007199254740992.0 AS u
  FROM rows CROSS JOIN reps),
weighted AS (
  SELECT b,
         CAST(sum({" + ".join(f"CAST(u >= {c} AS BIGINT)"
                              for c in _POISSON1_CDF)}) AS HUGEINT) AS w,
         CAST(sum(CAST(q AS HUGEINT)
                  * ({" + ".join(f"CAST(u >= {c} AS BIGINT)"
                                 for c in _POISSON1_CDF)})) AS HUGEINT) AS s
  FROM draws GROUP BY b),
means AS (
  SELECT b, CAST(s AS DOUBLE) / CAST(w AS DOUBLE) AS m FROM weighted),
se AS (
  SELECT sqrt(sum((m - mb.mbar) * (m - mb.mbar)) / ({_BOOT_B} - 1.0)) AS se
  FROM means CROSS JOIN
       (SELECT sum(m) / CAST({_BOOT_B} AS DOUBLE) AS mbar FROM means) mb),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(q) AS HUGEINT) AS sq
  FROM rows)
SELECT n, {_BOOT_B} AS b_replicas,
       round(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
       round(se.se, 6) AS boot_se
FROM base CROSS JOIN se
"""


# ---------------------------------------------------------------------------
# Trimmed + winsorized mean of l_quantity (10% per tail) — the robust
# location estimates, computed EXACTLY from the bounded value-count
# grid: k = floor(0.1·n) rows are dropped (trimmed) or clamped to the
# tail order statistics (winsorized) per side, all in integer
# arithmetic via one cumulative walk — no sort of the raw rows, no
# sampling, identical at any partitioning. The SQL oracle does the same
# walk with window cumsums over the ≤50-row grid.
# ---------------------------------------------------------------------------

_TRIM_FRAC = 0.1


def trimmed_mean_quantity(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_quantity"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        v = np.rint(batch.column("l_quantity")
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        return (pd.DataFrame({"v": v})
                .groupby("v", as_index=False).agg(n=("v", "size")))

    cnts = {int(r["v"]): int(r["n"]) for r in collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("n", alias_name="n")))}
    n = sum(cnts.values())
    k = int(_TRIM_FRAC * n)
    vals = sorted(cnts)
    # trimmed: keep ranks [k, n-k); winsorize: clamp below rank k to
    # v(k), above rank n-k-1 to v(n-k-1)  (0-indexed order statistics)
    lo_rank, hi_rank = k, n - k

    def value_at(rank: int) -> int:
        c = 0
        for v in vals:
            c += cnts[v]
            if rank < c:
                return v
        return vals[-1]

    v_lo, v_hi = value_at(lo_rank), value_at(hi_rank - 1)
    s_trim = 0
    cum = 0
    for v in vals:
        lo, hi = cum, cum + cnts[v]
        kept = min(hi, hi_rank) - max(lo, lo_rank)
        if kept > 0:
            s_trim += v * kept
        cum = hi
    s_wins = s_trim + k * v_lo + k * v_hi
    return pa.Table.from_pylist([{
        "n": n, "k_per_tail": k,
        "trimmed_mean": _round6(float(s_trim) / float(n - 2 * k)),
        "winsorized_mean": _round6(float(s_wins) / float(n))}])


TRIMMED_MEAN_SQL = """
WITH grid AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1),
walk AS (
  SELECT v, c,
         coalesce(sum(c) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
         sum(c) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
  FROM grid),
p AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(CAST(floor(0.1 * sum(c)) AS BIGINT) AS BIGINT) AS k
  FROM grid),
kept AS (
  SELECT CAST(sum(v * greatest(least(hi, p.n - p.k) - greatest(lo, p.k),
                               0)) AS HUGEINT) AS s_trim
  FROM walk CROSS JOIN p),
os AS (
  SELECT (SELECT min(v) FROM walk, p WHERE p.k < hi) AS v_lo,
         (SELECT min(v) FROM walk, p WHERE p.n - p.k - 1 < hi) AS v_hi)
SELECT p.n, p.k AS k_per_tail,
       round(CAST(kept.s_trim AS DOUBLE)
             / CAST(p.n - 2 * p.k AS DOUBLE), 6) AS trimmed_mean,
       round(CAST(kept.s_trim + p.k * os.v_lo + p.k * os.v_hi AS DOUBLE)
             / CAST(p.n AS DOUBLE), 6) AS winsorized_mean
FROM p CROSS JOIN kept CROSS JOIN os
"""


# ---------------------------------------------------------------------------
# Web link graph from the pages fixture (v2 fixtures embed
# deterministic <nav> outlinks): parse hrefs out of the raw html with
# the compiled RE2-style pattern, build (src_host, dst_host) edges and
# reduce to the per-destination in-degree profile — the crawl-frontier
# / authority-signal primitive every web pipeline needs. Combiner-first:
# per-batch (dst, src) pair counts, ONE bounded shuffle (hosts ≤ ~1000
# by construction, so the pair grid is bounded), per-dst rollup on the
# driver. The SQL oracle re-parses the same html with DuckDB's regex —
# an independent derivation, not a replay of the engine's parse.
# ---------------------------------------------------------------------------

_HREF_RE = r'href="//([^/"]+)/'
_SRC_HOST_RE = r"https://([^/]+)/"


def link_graph_pages(sf_dir: str) -> pa.Table:
    import re

    from ray.data.aggregate import Sum

    pages_dir = _pages_dir_for(sf_dir)
    ds = read_parquet_clean(pages_dir, columns=["url", "html"])
    href_re = re.compile(_HREF_RE.encode())
    src_re = re.compile(_SRC_HOST_RE)

    def partial(batch: pa.Table) -> pd.DataFrame:
        tbl = batch.filter(pc.is_valid(batch.column("html")))
        urls = tbl.column("url").to_pylist()
        htmls = tbl.column("html").to_pylist()
        src_l, dst_l = [], []
        for u, hb in zip(urls, htmls):
            m = src_re.match(u or "")
            if not m:
                continue
            for dst in href_re.findall(hb):
                src_l.append(m.group(1))
                dst_l.append(dst.decode())
        df = pd.DataFrame({"dst_host": dst_l, "src_host": src_l})
        return df.groupby(["dst_host", "src_host"], as_index=False).agg(
            n=("dst_host", "size"))

    agg: dict[str, list] = {}
    for r in collect_pylist(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["dst_host", "src_host"])
            .aggregate(Sum("n", alias_name="n"))):
        a = agg.setdefault(r["dst_host"], [0, 0])
        a[0] += int(r["n"])
        a[1] += 1
    return pa.Table.from_pylist([
        {"dst_host": d, "in_edges": agg[d][0], "src_hosts": agg[d][1]}
        for d in sorted(agg)])


LINK_GRAPH_SQL = """
WITH p AS (
  SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS src,
         decode(html) AS h
  FROM read_parquet('{pages_dir}/*.parquet')
  WHERE html IS NOT NULL),
e AS (
  SELECT src, unnest(regexp_extract_all(h, 'href="//([^/"]+)/', 1)) AS dst
  FROM p)
SELECT dst AS dst_host, CAST(count(*) AS BIGINT) AS in_edges,
       CAST(count(DISTINCT src) AS BIGINT) AS src_hosts
FROM e GROUP BY 1 ORDER BY 1
"""


def link_graph_sql(sf_dir: str | None = None) -> str:
    return LINK_GRAPH_SQL.format(pages_dir=_pages_dir_for(_oracle_sf(sf_dir)))


# ---------------------------------------------------------------------------
# Out-degree distribution of the same link graph: how many pages emit
# k outlinks — the sanity profile for crawl parsing (a sudden mass at
# 0 means the parser broke; a long tail means link farms). Pure
# per-batch degree histogram, ONE tiny (k, count) shuffle.
# ---------------------------------------------------------------------------


def out_degree_profile_pages(sf_dir: str) -> pa.Table:
    import re

    from ray.data.aggregate import Sum

    pages_dir = _pages_dir_for(sf_dir)
    ds = read_parquet_clean(pages_dir, columns=["html"])
    href_re = re.compile(_HREF_RE.encode())

    def partial(batch: pa.Table) -> pd.DataFrame:
        tbl = batch.filter(pc.is_valid(batch.column("html")))
        deg = [len(href_re.findall(hb))
               for hb in tbl.column("html").to_pylist()]
        return (pd.DataFrame({"out_degree": deg})
                .groupby("out_degree", as_index=False)
                .agg(pages=("out_degree", "size")))

    rows = sorted(collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("out_degree").aggregate(Sum("pages", alias_name="pages"))),
        key=lambda r: r["out_degree"])
    return pa.Table.from_pylist([
        {"out_degree": int(r["out_degree"]), "pages": int(r["pages"])}
        for r in rows])


OUT_DEGREE_SQL = """
WITH p AS (
  SELECT CAST(len(regexp_extract_all(decode(html), 'href="//([^/"]+)/', 1))
              AS BIGINT) AS out_degree
  FROM read_parquet('{pages_dir}/*.parquet')
  WHERE html IS NOT NULL)
SELECT out_degree, CAST(count(*) AS BIGINT) AS pages
FROM p GROUP BY 1 ORDER BY 1
"""


def out_degree_sql(sf_dir: str | None = None) -> str:
    return OUT_DEGREE_SQL.format(pages_dir=_pages_dir_for(_oracle_sf(sf_dir)))


# ---------------------------------------------------------------------------
# PageRank over the host link graph (the authority companion to
# link_graph_pages): distributed edge aggregation (the only part that
# touches raw pages) reduces the crawl to a bounded (src, dst, weight)
# host-graph table, then 5 damped power iterations run vectorized on
# the driver — the right split at web scale, where hosts number in the
# millions (driver-feasible) while pages number in the trillions
# (never leave the cluster). Same d=0.85 / dangling-mass / unrolled-CTE
# oracle machinery proven by pagerank_event_types (queries.py:9410).
# ---------------------------------------------------------------------------


def pagerank_link_graph_pages(sf_dir: str) -> pa.Table:
    import re

    from ray.data.aggregate import Sum

    pages_dir = _pages_dir_for(sf_dir)
    ds = read_parquet_clean(pages_dir, columns=["url", "html"])
    href_re = re.compile(_HREF_RE.encode())
    src_re = re.compile(_SRC_HOST_RE)

    def partial(batch: pa.Table) -> pd.DataFrame:
        tbl = batch.filter(pc.is_valid(batch.column("html")))
        src_l, dst_l = [], []
        for u, hb in zip(tbl.column("url").to_pylist(),
                         tbl.column("html").to_pylist()):
            m = src_re.match(u or "")
            if not m:
                continue
            for dst in href_re.findall(hb):
                src_l.append(m.group(1))
                dst_l.append(dst.decode())
        return (pd.DataFrame({"from_h": src_l, "to_h": dst_l})
                .groupby(["from_h", "to_h"], as_index=False)
                .agg(n=("from_h", "size")))

    edges = sorted(collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["from_h", "to_h"]).aggregate(Sum("n", alias_name="n"))),
        key=lambda e: (e["from_h"], e["to_h"]))
    nodes = sorted({e["from_h"] for e in edges}
                   | {e["to_h"] for e in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    nn = len(nodes)
    ei = np.array([idx[e["from_h"]] for e in edges], dtype=np.int64)
    ej = np.array([idx[e["to_h"]] for e in edges], dtype=np.int64)
    ew = np.array([float(e["n"]) for e in edges])
    out_n = np.zeros(nn)
    np.add.at(out_n, ei, ew)
    rank = np.full(nn, 1.0 / nn)
    for _ in range(_PR_ITERS):
        inflow = np.zeros(nn)
        np.add.at(inflow, ej, rank[ei] * ew / out_n[ei])
        dang = float(rank[out_n == 0].sum())
        rank = 0.15 / nn + 0.85 * (inflow + dang / nn)
    return pa.Table.from_pylist([
        {"node": v, "rank": _round6(rank[idx[v]])} for v in nodes])


def link_pagerank_sql(sf_dir: str | None = None) -> str:
    pages_dir = _pages_dir_for(_oracle_sf(sf_dir))
    head = f"""
WITH pages AS MATERIALIZED (
  SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS src,
         decode(html) AS h
  FROM read_parquet('{pages_dir}/*.parquet')
  WHERE html IS NOT NULL
), t AS MATERIALIZED (
  SELECT src AS from_h, dst AS to_h, CAST(count(*) AS DOUBLE) AS n
  FROM (SELECT src, unnest(regexp_extract_all(h, 'href="//([^/"]+)/', 1))
               AS dst
        FROM pages)
  GROUP BY 1, 2
), nodes AS MATERIALIZED (
  SELECT DISTINCT from_h AS node FROM t
  UNION
  SELECT DISTINCT to_h FROM t
), outd AS MATERIALIZED (
  SELECT from_h AS node, sum(n) AS outn FROM t GROUP BY 1
), nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nnodes FROM nodes
), r0 AS MATERIALIZED (SELECT node, 1.0 / nn.nnodes AS rank FROM nodes, nn)"""
    step = """
, r{k} AS MATERIALIZED (
  SELECT nd.node,
         0.15 / nn.nnodes + 0.85 * (COALESCE(fl.s, 0) + dg.d / nn.nnodes)
           AS rank
  FROM nodes nd
  CROSS JOIN nn
  CROSS JOIN (SELECT COALESCE(sum(r.rank), 0) AS d
              FROM r{p} r ANTI JOIN outd o ON r.node = o.node) dg
  LEFT JOIN (SELECT t.to_h AS node, sum(r.rank * t.n / o.outn) AS s
             FROM r{p} r
             JOIN t ON t.from_h = r.node
             JOIN outd o ON o.node = r.node
             GROUP BY 1) fl ON fl.node = nd.node
)"""
    body = "".join(step.format(k=k, p=k - 1) for k in range(1, _PR_ITERS + 1))
    return (head + body +
            f"\nSELECT node, round(rank, 6) AS rank FROM r{_PR_ITERS} "
            "ORDER BY node")


# ---------------------------------------------------------------------------
# Robots index-policy filter over the pages fixture (v4 embeds
# <meta name="robots" content="noindex,...""> on a deterministic page
# subset): the canonical crawl-compliance drop every web-text pipeline
# applies before training-data use (C4/CCNet drop noindex pages).
# Vectorized substring scan over the raw html bytes — no HTML parse —
# reduced per language: pages, noindex count, keep rate. The SQL
# oracle re-detects the meta tag independently with DuckDB regex.
# ---------------------------------------------------------------------------

_NOINDEX_NEEDLE = b'<meta name="robots" content="noindex'


def noindex_filter_pages(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    pages_dir = _pages_dir_for(sf_dir)
    ds = read_parquet_clean(pages_dir, columns=["lang", "html"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        lang = batch.column("lang").to_pylist()
        noidx = [1 if (hb is not None and _NOINDEX_NEEDLE in hb) else 0
                 for hb in batch.column("html").to_pylist()]
        has_html = [0 if hb is None else 1
                    for hb in batch.column("html").to_pylist()]
        df = pd.DataFrame({"lang": lang, "noindex": noidx,
                           "pages": has_html})
        return df.groupby("lang", as_index=False).agg(
            pages=("pages", "sum"), noindex=("noindex", "sum"))

    rows = sorted(collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow").groupby("lang")
        .aggregate(Sum("pages", alias_name="pages"),
                   Sum("noindex", alias_name="noindex"))),
        key=lambda r: r["lang"])
    return pa.Table.from_pylist([{
        "lang": r["lang"], "pages": int(r["pages"]),
        "noindex": int(r["noindex"]),
        "keep_rate": _round6((int(r["pages"]) - int(r["noindex"]))
                             / float(r["pages"]))}
        for r in rows])


NOINDEX_SQL = """
WITH p AS (
  SELECT lang,
         CAST(html IS NOT NULL AS BIGINT) AS has_html,
         CAST(html IS NOT NULL AND contains(decode(html),
              '<meta name="robots" content="noindex') AS BIGINT) AS ni
  FROM read_parquet('{pages_dir}/*.parquet')),
agg AS (
  SELECT lang, CAST(sum(has_html) AS BIGINT) AS pages,
         CAST(sum(ni) AS BIGINT) AS noindex
  FROM p GROUP BY lang)
SELECT lang, pages, noindex,
       round((pages - noindex) / CAST(pages AS DOUBLE), 6) AS keep_rate
FROM agg ORDER BY lang
"""


def noindex_sql(sf_dir: str | None = None) -> str:
    return NOINDEX_SQL.format(pages_dir=_pages_dir_for(_oracle_sf(sf_dir)))


# ---------------------------------------------------------------------------
# Holt linear (double-exponential) one-step-ahead forecast backtest
# over daily event volume — the capacity-planning primitive: level and
# trend recursions (alpha=0.5, beta=0.2) walk the calendar; each day is
# first PREDICTED from yesterday's (level, trend), then used to update.
# Reports the per-day forecasts plus the backtest MAE over the
# post-warmup days. Same scale shape as the SPC charts: ONE bounded
# daily combiner shuffle, driver recursion mirrored op-for-op by a
# recursive-CTE oracle (every literal forced to DOUBLE).
# ---------------------------------------------------------------------------

_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.2


def holt_forecast_events(sf_dir: str) -> pa.Table:
    rows = _daily_event_counts(sf_dir)
    out = []
    level = trend = None
    abs_err_sum = 0  # exact integer-cents-free: errors are x - forecast
    n_scored = 0
    for i, r in enumerate(rows):
        x = float(r["n"])
        if i == 0:
            level, trend, forecast = x, 0.0, None
        else:
            forecast = level + trend
            new_level = _HOLT_ALPHA * x + (1.0 - _HOLT_ALPHA) * (level + trend)
            trend = (_HOLT_BETA * (new_level - level)
                     + (1.0 - _HOLT_BETA) * trend)
            level = new_level
        if forecast is not None and i >= 7:   # score after a 7-day warmup
            abs_err_sum += abs(x - forecast)
            n_scored += 1
        out.append({"day": r["day"].strftime("%Y-%m-%d"), "n": int(r["n"]),
                    "forecast": (None if forecast is None
                                 else _round6(forecast)),
                    "level": _round6(level), "trend": _round6(trend)})
    mae = _round6(abs_err_sum / n_scored)
    for o in out:
        o["mae_post_warmup"] = mae
    return pa.Table.from_pylist(out)


HOLT_SQL = """
WITH RECURSIVE d AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
z AS (SELECT row_number() OVER (ORDER BY day) AS rn, day, n FROM d),
walk AS (
  SELECT rn, day, n, CAST(NULL AS DOUBLE) AS forecast,
         CAST(n AS DOUBLE) AS level, CAST(0 AS DOUBLE) AS trend
  FROM z WHERE rn = 1
  UNION ALL
  SELECT z.rn, z.day, z.n,
         w.level + w.trend,
         CAST(0.5 AS DOUBLE) * z.n
           + CAST(0.5 AS DOUBLE) * (w.level + w.trend),
         CAST(0.2 AS DOUBLE) * (CAST(0.5 AS DOUBLE) * z.n
                                + CAST(0.5 AS DOUBLE) * (w.level + w.trend)
                                - w.level)
           + CAST(0.8 AS DOUBLE) * w.trend
  FROM z JOIN walk w ON z.rn = w.rn + 1),
mae AS (
  SELECT sum(abs(n - forecast)) / count(*) AS m
  FROM walk WHERE rn > 7 AND forecast IS NOT NULL)
SELECT strftime(day, '%Y-%m-%d') AS day, n,
       round(forecast, 6) AS forecast,
       round(level, 6) AS level, round(trend, 6) AS trend,
       round(mae.m, 6) AS mae_post_warmup
FROM walk CROSS JOIN mae ORDER BY day
"""


# ---------------------------------------------------------------------------
# First/last-touch conversion attribution: for each user's purchase,
# credit the FIRST and the LAST non-purchase event type that preceded
# it — the marketing-attribution primitive over event streams. Rides
# the proven coarse hash(user)%P shuffle (every user's rows in one
# partition, vectorized in-partition walk); output is the bounded
# (touch_type, first_credits, last_credits) table. SQL oracle restates
# both rules with window functions.
# ---------------------------------------------------------------------------


def attribution_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum
    from tanml_ray.stages.shuffle import with_coarse_partition

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                  "event_type"])

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized within-partition walk: block starts via
        # cummax of change indices, last/first preceding non-purchase
        # via segment cummax with a "leaked index < block start" guard
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        n = len(g)
        empty = pd.DataFrame({
            "touch_type": pd.Series([], dtype=object),
            "first_credits": pd.Series([], dtype="int64"),
            "last_credits": pd.Series([], dtype="int64")})
        if n == 0:
            return empty
        idx = np.arange(n, dtype=np.int64)
        user_change = np.empty(n, dtype=bool)
        user_change[0] = True
        user_change[1:] = u[1:] != u[:-1]
        ustart = np.maximum.accumulate(np.where(user_change, idx, -1))
        nonp = et != "purchase"
        # last non-purchase at or before i (never i itself on purchase
        # rows, which is exactly the strictly-before semantics there)
        last_np = np.maximum.accumulate(np.where(nonp, idx, -1))
        # block's FIRST non-purchase: mark the non-purchase rows that
        # have no valid predecessor, then carry the mark forward
        prev_last = np.empty(n, dtype=np.int64)
        prev_last[0] = -1
        prev_last[1:] = last_np[:-1]
        is_first_np = nonp & (prev_last < ustart)
        first_np = np.maximum.accumulate(np.where(is_first_np, idx, -1))
        conv = (~nonp) & (first_np >= ustart)
        if not conv.any():
            return empty
        df = pd.DataFrame({"first_t": et[first_np[conv]],
                           "last_t": et[last_np[conv]]})
        f = df.groupby("first_t").size()
        last = df.groupby("last_t").size()
        keys = sorted(set(f.index) | set(last.index))
        return pd.DataFrame({
            "touch_type": keys,
            "first_credits": [int(f.get(k, 0)) for k in keys],
            "last_credits": [int(last.get(k, 0)) for k in keys]})

    rows = sorted(collect_pylist(
        with_coarse_partition(ds, "user_id")
        .groupby("__upart").map_groups(per_partition, batch_format="pandas")
        .groupby("touch_type")
        .aggregate(Sum("first_credits", alias_name="first_credits"),
                   Sum("last_credits", alias_name="last_credits"))),
        key=lambda r: r["touch_type"])
    return pa.Table.from_pylist([{
        "touch_type": r["touch_type"],
        "first_credits": int(r["first_credits"]),
        "last_credits": int(r["last_credits"])} for r in rows])


ATTRIBUTION_SQL = """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(event_type = 'purchase' AS BIGINT) AS is_conv
  FROM events),
w AS (
  SELECT user_id, event_type, is_conv,
         -- first/last NON-purchase touch strictly before this event:
         -- purchases do not reset or contribute to the touch chain
         last_value(CASE WHEN is_conv = 0 THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_touch,
         first_value(CASE WHEN is_conv = 0 THEN event_type END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS first_touch
  FROM o),
conv AS (
  SELECT first_touch, last_touch FROM w
  WHERE is_conv = 1 AND first_touch IS NOT NULL),
f AS (SELECT first_touch AS t, count(*) AS c FROM conv GROUP BY 1),
l AS (SELECT last_touch AS t, count(*) AS c FROM conv GROUP BY 1),
keys AS (SELECT t FROM f UNION SELECT t FROM l)
SELECT keys.t AS touch_type,
       CAST(coalesce(f.c, 0) AS BIGINT) AS first_credits,
       CAST(coalesce(l.c, 0) AS BIGINT) AS last_credits
FROM keys LEFT JOIN f ON f.t = keys.t LEFT JOIN l ON l.t = keys.t
ORDER BY touch_type
"""


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity audit over the orders quasi-identifiers
# (o_orderpriority, o_orderstatus, order year): the privacy-release
# companion to the PII scan — how re-identifiable is a row, and how
# diverse is the sensitive attribute (price band) within each
# equivalence class? ONE bounded (QI, sensitive-band) value-count
# shuffle (the QI grid is categorical-bounded); k/l/min/share math on
# the driver grid.
# ---------------------------------------------------------------------------

_KANON_THRESHOLD = 5


def k_anonymity_orders(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus",
                                  "o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        year = pc.year(batch.column("o_orderdate")).to_numpy(
            zero_copy_only=False)
        band = (np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100)
                .astype(np.int64) // 5_000_000)  # 50k-dollar bands
        df = pd.DataFrame({
            "pri": batch.column("o_orderpriority").to_pylist(),
            "st": batch.column("o_orderstatus").to_pylist(),
            "yr": year, "band": band})
        return df.groupby(["pri", "st", "yr", "band"],
                          as_index=False).agg(n=("yr", "size"))

    cls: dict[tuple, dict[int, int]] = {}
    for r in collect_pylist(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["pri", "st", "yr", "band"])
            .aggregate(Sum("n", alias_name="n"))):
        key = (r["pri"], r["st"], int(r["yr"]))
        cls.setdefault(key, {})[int(r["band"])] = int(r["n"])
    sizes = {k: sum(v.values()) for k, v in cls.items()}
    total = sum(sizes.values())
    below = sum(s for s in sizes.values() if s < _KANON_THRESHOLD)
    return pa.Table.from_pylist([{
        "classes": len(cls),
        "k_anonymity": min(sizes.values()),
        "l_diversity": min(len(v) for v in cls.values()),
        "rows_below_k5": below,
        "share_below_k5": _round6(below / float(total))}])


K_ANONYMITY_SQL = """
WITH q AS (
  SELECT o_orderpriority AS pri, o_orderstatus AS st,
         CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(round(o_totalprice * 100) AS BIGINT) // 5000000 AS band
  FROM orders),
cls AS (
  SELECT pri, st, yr, CAST(count(*) AS BIGINT) AS size,
         CAST(count(DISTINCT band) AS BIGINT) AS l
  FROM q GROUP BY pri, st, yr)
SELECT CAST(count(*) AS BIGINT) AS classes,
       CAST(min(size) AS BIGINT) AS k_anonymity,
       CAST(min(l) AS BIGINT) AS l_diversity,
       CAST(coalesce(sum(size) FILTER (WHERE size < 5), 0) AS BIGINT)
         AS rows_below_k5,
       round(coalesce(sum(size) FILTER (WHERE size < 5), 0)
             / CAST(sum(size) AS DOUBLE), 6) AS share_below_k5
FROM cls
"""


# ---------------------------------------------------------------------------
# Differentially-private count release (Laplace mechanism, eps = 0.1,
# sensitivity 1) over per-event-type counts — the privacy-release
# mechanism demo: noise is drawn from the Laplace inverse CDF applied
# to a DETERMINISTIC md5(seed:type) uniform, so the full release is
# reproducible and SQL-oracled. The deterministic seed makes this a
# mechanism TEST HARNESS, not a production DP release (documented: a
# real release needs a fresh secret seed per publication); the noise
# magnitude, clamping and rounding are exactly the production shape.
# ---------------------------------------------------------------------------

_DP_EPS = 0.1
_DP_SEED = 42


def dp_noisy_counts_events(sf_dir: str) -> pa.Table:
    import hashlib
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        return (pd.DataFrame({"event_type":
                              batch.column("event_type").to_pylist()})
                .groupby("event_type", as_index=False)
                .agg(n=("event_type", "size")))

    rows = sorted(collect_pylist(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type").aggregate(Sum("n", alias_name="n"))),
        key=lambda r: r["event_type"])
    b = 1.0 / _DP_EPS
    out = []
    for r in rows:
        h = int.from_bytes(hashlib.md5(
            f"{_DP_SEED}:{r['event_type']}".encode()).digest()[8:],
            "little")
        u = ((h >> 11) + 0.5) / 9007199254740992.0
        noise = -b * math.copysign(1.0, u - 0.5) \
            * math.log(1.0 - 2.0 * abs(u - 0.5))
        out.append({"event_type": r["event_type"], "true_n": int(r["n"]),
                    "noisy_n": int(max(0.0, np.floor(r["n"] + noise
                                                     + 0.5)))})
    return pa.Table.from_pylist(out)


DP_NOISY_SQL = f"""
WITH c AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS true_n
  FROM events GROUP BY 1),
u AS (
  SELECT event_type, true_n,
         ((md5_number_lower('{_DP_SEED}:' || event_type) >> 11) + 0.5)
           / 9007199254740992.0 AS u
  FROM c),
noise AS (
  SELECT event_type, true_n,
         -(1.0 / {_DP_EPS}) * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
           * ln(1.0 - 2.0 * abs(u - 0.5)) AS eta
  FROM u)
SELECT event_type, true_n,
       CAST(greatest(0.0, floor(true_n + eta + 0.5)) AS BIGINT) AS noisy_n
FROM noise ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# T5-style span corruption (single-span variant): mask a deterministic
# 3-token span per document, emitting (input_text with sentinel,
# target_text) training pairs — the denoising-objective preprocessing
# step of encoder-decoder LLM pipelines. Span position is
# md5(doc_id:span) mod (n-3), so the whole transform is a pure per-row
# function (stateless map_batches, no shuffle at all) that DuckDB
# replays exactly; string assembly mirrors the SQL '' || concat
# semantics verbatim (leading/trailing spaces when a side is empty are
# part of the contract, not trimmed).
# ---------------------------------------------------------------------------

_SPAN_LEN = 3


def span_corruption_documents(sf_dir: str) -> pa.Table:
    import hashlib
    import re

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    tok_re = re.compile(r"\S+")

    def corrupt(batch: pa.Table) -> pa.Table:
        tbl = batch.filter(pc.is_valid(batch.column("text")))
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_n, out_st, out_in, out_tg = [], [], [], [], []
        for did, text in zip(ids, tbl.column("text").to_pylist()):
            ws = tok_re.findall(text)
            n = len(ws)
            if n == 0:
                continue
            h = int.from_bytes(hashlib.md5(
                f"{did}:span".encode()).digest()[8:], "little")
            st = 1 + h % max(n - _SPAN_LEN, 1)
            left = " ".join(ws[:st - 1])
            right = " ".join(ws[st + _SPAN_LEN - 1:])
            out_id.append(int(did))
            out_n.append(n)
            out_st.append(st)
            out_in.append(left + " <extra_id_0> " + right)
            out_tg.append("<extra_id_0> "
                          + " ".join(ws[st - 1:st + _SPAN_LEN - 1]))
        return pa.table({
            "doc_id": pa.array(out_id, type=pa.int64()),
            "n_tokens": pa.array(out_n, type=pa.int64()),
            "span_start": pa.array(out_st, type=pa.int64()),
            "input_text": pa.array(out_in, type=pa.string()),
            "target_text": pa.array(out_tg, type=pa.string())})

    rows = sorted(collect_pylist(
        ds.map_batches(corrupt, batch_format="pyarrow")),
        key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows)


SPAN_CORRUPTION_SQL = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ws
  FROM documents WHERE text IS NOT NULL),
s AS (
  SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n,
         1 + CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || ':span')
                  % CAST(greatest(len(ws) - 3, 1) AS HUGEINT) AS BIGINT)
           AS st
  FROM t WHERE len(ws) > 0)
SELECT doc_id, n AS n_tokens, st AS span_start,
       coalesce(array_to_string(list_slice(ws, 1, st - 1), ' '), '')
         || ' <extra_id_0> '
         || coalesce(array_to_string(list_slice(ws, st + 3, n), ' '), '')
         AS input_text,
       '<extra_id_0> ' || array_to_string(list_slice(ws, st, st + 2), ' ')
         AS target_text
FROM s ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Entity resolution end-to-end: fuzzy_match_documents' Levenshtein
# pair graph → connected components → canonical clusters (min doc_id
# roots, component sizes) — the merge step of record linkage. The pair
# list is output-bounded by the blocking budget guard, so components
# resolve with a driver union-find here; the DISTRIBUTED min-label CC
# (dedup.py dup_components) is the path when the pair graph itself is
# web-scale. The SQL oracle recomputes the pairs and takes each node's
# minimum transitively-reachable id via a recursive closure.
# ---------------------------------------------------------------------------


def fuzzy_resolve_documents(sf_dir: str) -> pa.Table:
    pairs = fuzzy_match_documents(sf_dir).to_pylist()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        ra, rb = find(int(p["doc_id_a"])), find(int(p["doc_id_b"]))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, int] = {}
    for node in parent:
        comp[find(node)] = comp.get(find(node), 0) + 1
    return pa.Table.from_pylist([
        {"canonical_id": root, "size": comp[root]}
        for root in sorted(comp)])


FUZZY_RESOLVE_SQL = """
WITH RECURSIVE d AS (
  SELECT doc_id, lang || chr(31) || substr(text, 1, 2) AS block,
         substr(text, 1, 40) AS pre
  FROM documents WHERE text IS NOT NULL),
pairs AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM d a JOIN d b ON a.block = b.block AND a.doc_id < b.doc_id
  WHERE levenshtein(a.pre, b.pre) <= 4),
e AS (
  SELECT ia AS a, ib AS b FROM pairs
  UNION
  SELECT ib, ia FROM pairs),
reach AS (
  SELECT a, b FROM e
  UNION
  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
lab AS (
  SELECT a AS node, least(a, min(b)) AS root FROM reach GROUP BY a)
SELECT root AS canonical_id, CAST(count(*) AS BIGINT) AS size
FROM lab GROUP BY root ORDER BY root
"""


# ---------------------------------------------------------------------------
# Depth-1 CART decision stump (11th estimator family, models.py
# cart_stump): best single (feature, threshold) split over the bucketed
# orders features by exact INTEGER misclassification count — the split
# search reduces to one (feature, value, class) combiner shuffle and a
# cumulative walk, and the (errors, feature, threshold) integer
# ordering makes the selected split ulp-proof between engine and SQL.
# ---------------------------------------------------------------------------


def decision_stump_orders(sf_dir: str) -> pa.Table:
    from tanml_ray.models import cart_stump_fit

    ds = _orders_lda_features(sf_dir)

    def bucket(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cust_c": pc.divide(batch.column("x2"), 100),
            "price_k": pc.divide(batch.column("x1"), 1000),
            "y": batch.column("y")})

    out = cart_stump_fit(ds.map_batches(bucket, batch_format="pyarrow"),
                         ["cust_c", "price_k"], "y")
    return pa.Table.from_pylist([{
        "feature": out["feature"], "threshold": out["threshold"],
        "errors": out["errors"], "n": out["n"],
        "train_acc": _round6(out["train_acc"]),
        "left_label": out["left_label"],
        "right_label": out["right_label"]}])


DECISION_STUMP_SQL = """
WITH src AS (
  SELECT CAST(o_custkey AS BIGINT) // 100 AS cust_c,
         CAST(floor(o_totalprice) AS BIGINT) // 1000 AS price_k,
         CAST(o_orderpriority IN ('1-URGENT', '2-HIGH') AS BIGINT) AS y
  FROM orders),
tot AS (
  SELECT CAST(sum(y) AS BIGINT) AS a, CAST(count(*) AS BIGINT) AS n
  FROM src),
g AS (
  SELECT 'cust_c' AS f, cust_c AS v, CAST(sum(y) AS BIGINT) AS a,
         CAST(count(*) - sum(y) AS BIGINT) AS b
  FROM src GROUP BY 2
  UNION ALL
  SELECT 'price_k', price_k, CAST(sum(y) AS BIGINT),
         CAST(count(*) - sum(y) AS BIGINT)
  FROM src GROUP BY 2),
w AS (
  SELECT f, v,
         sum(a) OVER (PARTITION BY f ORDER BY v) AS al,
         sum(b) OVER (PARTITION BY f ORDER BY v) AS bl
  FROM g),
e AS (
  SELECT f, v, al, bl, tot.a - al AS ar, (tot.n - tot.a) - bl AS br,
         tot.n AS n
  FROM w CROSS JOIN tot)
SELECT f AS feature, CAST(v AS BIGINT) AS threshold,
       CAST((al + bl - greatest(al, bl))
            + (ar + br - greatest(ar, br)) AS BIGINT) AS errors,
       n,
       round((n - ((al + bl - greatest(al, bl))
                   + (ar + br - greatest(ar, br))))
             / CAST(n AS DOUBLE), 6) AS train_acc,
       CAST(al >= bl AS BIGINT) AS left_label,
       CAST(ar >= br AS BIGINT) AS right_label
FROM e ORDER BY errors, feature, threshold LIMIT 1
"""


# ---------------------------------------------------------------------------
# Dimension-chain rollup over the four previously-unexercised testdata
# tables: supplier → nation → region (both dimensions broadcast once
# via ray.put — the star-schema shape where fact rows never shuffle)
# reduced per region: suppliers, exact-cents mean account balance,
# negative-balance count.
# ---------------------------------------------------------------------------


def supplier_region_rollup(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.pipelines.join import broadcast_join

    nation = pa.concat_tables([b for b in _read(
        sf_dir, "nation", ["n_nationkey", "n_regionkey"])
        .iter_batches(batch_format="pyarrow")]) \
        .rename_columns(["s_nationkey", "n_regionkey"])
    region = pa.concat_tables([b for b in _read(
        sf_dir, "region", ["r_regionkey", "r_name"])
        .iter_batches(batch_format="pyarrow")]) \
        .rename_columns(["n_regionkey", "r_name"])
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey",
                                     "s_acctbal"])
    joined = broadcast_join(
        broadcast_join(sup, nation, "s_nationkey"), region, "n_regionkey")

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.rint(batch.column("s_acctbal")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        df = pd.DataFrame({"r_name": batch.column("r_name").to_pylist(),
                           "cents": cents, "neg": (cents < 0)})
        return df.groupby("r_name", as_index=False).agg(
            suppliers=("cents", "size"), cents=("cents", "sum"),
            negative=("neg", "sum"))

    rows = sorted(collect_pylist(
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Sum("suppliers", alias_name="suppliers"),
                   Sum("cents", alias_name="cents"),
                   Sum("negative", alias_name="negative"))),
        key=lambda r: r["r_name"])
    return pa.Table.from_pylist([{
        "r_name": r["r_name"], "suppliers": int(r["suppliers"]),
        "mean_acctbal": _round6(int(r["cents"]) / 100.0
                                / int(r["suppliers"])),
        "negative_balance": int(r["negative"])} for r in rows])


SUPPLIER_REGION_SQL = """
WITH j AS (
  SELECT r.r_name, CAST(round(s.s_acctbal * 100) AS BIGINT) AS cents
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey)
SELECT r_name, CAST(count(*) AS BIGINT) AS suppliers,
       round(CAST(sum(cents) AS DOUBLE) / 100.0 / count(*), 6)
         AS mean_acctbal,
       CAST(count(*) FILTER (WHERE cents < 0) AS BIGINT)
         AS negative_balance
FROM j GROUP BY r_name ORDER BY r_name
"""


# ---------------------------------------------------------------------------
# Brand margin over lineitem × part: the fact-vs-dimension price audit
# (realized extendedprice vs retail list price × quantity), exact on
# the cents grid per brand. The part table broadcasts once; lineitem
# streams — the shape that never shuffles 10¹² fact rows.
# ---------------------------------------------------------------------------


def brand_margin_lineitem(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.pipelines.join import broadcast_join

    part = pa.concat_tables([b for b in _read(
        sf_dir, "part", ["p_partkey", "p_brand", "p_retailprice"])
        .iter_batches(batch_format="pyarrow")]) \
        .rename_columns(["l_partkey", "p_brand", "p_retailprice"])
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])
    joined = broadcast_join(li, part, "l_partkey")

    def partial(batch: pa.Table) -> pd.DataFrame:
        qty = np.rint(batch.column("l_quantity")
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        ext = np.rint(batch.column("l_extendedprice")
                      .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        retail = np.rint(batch.column("p_retailprice")
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        df = pd.DataFrame({"p_brand": batch.column("p_brand").to_pylist(),
                           "rev": ext, "list_rev": retail * qty,
                           "qty": qty})
        return df.groupby("p_brand", as_index=False).agg(
            n=("qty", "size"), qty=("qty", "sum"), rev=("rev", "sum"),
            list_rev=("list_rev", "sum"))

    rows = sorted(collect_pylist(
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Sum("n", alias_name="n"), Sum("qty", alias_name="qty"),
                   Sum("rev", alias_name="rev"),
                   Sum("list_rev", alias_name="list_rev"))),
        key=lambda r: r["p_brand"])
    return pa.Table.from_pylist([{
        "p_brand": r["p_brand"], "n": int(r["n"]), "qty": int(r["qty"]),
        "revenue": int(r["rev"]) / 100.0,
        "margin_vs_list": _round6((int(r["rev"]) - int(r["list_rev"]))
                                  / float(r["list_rev"]))} for r in rows])


BRAND_MARGIN_SQL = """
WITH j AS (
  SELECT p.p_brand,
         CAST(round(l.l_quantity) AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS rev,
         CAST(round(p.p_retailprice * 100) AS BIGINT)
           * CAST(round(l.l_quantity) AS BIGINT) AS list_rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(qty) AS BIGINT) AS qty,
       CAST(sum(rev) AS DOUBLE) / 100.0 AS revenue,
       round(CAST(sum(rev) - sum(list_rev) AS DOUBLE)
             / CAST(sum(list_rev) AS DOUBLE), 6) AS margin_vs_list
FROM j GROUP BY p_brand ORDER BY p_brand
"""


def skew_join_events(sf_dir: str) -> pa.Table:
    """Per-segment event volume via the skew-aware join: events
    (fact, user_id heavy-hitters — see key_skew_profile_events) join
    customer (renamed key) with the hot-key broadcast / cold-key
    partitioned split of join.skew_join, then a combiner-first
    per-segment rollup in integer micros. The result is identical to
    a plain inner join by construction — which is exactly what the
    SQL oracle checks end-to-end across both paths."""
    from ray.data.aggregate import Sum

    from tanml_ray.pipelines.join import skew_join

    events = _read(sf_dir, "events", ["user_id", "value"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda t: t.rename_columns(["user_id", "c_mktsegment"]),
                     batch_format="pyarrow")
    joined = skew_join(events, cust, "user_id", buckets=16, hot_k=8)

    def partial(batch: pa.Table) -> pd.DataFrame:
        val_u = np.rint(batch.column("value").to_numpy(
            zero_copy_only=False) * 1e6).astype(np.int64)
        df = pd.DataFrame(
            {"c_mktsegment": batch.column("c_mktsegment").to_pylist(),
             "value_u": val_u})
        return df.groupby("c_mktsegment", as_index=False).agg(
            n_events=("value_u", "size"), value_u=("value_u", "sum"))

    agg = (joined.map_batches(partial, batch_format="pyarrow")
           .groupby("c_mktsegment")
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("value_u", alias_name="value_u")))
    rows = [{"c_mktsegment": r["c_mktsegment"],
             "n_events": r["n_events"],
             "sum_value": r["value_u"] / 1e6} for r in collect_pylist(agg)]
    rows.sort(key=lambda r: r["c_mktsegment"])
    return pa.Table.from_pylist(rows)


SKEW_JOIN_SQL = """
SELECT c_mktsegment, count(*) AS n_events,
       sum(CAST(round(value*1000000) AS BIGINT)) / 1000000.0 AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1 ORDER BY 1
"""


def range_export_orders(sf_dir: str) -> pa.Table:
    """Range-partitioned sorted export of orders by total price
    (integer cents grid), then the manifest read BACK from the written
    hive layout — so the oracle certifies boundaries, shard routing,
    the parquet round-trip and the per-shard stats end-to-end. The
    written layout is the file-pruning complement of the hash-sharded
    shuffle_shards export."""
    import shutil
    import tempfile

    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    from tanml_ray.pipelines.curate import range_export

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def derive(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("o_totalprice").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "v": pa.array(cents, type=pa.int64())})

    out_dir = tempfile.mkdtemp(prefix="range_export_", dir="/tmp")
    try:
        range_export(ds.map_batches(derive, batch_format="pyarrow"),
                     "v", 4, out_dir)

        def norm(batch: pa.Table) -> pa.Table:
            return pa.table({
                "shard": batch.column("shard").cast(pa.int64()),
                "v": batch.column("v").cast(pa.int64())})

        agg = (rd.read_parquet(out_dir)
               .map_batches(norm, batch_format="pyarrow")
               .groupby("shard")
               .aggregate(Count(alias_name="n"),
                          Min("v", alias_name="min_v"),
                          Max("v", alias_name="max_v")))
        rows = [{"shard": r["shard"], "n": r["n"],
                 "min_v": round(r["min_v"] / 100.0, 6),
                 "max_v": round(r["max_v"] / 100.0, 6)}
                for r in collect_pylist(agg)]
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    rows.sort(key=lambda r: r["shard"])
    return pa.Table.from_pylist(rows)


RANGE_EXPORT_SQL = """
WITH c AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v FROM orders),
b AS (SELECT quantile_disc(v, 0.25) AS b1, quantile_disc(v, 0.50) AS b2,
             quantile_disc(v, 0.75) AS b3 FROM c),
a AS (SELECT v,
        (CASE WHEN v > b1 THEN 1 ELSE 0 END
       + CASE WHEN v > b2 THEN 1 ELSE 0 END
       + CASE WHEN v > b3 THEN 1 ELSE 0 END) AS shard
      FROM c, b)
SELECT CAST(shard AS BIGINT) AS shard, CAST(count(*) AS BIGINT) AS n,
       round(min(v)/100.0, 6) AS min_v, round(max(v)/100.0, 6) AS max_v
FROM a GROUP BY shard ORDER BY shard
"""


def triangle_counts(edges):
    """Per-vertex triangle participation over a Dataset of canonical
    distinct undirected edges (string columns ``a`` < ``b``, no
    self-loops). Degree-ordered node-iterator, the standard
    distributed shape (Suri & Vassilvitskii's MR node-iterator):
    exact degree table (combiner-first) → orient every edge
    low-rank→high-rank by (degree, vertex) so each wedge is generated
    exactly once at its lowest-rank vertex and per-vertex out-degree
    is O(sqrt(m))-bounded → wedge pairs per center via a
    coarse-partitioned group walk → close wedges against oriented
    edges with a tagged union + groupby (no driver gather of edges,
    wedges, or triangles — the return is a Dataset of (host, n)).
    Any total order yields the same triangles."""
    from ray.data.aggregate import Sum
    def degree_partial(batch: pa.Table) -> pd.DataFrame:
        hosts = (batch.column("a").to_pylist()
                 + batch.column("b").to_pylist())
        df = pd.DataFrame({"host": pd.Series(hosts, dtype=str)})
        return from_pandas_clean(
            df.groupby("host", as_index=False).agg(deg=("host", "size")))

    degrees = (edges.map_batches(degree_partial, batch_format="pyarrow")
               .groupby("host").aggregate(Sum("deg", alias_name="deg")))

    # Attach deg to both endpoints; auto_join broadcasts the degree
    # table when bounded, exchanges otherwise.
    from tanml_ray.pipelines.join import auto_join

    def ren(col_map):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns([col_map.get(n, n)
                                     for n in t.column_names])
        return fn

    with_da = auto_join(edges,
                        degrees.map_batches(ren({"host": "a",
                                                 "deg": "deg_a"}),
                                            batch_format="pyarrow"),
                        "a", how="inner")
    with_db = auto_join(with_da,
                        degrees.map_batches(ren({"host": "b",
                                                 "deg": "deg_b"}),
                                            batch_format="pyarrow"),
                        "b", how="inner")

    def orient(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        lo_first = ((df["deg_a"] < df["deg_b"])
                    | ((df["deg_a"] == df["deg_b"]) & (df["a"] < df["b"])))
        return from_pandas_clean(pd.DataFrame({
            "u": np.where(lo_first, df["a"], df["b"]),
            "v": np.where(lo_first, df["b"], df["a"]),
            "deg_v": np.where(lo_first, df["deg_b"], df["deg_a"]),
        }))

    oriented = with_db.map_batches(orient, batch_format="pyarrow")

    def wedges_of(g: pd.DataFrame) -> pd.DataFrame:
        # out-neighbors of one center, ordered by rank (deg, host):
        # every unordered pair becomes one wedge keyed (x, y)
        out = []
        for _, grp in g.groupby("u", sort=False):
            nb = sorted(zip(grp["deg_v"].tolist(), grp["v"].tolist()))
            ctr = grp["u"].iloc[0]
            for i in range(len(nb)):
                for j in range(i + 1, len(nb)):
                    out.append((nb[i][1], nb[j][1], ctr))
        return from_pandas_clean(pd.DataFrame({
            "x": pd.Series([o[0] for o in out], dtype=str),
            "y": pd.Series([o[1] for o in out], dtype=str),
            "center": pd.Series([o[2] for o in out], dtype=str)}))

    # coarse partition by hash(center): one shuffle, many centers per
    # group, wedges_of walks its centers vectorized-per-group
    wedges = (oriented.map_batches(
        lambda t: t.append_column(
            "__wpart", pa.array(
                (pd.util.hash_array(
                    t.column("u").to_numpy(zero_copy_only=False)
                    .astype(object), categorize=False)
                 % np.uint64(64)).astype(np.int32))),
        batch_format="pyarrow")
        .groupby("__wpart")
        .map_groups(lambda g: wedges_of(g.drop(columns="__wpart")),
                    batch_format="pandas"))

    # Close wedges against oriented edges: tagged union, one shuffle
    # keyed (x, y); a group with an edge row marks every wedge row in
    # it as a triangle (center, x, y).
    edge_tag = oriented.map_batches(
        lambda t: pa.table({"x": t.column("u").cast(pa.string()),
                            "y": t.column("v").cast(pa.string()),
                            "center": pa.nulls(t.num_rows,
                                               type=pa.string())}),
        batch_format="pyarrow")
    both = wedges.union(edge_tag)

    _CLOSE_SCHEMA = pa.schema([("host", pa.string()), ("n", pa.int64())])

    def close_group(g: pd.DataFrame) -> pa.Table:
        # always a TYPED Arrow table: zero-row object-dtype pandas
        # blocks spam Ray's size estimator and drift the block schema
        has_edge = g["center"].isna().any()
        tri = g[g["center"].notna()]
        if not has_edge or tri.empty:
            return _CLOSE_SCHEMA.empty_table()
        hosts = (tri["x"].tolist() + tri["y"].tolist()
                 + tri["center"].tolist())
        df = pd.DataFrame({"host": pd.Series(hosts, dtype=str)})
        out = df.groupby("host", as_index=False).agg(n=("host", "size"))
        return pa.table({"host": pa.array(out["host"], type=pa.string()),
                         "n": pa.array(out["n"].to_numpy(np.int64),
                                       type=pa.int64())})

    return (both.groupby(["x", "y"])
            .map_groups(close_group, batch_format="pandas")
            .groupby("host").aggregate(Sum("n", alias_name="n")))


def host_triangles_pages(sf_dir: str) -> pa.Table:
    """Per-host triangle participation in the undirected host link
    graph — the classic clustering/community signal (link farms and
    mutual-citation rings show up as dense triangle neighborhoods).
    Edge extraction mirrors link_graph_pages; the count itself is the
    distributed degree-ordered node-iterator in triangle_counts. The
    SQL oracle's LEAST/GREATEST 3-way self-join is an exact twin."""
    import re

    pages_dir = _pages_dir_for(sf_dir)
    ds = read_parquet_clean(pages_dir, columns=["url", "html"])
    href_re = re.compile(_HREF_RE.encode())
    src_re = re.compile(_SRC_HOST_RE)

    def edge_partial(batch: pa.Table) -> pa.Table:
        tbl = batch.filter(pc.is_valid(batch.column("html")))
        urls = tbl.column("url").to_pylist()
        htmls = tbl.column("html").to_pylist()
        pairs = set()
        for u, hb in zip(urls, htmls):
            m = src_re.match(u or "")
            if not m:
                continue
            src = m.group(1)
            for dst_b in href_re.findall(hb):
                dst = dst_b.decode()
                if dst != src:
                    pairs.add((min(src, dst), max(src, dst)))
        a, b = (list(x) for x in zip(*pairs)) if pairs else ([], [])
        return from_pandas_clean(
            pd.DataFrame({"a": pd.Series(a, dtype=str),
                          "b": pd.Series(b, dtype=str)}))

    edges = (ds.map_batches(edge_partial, batch_format="pyarrow")
             .groupby(["a", "b"])
             .map_groups(lambda g: from_pandas_clean(g.head(1)),
                         batch_format="pandas"))

    rows = [{"host": r["host"], "n_triangles": int(r["n"])}
            for r in collect_pylist(triangle_counts(edges))]
    rows.sort(key=lambda r: r["host"])
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("host", pa.string()),
                                ("n_triangles", pa.int64())]))


HOST_TRIANGLES_SQL = """
WITH p AS (
  SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS src,
         decode(html) AS h
  FROM read_parquet('{pages_dir}/*.parquet')
  WHERE html IS NOT NULL),
e0 AS (
  SELECT DISTINCT src,
         unnest(regexp_extract_all(h, 'href="//([^/"]+)/', 1)) AS dst
  FROM p),
e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM e0 WHERE src <> dst),
t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
h AS (SELECT x AS host FROM t UNION ALL SELECT y AS host FROM t
      UNION ALL SELECT z AS host FROM t)
SELECT host, CAST(count(*) AS BIGINT) AS n_triangles
FROM h GROUP BY host ORDER BY host
"""


def host_triangles_sql(sf_dir: str | None = None) -> str:
    return HOST_TRIANGLES_SQL.format(
        pages_dir=_pages_dir_for(_oracle_sf(sf_dir)))


# ---------------------------------------------------------------------------
# Crawl snapshot delta: classify every url as added / removed / changed /
# unchanged between two crawl snapshots (the validation-engine view of
# re-crawl churn — CDX-style dataset versioning over the pages table).
# Snapshot A = the baseline pages fixture minus page_id % 31 == 7 (urls
# that "disappeared" by snapshot B's crawl), snapshot B = the "current"
# drift fixture minus page_id % 29 == 11 (urls B never reached) — both
# filters are deterministic spec, applied identically in the SQL twin.
# Content identity is md5(text, null→'') of the CANONICAL page per url
# (min page_id — the fixture's id%200==7 duplicate-url defect makes a
# keep-first election necessary, exactly as in exact_dedup_documents).
# Scale shape: per-batch keep-first combine (≤1 row per (url, side) per
# block leaves the map stage, text itself never shuffles — only 32-char
# digests), then one coarse hash(url) partition exchange where each
# partition classifies its urls vectorized and emits per-status partial
# counts; the final groupby moves ≤ 4·P rows. No driver gather of urls.
# ---------------------------------------------------------------------------

def crawl_delta_pages(sf_dir: str) -> pa.Table:
    import hashlib

    from ray.data.aggregate import Sum

    from tanml_ray.stages.shuffle import with_coarse_partition

    base_dir = _pages_dir_for(sf_dir, "baseline")
    cur_dir = _pages_dir_for(sf_dir, "current")

    def side_partial(batch: pa.Table, side: int, mod: int,
                     drop: int) -> pd.DataFrame:
        ids = batch.column("page_id").to_numpy(zero_copy_only=False)
        keep = (ids % mod) != drop
        tbl = batch.filter(pa.array(keep))
        digs = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
                for t in tbl.column("text").to_pylist()]
        df = pd.DataFrame({
            "url": tbl.column("url").to_pylist(),
            "page_id": tbl.column("page_id").to_numpy(zero_copy_only=False),
            "digest": digs, "side": np.int32(side)})
        # per-batch keep-first combine: ≤1 row per url leaves this block
        return df.sort_values("page_id", kind="mergesort") \
                 .drop_duplicates("url", keep="first")

    a = read_parquet_clean(base_dir, columns=["page_id", "url", "text"]) \
        .map_batches(lambda b: from_pandas_clean(side_partial(b, 0, 31, 7)),
                     batch_format="pyarrow")
    b = read_parquet_clean(cur_dir, columns=["page_id", "url", "text"]) \
        .map_batches(lambda b_: from_pandas_clean(side_partial(b_, 1, 29, 11)),
                     batch_format="pyarrow")

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["side", "page_id"], kind="mergesort") \
             .drop_duplicates(["url", "side"], keep="first")
        piv = g.pivot(index="url", columns="side", values="digest")
        adg = piv[0] if 0 in piv.columns else pd.Series(index=piv.index,
                                                        dtype=object)
        bdg = piv[1] if 1 in piv.columns else pd.Series(index=piv.index,
                                                        dtype=object)
        status = np.where(
            adg.isna(), "added",
            np.where(bdg.isna(), "removed",
                     np.where(adg == bdg, "unchanged", "changed")))
        out = pd.DataFrame({"status": status}).groupby(
            "status", as_index=False).agg(n_urls=("status", "size"))
        return out

    # coalesce tiny digest blocks before the exchange (see
    # pipelines/delta.py snapshot_delta: measured 5.7× on 1.2M pages)
    parts = (with_coarse_partition(a.union(b).repartition(32), "url")
             .groupby("__upart")
             .map_groups(lambda g: from_pandas_clean(classify(g)),
                         batch_format="pandas"))
    agg = parts.groupby("status").aggregate(Sum("n_urls", alias_name="n_urls"))
    rows = [{"status": r["status"], "n_urls": int(r["n_urls"])}
            for r in collect_pylist(agg)]
    rows.sort(key=lambda r: r["status"])
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("status", pa.string()),
                                ("n_urls", pa.int64())]))


CRAWL_DELTA_SQL = """
WITH a AS (
  SELECT url, arg_min(md5(coalesce(text, '')), page_id) AS dg
  FROM read_parquet('{base_dir}/*.parquet')
  WHERE page_id % 31 <> 7 GROUP BY url),
b AS (
  SELECT url, arg_min(md5(coalesce(text, '')), page_id) AS dg
  FROM read_parquet('{cur_dir}/*.parquet')
  WHERE page_id % 29 <> 11 GROUP BY url),
j AS (SELECT a.dg AS adg, b.dg AS bdg
      FROM a FULL OUTER JOIN b ON a.url = b.url)
SELECT CASE WHEN adg IS NULL THEN 'added'
            WHEN bdg IS NULL THEN 'removed'
            WHEN adg = bdg THEN 'unchanged'
            ELSE 'changed' END AS status,
       CAST(count(*) AS BIGINT) AS n_urls
FROM j GROUP BY 1 ORDER BY 1
"""


def crawl_delta_sql(sf_dir: str | None = None) -> str:
    sf = _oracle_sf(sf_dir)
    return CRAWL_DELTA_SQL.format(base_dir=_pages_dir_for(sf, "baseline"),
                                  cur_dir=_pages_dir_for(sf, "current"))


# ---------------------------------------------------------------------------
# Per-customer reorder intervals: the LAG-per-entity sequence operator at
# scale (repurchase-cycle analytics). For every customer, consecutive
# orders sorted by (o_orderdate, o_orderkey) yield gap = calendar-day
# difference; gaps are bucketed into standard repurchase bands. Scale
# shape: ONE coarse hash(custkey) exchange, then a per-partition
# vectorized sort + same-customer diff (no per-customer task, no window
# shuffle), emitting per-bucket (n, sum_days) partials; the final
# groupby moves ≤ 5·P rows. Day arithmetic is integer epoch-days
# (ts_us // 86_400_000_000 == CAST(ts AS DATE) for post-1970 data), so
# engine and oracle agree bit-exactly.
# ---------------------------------------------------------------------------

_GAP_BUCKETS = [(0, "00_same_day"), (7, "01_within_week"),
                (30, "02_within_month"), (90, "03_within_quarter")]


def reorder_intervals_customer(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.stages.shuffle import with_coarse_partition

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="mergesort")
        cust = g["o_custkey"].to_numpy()
        day = (g["o_orderdate"].astype("datetime64[us]").astype(np.int64)
               .to_numpy() // 86_400_000_000)
        same = np.concatenate([[False], cust[1:] == cust[:-1]])
        gaps = np.diff(day, prepend=day[:1])[same] if len(day) else \
            np.array([], dtype=np.int64)
        bucket = np.full(len(gaps), "04_long", dtype=object)
        for hi, name in reversed(_GAP_BUCKETS):
            bucket[gaps <= hi] = name
        out = pd.DataFrame({"bucket": bucket, "gap": gaps})
        return out.groupby("bucket", as_index=False).agg(
            n_gaps=("gap", "size"), sum_days=("gap", "sum"))

    parts = (with_coarse_partition(ds, "o_custkey")
             .groupby("__upart")
             .map_groups(lambda g: from_pandas_clean(per_partition(g)),
                         batch_format="pandas"))
    agg = parts.groupby("bucket").aggregate(
        Sum("n_gaps", alias_name="n_gaps"), Sum("sum_days", alias_name="sum_days"))
    rows = [{"bucket": r["bucket"], "n_gaps": int(r["n_gaps"]),
             "avg_gap_days": _round6(int(r["sum_days"]) / int(r["n_gaps"]))}
            for r in collect_pylist(agg)]
    rows.sort(key=lambda r: r["bucket"])
    return pa.Table.from_pylist(rows)


REORDER_INTERVALS_SQL = """
WITH s AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         LAG(CAST(o_orderdate AS DATE)) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_d
  FROM orders),
g AS (SELECT (d - prev_d) AS gap FROM s WHERE prev_d IS NOT NULL),
b AS (SELECT CASE WHEN gap <= 0 THEN '00_same_day'
                  WHEN gap <= 7 THEN '01_within_week'
                  WHEN gap <= 30 THEN '02_within_month'
                  WHEN gap <= 90 THEN '03_within_quarter'
                  ELSE '04_long' END AS bucket, gap FROM g)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_gaps,
       round(CAST(sum(gap) AS DOUBLE) / count(*), 6) AS avg_gap_days
FROM b GROUP BY bucket ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Crawl churn by host: the delta grouped by site — which hosts change
# most between two crawl snapshots (re-crawl scheduling signal: a host
# with high changed-fraction wants a shorter revisit interval). Reuses
# the url-level snapshot delta (pipelines/delta.py: keep-first
# canonical page, md5 content identity, one coarse hash(url) exchange)
# and rolls it up per host = authority part of the url; output is one
# row per (host, status) for hosts with ≥ 3 urls in the union (noise
# floor, restated in SQL; the fixture spreads urls over ~997 hosts so
# a higher floor would be empty at gate scale). Snapshot membership
# uses the same deterministic spec as crawl_delta_pages (A drops
# page_id % 31 == 7, B drops % 29 == 11) so all four statuses can
# appear per host. The per-host rollup is combiner-first: each coarse
# partition emits (host, status, partial n); the groupby moves
# ≤ 4·hosts·P rows — urls never leave their partition.
# ---------------------------------------------------------------------------

def crawl_churn_by_host(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    from tanml_ray.pipelines.delta import snapshot_delta

    def drop(mod: int, val: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("page_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids % mod) != val))
        return fn

    base = read_parquet_clean(_pages_dir_for(sf_dir, "baseline"),
                              columns=["page_id", "url", "text"]) \
        .map_batches(drop(31, 7), batch_format="pyarrow")
    cur = read_parquet_clean(_pages_dir_for(sf_dir, "current"),
                             columns=["page_id", "url", "text"]) \
        .map_batches(drop(29, 11), batch_format="pyarrow")
    delta = snapshot_delta(base, cur)

    def host_partial(batch: pa.Table) -> pd.DataFrame:
        urls = batch.column("url").to_pylist()
        hosts = [u.split("://", 1)[-1].split("/", 1)[0] for u in urls]
        df = pd.DataFrame({"host": pd.Series(hosts, dtype=str),
                           "status": batch.column("status").to_pylist()})
        return df.groupby(["host", "status"], as_index=False).agg(
            n_urls=("status", "size"))

    agg = (delta.map_batches(lambda t: from_pandas_clean(host_partial(t)),
                             batch_format="pyarrow")
           .groupby(["host", "status"])
           .aggregate(Sum("n_urls", alias_name="n_urls")))
    rows = collect_pylist(agg)
    totals: dict[str, int] = {}
    for r in rows:
        totals[r["host"]] = totals.get(r["host"], 0) + int(r["n_urls"])
    out = [{"host": r["host"], "status": r["status"],
            "n_urls": int(r["n_urls"])}
           for r in rows if totals[r["host"]] >= 3]
    out.sort(key=lambda r: (r["host"], r["status"]))
    return pa.Table.from_pylist(
        out, schema=pa.schema([("host", pa.string()),
                               ("status", pa.string()),
                               ("n_urls", pa.int64())]))


CRAWL_CHURN_SQL = """
WITH a AS (
  SELECT url, arg_min(md5(coalesce(text, '')), page_id) AS dg
  FROM read_parquet('{base_dir}/*.parquet')
  WHERE page_id % 31 <> 7 GROUP BY url),
b AS (
  SELECT url, arg_min(md5(coalesce(text, '')), page_id) AS dg
  FROM read_parquet('{cur_dir}/*.parquet')
  WHERE page_id % 29 <> 11 GROUP BY url),
j AS (SELECT coalesce(a.url, b.url) AS url, a.dg AS adg, b.dg AS bdg
      FROM a FULL OUTER JOIN b ON a.url = b.url),
s AS (SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
             CASE WHEN adg IS NULL THEN 'added'
                  WHEN bdg IS NULL THEN 'removed'
                  WHEN adg = bdg THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM j),
g AS (SELECT host, status, CAST(count(*) AS BIGINT) AS n_urls
      FROM s GROUP BY host, status),
t AS (SELECT host, sum(n_urls) AS total FROM g GROUP BY host)
SELECT g.host, g.status, g.n_urls
FROM g JOIN t ON g.host = t.host
WHERE t.total >= 3 ORDER BY g.host, g.status
"""


def crawl_churn_sql(sf_dir: str | None = None) -> str:
    sf = _oracle_sf(sf_dir)
    return CRAWL_CHURN_SQL.format(base_dir=_pages_dir_for(sf, "baseline"),
                                  cur_dir=_pages_dir_for(sf, "current"))


# ---------------------------------------------------------------------------
# Two-proportion z-test (pooled SE) — the canonical A/B conversion
# primitive (reference testing family A20 extension; Fleiss §2.3 /
# every experimentation platform's north-star metric). Variant
# assignment is the deterministic hash split user_id % 2; the tested
# proportion is purchase events per event (impression-level, so the
# test is nondegenerate at every fixture scale — the per-USER
# conversion version saturates at 100% on the tiny sf0.001 user
# population). Scale shape: pure combiner — per-batch (variant,
# n_events, n_purchases) partials, one Sum over ≤ 2·blocks rows, z is
# driver math on 4 integers with the IEEE op order mirrored exactly in
# the SQL twin. Degenerate pooled rates (0 or 1 → zero SE) yield
# z = NULL on both sides.
# ---------------------------------------------------------------------------

def ab_conversion_events(sf_dir: str) -> pa.Table:
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "variant": (batch.column("user_id")
                        .to_numpy(zero_copy_only=False) % 2).astype(np.int64),
            "conv": pc.equal(batch.column("event_type"), "purchase")
            .to_numpy(zero_copy_only=False).astype(np.int64)})
        return df.groupby("variant", as_index=False).agg(
            n_events=("conv", "size"), n_conv=("conv", "sum"))

    agg = (ds.map_batches(lambda t: from_pandas_clean(partial(t)),
                          batch_format="pyarrow")
           .groupby("variant")
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("n_conv", alias_name="n_conv")))
    by = {int(r["variant"]): (int(r["n_events"]), int(r["n_conv"]))
          for r in collect_pylist(agg)}
    (n_a, c_a), (n_b, c_b) = by[0], by[1]
    p_a, p_b = c_a / n_a, c_b / n_b
    pooled = (c_a + c_b) / (n_a + n_b)
    se = math.sqrt(pooled * (1.0 - pooled) * (1.0 / n_a + 1.0 / n_b))
    z = _round6((p_a - p_b) / se) if se > 0.0 else None
    return pa.Table.from_pylist([{
        "n_a": n_a, "conv_a": c_a, "n_b": n_b, "conv_b": c_b,
        "p_a": _round6(p_a), "p_b": _round6(p_b),
        "lift": _round6(p_b - p_a), "z": z}],
        schema=pa.schema([("n_a", pa.int64()), ("conv_a", pa.int64()),
                          ("n_b", pa.int64()), ("conv_b", pa.int64()),
                          ("p_a", pa.float64()), ("p_b", pa.float64()),
                          ("lift", pa.float64()), ("z", pa.float64())]))


AB_CONVERSION_SQL = """
WITH u AS (
  SELECT user_id % 2 AS variant,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events),
v AS (SELECT variant, CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(conv) AS BIGINT) AS n_conv
      FROM u GROUP BY variant),
w AS (SELECT
        max(CASE WHEN variant = 0 THEN n_events END) AS n_a,
        max(CASE WHEN variant = 0 THEN n_conv END) AS conv_a,
        max(CASE WHEN variant = 1 THEN n_events END) AS n_b,
        max(CASE WHEN variant = 1 THEN n_conv END) AS conv_b
      FROM v),
x AS (SELECT n_a, conv_a, n_b, conv_b,
        CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
        CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
        CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp
      FROM w)
SELECT n_a, conv_a, n_b, conv_b,
       round(pa, 6) AS p_a, round(pb, 6) AS p_b,
       round(pb - pa, 6) AS lift,
       CASE WHEN pp > 0 AND pp < 1 THEN
         round((pa - pb) / sqrt(pp * (1.0 - pp)
               * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)
       ELSE NULL END AS z
FROM x
"""


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B (Deng, Xu, Kohavi & Walker, WSDM 2013):
# the experimentation-platform staple. Pre-period covariate = each
# user's value sum before the corpus time midpoint, post-period metric
# = the sum after; θ = cov(pre, post) / var(pre) pooled over all
# users; adjusted metric y − θ·(x − x̄) shrinks between-user variance
# without biasing the A/B difference. Scale shape: two passes — a tiny
# global (min, max) ts reduce fixes the midpoint, then ONE coarse
# hash(user) exchange finishes the per-user (pre, post) integer-micro
# sums vectorized per partition and emits per-partition sufficient
# statistics (n, Σx, Σy per variant + pooled Σx², Σxy, Σy² as
# overflow-free Python-int strings, the profile_lineitem pattern);
# θ and the variance reduction are driver math on ~a dozen numbers,
# IEEE-op-mirrored in the HUGEINT SQL twin.
# ---------------------------------------------------------------------------

def cuped_ab_events(sf_dir: str) -> pa.Table:
    from tanml_ray.stages.shuffle import with_coarse_partition

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def ts_range_partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(ts.min())], type=pa.int64()),
                         "hi": pa.array([int(ts.max())], type=pa.int64())})

    rng = collect_pylist(
        ds.map_batches(ts_range_partial, batch_format="pyarrow"))
    lo = min(r["lo"] for r in rng)
    hi = max(r["hi"] for r in rng)
    mid = (lo + hi) // 2

    def per_user(batch: pa.Table) -> pd.DataFrame:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        val_u = np.rint(batch.column("value").to_numpy(zero_copy_only=False)
                        * 1e6).astype(np.int64)
        pre = np.where(ts < mid, val_u, 0)
        post = np.where(ts >= mid, val_u, 0)
        df = pd.DataFrame({"user_id": batch.column("user_id")
                           .to_numpy(zero_copy_only=False),
                           "x": pre, "y": post})
        return df.groupby("user_id", as_index=False).agg(
            x=("x", "sum"), y=("y", "sum"))

    def suffstats(g: pd.DataFrame) -> pd.DataFrame:
        u = g.groupby("user_id", as_index=False).agg(x=("x", "sum"),
                                                     y=("y", "sum"))
        v = (u["user_id"].to_numpy() % 2).astype(np.int64)
        x = u["x"].to_numpy()
        y = u["y"].to_numpy()
        rows = []
        for variant in (0, 1):
            m = v == variant
            xs, ys = x[m], y[m]
            rows.append({
                "variant": variant, "n": int(m.sum()),
                "sx": int(xs.sum()), "sy": int(ys.sum()),
                # Python-int products: per-user sums reach ~1e10 micro
                # units, squares ~1e20 > int64 — overflow-free bigints
                "sxx": str(sum(int(a) * int(a) for a in xs)),
                "sxy": str(sum(int(a) * int(b) for a, b in zip(xs, ys))),
                "syy": str(sum(int(b) * int(b) for b in ys))})
        return pd.DataFrame(rows)

    parts = collect_pylist(
        with_coarse_partition(
            ds.map_batches(lambda t: from_pandas_clean(per_user(t)),
                           batch_format="pyarrow"), "user_id")
        .groupby("__upart")
        .map_groups(lambda g: from_pandas_clean(suffstats(g)),
                    batch_format="pandas"))
    agg = {0: [0, 0, 0, 0, 0, 0], 1: [0, 0, 0, 0, 0, 0]}
    for r in parts:
        a = agg[int(r["variant"])]
        a[0] += int(r["n"]); a[1] += int(r["sx"]); a[2] += int(r["sy"])
        a[3] += int(r["sxx"]); a[4] += int(r["sxy"]); a[5] += int(r["syy"])
    n = float(agg[0][0] + agg[1][0])
    sx = float(agg[0][1] + agg[1][1]); sy = float(agg[0][2] + agg[1][2])
    sxx = float(agg[0][3] + agg[1][3]); sxy = float(agg[0][4] + agg[1][4])
    syy = float(agg[0][5] + agg[1][5])
    mean_x = sx / n; mean_y = sy / n
    var_x = sxx / n - mean_x * mean_x
    cov = sxy / n - mean_x * mean_y
    var_y = syy / n - mean_y * mean_y
    theta = cov / var_x
    var_cuped = var_y - cov * cov / var_x
    n_a, n_b = agg[0][0], agg[1][0]
    mean_post_a = float(agg[0][2]) / n_a; mean_post_b = float(agg[1][2]) / n_b
    mean_pre_a = float(agg[0][1]) / n_a; mean_pre_b = float(agg[1][1]) / n_b
    cuped_a = mean_post_a - theta * (mean_pre_a - mean_x)
    cuped_b = mean_post_b - theta * (mean_pre_b - mean_x)
    s = 1e6  # micro-units → value units on output
    return pa.Table.from_pylist([{
        "n_a": n_a, "n_b": n_b,
        "mean_post_a": _round6(mean_post_a / s),
        "mean_post_b": _round6(mean_post_b / s),
        "cuped_a": _round6(cuped_a / s), "cuped_b": _round6(cuped_b / s),
        "diff_raw": _round6((mean_post_b - mean_post_a) / s),
        "diff_cuped": _round6((cuped_b - cuped_a) / s),
        "theta": _round6(theta),
        "var_reduction": _round6(1.0 - var_cuped / var_y)}])


CUPED_AB_SQL = """
WITH r AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
           FROM events),
u AS (
  SELECT user_id, user_id % 2 AS v,
         sum(CASE WHEN epoch_us(ts) < mid
             THEN CAST(round(value * 1000000) AS BIGINT) ELSE 0 END) AS x,
         sum(CASE WHEN epoch_us(ts) >= mid
             THEN CAST(round(value * 1000000) AS BIGINT) ELSE 0 END) AS y
  FROM events, r GROUP BY user_id),
g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
        CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
        CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS DOUBLE) AS sxx,
        CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS sxy,
        CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS syy
      FROM u),
vv AS (SELECT v, CAST(count(*) AS BIGINT) AS nv,
         CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sxv,
         CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS syv
       FROM u GROUP BY v),
w AS (SELECT
        max(CASE WHEN v = 0 THEN nv END) AS n_a,
        max(CASE WHEN v = 1 THEN nv END) AS n_b,
        max(CASE WHEN v = 0 THEN sxv END) AS sx_a,
        max(CASE WHEN v = 1 THEN sxv END) AS sx_b,
        max(CASE WHEN v = 0 THEN syv END) AS sy_a,
        max(CASE WHEN v = 1 THEN syv END) AS sy_b
      FROM vv),
d AS (SELECT n_a, n_b,
        sx / n AS mean_x, sy / n AS mean_y,
        sxx / n - (sx / n) * (sx / n) AS var_x,
        sxy / n - (sx / n) * (sy / n) AS cov,
        syy / n - (sy / n) * (sy / n) AS var_y,
        sy_a / CAST(n_a AS DOUBLE) AS mean_post_a,
        sy_b / CAST(n_b AS DOUBLE) AS mean_post_b,
        sx_a / CAST(n_a AS DOUBLE) AS mean_pre_a,
        sx_b / CAST(n_b AS DOUBLE) AS mean_pre_b
      FROM g, w)
SELECT n_a, n_b,
  round(mean_post_a / 1000000.0, 6) AS mean_post_a,
  round(mean_post_b / 1000000.0, 6) AS mean_post_b,
  round((mean_post_a - (cov / var_x) * (mean_pre_a - mean_x)) / 1000000.0, 6)
    AS cuped_a,
  round((mean_post_b - (cov / var_x) * (mean_pre_b - mean_x)) / 1000000.0, 6)
    AS cuped_b,
  round((mean_post_b - mean_post_a) / 1000000.0, 6) AS diff_raw,
  round(((mean_post_b - (cov / var_x) * (mean_pre_b - mean_x))
       - (mean_post_a - (cov / var_x) * (mean_pre_a - mean_x)))
       / 1000000.0, 6) AS diff_cuped,
  round(cov / var_x, 6) AS theta,
  round(1.0 - (var_y - cov * cov / var_x) / var_y, 6) AS var_reduction
FROM d
"""


# ---------------------------------------------------------------------------
# Wald SPRT on the purchase rate — sequential testing as a streaming
# decision operator (Wald 1945; the always-on complement of the fixed-
# horizon A/B z-test). Events are consumed in global (ts, event_id)
# order; LLR_t = s_t·ln(p1/p0) + (t−s_t)·ln((1−p1)/(1−p0)) with
# H0: p=0.18, H1: p=0.22, α=β=0.05 → stop at the FIRST t where
# LLR ≥ ln(19) (accept H1) or ≤ ln(1/19) (accept H0); 'continue' with
# the final LLR if no boundary is hit. Scale shape (the pack_windows
# two-pass prefix): per-hour (n, successes) combiner totals → driver
# prefix over the calendar-bounded hour list (≤ a few thousand rows at
# ANY corpus size) finds each hour's incoming (T, S) offsets → one
# vectorized per-hour group pass evaluates the linear-in-(t, s_t)
# boundary crossing locally and emits its first hit; the global answer
# is the min-t hit. LLR is linear in two integers, so engine and the
# SQL window-cumsum twin agree bit-exactly.
# ---------------------------------------------------------------------------

_SPRT_P0, _SPRT_P1 = 0.18, 0.22


def sprt_purchase_events(sf_dir: str) -> pa.Table:
    import math

    from ray.data.aggregate import Sum

    c1 = math.log(_SPRT_P1 / _SPRT_P0)
    c2 = math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0))
    log_a = math.log(19.0)          # (1-β)/α
    log_b = math.log(1.0 / 19.0)    # β/(1-α)

    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type"])

    def hour_partial(batch: pa.Table) -> pd.DataFrame:
        hour = (batch.column("ts").cast(pa.int64())
                .to_numpy(zero_copy_only=False) // 3_600_000_000)
        s = pc.equal(batch.column("event_type"), "purchase") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"hour": hour, "s": s})
        return df.groupby("hour", as_index=False).agg(n=("s", "size"),
                                                      s=("s", "sum"))

    totals = collect_pylist(
        ds.map_batches(lambda t: from_pandas_clean(hour_partial(t)),
                       batch_format="pyarrow")
        .groupby("hour").aggregate(Sum("n", alias_name="n"),
                                   Sum("s", alias_name="s")))
    totals.sort(key=lambda r: r["hour"])
    offsets: dict[int, tuple[int, int]] = {}
    T = S = 0
    for r in totals:
        offsets[int(r["hour"])] = (T, S)
        T += int(r["n"])
        S += int(r["s"])
    total_n, total_s = T, S

    def add_hour(batch: pa.Table) -> pa.Table:
        hour = (batch.column("ts").cast(pa.int64())
                .to_numpy(zero_copy_only=False) // 3_600_000_000)
        return batch.append_column("hour",
                                   pa.array(hour, type=pa.int64()))

    def first_hit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        hour = int(g["hour"].iloc[0])
        t0, s0 = offsets[hour]
        s_loc = (g["event_type"].to_numpy() == "purchase").astype(np.int64)
        st = s0 + np.cumsum(s_loc)
        t = t0 + np.arange(1, len(g) + 1, dtype=np.int64)
        llr = st * c1 + (t - st) * c2
        hit = (llr >= log_a) | (llr <= log_b)
        if not hit.any():
            return pd.DataFrame({"t": pd.Series([], dtype="int64"),
                                 "s": pd.Series([], dtype="int64")})
        i = int(np.argmax(hit))
        return pd.DataFrame({"t": [int(t[i])], "s": [int(st[i])]})

    hits = collect_pylist(
        ds.map_batches(add_hour, batch_format="pyarrow")
        .groupby("hour")
        .map_groups(lambda g: from_pandas_clean(first_hit(g)),
                    batch_format="pandas"))
    if hits:
        best = min(hits, key=lambda r: r["t"])
        t, s = int(best["t"]), int(best["s"])
        llr = s * c1 + (t - s) * c2
        decision = "accept_h1" if llr >= log_a else "accept_h0"
    else:
        t, s = total_n, total_s
        llr = s * c1 + (t - s) * c2
        decision = "continue"
    return pa.Table.from_pylist([{
        "decision": decision, "n": t, "successes": s,
        "llr": _round6(llr)}])


SPRT_SQL = """
WITH e AS (
  SELECT ts, event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS sv
  FROM events),
c AS (
  SELECT CAST(row_number() OVER w AS BIGINT) AS t,
         CAST(sum(sv) OVER w AS BIGINT) AS st
  FROM e WINDOW w AS (ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
l AS (SELECT t, st,
        st * ln(0.22 / 0.18) + (t - st) * ln((1.0 - 0.22) / (1.0 - 0.18))
          AS llr
      FROM c),
hit AS (SELECT t, st, llr FROM l
        WHERE llr >= ln(19.0) OR llr <= ln(1.0 / 19.0)
        ORDER BY t LIMIT 1),
fin AS (SELECT t, st, llr FROM l ORDER BY t DESC LIMIT 1)
SELECT
  CASE WHEN (SELECT count(*) FROM hit) = 0 THEN 'continue'
       WHEN (SELECT llr FROM hit) >= ln(19.0) THEN 'accept_h1'
       ELSE 'accept_h0' END AS decision,
  coalesce((SELECT t FROM hit), (SELECT t FROM fin)) AS n,
  coalesce((SELECT st FROM hit), (SELECT st FROM fin)) AS successes,
  round(coalesce((SELECT llr FROM hit), (SELECT llr FROM fin)), 6) AS llr
"""


# ---------------------------------------------------------------------------
# Difference-in-differences over the pre/post × variant split — the
# observational-causal complement of the A/B family (Card & Krueger
# shape): DiD = (post_B − pre_B) − (post_A − pre_A) on per-user value
# sums, removing any variant-level baseline offset. Reuses the CUPED
# split (time midpoint, user_id % 2) and the same combiner-first
# integer-micro sufficient statistics; one coarse hash(user) exchange,
# driver math on 6 integers mirrored in SQL.
# ---------------------------------------------------------------------------

def did_events(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def ts_range_partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(ts.min())], type=pa.int64()),
                         "hi": pa.array([int(ts.max())], type=pa.int64())})

    rng = collect_pylist(
        ds.map_batches(ts_range_partial, batch_format="pyarrow"))
    mid = (min(r["lo"] for r in rng) + max(r["hi"] for r in rng)) // 2

    def partial(batch: pa.Table) -> pd.DataFrame:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        val_u = np.rint(batch.column("value").to_numpy(zero_copy_only=False)
                        * 1e6).astype(np.int64)
        df = pd.DataFrame({
            "variant": (batch.column("user_id")
                        .to_numpy(zero_copy_only=False) % 2).astype(np.int64),
            "period": (ts >= mid).astype(np.int64),
            "v": val_u})
        return df.groupby(["variant", "period"], as_index=False).agg(
            n=("v", "size"), sv=("v", "sum"))

    agg = (ds.map_batches(lambda t: from_pandas_clean(partial(t)),
                          batch_format="pyarrow")
           .groupby(["variant", "period"])
           .aggregate(Sum("n", alias_name="n"), Sum("sv", alias_name="sv")))
    cell = {(int(r["variant"]), int(r["period"])): (int(r["n"]), int(r["sv"]))
            for r in collect_pylist(agg)}
    mean = {k: float(v[1]) / v[0] for k, v in cell.items()}
    did = ((mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)]))
    s = 1e6
    return pa.Table.from_pylist([{
        "pre_a": _round6(mean[(0, 0)] / s), "post_a": _round6(mean[(0, 1)] / s),
        "pre_b": _round6(mean[(1, 0)] / s), "post_b": _round6(mean[(1, 1)] / s),
        "delta_a": _round6((mean[(0, 1)] - mean[(0, 0)]) / s),
        "delta_b": _round6((mean[(1, 1)] - mean[(1, 0)]) / s),
        "did": _round6(did / s)}])


DID_SQL = """
WITH r AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
           FROM events),
c AS (
  SELECT user_id % 2 AS variant,
         CASE WHEN epoch_us(ts) >= mid THEN 1 ELSE 0 END AS period,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sv
  FROM events, r GROUP BY 1, 2),
m AS (SELECT variant, period, CAST(sv AS DOUBLE) / n AS mu FROM c),
w AS (SELECT
        max(CASE WHEN variant = 0 AND period = 0 THEN mu END) AS m00,
        max(CASE WHEN variant = 0 AND period = 1 THEN mu END) AS m01,
        max(CASE WHEN variant = 1 AND period = 0 THEN mu END) AS m10,
        max(CASE WHEN variant = 1 AND period = 1 THEN mu END) AS m11
      FROM m)
SELECT round(m00 / 1000000.0, 6) AS pre_a, round(m01 / 1000000.0, 6) AS post_a,
       round(m10 / 1000000.0, 6) AS pre_b, round(m11 / 1000000.0, 6) AS post_b,
       round((m01 - m00) / 1000000.0, 6) AS delta_a,
       round((m11 - m10) / 1000000.0, 6) AS delta_b,
       round(((m11 - m10) - (m01 - m00)) / 1000000.0, 6) AS did
FROM w
"""
