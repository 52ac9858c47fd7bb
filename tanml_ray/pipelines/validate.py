"""The flagship validation pipeline (SURVEY.md §3.2 new-engine trace).

    read_parquet(pages/, include_paths=True)
      → stage 1  map_batches(ValidateBatch): row constraints + profile
                 partials + per-partition status partials, emitted as one
                 tagged mixed table (html/text projected away immediately —
                 the wide binary column never moves past stage 1)
      → materialize the (tiny) mixed table once
      → violations sink          (filter kind=violation → write_parquet)
      → per-partition status     (groupby partition_id+constraint_id, sum)
      → profile artifact         (merge pickled partials driver-side)
      → uniqueness(url)          (the one shuffle: groupby url over a
                                  pre-deduped projection — SURVEY.md §7.5
                                  item 7: per-batch local dedup first)
      → executive roll-up        (reference thresholds, §2.5 A24)

One streaming read of the input; everything downstream operates on
small derived tables. Partition = input parquet file, which is what
makes runs resumable per-partition (state/checkpoint.py).
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tanml_ray.functions.collect import collect_pylist

from tanml_ray.stages.constraints import (
    RowConstraint,
    default_pages_constraints,
    evaluate_constraints,
)
from tanml_ray.stages.profile import make_profile_partials
from tanml_ray.sources.ingest import read_parquet_clean

MIXED_SCHEMA = pa.schema([
    ("kind", pa.string()),            # violation | status | partial | uhash
    ("partition_id", pa.string()),
    ("constraint_id", pa.string()),
    ("url", pa.string()),
    ("offending_value", pa.string()),
    ("rows", pa.int64()),
    ("violations", pa.int64()),
    ("elapsed_us", pa.int64()),
    ("column", pa.string()),
    ("state", pa.binary()),
    ("bucket", pa.int32()),           # uhash rows: url-hash bucket
])

N_URL_BUCKETS = 64


def _mixed(kind: str, n: int, **cols) -> pa.Table:
    arrays = []
    for f in MIXED_SCHEMA:
        if f.name == "kind":
            arrays.append(pa.array([kind] * n, type=pa.string()))
        elif f.name in cols:
            v = cols[f.name]
            arrays.append(v if isinstance(v, pa.Array) else pa.array(v, type=f.type))
        else:
            arrays.append(pa.nulls(n, type=f.type))
    return pa.Table.from_arrays(arrays, schema=MIXED_SCHEMA)


def _hash_urls(urls: np.ndarray, mod: int | None = None) -> np.ndarray:
    """64-bit url hash used by the uniqueness check. ``mod`` narrows the
    hash space (test hook: forces collisions so the collision-verify
    path is exercisable; production leaves it None)."""
    import pandas as pd

    h = pd.util.hash_array(urls, categorize=False)
    if mod is not None:
        h = h % np.uint64(mod)
    return h


class ValidateBatch:
    """Stage-1 batch worker. Plain callable class → usable both as
    stateless task fn and as an actor pool via map_batches(cls)."""

    def __init__(self, constraints: list[RowConstraint] | None = None,
                 profile_columns: list[str] | None = None,
                 text_len_col: str | None = "text",
                 uniqueness: bool = True,
                 url_hash_mod: int | None = None):
        self.constraints = constraints if constraints is not None else default_pages_constraints()
        self.profile_columns = profile_columns or ["url", "warc_ts", "text", "lang"]
        self.text_len_col = text_len_col
        self.uniqueness = uniqueness
        self.url_hash_mod = url_hash_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        if "path" in batch.column_names:
            paths = np.asarray([os.path.basename(p) for p in
                                batch.column("path").to_pylist()], dtype=object)
            batch = batch.drop_columns(["path"])
        else:
            paths = np.full(batch.num_rows, "all", dtype=object)

        out: list[pa.Table] = []

        violations, counts = evaluate_constraints(batch, self.constraints)

        # attribute violations + row counts to partitions (usually one
        # path per block; handle the general case)
        uniq_paths = np.unique(paths)
        if len(uniq_paths) == 1:
            pid = uniq_paths[0]
            if violations.num_rows:
                out.append(_mixed("violation", violations.num_rows,
                                  partition_id=[pid] * violations.num_rows,
                                  constraint_id=violations.column("constraint_id").combine_chunks(),
                                  url=violations.column("url").combine_chunks(),
                                  offending_value=violations.column("offending_value").combine_chunks()))
            elapsed = int((time.perf_counter() - t0) * 1e6)
            out.append(_mixed("status", len(counts),
                              partition_id=[pid] * len(counts),
                              constraint_id=list(counts.keys()),
                              rows=[batch.num_rows] * len(counts),
                              violations=list(counts.values()),
                              elapsed_us=[elapsed] * len(counts)))
        else:
            for pid in uniq_paths:
                sel = pa.array(paths == pid)
                sub = batch.filter(sel)
                v_sub, c_sub = evaluate_constraints(sub, self.constraints)
                if v_sub.num_rows:
                    out.append(_mixed("violation", v_sub.num_rows,
                                      partition_id=[pid] * v_sub.num_rows,
                                      constraint_id=v_sub.column("constraint_id").combine_chunks(),
                                      url=v_sub.column("url").combine_chunks(),
                                      offending_value=v_sub.column("offending_value").combine_chunks()))
                elapsed = int((time.perf_counter() - t0) * 1e6)
                out.append(_mixed("status", len(c_sub),
                                  partition_id=[pid] * len(c_sub),
                                  constraint_id=list(c_sub.keys()),
                                  rows=[sub.num_rows] * len(c_sub),
                                  violations=list(c_sub.values()),
                                  elapsed_us=[elapsed] * len(c_sub)))

        partials = make_profile_partials(batch, self.profile_columns,
                                         derived_text_len=self.text_len_col)
        if partials.num_rows:
            out.append(_mixed("partial", partials.num_rows,
                              partition_id=[str(uniq_paths[0])] * partials.num_rows,
                              column=partials.column("column").combine_chunks(),
                              state=partials.column("state").combine_chunks()))

        # uniqueness(url) partials: pack this batch's url-hashes into
        # per-bucket blobs (the downstream shuffle then moves only
        # O(buckets × blocks) rows of columnar bytes, never urls)
        if self.uniqueness:
            import pandas as pd

            urls = batch.column("url").to_numpy(zero_copy_only=False).astype(object)
            h = _hash_urls(urls, self.url_hash_mod)
            bucket = (h % np.uint64(N_URL_BUCKETS)).astype(np.int32)
            order = np.argsort(bucket, kind="stable")
            hb, bb = h[order], bucket[order]
            bounds = np.searchsorted(bb, np.arange(N_URL_BUCKETS + 1))
            rows_b, rows_blob = [], []
            for b in range(N_URL_BUCKETS):
                lo, hi = bounds[b], bounds[b + 1]
                if hi > lo:
                    rows_b.append(b)
                    rows_blob.append(hb[lo:hi].tobytes())
            if rows_b:
                out.append(_mixed("uhash", len(rows_b),
                                  bucket=pa.array(rows_b, type=pa.int32()),
                                  state=pa.array(rows_blob, type=pa.binary())))
        return pa.concat_tables(out) if out else _mixed("status", 0)


@dataclass
class ValidationReport:
    status: "pa.Table"                 # partition_id, constraint_id, rows, violations, status
    partition_status: "pa.Table"       # partition_id, rows, violations, status, p95 source
    profile: dict[str, dict[str, Any]]
    violations: Any                    # ray.data.Dataset
    duplicate_urls: Any                # ray.data.Dataset (url, n)
    summary: dict[str, Any] = field(default_factory=dict)


def run_pages_validation(source, out_dir: str | None = None,
                         constraints: list[RowConstraint] | None = None,
                         check_uniqueness: bool = True,
                         override_num_blocks: int | None = None,
                         url_hash_mod: int | None = None,
                         uhash_driver_budget: int = 512 << 20) -> ValidationReport:
    """source: parquet path/dir (preferred — gives real partitions) or an
    existing ray.data.Dataset of pages. override_num_blocks caps the
    task count (one block per input file is usually right — Ray's
    default sub-file splitting multiplies scheduling overhead)."""
    import ray.data as rd

    # phase clock (GRAFT_PHASE_TIMING=1): prints per-phase wall to
    # stderr so the 2-vs-8-CPU scaling legs can be decomposed — the
    # non-scaling remainder on the wide leg lives in whichever phase
    # stays constant across CPU counts.
    _t0 = time.perf_counter()
    _trace = os.environ.get("GRAFT_PHASE_TIMING")

    def _mark(name: str) -> None:
        nonlocal _t0
        if _trace:
            now = time.perf_counter()
            print(f"[phase] {name}: {now - _t0:.3f}s", file=sys.stderr)
            _t0 = now

    if isinstance(source, str):
        ds = read_parquet_clean(source, include_paths=True,
                             override_num_blocks=override_num_blocks)
    else:
        ds = source
    _mark("stage0_read_setup")

    mixed = ds.map_batches(ValidateBatch(constraints=constraints,
                                         uniqueness=check_uniqueness,
                                         url_hash_mod=url_hash_mod),
                           batch_format="pyarrow").materialize()
    _mark("stage1_validate")

    violations = mixed.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "violation")),
        batch_format="pyarrow").select_columns(
        ["partition_id", "constraint_id", "url", "offending_value"])

    # -- status + profile: one driver-side pass over the (small) non-
    # violation, non-uhash rows — a distributed groupby at this size
    # would be pure scheduling overhead (O(blocks × constraints) rows).
    status_agg: dict[tuple, list[int]] = {}
    merged_profiles = None
    import pickle

    from tanml_ray.kernels.accumulators import ColumnProfileAcc

    def _pre_merge(t: pa.Table) -> pa.Table:
        """Tree-merge round: collapse one block's status/partial rows so
        the driver merge is O(pre-merge tasks), not O(input blocks).
        uhash rows pass through with per-bucket blob concatenation, so
        the whole non-violation stream is consumed in ONE pass (no
        per-kind re-filters over the full mixed table)."""
        import pickle as _pickle

        from tanml_ray.kernels.accumulators import ColumnProfileAcc as _Acc

        st: dict[tuple, list[int]] = {}
        pr: dict[str, object] = {}
        uh: dict[int, list[bytes]] = {}
        first_pid = "all"
        for r in t.to_pylist():
            if r["kind"] == "status":
                first_pid = r["partition_id"]
                a = st.setdefault((r["partition_id"], r["constraint_id"]), [0, 0, 0])
                a[0] += r["rows"]
                a[1] += r["violations"]
                a[2] = max(a[2], r["elapsed_us"])
            elif r["kind"] == "partial":
                acc = _Acc.from_state(_pickle.loads(r["state"]))
                if r["column"] in pr:
                    pr[r["column"]].merge(acc)
                else:
                    pr[r["column"]] = acc
            elif r["kind"] == "uhash":
                uh.setdefault(r["bucket"], []).append(r["state"])
        out = []
        if uh:
            bks = sorted(uh)
            out.append(_mixed("uhash", len(bks),
                              bucket=pa.array(bks, type=pa.int32()),
                              state=pa.array([b"".join(uh[b]) for b in bks],
                                             type=pa.binary())))
        if st:
            keys = sorted(st)
            out.append(_mixed("status", len(keys),
                              partition_id=[k[0] for k in keys],
                              constraint_id=[k[1] for k in keys],
                              rows=[st[k][0] for k in keys],
                              violations=[st[k][1] for k in keys],
                              elapsed_us=[st[k][2] for k in keys]))
        if pr:
            cols = sorted(pr)
            out.append(_mixed("partial", len(cols),
                              partition_id=[first_pid] * len(cols),
                              column=cols,
                              state=[_pickle.dumps(pr[c].to_state()) for c in cols]))
        return pa.concat_tables(out) if out else _mixed("status", 0)

    def _filter_pre_merge(t: pa.Table) -> pa.Table:
        return _pre_merge(t.filter(pc.not_equal(t.column("kind"), "violation")))

    # Size-adaptive tree: at modest block counts the filter+pre-merge
    # FUSE into one per-block pass (no repartition round — the driver
    # merge over ≤ pre_merge_cutoff pre-merged blocks is cheaper than
    # an exchange); past the cutoff the repartition(8) tree round caps
    # the driver merge at O(8) regardless of block count (the 10⁶-block
    # path; a fully driver-fused variant regressed the high-CPU legs in
    # round 1 and stays rejected).
    PRE_MERGE_CUTOFF = 128
    n_blocks = mixed.num_blocks()
    if n_blocks is not None and n_blocks <= PRE_MERGE_CUTOFF:
        small = mixed.map_batches(_filter_pre_merge, batch_format="pyarrow",
                                  batch_size=None).materialize()
    else:
        small = (mixed.map_batches(
            lambda t: t.filter(pc.not_equal(t.column("kind"), "violation")),
            batch_format="pyarrow")
            .repartition(8)
            .map_batches(_pre_merge, batch_format="pyarrow", batch_size=None)
            .materialize())
    _mark("stage2_pre_merge")
    merged_profiles = {}

    # size-adaptive routing decided UP FRONT from O(1) block metadata:
    # `small` is materialized, and its bytes are dominated by the uhash
    # blobs (8 B/url vs a handful of status/partial rows per block), so
    # `size_bytes()` is a tight, conservative over-estimate of the blob
    # payload — no extra task round just to measure it. Below budget,
    # ONE driver iteration consumes status + profile + uhash together;
    # above it the uhash rows never stream through the driver at all.
    uhash_bytes = small.size_bytes() if check_uniqueness else 0
    driver_uhash = check_uniqueness and uhash_bytes <= uhash_driver_budget
    _mark("stage3_uhash_size_probe")

    uh_blobs: list[bytes] = []
    driver_stream = (small if driver_uhash else small.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("kind"), "uhash")),
        batch_format="pyarrow"))
    for t in driver_stream.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for r in t.to_pylist():
            if r["kind"] == "status":
                a = status_agg.setdefault((r["partition_id"], r["constraint_id"]),
                                          [0, 0, 0])
                a[0] += r["rows"]
                a[1] += r["violations"]
                a[2] = max(a[2], r["elapsed_us"])
            elif r["kind"] == "partial":
                acc = ColumnProfileAcc.from_state(pickle.loads(r["state"]))
                if r["column"] in merged_profiles:
                    merged_profiles[r["column"]].merge(acc)
                else:
                    merged_profiles[r["column"]] = acc
            elif r["kind"] == "uhash":
                uh_blobs.append(r["state"])
    status = pa.Table.from_pylist(
        [{"partition_id": k[0], "constraint_id": k[1],
          "rows": v[0], "violations": v[1], "elapsed_us": v[2]}
         for k, v in sorted(status_agg.items())],
        schema=pa.schema([("partition_id", pa.string()),
                          ("constraint_id", pa.string()),
                          ("rows", pa.int64()), ("violations", pa.int64()),
                          ("elapsed_us", pa.int64())]))
    status = status.append_column(
        "status", pc.if_else(pc.greater(status.column("violations"), 0),
                             pa.scalar("fail"), pa.scalar("pass")))
    profile = {name: acc.finalize() for name, acc in merged_profiles.items()}
    _mark("stage4_driver_merge")

    # -- uniqueness(url): the one shuffle (SURVEY.md §7.5 item 7).
    # Stage 1 already packed per-batch url-hash blobs keyed by bucket;
    # the exchange moves O(buckets × blocks) rows of columnar bytes
    # (never url strings), and per-bucket dup detection is one
    # np.unique over the concatenated blobs.
    dup_urls = None
    dup_count = 0
    if check_uniqueness:
        import pandas as pd

        # Size-adaptive merge (like broadcast-vs-shuffle join selection):
        # hash blobs are 8 B/url. Below the threshold one driver-side
        # np.unique is faster than any shuffle (the blobs were already
        # collected in the single consumer pass above); above it
        # (≳10^8 urls) the per-bucket distributed groupby takes over.
        # The hash pass is a CANDIDATE FILTER only — repeated hashes
        # are then verified by actual url string equality in the
        # resolve pass, so 64-bit birthday collisions (≈ n²/2^65 —
        # thousands of false pairs at 10^12 rows) can never report
        # distinct urls as duplicates.
        if driver_uhash:
            h = np.frombuffer(b"".join(uh_blobs), dtype=np.uint64)
            # O(n) hashmap duplicate scan (pd.Series.duplicated) instead
            # of sort-based np.unique — 3× faster at 5M hashes (0.8 s vs
            # 2.5 s), and this is serial driver time that the wide
            # scaling leg pays in full.
            dup_mask = pd.Series(h).duplicated().to_numpy()
            cand_hashes = np.unique(h[dup_mask]).astype(np.int64)
            _mark("stage5_uhash_dups")
        else:
            uhash = small.map_batches(
                lambda t: t.filter(pc.equal(t.column("kind"), "uhash")),
                batch_format="pyarrow").select_columns(["bucket", "state"])

            def find_dups(g: pd.DataFrame) -> pd.DataFrame:
                hh = np.frombuffer(b"".join(g["state"]), dtype=np.uint64)
                u, c = np.unique(hh, return_counts=True)
                d = c > 1
                return pd.DataFrame({"h": u[d].astype(np.int64)})

            cand_hashes = np.array(
                [r["h"] for r in collect_pylist(
                    uhash.groupby("bucket").map_groups(find_dups,
                                                       batch_format="pandas"))],
                dtype=np.int64)
        if cand_hashes.size:
            import ray as _ray

            dup_ref = _ray.put(np.sort(cand_hashes))

            def resolve_urls(t: pa.Table) -> pa.Table:
                dup_sorted = _ray.get(dup_ref)
                urls = t.column("url").to_numpy(zero_copy_only=False).astype(object)
                h = _hash_urls(urls, url_hash_mod).astype(np.int64)
                pos = np.searchsorted(dup_sorted, h)
                pos[pos == len(dup_sorted)] = 0
                mask = dup_sorted[pos] == h
                return pa.table({"url": pa.array(urls[mask].tolist(), type=pa.string())})

            # column-pruned re-read: only urls leave storage; output is
            # bounded by the candidate row count (true dups + rare
            # collision partners), not the input size
            if isinstance(source, str):
                resolve_src = read_parquet_clean(source, columns=["url"])
            else:
                resolve_src = ds.select_columns(["url"])
            resolved = collect_pylist(
                resolve_src.map_batches(resolve_urls, batch_format="pyarrow"))
            # verify: a url is duplicated iff the SAME string occurs >1×
            from collections import Counter

            url_counts = Counter(r["url"] for r in resolved)
            verified = {u: n for u, n in url_counts.items() if n > 1}
            dup_count = len(verified)
            _mark("stage6_url_resolve")
            import ray.data as _rd

            dup_urls = _rd.from_arrow(pa.Table.from_pylist(
                [{"url": u, "n": n} for u, n in sorted(verified.items())],
                schema=pa.schema([("url", pa.string()), ("n", pa.int64())])))
        else:
            import ray.data as _rd

            dup_urls = _rd.from_arrow(pa.table(
                {"url": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}))

    # -- per-partition roll-up
    pstat = (status.group_by("partition_id")
             .aggregate([("rows", "max"), ("violations", "sum"), ("elapsed_us", "max")]))
    pstat = pstat.rename_columns(["partition_id", "rows", "violations", "elapsed_us"])
    pstat = pstat.append_column(
        "status", pc.if_else(pc.greater(pstat.column("violations"), 0),
                             pa.scalar("fail"), pa.scalar("pass")))

    elapsed = np.asarray(pstat.column("elapsed_us").to_pylist(), dtype=np.float64)
    total_rows = int(pc.sum(pstat.column("rows")).as_py() or 0)
    summary = {
        "partitions": pstat.num_rows,
        "rows": total_rows,
        "total_violations": int(pc.sum(status.column("violations")).as_py() or 0),
        "duplicate_urls": dup_count,
        "failed_partitions": int(pc.sum(
            pc.cast(pc.equal(pstat.column("status"), "fail"), pa.int64())).as_py() or 0),
        "p95_partition_latency_ms": float(np.percentile(elapsed, 95) / 1000) if elapsed.size else 0.0,
        "overall": "fail" if dup_count or
                   int(pc.sum(status.column("violations")).as_py() or 0) else "pass",
    }

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        violations.write_parquet(os.path.join(out_dir, "violations"))
        import json
        with open(os.path.join(out_dir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2, default=str)

    _mark("stage7_rollup")
    return ValidationReport(status=status, partition_status=pstat,
                            profile=profile, violations=violations,
                            duplicate_urls=dup_urls, summary=summary)


# ---------------------------------------------------------------------------
# Aggregate (partition-level) constraints — the deequ/Great-
# Expectations check class the row constraints can't express:
# thresholds over per-partition AGGREGATES (violation rates, row-count
# bounds). They evaluate over the already-computed status table
# (partitions × constraints rows — never corpus-sized), so adding a
# threshold costs zero extra distributed work.
# ---------------------------------------------------------------------------

def evaluate_aggregate_constraints(report: "ValidationReport",
                                   rules: list[dict]) -> pa.Table:
    """rules, each a dict:
      {"kind": "max_violation_rate", "source_constraint": <id>,
       "max_rate": float, "name": optional}  — per partition,
       violations/rows of that constraint must be <= max_rate;
      {"kind": "min_rows", "min_rows": int, "name": optional}
       — per partition, row count must be >= min_rows (catches
       truncated/failed shards).

    Returns (partition_id, constraint_id, value, threshold, status)
    with value rounded to 6.
    """
    import numpy as np

    st = report.status.to_pandas()
    out = []
    for rule in rules:
        kind = rule["kind"]
        if kind == "max_violation_rate":
            src = rule["source_constraint"]
            thr = float(rule["max_rate"])
            cid = rule.get("name", f"agg_rate_{src}")
            sub = st[st["constraint_id"] == src]
            if sub.empty:
                # a typo'd id would otherwise emit zero rows and read
                # as "gate passed" — fail loudly instead
                known = sorted(st["constraint_id"].unique())
                raise ValueError(
                    f"source_constraint {src!r} not in status table; "
                    f"known: {known}")
            for _, r in sub.iterrows():
                rate = (r["violations"] / r["rows"]) if r["rows"] else 0.0
                out.append({
                    "partition_id": r["partition_id"],
                    "constraint_id": cid,
                    "value": float(np.round(rate, 6)),
                    "threshold": thr,
                    "status": "pass" if rate <= thr else "fail"})
        elif kind == "min_rows":
            thr = int(rule["min_rows"])
            cid = rule.get("name", "agg_min_rows")
            rows_per = st.groupby("partition_id")["rows"].max()
            for pid, n in rows_per.items():
                out.append({
                    "partition_id": pid, "constraint_id": cid,
                    "value": float(n), "threshold": float(thr),
                    "status": "pass" if n >= thr else "fail"})
        else:
            raise ValueError(f"unknown aggregate constraint kind {kind!r}")
    return pa.Table.from_pylist(sorted(
        out, key=lambda r: (r["constraint_id"], r["partition_id"])))
